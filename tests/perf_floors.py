"""Wall-clock throughput-floor test support (ADVICE r8: the streaming
near-dup floor asserted absolute docs/s in the default unit suite and
could flake on loaded or slower hosts despite its 40% margin).

Two mechanisms make the floors host-robust without giving up the CI
tripwire:

- ``@pytest.mark.perf_floor`` + :func:`skip_if_perf_floors_disabled` —
  ``SPARK_GRAFT_SKIP_PERF_FLOORS=1`` (or ``-m "not perf_floor"``) skips
  every wall-clock assertion, so plain ``pytest tests/`` on an arbitrary
  dev laptop cannot fail on timing alone when the operator is untouched.
- :func:`arrow_host_scale` — a fixed Arrow/Python-worker probe (the
  bench.py ``sentinel_arrow_sec`` contract, sized for the test session)
  measures THIS run's effective Python-band speed, and the floors scale
  DOWN by ``min(1, cal/measured)`` on hosts slower than the calibration
  host. Floors never scale UP (a fast host keeps the calibrated margin
  rather than manufacturing a tighter one from a noisy probe), so the
  scale can only make the assertion more permissive — a genuine operator
  regression (the thing the floor protects: losing the Arrow signature
  kernel, the salted CSR state, or the pruned streaming argmin — each a
  >2x swing) still trips because host slowdown and code slowdown multiply.

The probe plan mirrors bench.py's ``sentinel_arrow_probe`` (same Arrow
IPC + numpy + md5-fold machinery the streaming kernels run on) but reads
the sf0.01 lineitem slice so one rep costs ~0.5 s in the local[4] test
session. Calibrated on the round-9 host: 0.45 s warm best-of-2.
"""

from __future__ import annotations

import os
import time

import pytest

# Warm best-of-2 of _arrow_probe on the calibration host (round 9,
# local[4], 8 shuffle partitions — the test-session shape). Floors quoted
# in the tests are docs/s measured on the SAME host/session, so the ratio
# cal/measured transports them to any other host.
ARROW_PROBE_CAL_S = 0.45

_scale_cache: dict[str, float] = {}


def skip_if_perf_floors_disabled() -> None:
    if os.environ.get("SPARK_GRAFT_SKIP_PERF_FLOORS"):
        pytest.skip("SPARK_GRAFT_SKIP_PERF_FLOORS set — wall-clock floors off")


def _arrow_probe(spark):
    """Fixed Python-worker probe — the bench.py sentinel_arrow contract
    at test size. NEVER change this plan: it is the normalization baseline
    for every floor calibrated against ARROW_PROBE_CAL_S."""
    import hashlib

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [StructField("n", LongType()), StructField("h", LongType())]
    )

    def fold(batches):
        for pdf in batches:
            keys = (
                pdf["l_orderkey"].to_numpy().astype("int64") * 1000003
                + pdf["l_partkey"].to_numpy().astype("int64")
            )
            digest = hashlib.md5(keys.tobytes()).digest()
            yield pd.DataFrame(
                {"n": [len(pdf)], "h": [int.from_bytes(digest[:4], "big")]}
            )

    return (
        spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .mapInPandas(fold, out_schema)
        .groupBy()
        .agg(F.sum("n").alias("rows"), F.sum("h").alias("hsum"))
    )


def arrow_host_scale(spark) -> float:
    """min(1, cal/measured) for the fixed Arrow probe — the factor to
    multiply a calibrated docs/s floor by on this host, cached per
    session. One untimed warm rep (cold Python-worker spawn costs ~10x
    the warm probe and is not host speed), then best-of-2 timed."""
    key = "scale"
    if key in _scale_cache:
        return _scale_cache[key]

    def run():
        _arrow_probe(spark).write.mode("overwrite").format("noop").save()

    run()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    scale = min(1.0, ARROW_PROBE_CAL_S / best)
    _scale_cache[key] = scale
    return scale
