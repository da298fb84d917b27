#!/usr/bin/env python
"""Two-band drift-sentinel calibration (round 8, VERDICT r7 item 5).

bench.py emits two fixed, registry-independent drift sentinels:
``sentinel_sec`` (pure-JVM lineitem scan→hash agg) and
``sentinel_arrow_sec`` (Arrow mapInPandas md5-fold over a lineitem slice).
BASELINE.md's two-band rule normalizes JVM-heavy queries by the first and
Arrow-heavy (mapInPandas/applyInPandas) queries by the second — because in
round 7 a JVM-only sentinel left four Arrow-heavy doc queries showing
1.24–1.45x phantom "regressions" on byte-identical code.

This script VALIDATES the rule: it times both sentinels plus the four
Arrow-band doc queries (best-of-N in one warm session) so two runs under
DIFFERENT host conditions (idle vs loaded) can be compared. If the doc-query
ratios between the two runs track sentinel_arrow's ratio rather than
sentinel_jvm's, the Arrow band is the right normalizer for that family.

Usage:
  python scripts/sentinel_cal.py [--sf-dir /root/testdata/sf0.1] [--reps 2]

Output: one JSON line {"sentinel_jvm": s, "sentinel_arrow": s, "<query>": s,
...} (best-of-reps per target).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARROW_BAND_QUERIES = (
    "doc_minhash_lsh",
    "doc_minhash_capped",
    "doc_simhash_pairs",
    "doc_simhash128_pairs",
)


def main() -> int:
    argv = sys.argv
    sf_dir = (
        argv[argv.index("--sf-dir") + 1]
        if "--sf-dir" in argv
        else "/root/testdata/sf0.1"
    )
    reps = int(argv[argv.index("--reps") + 1]) if "--reps" in argv else 2

    from stock_etl_pipeline_spark.session import get_spark
    from stock_etl_pipeline_spark.workload import load_all

    spark = get_spark(app_name="sentinel-cal")
    reg = load_all()

    def run(df):
        df.write.mode("overwrite").format("noop").save()

    run(reg["source_report"].fn(spark, sf_dir))  # warm-up (bench.py policy)

    from pyspark.sql import functions as F

    def sentinel_jvm():
        return (
            spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("s_qty"),
                F.avg("l_extendedprice").alias("a_price"),
                F.count("*").alias("n"),
            )
        )

    def sentinel_arrow():
        import hashlib

        import pandas as pd
        from pyspark.sql.types import LongType, StructField, StructType

        out_schema = StructType(
            [StructField("n", LongType()), StructField("h", LongType())]
        )

        def fold(batches):
            import numpy as np

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
            spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
            .select("l_orderkey", "l_partkey")
            .mapInPandas(fold, out_schema)
            .groupBy()
            .agg(F.sum("n").alias("rows"), F.sum("h").alias("hsum"))
        )

    targets = [("sentinel_jvm", sentinel_jvm), ("sentinel_arrow", sentinel_arrow)] + [
        (q, (lambda q=q: reg[q].fn(spark, sf_dir))) for q in ARROW_BAND_QUERIES
    ]
    out: dict[str, float] = {}
    for _ in range(reps):
        for name, fn in targets:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            run(fn())
            e = round(time.perf_counter() - t0, 3)
            if name not in out or e < out[name]:
                out[name] = e
    print(json.dumps({"sf_dir": sf_dir, **out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
