#!/usr/bin/env python
"""Benchmark the headline workload queries.

Runs every bench-flagged query from the workload registry at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

  {"metric": "workload_total", "value": <total sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <float>}

Each query is forced end-to-end with the no-op sink (full computation, no
write cost). One untimed warm-up query absorbs JVM/codegen startup.

``--breakdown`` instead prints a stage-level JSON line for the composite
operators (workload/microbench.py): per-stage deltas showing where the
LSH/SimHash/GEMM/IVF pipelines spend their time. ``--reps N`` takes the
best of N runs per prefix (default 2 — absorbs run-to-run noise).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from stock_etl_pipeline_spark.session import get_spark
    from stock_etl_pipeline_spark.workload import load_all

    spark = get_spark(app_name="bench")
    registry = load_all()
    bench_specs = {n: s for n, s in sorted(registry.items()) if s.bench}

    def run(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    # Warm-up (JVM, codegen, parquet footer caches) — untimed. Must be a
    # NON-headline query so no timed query gets a warmed advantage the others
    # don't; source_distribution scans the same lineitem-backed prices view
    # the stock family reads.
    run(registry["source_distribution"].fn(spark, sf_dir))

    if "--breakdown" in sys.argv:
        from stock_etl_pipeline_spark.workload.microbench import run_breakdown

        reps = (
            int(sys.argv[sys.argv.index("--reps") + 1])
            if "--reps" in sys.argv
            else 2
        )
        stages = run_breakdown(spark, sf_dir, reps=reps)
        print(
            json.dumps(
                {"metric": "stage_breakdown", "unit": "sec", "stages": stages, "sf": sf}
            )
        )
        return 0

    timings: dict[str, float] = {}
    for name, s in bench_specs.items():
        t0 = time.perf_counter()
        run(s.fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "workload_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
