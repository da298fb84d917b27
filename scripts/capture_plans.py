#!/usr/bin/env python
"""Capture .explain("formatted") for every bench query into plans/<tag>/.

Usage: python scripts/capture_plans.py <suffix> [query ...]

Writes plans/r13/<query>_<suffix>.txt for each bench-flagged query (or the
named subset). Runs under SPARK_GRAFT_PLAN_ONLY=1 like bench.py's
fingerprint pass so eager cache fills are skipped while bounded model
training still executes (that IS plan construction for those operators).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from stock_etl_pipeline_spark.session import get_spark
    from stock_etl_pipeline_spark.workload import load_all

    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    bench_specs = {
        n: s
        for n, s in sorted(registry.items())
        if s.bench and (not only or n in only)
    }
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_TAG", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)

    os.environ["SPARK_GRAFT_PLAN_ONLY"] = "1"
    try:
        for name, s in bench_specs.items():
            spark.catalog.clearCache()
            try:
                df = s.fn(spark, sf_dir)
                text = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception as exc:  # capture the failure, keep going
                text = f"PLAN CAPTURE FAILED: {exc!r}\n"
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(text)
            print(f"wrote {path} ({len(text)} chars)")
    finally:
        del os.environ["SPARK_GRAFT_PLAN_ONLY"]
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
