#!/usr/bin/env python
"""Larger-SF soak (ROADMAP item 7): synthesize a ~10x dataset from sf0.1
and measure how every bench-flagged query scales.

Usage:  python scripts/soak.py [--scale 10] [--dir /root/repo/.soak/sf1]

The driver testdata stops at sf0.1; this script builds a scaled tier by
unioning key-offset replicas (deterministic, engine-only ops — no new
generator to trust):

- lineitem: l_orderkey offset per replica (symbol distribution and date
  span preserved → window/agg queries scale linearly in rows).
- documents: doc_id offset + a per-replica suffix token appended to text,
  so replicas are NOT near-duplicates of each other (an exact-copy replica
  would give every LSH bucket r copies of each doc and inflate candidate
  pairs by r(r-1)/2 — a different experiment than data growth).
- events: event_id/user_id offsets, ts shifted +i minutes per replica.
- embeddings: vec_id offset, embedding cyclically rotated by i positions
  (norm-preserving; changes LSH buckets and k-means cells so the scaled
  corpus isn't 10 aligned clones).
- orders/customer/part/supplier/nation/region: copied as-is (dims).

Output: one JSON line per tier with per-query seconds, then a scaling
table (t_scaled / t_base). Queries expected ~linear: LSH dedup paths,
aggregates, windows. Known super-linear: embedding_near_dup (block GEMM is
O(n^2) by definition — its scale path is the LSH/IVF bucketing which IS
linear; the soak shows exactly that contrast).

Results land in SCALING.md; the soak dir is gitignored scratch.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = "/root/testdata/sf0.1"
COPY_TABLES = ("region", "nation", "customer", "supplier", "part", "orders")


def build(spark, out_dir: str, scale: int) -> None:
    from pyspark.sql import functions as F

    from stock_etl_pipeline_spark.datasets import load_table

    os.makedirs(out_dir, exist_ok=True)

    def replicate(name, mutate):
        base = load_table(spark, BASE_SF, name)
        reps = [mutate(base, i) for i in range(scale)]
        df = reps[0]
        for r in reps[1:]:
            df = df.unionByName(r)
        # keep input layout realistic: multiple row groups / files
        df.repartition(max(scale, 8)).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )

    n_docs = load_table(spark, BASE_SF, "documents").count()
    replicate(
        "documents",
        lambda d, i: d.select(
            (F.col("doc_id") + F.lit(i * n_docs)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" rep{i}")).alias("text")
            if i
            else F.col("text"),
            "lang",
            "source",
            "n_chars",
        ),
    )

    n_li = 6_000_000  # orderkey space upper bound per replica
    replicate(
        "lineitem",
        lambda d, i: d.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(i * n_li)
        ),
    )

    n_ev = load_table(spark, BASE_SF, "events").count()
    replicate(
        "events",
        lambda d, i: d.select(
            (F.col("event_id") + F.lit(i * n_ev)).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {i} MINUTE")).alias("ts"),
            (F.col("user_id") + F.lit(i * 100_000)).alias("user_id"),
            "event_type",
            "value",
            "props",
        ),
    )

    n_vec = load_table(spark, BASE_SF, "embeddings").count()
    replicate(
        "embeddings",
        lambda d, i: d.select(
            (F.col("vec_id") + F.lit(i * n_vec)).alias("vec_id"),
            F.expr(
                f"concat(slice(embedding, {i % 64 + 1}, 64 - {i % 64}),"
                f" slice(embedding, 1, {i % 64}))"
            ).alias("embedding")
            if i
            else F.col("embedding"),
            "label",
        ),
    )

    for name in COPY_TABLES:
        load_table(spark, BASE_SF, name).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )


def run_tier(spark, sf_dir: str, specs) -> dict[str, float]:
    timings = {}
    for name, s in specs.items():
        t0 = time.perf_counter()
        s.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 2)
    return timings


def main() -> int:
    scale = int(sys.argv[sys.argv.index("--scale") + 1]) if "--scale" in sys.argv else 10
    out_dir = (
        sys.argv[sys.argv.index("--dir") + 1]
        if "--dir" in sys.argv
        else "/root/repo/.soak/sf1"
    )

    from stock_etl_pipeline_spark.session import get_spark
    from stock_etl_pipeline_spark.workload import load_all

    spark = get_spark(app_name="soak")
    specs = {n: s for n, s in sorted(load_all().items()) if s.bench}

    if not os.path.exists(f"{out_dir}/lineitem.parquet"):
        t0 = time.perf_counter()
        build(spark, out_dir, scale)
        print(f"built {out_dir} (scale {scale}x) in {time.perf_counter() - t0:.0f}s")

    base = run_tier(spark, BASE_SF, specs)
    print(json.dumps({"tier": "base_sf0.1", "queries": base}))
    scaled = run_tier(spark, out_dir, specs)
    print(json.dumps({"tier": f"scaled_{scale}x", "queries": scaled}))

    print(f"\n{'query':28s} {'sf0.1':>8s} {'10x':>8s} {'ratio':>7s}")
    for name in specs:
        r = scaled[name] / base[name] if base[name] else float("inf")
        print(f"{name:28s} {base[name]:8.2f} {scaled[name]:8.2f} {r:7.1f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
