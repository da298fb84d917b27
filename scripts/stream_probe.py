#!/usr/bin/env python
"""Throughput probe for the streaming dedup operators (SCALING.md's
streaming section). Round 4 measured the simhash probe ad-hoc; this checks
it in so before/after comparisons rerun the same shape.

Shape (``--operator simhash``, default): take the documents table, assign
synthetic 1 s-spaced event times, split into ``--batches`` parquet files,
stream them back with ``maxFilesPerTrigger=1`` and a 1 h watermark, and
report wall time and docs/s over the whole availableNow run.
``--dup-factor N`` appends N-1 extra near-duplicate copies of every doc
(a " copy<k>" suffix), packing buckets so the per-doc bucket scan — the
vectorization target — dominates over per-micro-batch fixed cost.

``--operator semantic`` probes ``streaming_semantic_dedup`` instead: the
embeddings table, a frozen K=8 centroid model trained offline by the batch
``kmeans_exact``, same synthetic event times; ``--dup-factor`` appends
exact vector copies (distinct ids), packing cells the way the suffix
copies pack simhash buckets.

Usage:
  python scripts/stream_probe.py [--operator simhash|semantic]
      [--sf-dir /root/testdata/sf0.1]
      [--batches 4] [--dup-factor 1] [--watermark "1 hour"]
      [--conf spark.key=value ...] [--progress]

``--conf`` (repeatable) sets session confs BEFORE the stream starts —
the state-store experiment surface (provider class, shuffle/state
partition count, no-data micro-batches). ``--progress`` additionally
prints one JSON line decomposing the run from StreamingQuery progress
events: per-batch durationMs components (addBatch / getBatch /
queryPlanning / walCommit / commitOffsets / latestOffset) and the state
operator's commit times — the measured breakdown of the per-micro-batch
fixed cost (round-5 verdict: ~4.5 s/batch dominated both streaming
operators; round 6 targets the largest term with evidence).

Output: one JSON line {"metric": "stream_neardup_probe", ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--operator", choices=("simhash", "semantic"), default="simhash")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--dup-factor", type=int, default=1)
    ap.add_argument("--watermark", default="1 hour")
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("--progress", action="store_true")
    ap.add_argument(
        "--tuned",
        action="store_true",
        help="apply streaming.tuned_stream_confs (16 state partitions, "
        "no-data batches off) before any --conf overrides",
    )
    ap.add_argument(
        "--warm-start",
        action="store_true",
        help="run a tiny (2-doc) UNTIMED stream of the same operator to "
        "completion first — triggers the one-off codegen + Python worker "
        "spin-up the round-6 decomposition measured at ~47%% of sf0.1 "
        "probe wall, so the timed run approximates a long-lived stream's "
        "steady state",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from stock_etl_pipeline_spark import streaming
    from stock_etl_pipeline_spark.datasets import load_table
    from stock_etl_pipeline_spark.session import get_spark

    spark = get_spark()
    if args.tuned:
        streaming.tuned_stream_confs(spark)
    for kv in args.conf:
        k, _, v = kv.partition("=")
        spark.conf.set(k, v)
    work = tempfile.mkdtemp(prefix="stream_probe_")
    src = os.path.join(work, "stream_src")
    try:
        base = F.to_timestamp(F.lit("2024-01-01 12:00:00"))
        if args.operator == "simhash":
            id_col, payload_col, payload_type = "doc_id", "text", "string"
            rows = load_table(spark, args.sf_dir, "documents").select(
                "doc_id", "text"
            )
            if args.dup_factor > 1:
                copies = F.array(
                    *[
                        F.struct(
                            (F.col("doc_id") * args.dup_factor + k).alias("doc_id"),
                            (
                                F.col("text")
                                if k == 0
                                else F.concat(F.col("text"), F.lit(f" copy{k}"))
                            ).alias("text"),
                        )
                        for k in range(args.dup_factor)
                    ]
                )
                rows = rows.select(F.explode(copies).alias("c")).select("c.*")
        else:
            from stock_etl_pipeline_spark.operators import similarity

            id_col, payload_col, payload_type = (
                "vec_id", "embedding", "array<float>",
            )
            emb = load_table(spark, args.sf_dir, "embeddings").select(
                "vec_id", "embedding"
            )
            # Frozen model: trained offline on the BASE corpus (dup copies
            # are exact clones and would not move the centroids anyway).
            cents = similarity.kmeans_exact(
                similarity.with_micro_vectors(emb), k_clusters=8, iters=2
            )
            rows = emb
            if args.dup_factor > 1:
                copies = F.array(
                    *[
                        F.struct(
                            (F.col("vec_id") * args.dup_factor + k).alias("vec_id"),
                            F.col("embedding").alias("embedding"),
                        )
                        for k in range(args.dup_factor)
                    ]
                )
                rows = rows.select(F.explode(copies).alias("c")).select("c.*")
        # Deterministic 1 s-spaced event times in id order; batch id by
        # row order so event time is (mostly) aligned with batch order.
        staged = rows.select(
            id_col,
            (base + F.make_dt_interval(secs=F.col(id_col).cast("double"))).alias("ts"),
            payload_col,
            (F.col(id_col) % args.batches).alias("b"),
        )
        n_docs = staged.count()
        for b in range(args.batches):
            staged.filter(F.col("b") == b).drop("b").coalesce(1).write.mode(
                "append"
            ).parquet(src)

        stream = (
            spark.readStream.schema(
                f"{id_col} long, ts timestamp, {payload_col} {payload_type}"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        if args.operator == "simhash":
            flagged = streaming.streaming_simhash_near_dup(
                stream, watermark=args.watermark
            )
        else:
            flagged = streaming.streaming_semantic_dedup(
                stream, cents, threshold=0.4, watermark=args.watermark
            )
        if args.warm_start:
            # same operator, same plan shape, 2 docs — everything one-off
            # (codegen, Python worker pool, state-store init) pays here
            wsrc = os.path.join(work, "warm_src")
            staged.drop("b").limit(2).coalesce(1).write.parquet(wsrc)
            wstream = (
                spark.readStream.schema(
                    f"{id_col} long, ts timestamp, {payload_col} {payload_type}"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(wsrc)
            )
            if args.operator == "simhash":
                wflag = streaming.streaming_simhash_near_dup(
                    wstream, watermark=args.watermark
                )
            else:
                wflag = streaming.streaming_semantic_dedup(
                    wstream, cents, threshold=0.4, watermark=args.watermark
                )
            streaming.run_to_memory(
                wflag, "t_warm", os.path.join(work, "ckpt_warm"), timeout_s=600
            )
        ckpt = os.path.join(work, "ckpt")
        t0 = time.perf_counter()
        q = streaming.run_to_memory(flagged, "t_probe", ckpt, timeout_s=1800)
        wall = time.perf_counter() - t0
        if args.progress:
            dur_keys = (
                "addBatch", "getBatch", "latestOffset", "queryPlanning",
                "walCommit", "commitOffsets", "triggerExecution",
            )
            batches = []
            for p in q.recentProgress:
                d = p.get("durationMs") or {}
                row = {k: d.get(k) for k in dur_keys}
                row["numInputRows"] = p.get("numInputRows")
                ops = p.get("stateOperators") or []
                if ops:
                    row["stateCommitMs"] = ops[0].get("commitTimeMs")
                    row["stateRowsTotal"] = ops[0].get("numRowsTotal")
                batches.append(row)
            totals = {
                k: sum(b[k] or 0 for b in batches) for k in dur_keys
            }
            totals["stateCommitMs"] = sum(b.get("stateCommitMs") or 0 for b in batches)
            print(
                json.dumps(
                    {
                        "metric": "stream_progress_breakdown",
                        "unit": "ms",
                        "n_batches": len(batches),
                        "totals": totals,
                        "batches": batches,
                    }
                )
            )
        out = spark.table("t_probe")
        n_out = out.count()
        n_flagged = out.filter(F.col("matched_id").isNotNull()).select(
            id_col
        ).distinct().count()
        print(
            json.dumps(
                {
                    "metric": (
                        "stream_neardup_probe"  # historical name, kept stable
                        if args.operator == "simhash"
                        else "stream_semdedup_probe"
                    ),
                    "unit": "sec",
                    "value": round(wall, 3),
                    "docs": n_docs,
                    "docs_per_s": round(n_docs / wall, 1),
                    "out_rows": n_out,
                    "flagged_docs": n_flagged,
                    "batches": args.batches,
                    "dup_factor": args.dup_factor,
                    "warm_start": args.warm_start,
                    "sf_dir": args.sf_dir,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
