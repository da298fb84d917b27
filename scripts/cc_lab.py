#!/usr/bin/env python
"""connected_components fixed-cost lab (round 9).

CC is the largest K-flat term in semantic dedup at the 100x tier; its cost
is per-alternation FIXED cost (jobs, AQE finalization, barriers), not data.
This lab times checkpoint/convergence VARIANTS of the same alternation loop
in one warm session, interleaved, on a synthetic pair graph shaped like the
100x semantic-dedup graph (cliques = dup families + chains = transitive
overlaps), and reports wall + Spark job count per run.

Variants:
  r8        eager ckpt large + eager ckpt small + star-forest agg each round
  lazy_cnt  lazy ckpt both + count() materialization + count-plateau gate
  survivor  NO ckpt on large (ReuseExchange dedupes it inside small's one
            plan) + eager ckpt small + star-forest agg each round
  surv_cnt  like survivor + count-plateau gate (count over cached small)
  hybrid    the SHIPPED operator with the round-9 local finish (edge count
            under the gate -> bounded collect + driver union-find)
  shipped0  the SHIPPED operator, gate disabled (pure distributed) — the
            in-tree twin of lazy_cnt, sanity vs the handwritten replica

Usage: python scripts/cc_lab.py [--cliques 30000] [--chains 2000] [--reps 3]
Output: one JSON line per (rep, variant), then a min/median summary.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_pairs(spark, n_cliques: int, n_chains: int):
    from pyspark.sql import functions as F

    # cliques of 2-6 consecutive ids + chains of length 10, disjoint id space
    cl = (
        spark.range(n_cliques)
        .withColumn("base", F.col("id") * 8)
        .withColumn("sz", (F.col("id") % 5 + 2).cast("int"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(0, sz - 1), i -> "
                    "transform(sequence(i + 1, sz - 1), j -> "
                    "struct(base + i AS doc_a, base + j AS doc_b))))"
                )
            ).alias("e")
        )
        .select("e.doc_a", "e.doc_b")
    )
    off = n_cliques * 8
    ch = (
        spark.range(n_chains)
        .withColumn("base", F.lit(off) + F.col("id") * 12)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, 9), i -> "
                    "struct(base + i AS doc_a, base + i + 1 AS doc_b))"
                )
            ).alias("e")
        )
        .select("e.doc_a", "e.doc_b")
    )
    return cl.unionByName(ch)


def cc_variant(pairs, variant: str, max_rounds: int = 50):
    """The connected_components alternation loop with the variant's
    checkpoint/convergence policy. Mirrors operators/dedup.py (keep in
    sync when the operator changes). ``hybrid``/``shipped0`` call the
    shipped operator itself (gate on/off via SPARK_GRAFT_CC_LOCAL)."""
    from pyspark.sql import functions as F

    from stock_etl_pipeline_spark.operators.dedup import (
        _is_star_forest_df,
        connected_components,
    )

    if variant in ("hybrid", "shipped0"):
        saved = os.environ.get("SPARK_GRAFT_CC_LOCAL")
        if variant == "shipped0":
            os.environ["SPARK_GRAFT_CC_LOCAL"] = "0"
        else:
            os.environ.pop("SPARK_GRAFT_CC_LOCAL", None)
        try:
            return connected_components(pairs), -1
        finally:
            if saved is None:
                os.environ.pop("SPARK_GRAFT_CC_LOCAL", None)
            else:
                os.environ["SPARK_GRAFT_CC_LOCAL"] = saved

    id_a, id_b = "doc_a", "doc_b"
    nodes = (
        pairs.select(F.col(id_a).alias("id"))
        .unionByName(pairs.select(F.col(id_b).alias("id")))
        .distinct()
        .localCheckpoint()
    )
    edges = (
        pairs.select(
            F.least(F.col(id_a), F.col(id_b)).alias("lo"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )
    use_count = variant in ("lazy_cnt", "surv_cnt")
    lazy = variant == "lazy_cnt"
    ckpt_large = variant in ("r8", "lazy_cnt")

    if lazy:
        edges = edges.localCheckpoint(eager=False)
        n_edges = edges.count()
    else:
        edges = edges.localCheckpoint()
        n_edges = edges.count() if use_count else -1

    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        sym = edges.unionByName(
            edges.select(F.col("hi").alias("lo"), F.col("lo").alias("hi"))
        ).select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        m_u = sym.groupBy("u").agg(F.min("v").alias("min_nbr"))
        m_u = m_u.select("u", F.least("u", "min_nbr").alias("m"))
        large = (
            sym.filter(F.col("v") > F.col("u"))
            .join(m_u, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("m").alias("lo"), F.col("v").alias("hi"))
            .distinct()
        )
        if ckpt_large:
            large = large.localCheckpoint(eager=not lazy)

        down = large.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
        m_u = down.groupBy("u").agg(F.min("v").alias("m"))
        relink = (
            down.join(m_u, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("m").alias("lo"), F.col("v").alias("hi"))
        )
        self_link = m_u.select(F.col("m").alias("lo"), F.col("u").alias("hi"))
        small = relink.unionByName(self_link).distinct()
        small = small.localCheckpoint(eager=not lazy)

        edges = small
        if use_count:
            n_small = small.count()
            if n_small == n_edges and _is_star_forest_df(small):
                break
            n_edges = n_small
        else:
            if _is_star_forest_df(small):
                break
    else:
        raise ValueError("no fixpoint")

    stars = edges.select(F.col("hi").alias("id"), F.col("lo").alias("root"))
    out = nodes.join(stars, "id", "left").select(
        F.col("id").alias("doc_id"),
        F.coalesce(F.col("root"), F.col("id")).alias("keeper_id"),
    )
    return out, rounds


def main() -> int:
    argv = sys.argv
    n_cliques = (
        int(argv[argv.index("--cliques") + 1]) if "--cliques" in argv else 30000
    )
    n_chains = (
        int(argv[argv.index("--chains") + 1]) if "--chains" in argv else 2000
    )
    reps = int(argv[argv.index("--reps") + 1]) if "--reps" in argv else 3

    from stock_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="cc-lab")
    sc = spark.sparkContext
    pairs = build_pairs(spark, n_cliques, n_chains).localCheckpoint()
    n_pairs = pairs.count()
    print(json.dumps({"pairs": n_pairs}), flush=True)

    variants = ("r8", "lazy_cnt", "survivor", "surv_cnt", "hybrid", "shipped0")
    expected = None
    times: dict[str, list[float]] = {v: [] for v in variants}
    for rep in range(reps):
        for v in variants:
            spark.catalog.clearCache()
            j0 = len(sc.statusTracker().getJobIdsForGroup())
            t0 = time.perf_counter()
            out, rounds = cc_variant(pairs, v)
            chk = out.groupBy().agg(
                {"doc_id": "count", "keeper_id": "min"}
            ).collect()[0]
            wall = round(time.perf_counter() - t0, 2)
            jobs = len(sc.statusTracker().getJobIdsForGroup()) - j0
            sig = (chk[0], chk[1])
            if expected is None:
                expected = sig
            elif sig != expected:
                raise SystemExit(f"variant {v} output mismatch: {sig} vs {expected}")
            times[v].append(wall)
            print(
                json.dumps(
                    {"rep": rep, "variant": v, "sec": wall, "jobs": jobs,
                     "rounds": rounds}
                ),
                flush=True,
            )
    summary = {
        v: {"min": min(ts), "median": statistics.median(ts)}
        for v, ts in times.items()
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
