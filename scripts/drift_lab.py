#!/usr/bin/env python
"""MinHash stop-list drift lab (VERDICT r10 item 5).

The MinHash index freezes its df-cap ban set at build time
(``<path>_banned``): shingles that cross the cap only AFTER later
increments stay unbanned, so the frozen-list semantics drift from what a
fresh build would compute. This lab quantifies that drift and calibrates
the rewrite trigger for ``minhash_index_rewrite``:

1. Build the index on the tier corpus (df-cap 64, tier LSH geometry).
2. Feed N increments (``--batches``), two scenarios:
     organic   slices of a disjoint same-distribution corpus (the honest
               daily-batch shape: dfs grow ~uniformly, drift is slow)
     template  each batch additionally carries ``--template-docs`` docs
               sharing one boilerplate paragraph (the adversarial shape
               that actually bites: a new footer/banner crosses the cap
               within a few batches and its shingles keep minhashing)
3. Per batch, record the FREE drift statistic: mean banded-join
   candidates per increment doc against the stored index — the first
   stage of the join the increment already materializes, one extra
   count. Unbanned hot shingles inflate exactly this number.
4. At ``--checkpoints``, measure ground truth: pair flags over the
   current corpus under the FROZEN list vs a FRESH df-cap run —
   recall = |frozen ∩ fresh| / |fresh| (missed-by-frozen pairs are
   fresh-only), extras = frozen-only flags (pairs only hot-shingle
   collisions produced), and the ban-set sizes.

Trigger calibration (documented in SCALING.md + minhash_index_rewrite):
rewrite when candidates/doc exceeds ~2x the index's build-time baseline
— the measured organic drift stays well under that line while the
template scenario crosses it within a handful of batches.

Usage:
  python scripts/drift_lab.py [--tier .soak/sf10] [--incr-src .soak/sf1]
      [--batches 100] [--checkpoints 10,50,100] [--scenario organic]
      [--template-docs 50] [--json DRIFT.json]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OFFSET = 10**12


def main() -> int:
    argv = sys.argv

    def opt(name, default):
        return argv[argv.index(name) + 1] if name in argv else default

    tier = opt("--tier", "/root/repo/.soak/sf10")
    incr_src = opt("--incr-src", "/root/repo/.soak/sf1")
    n_batches = int(opt("--batches", "100"))
    checkpoints = sorted(
        int(x) for x in opt("--checkpoints", "10,50,100").split(",")
    )
    scenario = opt("--scenario", "organic")
    template_docs = int(opt("--template-docs", "50"))
    json_out = opt("--json", None)

    from pyspark.sql import functions as F

    from stock_etl_pipeline_spark.datasets import load_table
    from stock_etl_pipeline_spark.operators.dedup import (
        _bk_bands,
        lsh_tier_geometry,
        minhash_index_increment,
        minhash_index_write,
        minhash_lsh_pairs,
    )
    from stock_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="drift_lab")
    corpus = load_table(spark, tier, "documents").select("doc_id", "text")
    pool = (
        load_table(spark, incr_src, "documents")
        .select((F.col("doc_id") + OFFSET).alias("doc_id"), "text")
    )
    n_corpus = corpus.count()
    k, b, est = lsh_tier_geometry(n_corpus)
    geom = dict(num_hashes=k, bands=b, est_min_matches=est, threshold=0.7)
    cap = 64
    print(json.dumps({"corpus_docs": n_corpus, "geometry": geom,
                      "scenario": scenario, "batches": n_batches}), flush=True)

    idx = os.path.join(os.path.dirname(tier.rstrip("/")), "drift_index")
    t0 = time.perf_counter()
    minhash_index_write(
        corpus, idx, n_files=32, n_docs=n_corpus, shingle_df_cap=cap, **geom
    )
    print(json.dumps({"arm": "index_once",
                      "sec": round(time.perf_counter() - t0, 2)}), flush=True)
    frozen = spark.read.parquet(idx + "_banned")
    n_frozen = frozen.count()

    # deterministic batch split of the pool; the template scenario appends
    # per-batch boilerplate docs (same paragraph + a unique tail token so
    # they are near-dups of each other, not exact copies)
    boiler = " ".join(
        f"w{i % 37} standard footer unsubscribe notice section {i % 11}"
        for i in range(120)
    )
    batches = []
    for i in range(n_batches):
        bdf = pool.filter(F.col("doc_id") % n_batches == i)
        if scenario == "template":
            tmpl = spark.range(template_docs).select(
                (F.lit(2 * OFFSET + i * template_docs) + F.col("id")).alias(
                    "doc_id"
                ),
                F.concat(
                    F.lit(boiler + " unique tail "),
                    F.col("id").cast("string"),
                    F.lit(f" batch {i}"),
                ).alias("text"),
            )
            bdf = bdf.unionByName(tmpl)
        batches.append(bdf)

    def cand_per_doc(bdf, n_in_batch: int) -> float:
        """Mean banded candidates per batch doc against the stored index —
        the statistic the increment's own join materializes."""
        stored = spark.read.parquet(idx)
        mine = stored.join(bdf.select("doc_id"), "doc_id")
        cand = (
            _bk_bands(mine, geom["bands"], "id_a")
            .join(_bk_bands(stored, geom["bands"], "id_b"),
                  ["band_id", "band_key"])
            .filter(F.col("id_a") != F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
            .count()
        )
        return cand / max(1, n_in_batch)

    def pair_set(df, n, frozen_list):
        p = minhash_lsh_pairs(
            df,
            n_docs=n,
            banned_b60=frozen_list,
            shingle_df_cap=None if frozen_list is not None else cap,
            **geom,
        )
        return {(r["doc_a"], r["doc_b"]) for r in p.select("doc_a", "doc_b").collect()}

    rows = []
    grown = corpus
    n_grown = n_corpus
    baseline_cpd = None
    for i, bdf in enumerate(batches, start=1):
        n_in = bdf.count()
        t0 = time.perf_counter()
        minhash_index_increment(spark, idx, bdf, append=True, n_docs=n_in)
        dt = time.perf_counter() - t0
        grown = grown.unionByName(bdf)
        n_grown += n_in
        cpd = cand_per_doc(bdf, n_in)
        if baseline_cpd is None:
            baseline_cpd = max(cpd, 1e-9)
        row = {"batch": i, "docs": n_in, "incr_sec": round(dt, 2),
               "cand_per_doc": round(cpd, 3),
               "cpd_ratio": round(cpd / baseline_cpd, 3)}
        if i in checkpoints:
            spark.catalog.clearCache()
            pf = pair_set(grown, n_grown, frozen)
            spark.catalog.clearCache()
            fr = pair_set(grown, n_grown, None)
            inter = pf & fr
            # fresh hot-list size at the current corpus
            from stock_etl_pipeline_spark.operators.dedup import (
                word_shingles_b60,
            )
            n_fresh_ban = (
                word_shingles_b60(grown, "doc_id", "text", 3)
                .groupBy("b60").agg(F.count("*").alias("df"))
                .filter(F.col("df") > cap).count()
            )
            row.update({
                "checkpoint": True,
                "pairs_frozen": len(pf),
                "pairs_fresh": len(fr),
                "recall_vs_fresh": round(len(inter) / max(1, len(fr)), 4),
                "extra_frozen_only": len(pf - fr),
                "missed_fresh_only": len(fr - pf),
                "ban_frozen": n_frozen,
                "ban_fresh": n_fresh_ban,
                "ban_new_hot": n_fresh_ban - n_frozen,
            })
        rows.append(row)
        print(json.dumps(row), flush=True)

    summary = {
        "metric": "stoplist_drift",
        "tier": tier,
        "scenario": scenario,
        "batches": n_batches,
        "cap": cap,
        "baseline_cand_per_doc": round(baseline_cpd, 3),
        "final_cpd_ratio": rows[-1]["cpd_ratio"],
        "checkpoints": [r for r in rows if r.get("checkpoint")],
    }
    print(json.dumps(summary), flush=True)
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"rows": rows, "summary": summary}, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
