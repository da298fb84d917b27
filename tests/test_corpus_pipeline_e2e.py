"""End-to-end training-corpus pipeline: the LLM-data story composed from
the shipped operators the way a user would chain them —

    quality gate → exact dedup → near-dup dedup (capped MinHash-LSH pairs
    → connected components → keep one per cluster) → benchmark
    decontamination → deterministic train/val/test split

Each stage's registered query is driver-checked individually; this test
pins the COMPOSITION: monotone corpus shrinkage, no surviving duplicate
pair, split completeness, and end-to-end determinism under repartition.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_etl_pipeline_spark.datasets import load_table
from stock_etl_pipeline_spark.operators import dedup, sampling
from stock_etl_pipeline_spark.workload import load_all

SF = "/root/testdata/sf0.001"
REGISTRY = load_all()
FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _run_pipeline(spark, docs):
    # 1. quality gate — cheap word-count floor (doc_text_stats carries the
    #    full quality score; the gate shape is what matters here)
    docs = (
        docs.withColumn("wc", F.size(F.split(F.lower("text"), r"\s+")))
        .filter(F.col("wc") >= 5)
        .drop("wc")
    )
    # 2. exact dedup: keep the min doc_id per text digest
    keep = docs.groupBy(F.md5("text").alias("dg")).agg(
        F.min("doc_id").alias("doc_id")
    )
    docs = docs.join(keep.select("doc_id"), "doc_id")
    # 3. near-dup dedup: capped MinHash-LSH pairs → exact components → keepers
    pairs = dedup.minhash_lsh_pairs(
        docs, num_hashes=20, bands=4, threshold=0.7,
        est_min_matches=10, shingle_df_cap=64,
    )
    comps = dedup.connected_components(pairs)
    drops = comps.filter(F.col("doc_id") != F.col("keeper_id")).select("doc_id")
    docs = docs.join(drops, "doc_id", "left_anti")
    # 4. decontamination: drop training docs flagged against the eval set
    contaminated = (
        REGISTRY["doc_decontaminate"].fn(docs.sparkSession, SF)
        .filter("contaminated")
        .select("doc_id")
    )
    docs = docs.join(contaminated, "doc_id", "left_anti")
    # 5. deterministic split
    return docs.withColumn("split", sampling.split_column("doc_id", FRACTIONS)), pairs


def test_corpus_pipeline_end_to_end(spark):
    base = load_table(spark, SF, "documents")
    n0 = base.count()
    out, pairs = _run_pipeline(spark, base)
    rows = out.select("doc_id", "split").collect()
    kept = {r["doc_id"] for r in rows}

    # shrinkage but non-trivial survival
    assert 0 < len(kept) <= n0

    # no exact-duplicate text survives
    n_digests = (
        out.select("doc_id")
        .join(base, "doc_id")
        .select(F.md5("text").alias("dg"))
        .distinct()
        .count()
    )
    assert n_digests == len(kept)

    # no verified near-dup pair has BOTH endpoints kept
    both = pairs.join(
        out.select(F.col("doc_id").alias("doc_a")), "doc_a"
    ).join(out.select(F.col("doc_id").alias("doc_b")), "doc_b")
    assert both.count() == 0

    # decontaminated: no kept doc is flagged
    flagged = {
        r["doc_id"]
        for r in REGISTRY["doc_decontaminate"].fn(spark, SF)
        .filter("contaminated")
        .collect()
    }
    assert not (kept & flagged)

    # splits partition the survivors and hit all three buckets
    by_split = {}
    for r in rows:
        by_split.setdefault(r["split"], set()).add(r["doc_id"])
    assert set(by_split) <= set(FRACTIONS)
    assert sum(len(v) for v in by_split.values()) == len(kept)
    assert len(by_split.get("train", ())) > len(by_split.get("val", set()) | by_split.get("test", set()))


def test_corpus_pipeline_deterministic_under_repartition(spark):
    base = load_table(spark, SF, "documents")
    a, _ = _run_pipeline(spark, base)
    b, _ = _run_pipeline(spark, base.repartition(13))
    sa = {(r["doc_id"], r["split"]) for r in a.select("doc_id", "split").collect()}
    sb = {(r["doc_id"], r["split"]) for r in b.select("doc_id", "split").collect()}
    assert sa == sb
