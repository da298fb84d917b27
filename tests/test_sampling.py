"""Deterministic sampling/splits (operators/sampling.py) and histogram
quantiles (operators/sketches.py): stability under repartitioning and
accuracy vs exact. Cross-engine equality is covered by oracle parity on
doc_train_split / price_quantile_sketch."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_etl_pipeline_spark.datasets import load_table
from stock_etl_pipeline_spark.operators import sampling, sketches
from stock_etl_pipeline_spark.workload import load_all

SF = "/root/testdata/sf0.01"


def test_sample_is_repartition_stable(spark):
    """The property df.sample cannot give: identical membership regardless
    of physical layout."""
    d = load_table(spark, SF, "documents")
    ids = lambda df: {r[0] for r in df.select("doc_id").collect()}
    s1 = ids(sampling.deterministic_sample(d.repartition(1), "doc_id", 0.3))
    s13 = ids(sampling.deterministic_sample(d.repartition(13), "doc_id", 0.3))
    assert s1 == s13
    n = d.count()
    assert 0.2 < len(s1) / n < 0.4  # ~binomial(n, 0.3)


def test_sample_fraction_monotone(spark):
    """A 10% sample is a subset of the 30% sample (nested by construction —
    same u, larger cut). Lets a pipeline grow a sample without resampling."""
    d = load_table(spark, SF, "documents")
    ids = lambda f: {
        r[0]
        for r in sampling.deterministic_sample(d, "doc_id", f).select("doc_id").collect()
    }
    assert ids(0.1) <= ids(0.3)


def test_split_partitions_corpus(spark):
    d = load_table(spark, SF, "documents")
    labeled = d.select(
        sampling.split_column("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).alias(
            "split"
        )
    )
    counts = {r["split"]: r["n"] for r in labeled.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = d.count()
    assert sum(counts.values()) == n  # total partition, no row lost
    assert 0.75 < counts["train"] / n < 0.85
    assert 0.05 < counts["val"] / n < 0.15
    assert 0.05 < counts["test"] / n < 0.15


def test_histogram_quantiles_accuracy(spark):
    out = {
        r["q"]: r
        for r in load_all()["price_quantile_sketch"].fn(spark, SF).collect()
    }
    assert set(out) == {0.5, 0.9, 0.99}
    for r in out.values():
        # value error ≤ one bucket width; on this distribution that is well
        # under 1% relative
        assert r["rel_err"] < 0.01, dict(r.asDict())
        assert r["approx_price"] >= r["exact_price"] - 1e-9  # right-edge estimate
