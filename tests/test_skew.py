"""Skew-salting equivalence tests: the salted plans must produce
row-identical results to their unsalted twins on hot-key data, and the
salted aggregation must actually fan the hot key out in phase 1."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_etl_pipeline_spark.operators.skew import salted_agg, salted_join
from stock_etl_pipeline_spark.plans import explain_formatted


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows on the hot key, a handful elsewhere — the classic hot-key shape.
    hot = spark.range(10_000).select(
        F.lit("HOT").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    cold = spark.range(50).select(
        F.concat(F.lit("c"), (F.col("id") % 5).cast("string")).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_agg_matches_plain(spark, skewed):
    plain = skewed.groupBy("k").agg(
        F.sum("v").alias("s"), F.count("v").alias("n"),
        F.min("v").alias("lo"), F.max("v").alias("hi"),
    )
    salted = salted_agg(
        skewed, ["k"],
        {"s": ("sum", "v"), "n": ("count", "v"), "lo": ("min", "v"), "hi": ("max", "v")},
        n_salts=8,
    )
    want = {r["k"]: (r["s"], r["n"], r["lo"], r["hi"]) for r in plain.collect()}
    got = {r["k"]: (r["s"], r["n"], r["lo"], r["hi"]) for r in salted.collect()}
    assert got == want


def test_salted_agg_two_phases(spark, skewed):
    salted = salted_agg(skewed, ["k"], {"n": ("count", "v")}, n_salts=8)
    p = explain_formatted(salted)
    # phase-1 grouping carries the salt column → hot key split across tasks
    assert "__salt" in p


def test_salted_agg_rejects_non_algebraic(spark, skewed):
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(skewed, ["k"], {"d": ("countDistinct", "v")})


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("HOT", "hot-dim"), ("c0", "cold-0"), ("c3", "cold-3"), ("absent", "x")],
        ["k", "label"],
    )
    plain = skewed.join(dim, "k").groupBy("k", "label").count()
    salted = salted_join(skewed, dim, ["k"], n_salts=8).groupBy("k", "label").count()
    want = {(r["k"], r["label"]): r["count"] for r in plain.collect()}
    got = {(r["k"], r["label"]): r["count"] for r in salted.collect()}
    assert got == want


def test_salted_left_join_keeps_unmatched(spark, skewed):
    dim = spark.createDataFrame([("HOT", "hot-dim")], ["k", "label"])
    out = salted_join(skewed, dim, ["k"], n_salts=4, how="left")
    assert out.count() == skewed.count()  # left rows never lost
    assert out.filter(F.col("label").isNull()).count() == 50  # cold keys unmatched


def test_salted_join_rejects_replicated_outer(spark, skewed):
    dim = spark.range(4).select(F.col("id").alias("k"), F.lit("x").alias("d"))
    with pytest.raises(ValueError, match="replicated"):
        salted_join(skewed, dim, on=["k"], how="right")
    with pytest.raises(ValueError, match="replicated"):
        salted_join(skewed, dim, on=["k"], how="full_outer")
