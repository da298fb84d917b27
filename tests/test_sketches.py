"""Sketch operators: accuracy vs exact, mergeability/partitioning
invariance, and the small-range linear-counting path
(operators/sketches.py). Cross-engine equality is covered by
test_oracle_parity on distinct_count_sketches."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_etl_pipeline_spark.datasets import load_table
from stock_etl_pipeline_spark.operators import sketches

SF = "/root/testdata/sf0.01"


def test_hll_accuracy_global(spark):
    e = load_table(spark, SF, "events")
    exact = e.select("user_id").distinct().count()
    est = sketches.hll_estimate(e, "user_id").collect()[0]["hll_distinct"]
    # m = 256 → σ ≈ 6.5%; 3σ bound
    assert abs(est - exact) / exact < 0.2, (est, exact)


def test_kmv_accuracy_global(spark):
    e = load_table(spark, SF, "events")
    exact = e.select("user_id").distinct().count()
    est = sketches.kmv_estimate(e, "user_id").collect()[0]["kmv_distinct"]
    # k = 64 → σ ≈ 12.5%; 3σ bound
    assert abs(est - exact) / exact < 0.4, (est, exact)


def test_sketches_partitioning_invariant(spark):
    """The decimal register sum and the k-min order statistic must not see
    partition count or row order (the reason HLL's Σ2^-r runs in
    DECIMAL(38,0), not doubles)."""
    e = load_table(spark, SF, "events")
    for npart in (1, 7):
        shuffled = e.repartition(npart)
        h = sketches.hll_estimate(shuffled, "user_id", ["event_type"]).collect()
        k = sketches.kmv_estimate(shuffled, "user_id", ["event_type"]).collect()
        if npart == 1:
            h0 = {r["event_type"]: r["hll_distinct"] for r in h}
            k0 = {r["event_type"]: r["kmv_distinct"] for r in k}
        else:
            assert {r["event_type"]: r["hll_distinct"] for r in h} == h0
            assert {r["event_type"]: r["kmv_distinct"] for r in k} == k0


def test_kmv_small_group_is_exact(spark):
    """Groups with < k distinct values are counted exactly (the sketch holds
    the whole distinct set)."""
    e = load_table(spark, SF, "events").filter(F.col("user_id") < 20)
    got = sketches.kmv_estimate(e, "user_id").collect()[0]["kmv_distinct"]
    exact = e.select("user_id").distinct().count()
    assert exact < sketches.KMV_K
    assert got == float(exact)


def test_hll_small_range_linear_counting(spark):
    """Tiny cardinalities take the linear-counting branch and land near
    exact."""
    e = load_table(spark, SF, "events").filter(F.col("user_id") < 10)
    exact = e.select("user_id").distinct().count()
    est = sketches.hll_estimate(e, "user_id").collect()[0]["hll_distinct"]
    assert abs(est - exact) <= 1.0, (est, exact)


def test_histogram_quantiles_constant_column(spark):
    """hi == lo (constant column) must return the constant for every q, not
    NULL/empty — the width clamp keeps the bucket arithmetic finite."""
    from stock_etl_pipeline_spark.operators import sketches as ops

    df = spark.range(100).selectExpr("CAST(42 AS BIGINT) AS v")
    out = ops.histogram_quantiles(df, "v", [0.5, 0.9, 0.99])
    rows = {r["q"]: r["approx_value"] for r in out.collect()}
    assert rows == {0.5: 42.0, 0.9: 42.0, 0.99: 42.0}


def test_histogram_quantiles_constant_column_sql_twin(spark, tmp_path):
    import duckdb

    from stock_etl_pipeline_spark.operators import sketches as ops

    p = str(tmp_path / "cvals.parquet")
    spark.range(100).selectExpr("CAST(42 AS BIGINT) AS v").write.parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW cvals AS SELECT * FROM read_parquet('{p}/*.parquet')")
    rows = con.execute(ops.sql_histogram_quantiles("cvals", "v", [0.5, 0.9])).fetchall()
    assert sorted(rows) == [(0.5, 42.0), (0.9, 42.0)]
