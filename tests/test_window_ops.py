"""Window operator library (operators/window.py): the helpers the fused
window_suite query subsumed inline still carry their own contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_etl_pipeline_spark.operators.window import (
    rank_in_group,
    top_k_per_group,
    with_lag_lead,
)


def _series(spark):
    rows = [
        ("A", 1, 10.0),
        ("A", 2, 20.0),
        ("A", 3, 15.0),
        ("B", 1, 5.0),
        ("B", 2, 4.0),
    ]
    return spark.createDataFrame(rows, "symbol string, date int, close_price double")


def test_with_lag_lead_boundaries_and_return(spark):
    out = with_lag_lead(_series(spark), "close_price", order_col="date")
    got = {(r["symbol"], r["date"]): r for r in out.collect()}
    assert got[("A", 1)]["prev_value"] is None
    assert got[("A", 1)]["next_value"] == 20.0
    assert got[("A", 2)]["prev_value"] == 10.0
    assert got[("A", 2)]["return_pct"] == 100.0
    assert got[("A", 3)]["next_value"] is None
    # partitions are isolated: B's first row sees no A values
    assert got[("B", 1)]["prev_value"] is None


def test_rank_in_group_descending_default(spark):
    out = rank_in_group(_series(spark), "symbol", "close_price")
    got = {(r["symbol"], r["date"]): r["rnk"] for r in out.collect()}
    assert got[("A", 2)] == 1  # 20.0 ranks first descending
    assert got[("A", 3)] == 2
    assert got[("A", 1)] == 3
    assert got[("B", 1)] == 1


def test_top_k_per_group_with_tiebreak(spark):
    rows = [("A", 1, 9.0), ("A", 2, 9.0), ("A", 3, 1.0), ("B", 1, 2.0)]
    df = spark.createDataFrame(rows, "symbol string, date int, close_price double")
    out = top_k_per_group(
        df, "symbol", "close_price", k=2, tiebreak_cols=("date",)
    )
    got = {(r["symbol"], r["date"]) for r in out.collect()}
    # ties on close broken by ascending date: both 9.0 rows kept, 1.0 dropped
    assert got == {("A", 1), ("A", 2), ("B", 1)}
