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


def test_window_suite_interval_range_frame_equals_legacy_days_key(spark, monkeypatch):
    """The 7-calendar-day frame is an INTERVAL range over the date order key
    (r13 optimization: joins the date-ordered window group — 3 Window nodes
    instead of 4, one fewer per-partition sort). The legacy spelling ordered
    by a datediff-derived long; datediff is monotone and [days-6, days]
    admits exactly the dates in [date-6d, date], so the two arms must be
    row-identical. SPARK_GRAFT_W7_LEGACY=1 keeps the legacy arm."""
    import re as _re

    from stock_etl_pipeline_spark.workload import load_all

    sf = "/root/testdata/sf0.001"
    fn = load_all()["window_suite"].fn
    monkeypatch.delenv("SPARK_GRAFT_W7_LEGACY", raising=False)
    new_df = fn(spark, sf)
    # plan contract first (pre-execution — after collect the AQE explain
    # repeats the tree in final+initial sections): THREE window sort groups
    plan = new_df._sc._jvm.PythonSQLUtils.explainString(
        new_df._jdf.queryExecution(), "formatted"
    )
    assert len(_re.findall(r"\(\d+\)\s+Window\b", plan)) == 3
    new = sorted(map(repr, new_df.collect()))
    monkeypatch.setenv("SPARK_GRAFT_W7_LEGACY", "1")
    old = sorted(map(repr, fn(spark, sf).collect()))
    assert new == old and len(new) > 0
