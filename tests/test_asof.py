"""Unit tests for the as-of join operator (operators/asof.py): backward
inclusive semantics, NULL before any quote, per-key isolation."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from stock_etl_pipeline_spark.operators.asof import asof_join


def _df(spark, rows, cols):
    schema = T.StructType(
        [
            T.StructField(cols[0], T.StringType()),
            T.StructField(cols[1], T.DateType()),
            T.StructField(cols[2], T.DoubleType()),
        ]
    )
    return spark.createDataFrame(
        [(s, dt.date.fromisoformat(d), v) for s, d, v in rows], schema
    )


def test_asof_backward_inclusive(spark):
    left = _df(
        spark,
        [("A", "2024-01-01", 1.0), ("A", "2024-01-03", 2.0), ("A", "2024-01-05", 3.0)],
        ["sym", "d", "px"],
    )
    right = _df(
        spark,
        [("A", "2024-01-03", 30.0), ("A", "2024-01-04", 40.0)],
        ["sym", "d", "quote"],
    )
    out = {
        r["d"].isoformat(): r["quote_asof"]
        for r in asof_join(
            left, right, on=["sym"], ts="d", value_cols=["quote"]
        ).collect()
    }
    assert out == {
        "2024-01-01": None,  # before any quote
        "2024-01-03": 30.0,  # same-timestamp quote included (inclusive)
        "2024-01-05": 40.0,  # most recent prior quote
    }


def test_asof_keys_isolated(spark):
    left = _df(spark, [("A", "2024-01-02", 1.0), ("B", "2024-01-02", 1.0)], ["sym", "d", "px"])
    right = _df(spark, [("A", "2024-01-01", 10.0)], ["sym", "d", "quote"])
    rows = asof_join(left, right, on=["sym"], ts="d", value_cols=["quote"]).collect()
    by_sym = {r["sym"]: r["quote_asof"] for r in rows}
    assert by_sym == {"A": 10.0, "B": None}  # B never sees A's quotes


def test_asof_preserves_left_payload_and_count(spark):
    left = _df(
        spark,
        [("A", "2024-01-0%d" % i, float(i)) for i in range(1, 8)],
        ["sym", "d", "px"],
    )
    right = _df(spark, [("A", "2024-01-04", 99.0)], ["sym", "d", "quote"])
    out = asof_join(left, right, on=["sym"], ts="d", value_cols=["quote"])
    rows = out.collect()
    assert len(rows) == 7  # one output row per left row, right rows dropped
    assert {r["px"] for r in rows} == {float(i) for i in range(1, 8)}


def test_asof_propagates_matched_null_value(spark):
    """A matched right row whose value column is genuinely NULL must yield
    NULL (the matched row's value), NOT an older non-NULL value — DuckDB
    ASOF JOIN / pandas merge_asof semantics."""
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [("A", 3), ("A", 6)], "k string, ts int"
    )
    right = spark.createDataFrame(
        [("A", 1, 10.0), ("A", 5, None)], "k string, ts int, v double"
    )
    out = asof_join(left, right, on=["k"], ts="ts", value_cols=["v"])
    got = {r["ts"]: r["v_asof"] for r in out.collect()}
    assert got[3] == 10.0           # matched ts=1
    assert got[6] is None           # matched ts=5 whose v IS NULL
