"""SQL-API surface (entry path C — SURVEY.md §3.3): the reference's five
BigQuery templates (reference plugins/helpers/queries.py:22-163) ported to
the engine's portable SQL subset and executed via ``spark.sql`` over
registered views.

Each query's SQL text is ONE string valid in both Spark SQL and DuckDB:
the Spark side registers the ``lineitem`` view and runs the exact same text
the oracle runs (prices CTE included). Parity is therefore by shared source
— the test is that the two engines' evaluation of the common dialect
agrees, which is precisely the portability contract the engine's
determinism discipline (floor-rounding, integer-exact sums, FILTER clauses,
no ANY_VALUE) is designed to guarantee.

Dialect substitutions from the BigQuery originals, per SURVEY.md §3.3:
``ANY_VALUE`` → deterministic exact-avg close; ``COUNTIF`` →
``count(*) FILTER (WHERE …)``; ``DATE_SUB(CURRENT_DATE(), INTERVAL n DAY)``
→ ``DATE '<AS_OF>' - INTERVAL n DAY`` (frozen clock); ``IN UNNEST(arr)`` →
literal IN list; ``ARRAY_AGG(STRUCT(...))`` → the documented two-step
rendering (workload/stock.py source_details).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..datasets import AS_OF_DATE, load_table, oracle_with_prices
from ..functions import sql_exact_avg, sql_pround
from . import spec

_CLOSE_AVG = sql_pround(sql_exact_avg("close", 100.0), 6)


def _run_sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(text)


def _sql_spec(name: str, body: str, tags: tuple[str, ...]):
    """Register a query whose Spark implementation and DuckDB oracle are the
    SAME SQL text."""
    text = oracle_with_prices(body)

    @spec(name, oracle=text, tags=tags)
    def runner(spark: SparkSession, sf_dir: str, _text=text) -> DataFrame:
        return _run_sql(spark, sf_dir, _text)

    return runner


# 1. Daily-metrics view (reference queries.py:22-34; ANY_VALUE → exact avg).
_sql_spec(
    "sql_daily_metrics",
    f"""
SELECT date, symbol,
  {_CLOSE_AVG} AS avg_close,
  {sql_pround(sql_exact_avg("(high - low) / open * 100", 1000000.0), 6)} AS avg_volatility,
  count(DISTINCT data_source) AS source_count
FROM prices
GROUP BY date, symbol
""".strip(),
    tags=("sql_api", "A1", "K9"),
)

# 2. Cross-source comparison (reference queries.py:37-73; HAVING + theta
# filter on the computed spread, 2% threshold).
_sql_spec(
    "sql_cross_source",
    f"""
SELECT symbol, date, min_close, max_close, source_count,
  {sql_pround("(max_close - min_close) / min_close * 100", 6)} AS price_diff_pct
FROM (
  SELECT symbol, date,
    min(close) AS min_close,
    max(close) AS max_close,
    count(DISTINCT data_source) AS source_count
  FROM prices
  WHERE date >= DATE '{AS_OF_DATE}' - INTERVAL 90 DAY
  GROUP BY symbol, date
  HAVING count(DISTINCT data_source) > 1
) g
WHERE (max_close - min_close) / min_close > 0.02
""".strip(),
    tags=("sql_api", "A2", "J2"),
)

# 3. Moving averages over a symbol subset (reference queries.py:76-115;
# IN UNNEST(@symbols) → literal IN list, trailing 90 days, 5/20-day frames).
_MA_FRAME_5 = "(PARTITION BY symbol ORDER BY date ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)"
_MA_FRAME_20 = "(PARTITION BY symbol ORDER BY date ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)"
_CLOSE_U = f"CAST(floor({sql_exact_avg('close', 100.0)} * 1000000.0 + 0.5) AS BIGINT)"
_sql_spec(
    "sql_moving_averages",
    f"""
, daily AS (
  SELECT date, symbol, {_CLOSE_U} AS close_u
  FROM prices
  WHERE symbol IN ('SYM00', 'SYM03', 'SYM07', 'SYM11')
    AND date >= DATE '{AS_OF_DATE}' - INTERVAL 90 DAY
  GROUP BY date, symbol
)
SELECT symbol, date, close_u / CAST(1000000.0 AS DOUBLE) AS close_price,
  CAST(sum(close_u) OVER {_MA_FRAME_5} AS BIGINT)
    / (CAST(1000000.0 AS DOUBLE) * count(close_u) OVER {_MA_FRAME_5}) AS ma_5d,
  CAST(sum(close_u) OVER {_MA_FRAME_20} AS BIGINT)
    / (CAST(1000000.0 AS DOUBLE) * count(close_u) OVER {_MA_FRAME_20}) AS ma_20d
FROM daily
""".strip(),
    tags=("sql_api", "W1", "P17"),
)

# 4. Data profile (reference queries.py:118-147; COUNTIF → FILTER clause,
# ROLLUP(()) → plain global aggregate, trailing 30 days).
_sql_spec(
    "sql_data_profile",
    f"""
SELECT count(*) AS total_rows,
  count(DISTINCT date) AS unique_dates,
  count(DISTINCT symbol) AS unique_symbols,
  count(DISTINCT data_source) AS unique_sources,
  min(date) AS earliest_date,
  max(date) AS latest_date,
  min(close) AS min_close,
  max(close) AS max_close,
  {_CLOSE_AVG} AS avg_close,
  CAST(count(*) FILTER (WHERE open IS NULL) AS BIGINT) AS null_open_count,
  CAST(count(*) FILTER (WHERE volume IS NULL) AS BIGINT) AS null_volume_count
FROM prices
WHERE date >= DATE '{AS_OF_DATE}' - INTERVAL 30 DAY
""".strip(),
    tags=("sql_api", "A5", "A4"),
)

# 5. Ingestion stats by day (reference queries.py:150-163; the reference
# groups DATE(processed_at) — the frozen-clock stand-in groups the data date
# over the trailing 14 days).
_sql_spec(
    "sql_ingestion_stats",
    f"""
SELECT date AS ingestion_date,
  count(*) AS records_loaded,
  count(DISTINCT symbol) AS symbols_count,
  count(DISTINCT data_source) AS sources_count,
  min(close) AS min_close,
  max(close) AS max_close
FROM prices
WHERE date >= DATE '{AS_OF_DATE}' - INTERVAL 14 DAY
GROUP BY date
""".strip(),
    tags=("sql_api", "A7"),
)
