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
from . import spec, spec_tests_only

def _run_sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(text)


def _sql_spec(
    name: str, body: str, tags: tuple[str, ...], tests_only: bool = False
):
    """Register a query whose Spark implementation and DuckDB oracle are the
    SAME SQL text."""
    text = oracle_with_prices(body)
    deco = spec_tests_only(name, oracle=text, tags=tags) if tests_only else spec(
        name, oracle=text, tags=tags
    )

    @deco
    def runner(spark: SparkSession, sf_dir: str, _text=text) -> DataFrame:
        return _run_sql(spark, sf_dir, _text)

    return runner


# The reference has five SQL templates (queries.py:22-163). All five now
# hold the tests-only tier (full shared-text oracle parity via
# test_oracle_parity.py) — each template's semantics also has a
# driver-checked DataFrame twin (cross_source_spread, moving_averages +
# window_suite, daily_metrics, profile_suite, ingestion_stats), so the
# sql_* texts re-prove semantics the registry already covers. Their two
# freed driver slots went to the LLM-corpus layer: doc_corpus_construction
# (round 11) and doc_lm_quality (round 12) — previously builder-verified
# only. View-DDL + spark.sql entry (K9) keeps driver coverage through the
# prices-view registration every oracle_with_prices query performs.

# 1. Cross-source comparison (reference queries.py:37-73; HAVING + theta
# filter on the computed spread, 2% threshold). Demoted round 12: its
# HAVING/theta semantics are driver-checked by cross_source_spread.
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
    tests_only=True,
)

# 2. Moving averages over a symbol subset (reference queries.py:76-115;
# IN UNNEST(@symbols) → literal IN list, trailing 90 days, 5/20-day frames).
# Windowed + IN-list SQL over the view surface — keeps O1/O2/K9/P17
# exercised through spark.sql next to the HAVING/theta template above.
# (W1's window math additionally has two DataFrame-side driver-checked
# representations: moving_averages and window_suite.)
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
    tests_only=True,
)

