"""Analytics query set — DataFrame builders for the reference's five BigQuery
SQL templates (reference plugins/helpers/queries.py:22-163), with the dialect
substitutions from SURVEY.md §3.3.

Determinism policy (SURVEY.md §7): the reference's ``ANY_VALUE`` picks an
arbitrary row per group — here replaced by deterministic order-insensitive
aggregates (avg/min/max) so oracle hash comparison is exact. Wall-clock
``CURRENT_DATE()`` filters take an injectable ``as_of`` date.

Scale notes: every query below is a single partial+final hash aggregate (one
shuffle). HAVING is a post-agg filter. The trailing-N-day filters are plain
date predicates that Catalyst pushes to the parquet scan and, on a
date-partitioned warehouse layout (sinks.write_warehouse), prunes partitions.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import exact_avg, pround
from .window import daily_close, moving_averages


def _as_of_col(as_of: str | dt.date):
    return F.lit(str(as_of)).cast("date")


def trailing_days(df: DataFrame, as_of: str | dt.date, days: int, date_col: str = "date") -> DataFrame:
    """P16: WHERE date >= as_of − INTERVAL n DAY (pushdown-friendly)."""
    return df.filter(F.col(date_col) >= F.date_sub(_as_of_col(as_of), days))


def daily_metrics(prices: DataFrame) -> DataFrame:
    """A1 — daily-metrics view (reference plugins/helpers/queries.py:22-34).

    ANY_VALUE(close) → deterministic avg/min/max of close per (date,symbol).
    """
    volatility = (F.col("high") - F.col("low")) / F.col("open") * 100
    return prices.groupBy("date", "symbol").agg(
        pround(exact_avg(F.col("close"), 100.0), 6).alias("avg_close"),
        F.min("close").alias("min_close"),
        F.max("close").alias("max_close"),
        pround(exact_avg(volatility, 1_000_000.0), 6).alias("avg_volatility"),
        F.countDistinct("data_source").alias("source_count"),
        F.sum("volume").alias("total_volume"),
    )


def cross_source_comparison(
    prices: DataFrame, min_spread_ratio: float = 0.02
) -> DataFrame:
    """A2/J2/P18 — cross-source close spread (reference
    plugins/helpers/queries.py:37-73): groups with >1 source whose
    (max-min)/min close spread exceeds the threshold. The reference's nested
    Python loop (dags/utils/validators.py:233-244) is this one grouped
    aggregate + HAVING filter."""
    agg = prices.groupBy("symbol", "date").agg(
        F.min("close").alias("min_close"),
        F.max("close").alias("max_close"),
        pround(exact_avg(F.col("close"), 100.0), 6).alias("avg_close"),
        F.countDistinct("data_source").alias("source_count"),
    )
    spread = (F.col("max_close") - F.col("min_close")) / F.col("min_close")
    return agg.filter(
        (F.col("source_count") > 1) & (spread > min_spread_ratio)
    ).withColumn("price_diff_pct", pround(spread * 100, 6))


def source_details(prices: DataFrame) -> DataFrame:
    """A3 — ARRAY_AGG(STRUCT(...)) per group (reference
    plugins/helpers/queries.py:57) → sorted collect_set, rendered as a
    deterministic comma-joined string for portable comparison."""
    return prices.groupBy("symbol", "date").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("data_source"))).alias("sources"),
        F.count("*").alias("n_rows"),
    )


def rolling_moving_averages(
    prices: DataFrame,
    symbols: Sequence[str] | None = None,
    as_of: str | dt.date | None = None,
    trailing: int | None = None,
    widths: Sequence[int] = (5, 10, 20, 50),
) -> DataFrame:
    """W1 — the flagship query (reference plugins/helpers/queries.py:76-115):
    per-(date,symbol) dedup CTE → four trailing ROWS frames.

    ``symbols`` → P17 IN-list filter; ``trailing`` days → P16 filter. Both are
    applied BEFORE the window (narrow, pushdown-friendly), matching the
    reference's CTE which filters inside the dedup stage."""
    df = prices
    if symbols:
        df = df.filter(F.col("symbol").isin(list(symbols)))
    if as_of is not None and trailing is not None:
        df = trailing_days(df, as_of, trailing)
    return moving_averages(daily_close(df), widths=widths, min_periods=1)


def data_profile(prices: DataFrame, as_of: str | dt.date, days: int = 30) -> DataFrame:
    """A5 — global profile over trailing window (reference
    plugins/helpers/queries.py:118-147; GROUP BY ROLLUP(()) is the degenerate
    grand-total group → plain global agg). COUNTIF null-profiling (A4) rides
    along via count_if."""
    df = trailing_days(prices, as_of, days)
    return df.agg(
        F.count("*").alias("row_count"),
        F.countDistinct("date").alias("unique_dates"),
        F.countDistinct("symbol").alias("unique_symbols"),
        F.countDistinct("data_source").alias("unique_sources"),
        F.min("date").alias("earliest_date"),
        F.max("date").alias("latest_date"),
        F.min("close").alias("min_close"),
        F.max("close").alias("max_close"),
        pround(exact_avg(F.col("close"), 100.0), 6).alias("avg_close"),
        F.count_if(F.col("open").isNull()).alias("null_open_count"),
        F.count_if(F.col("volume").isNull()).alias("null_volume_count"),
    )


def source_distribution(prices: DataFrame) -> DataFrame:
    """A6 — source histogram (reference plugins/helpers/queries.py:142).
    BigQuery's ARRAY_AGG(STRUCT(k, COUNT(*))) is non-portable as written;
    engine semantics are the two-step groupBy→count (SURVEY.md §2.5 A6)."""
    return prices.groupBy("data_source").agg(F.count("*").alias("record_count"))


def ingestion_stats(
    events: DataFrame,
    ts_col: str = "ts",
    as_of_ts: str | None = None,
    days: int = 14,
) -> DataFrame:
    """A7 — ingestion stats by derived day (reference
    plugins/helpers/queries.py:150-163): GROUP BY DATE(processed_at) over a
    trailing window, with distinct counts and value bounds."""
    df = events
    if as_of_ts is not None:
        cutoff = F.date_sub(F.lit(as_of_ts).cast("timestamp").cast("date"), days)
        df = df.filter(F.col(ts_col).cast("date") >= cutoff)
    return df.groupBy(F.col(ts_col).cast("date").alias("ingestion_date")).agg(
        F.count("*").alias("record_count"),
        F.countDistinct("user_id").alias("unique_users"),
        F.countDistinct("event_type").alias("unique_event_types"),
        pround(exact_avg(F.col("value"), 100.0), 6).alias("avg_value"),
        F.min(ts_col).alias("first_event_ts"),
        F.max(ts_col).alias("last_event_ts"),
    )
