"""Window-function operators: trailing moving averages and the cheap
extensions (lag/lead/rank) the reference lacked.

Reference semantics (SURVEY.md §2.6):

- W1 — SQL form (reference plugins/helpers/queries.py:76-115): trailing
  ``AVG(close_price) OVER (PARTITION BY symbol ORDER BY date ROWS BETWEEN
  n-1 PRECEDING AND CURRENT ROW)`` with *partial* leading windows, fed by a
  per-(date,symbol) dedup CTE.
- W2 — pandas form (reference dags/utils/transformers.py:128-151): per-symbol
  ``rolling(window=n).mean()`` whose default ``min_periods=n`` yields NULL for
  the first n−1 rows of each symbol.

Both semantics are exposed via ``min_periods``. The reference's per-symbol
Python loop disappears into ``Window.partitionBy`` — one shuffle on the
partition key, then a single sort per partition serves every frame width
(Catalyst reuses the sort across the four ``avg`` projections, so this is one
exchange + one sort regardless of how many widths are requested — the property
that matters at 100 TB).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import exact_avg, pround


def moving_averages(
    df: DataFrame,
    widths: Sequence[int] = (5, 10, 20, 50),
    partition_col: str = "symbol",
    order_col: str = "date",
    value_col: str = "close_price",
    min_periods: int | None = 1,
    round_digits: int | None = 8,
    micros_col: str | None = None,
) -> DataFrame:
    """Append ``ma_{w}d`` trailing-average columns for each width.

    ``min_periods=1`` → SQL-faithful partial windows (W1);
    ``min_periods=None`` → pandas-faithful ``min_periods=width`` (W2), i.e.
    NULL until a full window exists.

    ``micros_col``: name of an exact integer (micro-unit) twin of
    ``value_col``. When given, the window average is computed as
    ``sum(micros)/ (1e6 · count)`` — an integer window sum (exact,
    summation-order-independent) followed by one division, so the result is
    bitwise identical on any engine/partitioning with NO rounding step.
    Without it, a float window average is rounded via pround (adequate only
    when inputs aren't on a decimal grid).
    """
    out = df
    for w in widths:
        frame = (
            Window.partitionBy(partition_col)
            .orderBy(order_col)
            .rowsBetween(-(w - 1), Window.currentRow)
        )
        if micros_col is not None:
            avg: Column = F.sum(micros_col).over(frame) / (
                F.lit(1_000_000.0) * F.count(micros_col).over(frame)
            )
        else:
            avg = F.avg(value_col).over(frame)
            if round_digits is not None:
                avg = pround(avg, round_digits)
        required = w if min_periods is None else min_periods
        if required > 1:
            avg = F.when(F.count(value_col).over(frame) >= required, avg)
        out = out.withColumn(f"ma_{w}d", avg)
    return out


def daily_close(
    prices: DataFrame,
    date_col: str = "date",
    symbol_col: str = "symbol",
    close_col: str = "close",
) -> DataFrame:
    """The dedup CTE feeding W1 (reference plugins/helpers/queries.py:77-86).

    The reference uses ``ANY_VALUE(close_price)`` — nondeterministic in both
    BigQuery and Spark (SURVEY.md §7 risk list); the engine's canonical form
    averages the per-(date,symbol) closes instead, which is deterministic and
    order-insensitive (integer-cents sum → single division), so oracle
    comparison is exact.

    Emits both ``close_price`` (double, 6-decimal grid) and
    ``close_price_u`` (exact micro-units long) — the latter feeds
    ``moving_averages(micros_col=...)`` for order-independent window sums.
    """
    micros = F.floor(
        exact_avg(F.col(close_col), 100.0) * F.lit(1_000_000.0) + F.lit(0.5)
    ).cast("long")
    return prices.groupBy(date_col, symbol_col).agg(
        micros.alias("close_price_u")
    ).withColumn("close_price", F.col("close_price_u") / F.lit(1_000_000.0))


def with_lag_lead(
    df: DataFrame,
    value_col: str = "close_price",
    partition_col: str = "symbol",
    order_col: str = "date",
) -> DataFrame:
    """Extension: 1-step lag/lead + daily return pct (SURVEY.md §7 step 9)."""
    w = Window.partitionBy(partition_col).orderBy(order_col)
    prev = F.lag(value_col, 1).over(w)
    return (
        df.withColumn("prev_value", prev)
        .withColumn("next_value", F.lead(value_col, 1).over(w))
        .withColumn(
            "return_pct",
            pround((F.col(value_col) - prev) / prev * 100, 6),
        )
    )


def rank_in_group(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    ascending: bool = False,
) -> DataFrame:
    """Extension: dense ranking within a group (row_number/rank/dense_rank)."""
    order = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    w = Window.partitionBy(partition_col).orderBy(order, F.col(partition_col))
    return (
        df.withColumn("row_num", F.row_number().over(w))
        .withColumn("rnk", F.rank().over(w))
        .withColumn("dense_rnk", F.dense_rank().over(w))
    )


def top_k_per_group(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    k: int,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Top-K rows per group via row_number — the scalable top-k idiom (no
    global sort; one hash shuffle on the group key)."""
    order = [F.col(order_col).desc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(partition_col).orderBy(*order)
    return (
        df.withColumn("row_num", F.row_number().over(w))
        .filter(F.col("row_num") <= k)
        .drop("row_num")
    )
