"""As-of (point-in-time) join — the canonical stock-data alignment operator.

The reference approximates cross-source alignment with MERGE upsert + grouped
comparison (SURVEY.md §2.4 J1/J2); a true as-of join is listed as the §7
step-9 extension. Spark has no built-in as-of join, so this implements the
scalable union+window formulation:

1. UNION the left (probe) and right (quote) relations with a side tag,
   right rows carrying the value columns and left rows carrying NULLs.
2. One window sort per key: ``partitionBy(keys).orderBy(ts, side)`` with
   right rows ordered BEFORE left rows at equal timestamps (inclusive
   backward semantics, matching DuckDB/pandas ``ASOF JOIN`` / ``merge_asof``).
3. ``last(value, ignorenulls=True)`` over an unbounded-preceding frame
   propagates the most recent right-side value onto every left row.

Cost model: exactly ONE shuffle+sort of (left ∪ right) on the key — no range
explode, no per-row lookup join, no broadcast requirement on either side.
This is the formulation that survives 100 TB: a range/interval join rewrite
would fan out candidates quadratically per key, while the window sort is
O(n log n) per partition with AQE-managed partition sizing. Skewed keys
(one symbol dominating) are the risk; mitigate upstream by salting the key
and merging salted results, or pre-aggregating right to one row per (key, ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward inclusive as-of join.

    For each left row, appends ``<value_col><suffix>`` columns holding the
    right-side values at the greatest right ``ts`` ≤ the left row's ``ts``
    within the same ``on`` key group (NULL if no prior right row).

    ``right`` should be unique per (on, ts) — pre-aggregate if not, or the
    propagated value is the last within the duplicate timestamp group in
    side-sorted order (deterministic only if made unique).

    NULL semantics: the MATCHED right row's values are propagated even when
    some of them are NULL (DuckDB ASOF JOIN / pandas merge_asof behavior).
    All value columns ride in ONE struct — non-null for every right row, so
    ``last(ignorenulls=True)`` skips left-row placeholders but never skips a
    matched right row whose individual value happens to be NULL.
    """
    from pyspark.sql import types as T

    struct_t = T.StructType(
        [T.StructField(v, right.schema[v].dataType, True) for v in value_cols]
    )
    lhs = left.withColumn("_side", F.lit(1)).withColumn(
        "_vals", F.lit(None).cast(struct_t)
    )
    rhs = right.select(
        *on,
        ts,
        F.lit(0).alias("_side"),
        F.struct(*[F.col(v).alias(v) for v in value_cols]).alias("_vals"),
    )
    # Align column sets: left keeps its payload columns; right rows carry NULL
    # payloads and are dropped after propagation.
    payload = [c for c in left.columns if c not in (*on, ts)]
    rhs_full = rhs
    for c in payload:
        rhs_full = rhs_full.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = lhs.select(*on, ts, "_side", *payload, "_vals").unionByName(
        rhs_full.select(*on, ts, "_side", *payload, "_vals")
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *on,
        ts,
        "_side",
        *payload,
        F.last("_vals", ignorenulls=True).over(w).alias("_vals_asof"),
    )
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            *on,
            ts,
            *payload,
            *[
                F.col(f"_vals_asof.{v}").alias(f"{v}{suffix}")
                for v in value_cols
            ],
        )
    )
