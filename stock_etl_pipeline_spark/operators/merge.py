"""Merge stage: n-ary union → deterministic keyed dedup → sort.

Spark twin of the reference's merge_stock_datasets
(reference dags/utils/transformers.py:79-125): pd.concat (O3) →
drop_duplicates on (date,symbol,data_source) (O4) → multi-key sort (O1).

Scale notes:
- ``unionByName`` is metadata-only (no shuffle).
- dedup is ONE hash shuffle on the key; with ``tiebreak_cols`` it is an
  aggregate argmin (min over an ordered struct — partial-combined
  map-side; plans as SortAggregate since struct buffers are not
  hash-aggregable, see merge_sources) so the kept row is deterministic —
  pandas
  keep-first depends on concat order, which is meaningless on a
  distributed engine (SURVEY.md §7 risk list).
- the final sort is optional: a global orderBy is a range-partition shuffle
  that only matters at the sink; keep ``sort=False`` mid-pipeline.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MERGE_KEYS = ["date", "symbol", "data_source"]


def union_all(dfs: Sequence[DataFrame], allow_missing_columns: bool = False) -> DataFrame:
    """O3: n-ary union by name (sources may disagree on column order —
    reference concatenates frames from per-source CSVs, transformers.py:106)."""
    if not dfs:
        raise ValueError("union_all requires at least one DataFrame")
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing_columns), dfs
    )


def dedup_keep_first(
    df: DataFrame,
    keys: Sequence[str] = MERGE_KEYS,
    tiebreak_cols: Sequence[str] | None = None,
) -> DataFrame:
    """O4: dedup by key subset.

    With ``tiebreak_cols`` the kept row is the first under that ordering
    (deterministic, pandas-keep-first analogue with an explicit tiebreak);
    without, ``dropDuplicates`` keeps an arbitrary row per key (cheaper:
    partial-aggregate combine instead of a full window sort).

    The tiebreak path is an AGGREGATE argmin — ``min(struct(tiebreaks…,
    payload…))`` — not a window row_number. Physically it plans as a
    SortAggregate (struct-typed buffers are not hash-aggregable; the r13
    plan audit corrected this doc's earlier hash-aggregate claim), but it
    keeps the property that matters at scale: map-side PARTIAL
    aggregation, so duplicates die before the exchange, where a window
    row_number ships every row. The r13 A/B measured all three physical
    forms (struct-min SortAggregate, window row_number, min_by) at parity
    at bench scale — the struct-min stays because its shuffle shrinks
    with the duplicate rate. Ordering by the full struct makes even
    full-tiebreak ties deterministic (lexicographic over the remaining
    payload), strictly stronger than row_number's arbitrary pick.
    """
    if not tiebreak_cols:
        return df.dropDuplicates(list(keys))
    keys = list(keys)
    payload = [c for c in df.columns if c not in keys]
    ordered = list(tiebreak_cols) + [
        c for c in payload if c not in set(tiebreak_cols)
    ]
    agg = df.groupBy(*keys).agg(F.min(F.struct(*ordered)).alias("__m"))
    return agg.select(
        *keys, *[F.col(f"__m.{c}").alias(c) for c in ordered]
    ).select(*df.columns)


def merge_datasets(
    dfs: Sequence[DataFrame],
    keys: Sequence[str] = MERGE_KEYS,
    tiebreak_cols: Sequence[str] | None = None,
    sort: bool = False,
    sort_cols: Sequence[str] = ("date", "symbol", "data_source"),
) -> DataFrame:
    """Full merge stage (reference dags/utils/transformers.py:79-125)."""
    out = dedup_keep_first(union_all(dfs), keys, tiebreak_cols)
    if sort:
        out = out.orderBy(*sort_cols)
    return out
