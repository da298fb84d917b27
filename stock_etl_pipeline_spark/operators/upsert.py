"""MERGE upsert — the one genuinely stateful operator (K7/J1).

Reference: staging table + BigQuery ``MERGE T USING S ON key-equality →
WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT``
(reference dags/utils/loaders.py:107-190, MERGE text at :160-169).

Pure-Spark rewrite on plain Parquet (no Delta jars in this image —
sinks.merge_write gates a Delta backend behind an import-try):

- ``merge_upsert``: source-wins combine. Implemented as
  ``target LEFT ANTI source  UNION ALL  source`` — the anti join removes
  target rows whose key matches the source, then the source (already the
  newest version) is appended. Equivalent to the full-outer+coalesce rewrite
  but cheaper: the anti join streams the big target against the (small,
  broadcast) daily source with NO shuffle of the target, and avoids building
  wide coalesce projections.
- a full-outer variant is kept for the case where the source carries partial
  columns (update only some fields).

Scale notes: the daily source is tiny relative to the warehouse →
``broadcast(source_keys)`` makes the anti join a broadcast-hash join, so the
100 TB target is scanned once with no exchange. Combined with
partition-scoped dynamic overwrite in sinks.merge_write, the blast radius is
only the partitions the source touches.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedupe_source_latest(
    source: DataFrame, keys: Sequence[str], version_col: str | None
) -> DataFrame:
    """Keep one row per key in the source (latest by version_col) so MERGE
    semantics are well-defined when the batch itself contains dup keys."""
    if version_col is None:
        return source.dropDuplicates(list(keys))
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc())
    return (
        source.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    version_col: str | None = None,
    broadcast_source: bool = True,
) -> DataFrame:
    """Source-wins upsert: rows for keys present in ``source`` are replaced,
    all other target rows pass through, new keys are inserted.

    Matches the reference MERGE's UPDATE-all-non-key-columns semantics
    (reference dags/utils/loaders.py:160-169) when source/target share a
    schema. Column order follows ``target``.
    """
    keys = list(keys)
    src = dedupe_source_latest(source, keys, version_col).select(*target.columns)
    src_keys = src.select(*keys).distinct()
    if broadcast_source:
        src_keys = F.broadcast(src_keys)
    untouched = target.join(src_keys, on=keys, how="left_anti")
    return untouched.unionByName(src)


def merge_upsert_full_outer(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Full-outer + coalesce rewrite (SURVEY.md §2.2 K7 alternative): per
    non-key column take the source value when the key matched, else target.
    Use when the source legitimately carries NULLs that must NOT overwrite
    (coalesce semantics) — otherwise prefer ``merge_upsert``."""
    keys = list(keys)
    t = target.alias("t")
    s = source.alias("s")
    joined = t.join(s, on=keys, how="full_outer")
    non_keys = [c for c in target.columns if c not in keys]
    projection = [F.coalesce(F.col(f"t.{k}"), F.col(f"s.{k}")).alias(k) for k in keys]
    projection += [
        F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c) for c in non_keys
    ]
    return joined.select(*projection)
