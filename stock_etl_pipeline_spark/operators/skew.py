"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join splitting handles sort-merge join skew automatically, but
two shapes still need explicit salting at 100 TB:

- **hot-key aggregation**: one grouping key holding a large fraction of all
  rows serializes its partial aggregation into one task. ``salted_agg``
  splits each key into ``n_salts`` sub-groups (phase 1, uniform fan-out)
  and recombines (phase 2, one row per key) — both phases are ordinary
  hash aggregates with map-side combine, and the final result is
  salt-invariant for the algebraic aggregates supported here.
- **hot-key equi-join**: ``salted_join`` sprays the skewed side's hot keys
  across ``n_salts`` sub-keys and replicates the other side once per salt,
  so no single task receives a whole hot key. Replication factor applies
  to the OTHER side only — keep that the smaller relation.

Salt values are derived from ``rand(seed)`` — per-row placement is not
reproducible across cluster layouts, but every supported aggregate and the
join result are salt-placement-invariant, which is the invariant the
equivalence tests pin.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"

# aggregate name → (phase-1 partial over rows, phase-2 combine over partials)
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    *,
    n_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column → (agg_name, input_column) with agg_name in
    {sum, count, min, max}. ``avg`` decomposes as sum+count at the call site
    (engine discipline: exact integer sums / single final division).
    """
    for name, (agg, _col) in aggs.items():
        if agg not in _ALGEBRAIC:
            raise ValueError(f"{name}: non-algebraic aggregate {agg!r} cannot be salted")
    salted = df.withColumn(_SALT, (F.rand(seed) * n_salts).cast("int"))
    phase1 = salted.groupBy(*keys, _SALT).agg(
        *[
            _ALGEBRAIC[agg][0](F.col(col)).alias(out)
            for out, (agg, col) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[agg][1](F.col(out)).alias(out)
            for out, (agg, _col) in aggs.items()
        ]
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    *,
    n_salts: int = 16,
    seed: int = 42,
    how: str = "inner",
) -> Column | DataFrame:
    """Equi-join with the skewed side salted and the other side replicated.

    Join key becomes (on…, salt): the skewed side draws a random salt, the
    other side carries every salt. For ``inner`` and ``left`` joins the
    result is row-identical to the unsalted join; only the partitioning of
    the work changes.

    Outer joins that preserve the REPLICATED side are unsupported: an
    unmatched ``other`` row exists under all ``n_salts`` salt values and
    none of them matches, so right/full outer would emit it n_salts times.
    (``left_semi``/``left_anti`` on the salted side are fine.)
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join(how={how!r}): outer joins preserving the replicated "
            f"side would duplicate unmatched rows n_salts times; use one of "
            f"{sorted(allowed)} or salt the other side instead"
        )
    on = list(on)
    s = skewed.withColumn(_SALT, (F.rand(seed) * n_salts).cast("int"))
    o = other.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return s.join(o, on + [_SALT], how).drop(_SALT)
