"""Sketch queries: HLL and KMV distinct-count estimates vs exact, on the
events table (operators/sketches.py).

Each query returns the per-group EXACT distinct count alongside the sketch
estimate and its relative error, so accuracy is visible in the result (and
the oracle twin replays sketch + exact + error identically). At 100 TB the
exact column is what you'd drop: the sketches shuffle ≤ 256 register rows /
≤ 64 hash rows per group instead of every distinct user id, and both merge
associatively (register max / k-smallest union), so partial aggregation
does the heavy lifting map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datasets import load_table
from ..functions import pround
from ..operators import sketches
from . import spec

_REL_ERR = "floor(abs({est} - n_exact) / n_exact * 1000000.0 + 0.5) / 1000000.0"


# HLL and KMV fused into one registered query (same group grain — one green
# driver row covers both sketch operators; each estimate is still computed by
# its own operator pipeline and joined on the group key).
_SKETCHES_ORACLE = f"""
WITH hest AS (
  {sketches.sql_hll_estimate("events", "user_id", ["event_type"])}
),
kest AS (
  {sketches.sql_kmv_estimate("events", "user_id", ["event_type"])}
),
ex AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY event_type
)
SELECT ex.event_type, ex.n_exact,
  h.hll_distinct, {_REL_ERR.format(est="h.hll_distinct")} AS hll_rel_err,
  k.kmv_distinct, {_REL_ERR.format(est="k.kmv_distinct")} AS kmv_rel_err
FROM ex
JOIN hest h ON h.event_type = ex.event_type
JOIN kest k ON k.event_type = ex.event_type
""".strip()


@spec(
    "distinct_count_sketches",
    oracle=_SKETCHES_ORACLE,
    tags=("sketch", "hll", "kmv", "approx"),
    bench=True,
)
def q_distinct_count_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type HyperLogLog (m = 256 registers, ≈6.5% expected error)
    AND KMV (k = 64 minimum hash values) distinct-user estimates next to the
    exact count. The register/min-hash constructions are md5-replayable, so
    even the iterative-looking sketches carry a full value-hash oracle —
    approximation without unverifiability. KMV is additionally
    transcendental-free (exact integer + single-rounding double arithmetic);
    HLL's harmonic mean is computed on an exact DECIMAL(38) register sum so
    both are order-independent."""
    e = load_table(spark, sf_dir, "events")
    hll = sketches.hll_estimate(e, "user_id", ["event_type"])
    kmv = sketches.kmv_estimate(e, "user_id", ["event_type"])
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )

    def rel_err(est_col: str):
        return (
            F.floor(
                F.abs(F.col(est_col) - F.col("n_exact")) / F.col("n_exact") * 1e6
                + F.lit(0.5)
            )
            / 1e6
        )

    return (
        exact.join(hll, "event_type")
        .join(kmv, "event_type")
        .select(
            "event_type",
            "n_exact",
            "hll_distinct",
            rel_err("hll_distinct").alias("hll_rel_err"),
            "kmv_distinct",
            rel_err("kmv_distinct").alias("kmv_rel_err"),
        )
    )


# --- histogram quantile sketch ----------------------------------------------
# Exact twin uses the symbol_stats cents-grid discipline so both
# engines interpolate over bit-identical integer-valued doubles.
_QS = [0.5, 0.9, 0.99]
_HQ_ORACLE = f"""
WITH cents AS (
  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c
  FROM lineitem
),
approx AS (
  {sketches.sql_histogram_quantiles("cents", "price_c", _QS)}
),
ex AS (
  SELECT unnest([{", ".join(f"CAST({q!r} AS DOUBLE)" for q in _QS)}]) AS q,
         unnest([{", ".join(f"e{i}" for i in range(len(_QS)))}]) AS exact_c
  FROM (
    SELECT {", ".join(f"quantile_cont(CAST(price_c AS DOUBLE), {q!r}) AS e{i}" for i, q in enumerate(_QS))}
    FROM cents
  )
)
SELECT a.q, a.approx_value / 100.0 AS approx_price, ex.exact_c / 100.0 AS exact_price,
  floor(abs(a.approx_value - ex.exact_c) / ex.exact_c * 1000000.0 + 0.5) / 1000000.0 AS rel_err
FROM approx a JOIN ex ON a.q = ex.q
""".strip()


@spec("price_quantile_sketch", oracle=_HQ_ORACLE, tags=("sketch", "quantile", "approx"))
def q_price_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p90/p99 of lineitem extended price from a 1024-bucket
    fixed-grid histogram, next to the exact percentile. The histogram
    shuffles ≤ 1024 longs total (map-side combined) where exact percentile
    shuffles every value — the promised scale path beside symbol_stats."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = li.select(
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("price_c")
    )
    approx = sketches.histogram_quantiles(cents, "price_c", _QS)
    # ONE percentile aggregate over an ARRAY of percentages (round 14):
    # three scalar percentile() aggs each built their own 600k-value
    # sort buffer — 4.70 s vs 1.56 s for the single array form at sf0.1
    # (3x), and the returned doubles are bit-identical (same sorted
    # counts map, same per-q interpolation arithmetic; equality probed
    # on the live corpus before the switch).
    wide = cents.select(F.col("price_c").cast("double").alias("pc")).agg(
        F.percentile("pc", F.array(*[F.lit(float(q)) for q in _QS])).alias("es")
    )
    exact = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(float(q)).alias("q"),
                        F.col("es")[i].alias("exact_c"),
                    )
                    for i, q in enumerate(_QS)
                ]
            )
        ).alias("x")
    ).select("x.q", "x.exact_c")
    err = (
        F.floor(
            F.abs(F.col("approx_value") - F.col("exact_c"))
            / F.col("exact_c")
            * 1e6
            + F.lit(0.5)
        )
        / 1e6
    )
    return approx.join(exact, "q").select(
        "q",
        (F.col("approx_value") / 100.0).alias("approx_price"),
        (F.col("exact_c") / 100.0).alias("exact_price"),
        err.alias("rel_err"),
    )
