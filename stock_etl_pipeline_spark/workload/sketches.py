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


def _with_exact_and_err(est_df: DataFrame, events: DataFrame, est_col: str) -> DataFrame:
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    err = (
        F.floor(
            F.abs(F.col(est_col) - F.col("n_exact")) / F.col("n_exact") * 1e6
            + F.lit(0.5)
        )
        / 1e6
    )
    return (
        est_df.join(exact, "event_type")
        .select("event_type", "n_exact", est_col, err.alias("rel_err"))
    )


_HLL_ORACLE = f"""
WITH est AS (
  {sketches.sql_hll_estimate("events", "user_id", ["event_type"])}
),
ex AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY event_type
)
SELECT e.event_type, ex.n_exact, e.hll_distinct,
  {_REL_ERR.format(est="e.hll_distinct")} AS rel_err
FROM est e JOIN ex ON e.event_type = ex.event_type
""".strip()


@spec("hll_distinct_users", oracle=_HLL_ORACLE, tags=("sketch", "hll", "approx"), bench=True)
def q_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type HyperLogLog distinct-user estimate (m = 256 registers,
    ≈6.5% expected error) next to the exact count. The register construction
    is md5-replayable, so even the iterative-looking sketch carries a full
    value-hash oracle — approximation without unverifiability."""
    e = load_table(spark, sf_dir, "events")
    est = sketches.hll_estimate(e, "user_id", ["event_type"])
    return _with_exact_and_err(est, e, "hll_distinct")


_KMV_ORACLE = f"""
WITH est AS (
  {sketches.sql_kmv_estimate("events", "user_id", ["event_type"])}
),
ex AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY event_type
)
SELECT e.event_type, ex.n_exact, e.kmv_distinct,
  {_REL_ERR.format(est="e.kmv_distinct")} AS rel_err
FROM est e JOIN ex ON e.event_type = ex.event_type
""".strip()


@spec("kmv_distinct_users", oracle=_KMV_ORACLE, tags=("sketch", "kmv", "approx"))
def q_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type KMV (k = 64 minimum hash values) distinct-user
    estimate next to the exact count. Fully transcendental-free: every step
    is exact integer or single-rounding double arithmetic, so cross-engine
    equality holds without any rounding grid."""
    e = load_table(spark, sf_dir, "events")
    est = sketches.kmv_estimate(e, "user_id", ["event_type"])
    return _with_exact_and_err(est, e, "kmv_distinct")
