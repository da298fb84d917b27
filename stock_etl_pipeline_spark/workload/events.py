"""Event-stream analytics (batch form) over the ``events`` table.

These are the batch twins of the streaming extension (SURVEY.md §2.10/§7):
tumbling-window aggregation, sessionization, and ingestion stats. The
streaming module reuses the same groupings with ``F.window``/watermarks.

``value`` sums use the integer-cents discipline (functions/__init__.py) so
aggregation order cannot perturb the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..datasets import load_table
from ..functions import exact_avg, exact_sum, pround, sql_exact_avg, sql_exact_sum, sql_pround
from ..operators import analytics
from . import spec

# Ingestion stats by derived day (A7) FUSED with the per-event-type agg AND
# the JSON-props extraction agg (§2.9 semi-structured) as a
# block-discriminated union over ONE events scan — the registry-slot pattern
# of source_report / doc_lang_report. Column semantics per block:
# by_day rows carry n_event_types / avg_value / first-last ts; by_type rows
# carry total_value / min_value / max_value; by_k rows (key = the typed
# JSON-extracted props.k) carry only n_events; the other blocks' columns
# are typed NULLs.
_INGESTION_ORACLE = f"""
SELECT 'by_day' AS block,
  CAST(CAST(ts AS DATE) AS STRING) AS key,
  count(*) AS n_events,
  count(DISTINCT user_id) AS n_users,
  count(DISTINCT event_type) AS n_event_types,
  {sql_pround(sql_exact_avg("value", 100.0), 6)} AS avg_value,
  CAST(NULL AS DOUBLE) AS total_value,
  CAST(NULL AS DOUBLE) AS min_value,
  CAST(NULL AS DOUBLE) AS max_value,
  min(ts) AS first_event_ts,
  max(ts) AS last_event_ts
FROM events
GROUP BY CAST(ts AS DATE)
UNION ALL
SELECT 'by_type' AS block,
  event_type AS key,
  count(*) AS n_events,
  count(DISTINCT user_id) AS n_users,
  CAST(NULL AS BIGINT) AS n_event_types,
  CAST(NULL AS DOUBLE) AS avg_value,
  {sql_exact_sum("value", 100.0)} AS total_value,
  min(value) AS min_value,
  max(value) AS max_value,
  CAST(NULL AS TIMESTAMP) AS first_event_ts,
  CAST(NULL AS TIMESTAMP) AS last_event_ts
FROM events
GROUP BY event_type
UNION ALL
SELECT 'by_k' AS block,
  CAST(CAST(json_extract(props, '$.k') AS INTEGER) AS STRING) AS key,
  count(*) AS n_events,
  CAST(NULL AS BIGINT) AS n_users,
  CAST(NULL AS BIGINT) AS n_event_types,
  CAST(NULL AS DOUBLE) AS avg_value,
  CAST(NULL AS DOUBLE) AS total_value,
  CAST(NULL AS DOUBLE) AS min_value,
  CAST(NULL AS DOUBLE) AS max_value,
  CAST(NULL AS TIMESTAMP) AS first_event_ts,
  CAST(NULL AS TIMESTAMP) AS last_event_ts
FROM events
GROUP BY CAST(json_extract(props, '$.k') AS INTEGER)
""".strip()


@spec("ingestion_stats", oracle=_INGESTION_ORACLE, tags=("A7", "agg"), bench=True)
def q_ingestion_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — GROUP BY derived day (reference plugins/helpers/queries.py:150-163)
    fused with the per-event-type profile (count / distinct users / exact sum
    / min / max) AND the semi-structured JSON-props extraction agg
    (get_json_object → typed value → group count, §2.9) as a
    block-discriminated union: one events scan feeds all three aggregates
    (Spark reuses the scan across union branches; each branch keeps its own
    exchange on its own grouping key)."""
    e = load_table(spark, sf_dir, "events")
    by_day = analytics.ingestion_stats(e).select(
        F.lit("by_day").alias("block"),
        F.col("ingestion_date").cast("string").alias("key"),
        F.col("record_count").alias("n_events"),
        F.col("unique_users").alias("n_users"),
        F.col("unique_event_types").alias("n_event_types"),
        "avg_value",
        F.lit(None).cast("double").alias("total_value"),
        F.lit(None).cast("double").alias("min_value"),
        F.lit(None).cast("double").alias("max_value"),
        "first_event_ts",
        "last_event_ts",
    )
    by_type = e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        exact_sum(F.col("value"), 100.0).alias("total_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    ).select(
        F.lit("by_type").alias("block"),
        F.col("event_type").alias("key"),
        "n_events",
        "n_users",
        F.lit(None).cast("long").alias("n_event_types"),
        F.lit(None).cast("double").alias("avg_value"),
        "total_value",
        "min_value",
        "max_value",
        F.lit(None).cast("timestamp").alias("first_event_ts"),
        F.lit(None).cast("timestamp").alias("last_event_ts"),
    )
    by_k = e.groupBy(
        F.get_json_object("props", "$.k").cast("int").alias("k_value")
    ).agg(F.count("*").alias("n_events")).select(
        F.lit("by_k").alias("block"),
        F.col("k_value").cast("string").alias("key"),
        "n_events",
        F.lit(None).cast("long").alias("n_users"),
        F.lit(None).cast("long").alias("n_event_types"),
        F.lit(None).cast("double").alias("avg_value"),
        F.lit(None).cast("double").alias("total_value"),
        F.lit(None).cast("double").alias("min_value"),
        F.lit(None).cast("double").alias("max_value"),
        F.lit(None).cast("timestamp").alias("first_event_ts"),
        F.lit(None).cast("timestamp").alias("last_event_ts"),
    )
    return by_day.unionByName(by_type).unionByName(by_k)


# Tumbling (1 h) and sliding (1 h / 30 min) window aggregates FUSED into one
# query with a window_kind discriminator — one registry slot for both batch
# twins of the streaming windowed agg (streaming/pipeline.py uses F.window +
# watermark for the same groupings). Spark expands each sliding row to its 2
# covering windows then hash-aggregates — same shuffle shape as tumbling, 2x
# pre-aggregation input, identical at any scale; the oracle unrolls the same
# two starts by epoch arithmetic (kept as plain TIMESTAMP — to_timestamp()
# in DuckDB would yield TIMESTAMPTZ and render differently).
_WINDOWED_ORACLE = f"""
WITH slid AS (
  SELECT event_type, value,
    TIMESTAMP '1970-01-01 00:00:00'
      + (CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 - s.off) * INTERVAL 1 SECOND
      AS window_start
  FROM events
  CROSS JOIN (SELECT unnest([0, 1800]) AS off) s
  WHERE ts IS NOT NULL
)
SELECT 'tumbling' AS window_kind,
  date_trunc('hour', ts) AS window_start,
  event_type,
  count(*) AS n_events,
  {sql_exact_sum("value", 100.0)} AS total_value,
  {sql_pround(sql_exact_avg("value", 100.0), 6)} AS avg_value
FROM events
WHERE ts IS NOT NULL
GROUP BY date_trunc('hour', ts), event_type
UNION ALL
SELECT 'sliding' AS window_kind,
  window_start,
  event_type,
  count(*) AS n_events,
  {sql_exact_sum("value", 100.0)} AS total_value,
  {sql_pround(sql_exact_avg("value", 100.0), 6)} AS avg_value
FROM slid
GROUP BY window_start, event_type
""".strip()


@spec(
    "windowed_hourly",
    oracle=_WINDOWED_ORACLE,
    tags=("streaming", "window_agg", "sliding"),
    bench=True,
)
def q_windowed_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling + sliding hourly window aggregates (window_kind column).

    ``ts IS NOT NULL`` is explicit in BOTH twins: F.window silently drops
    null-timestamp rows while the tumbling groupBy would keep a null group
    and the oracle's CROSS JOIN would keep a NULL window_start — three
    different null semantics unless pinned here."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    aggs = [
        F.count("*").alias("n_events"),
        exact_sum(F.col("value"), 100.0).alias("total_value"),
        pround(exact_avg(F.col("value"), 100.0), 6).alias("avg_value"),
    ]
    tumbling = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("window_start"),
        "event_type",
    ).agg(*aggs).select(F.lit("tumbling").alias("window_kind"), "*")
    sliding = (
        e.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(*aggs)
        .select(
            F.lit("sliding").alias("window_kind"),
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
            "avg_value",
        )
    )
    return tumbling.unionByName(sliding)


_SESSION_GAP_SECONDS = 1800

_SESSIONIZE_ORACLE = f"""
WITH gaps AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR date_diff('second', lag(ts) OVER w, ts) > {_SESSION_GAP_SECONDS}
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts, value,
    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM gaps
)
SELECT user_id, session_id,
  count(*) AS n_events,
  min(ts) AS session_start,
  max(ts) AS session_end,
  {sql_exact_sum("value", 100.0)} AS session_value
FROM sess
GROUP BY user_id, session_id
""".strip()


@spec("sessionize", oracle=_SESSIONIZE_ORACLE, tags=("sessionization", "window"), bench=True)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag-gap → cumulative session id → per-session agg.
    One shuffle on user_id serves all three window/group steps (the window
    partitioning is reused by the final groupBy — no second exchange)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    prev_ts = F.lag("ts").over(w)
    gap = F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)
    is_new = F.when(
        prev_ts.isNull() | (gap > _SESSION_GAP_SECONDS), F.lit(1)
    ).otherwise(F.lit(0))
    sess = e.withColumn("is_new", is_new).withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        exact_sum(F.col("value"), 100.0).alias("session_value"),
    )


# json_props_extract was a standalone query through round 4; it is now the
# by_k block of ingestion_stats (same events scan, same extraction + agg) —
# the fusion freed a registry slot while keeping the §2.9 semi-structured
# op driver-checked.


