"""Structured Streaming pipeline: the reference's batch-only surface
(SURVEY.md §2.10) extended to streams, per the §7 step-9 build plan.

The reference has no streaming; its streaming-adjacent semantics map as:

- incremental ``WRITE_APPEND`` loads (dags/stock_etl.py:149) →
  ``outputMode("append")`` sinks;
- freshness watermark gate (dags/utils/validators.py:254-309) →
  ``withWatermark`` + lateness-bounded state;
- key dedup on replay (dags/utils/transformers.py:109) →
  ``dropDuplicatesWithinWatermark`` (bounded state — plain
  ``dropDuplicates`` on a stream would grow state forever);
- MERGE of replayed data (dags/utils/loaders.py:160-169) →
  ``foreachBatch`` + the engine's merge_write per micro-batch.

Scale notes: every transformation here is the same Catalyst plan as its
batch twin in workload/events.py — the streaming runtime adds incremental
state handling. State stores shard by the grouping key (watermark bounds
their size); ``maxFilesPerTrigger`` throttles file-source backlogs the way
the reference throttles API calls (dags/utils/extractors.py:56).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import scaled_long

# Explicit stream-read schema for the events table (file streams require a
# user schema — no inference pass). The stream source is a bronze directory
# the engine itself materialized (datasets.load_table normalizes the
# driver's TIMESTAMP(NANOS) original at batch-ingest time), so ts is a
# plain microsecond timestamp here.
EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession,
    path: str,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over an events parquet directory."""
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def tumbling_event_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of the workload windowed_hourly tumbling branch: per
    (window, event_type)
    counts + integer-exact value sums. The watermark bounds state: windows
    older than (max event time − watermark) are finalized and evicted."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(scaled_long(F.col("value"), 100.0)) / 100.0).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def dedup_events_within_watermark(
    events: DataFrame,
    *,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Replay-safe dedup with bounded state: a duplicate arriving within the
    watermark horizon is dropped; state for old keys is evicted. This is the
    streaming form of the reference's keep-first key dedup."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def sessionize_stream(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user (dynamic-gap tumbling): built-in
    ``session_window`` instead of applyInPandasWithState — the state store
    merges overlapping windows JVM-side."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(scaled_long(F.col("value"), 100.0)) / 100.0).alias("session_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running event count + exact running value total, maintained across
    micro-batches in the state store and emitted (update mode) once per user
    per batch.

    This is the escape hatch for stateful logic ``session_window``/
    ``dropDuplicatesWithinWatermark`` can't express (custom accumulators,
    ML-ish counters, decision state). State is (count, cents) per user —
    value totals accumulate as integer cents so replays and partitionings
    cannot perturb the double rendered at the end.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, total_value double"
    state_schema = "n long, cents long"

    def update(key, pdf_iter, state: GroupState):
        import numpy as np

        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            # exact: floor-to-cents grid, order-independent (astype would
            # truncate toward zero — wrong for negatives)
            cents += int(
                np.floor(pdf["value"].to_numpy() * 100 + 0.5).astype("int64").sum()
            )
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_sessionize(
    events: DataFrame,
    *,
    gap_minutes: int = 30,
    watermark: str = "1 minute",
) -> DataFrame:
    """Custom session windows via ``applyInPandasWithState`` with EVENT-TIME
    TIMEOUT eviction — the full custom-stateful lifecycle that the built-in
    ``session_window`` (sessionize_stream) hides:

    - per-user state = (session_start, last_event, count, integer cents);
    - a new event within ``gap_minutes`` of the last extends the session;
      a later event CLOSES the session (emitted immediately, append-style)
      and starts a new one;
    - an idle session is closed by the state-store TIMEOUT when the
      watermark passes last_event + gap — state cannot accumulate forever,
      which is the property that matters on an unbounded 100 TB stream.

    Matches ``session_window`` semantics for in-order input: session_end =
    last event + gap. Value totals accumulate as integer cents (replay- and
    partitioning-independent).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, session_value double"
    )
    state_schema = "start_us long, last_us long, n long, cents long"

    def _row(user_id, start_us, last_us, n, cents):
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us + gap_us, unit="us")],
                "n_events": [n],
                "session_value": [cents / 100.0],
            }
        )

    def update(key, pdf_iter, state: GroupState):
        import numpy as np

        user_id = key[0]
        if state.hasTimedOut:
            start_us, last_us, n, cents = state.get
            state.remove()
            yield _row(user_id, start_us, last_us, n, cents)
            return
        batch = [p for p in pdf_iter if len(p)]
        if not batch:
            return
        pdf = pd.concat(batch).sort_values("ts")
        ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
        cents_arr = np.floor(pdf["value"].to_numpy() * 100 + 0.5).astype("int64")
        if state.exists:
            start_us, last_us, n, cents = state.get
        else:
            start_us, last_us, n, cents = int(ts_us[0]), int(ts_us[0]) - 1, 0, 0
            # last_us just below first event so the first iteration extends
        for t, c in zip(ts_us, cents_arr):
            if n and t - last_us > gap_us:
                yield _row(user_id, start_us, last_us, n, cents)
                start_us, n, cents = int(t), 0, 0
            # A LATE event (cross-batch, within watermark) must never move
            # the session boundaries backward: start only shrinks, last only
            # grows, so session_end and the timeout stay monotone.
            start_us = min(start_us, int(t))
            last_us = max(last_us, int(t))
            n += 1
            cents += int(c)
        state.update((int(start_us), int(last_us), int(n), int(cents)))
        state.setTimeoutTimestamp((last_us + gap_us) // 1000)  # epoch ms
        return

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "user_id",
    within: str = "30 minutes",
    watermark: str = "2 hours",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Stream-stream inner join: same key, right event within ±``within`` of
    the left event. Both sides carry watermarks and the join condition bounds
    event-time distance, so the state store can evict rows once the watermark
    passes — without the time bound, stream-stream join state grows forever.

    Scale notes: the join shuffles both streams on the key once; state per
    key is bounded by (rate × 2×within). This is the streaming twin of a
    batch self-join with a time-band predicate.
    """
    l = left.withWatermark("ts", watermark).select(
        F.col(key),
        F.col("ts").alias(f"{left_prefix}ts"),
        F.col("event_id").alias(f"{left_prefix}event_id"),
        F.col("value").alias(f"{left_prefix}value"),
    )
    r = right.withWatermark("ts", watermark).select(
        F.col(key).alias(f"{right_prefix}{key}"),
        F.col("ts").alias(f"{right_prefix}ts"),
        F.col("event_id").alias(f"{right_prefix}event_id"),
    )
    cond = (
        (F.col(key) == F.col(f"{right_prefix}{key}"))
        & (F.col(f"{right_prefix}ts") >= F.col(f"{left_prefix}ts") - F.expr(f"INTERVAL {within}"))
        & (F.col(f"{right_prefix}ts") <= F.col(f"{left_prefix}ts") + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner").drop(f"{right_prefix}{key}")


def stream_merge_upsert(
    stream: DataFrame,
    target_path: str,
    keys: list[str],
    checkpoint_dir: str,
    *,
    partition_col: str | None = None,
):
    """MERGE per micro-batch: foreachBatch + the engine's merge_write — the
    streaming twin of the reference's staging-table MERGE. Checkpointing
    makes the upsert effectively-once (a replayed batch merges to the same
    end state: MERGE is idempotent on keys)."""
    from .. import sinks

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sinks.merge_write(
            batch_df.sparkSession,
            target_path,
            batch_df,
            keys,
            partition_col=partition_col,
        )

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def stream_acid_merge(
    stream: DataFrame,
    table: str,
    keys: list[str],
    checkpoint_dir: str,
    *,
    file_cow: bool = False,
    allow_new_columns: bool = False,
    vacuum_every: int | None = None,
    vacuum_keep: int = 2,
    compact_every: int | None = None,
    compact_target_rows: int = 1_000_000,
    exactly_once: bool = False,
    backend=None,
):
    """MERGE per micro-batch into a snapshot-committed ACID table
    (sinks/acid.py): each batch becomes one atomically-published snapshot,
    so a concurrent reader NEVER sees a half-merged batch — the isolation
    stream_merge_upsert's in-place partition rewrite cannot give. Replays
    are effectively-once by the same argument (MERGE is idempotent on
    keys: a re-merged batch publishes a snapshot with identical content,
    just one more ordinal — acid_vacuum sweeps the history).
    ``file_cow=True`` publishes manifest snapshots (only files containing
    the batch's keys rewrite) — the right mode for a long-running stream
    on a large table, where per-batch whole-table COW would compound.

    ``allow_new_columns=True`` threads SCHEMA EVOLUTION through the
    stream (VERDICT r12 item 3): a mid-stream batch carrying a column
    the table lacks widens the pinned schema once — nullable, existing
    rows and untouched carried-forward files read NULL — instead of
    forcing a stream restart through the batch API; pre-evolution
    snapshots keep their at-commit schema under time travel. The strict
    default drops extra source columns, exactly as acid_merge_upsert.

    RETENTION (round 12 — the 1k-batch churn soak, SCALING): a stream
    that only commits grows the table's fixed costs without bound — one
    marker per batch (every commit's ordinal resolution lists
    ``_commits/``), one snapshot dir per batch, and under file_cow at
    least one small data file + manifest entry per batch (every merge's
    pruning loop and manifest JSON scale with it). ``vacuum_every=N``
    runs ``acid_vacuum(keep=vacuum_keep)`` after every Nth commit, and
    ``compact_every=M`` (file_cow only) runs
    ``acid_compact(target_rows=compact_target_rows)`` after every Mth —
    both INSIDE foreachBatch, which serializes batches, so the
    no-commit-in-flight maintenance contract holds by construction
    PROVIDED the stream is the table's only writer (the same
    single-maintainer rule as acid_vacuum itself; leave both off and
    run maintenance out-of-band otherwise). ``vacuum_keep`` is the
    time-travel retention: ``acid_read(ordinal=...)`` reaches only the
    newest ``keep`` snapshots, so size it to the longest reader/replay
    window the table must serve.

    ``exactly_once=True`` upgrades replay handling from value-idempotent
    to SKIP: every commit's _meta.json records this stream's run epoch
    and batch_id; a replayed batch whose (epoch, batch_id) is already in
    the visible commit log returns without committing, so a restart adds
    NO duplicate snapshot (the default re-merges: same content, one more
    ordinal). The epoch is the CHECKPOINT's streaming-query id (the
    ``metadata`` file Spark writes inside the checkpoint dir), NOT a hash
    of the path: batch ids are only comparable within one checkpoint
    lifetime — if the checkpoint state is lost and rebuilt, batch numbers
    restart at 0 over a possibly-different file assignment, and skipping
    "already seen" ids would silently drop new data; a rebuilt checkpoint
    gets a fresh query id, so those batches fall back to the
    value-idempotent re-merge (Delta's txnAppId carries the same
    contract). The commit-log lookup runs ONCE per stream start (then a
    closure high-water mark takes over — O(1) per batch); history is
    bounded by ``vacuum_keep``, and if vacuum has swept the recording
    snapshot the skip degrades to the re-merge — correctness never
    depends on it; size ``vacuum_keep`` ≥ the replay window to keep it
    firing."""
    from ..sinks.acid import (
        acid_compact, acid_history, acid_merge_upsert, acid_vacuum,
    )

    # closure state, per stream incarnation: exactly-once high-water mark
    # and the merge-commit counter driving maintenance cadence (counting
    # MERGES, not ordinals — compaction's own commit advances the ordinal,
    # so an ordinal-parity rule degenerates to compact-every-batch)
    state = {"epoch": None, "done": None, "merges": 0}

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        extra = None
        if exactly_once:
            epoch = _stream_query_epoch(spark, checkpoint_dir)
            # the high-water mark is only meaningful WITHIN one checkpoint
            # lifetime: if this writer object is .start()ed again after the
            # checkpoint was wiped (new query id, batch ids restart at 0),
            # a mark carried over from the previous epoch would make
            # batch_id <= done true for NEW batches and silently skip them
            # (ADVICE r12) — re-derive it whenever the epoch changes
            if state["done"] is None or state["epoch"] != epoch:
                # derive BEFORE assigning: if the history scan throws
                # mid-switch, a half-updated state (new epoch, previous
                # epoch's mark) would silently skip the retried batches
                # (code-review r13)
                done = max(
                    (
                        h["batch_id"]
                        for h in acid_history(spark, table, backend=backend)
                        if h.get("epoch") == epoch
                    ),
                    default=-1,
                )
                state["epoch"], state["done"] = epoch, done
            if batch_id <= state["done"]:
                return  # this batch's merge already committed — replay skip
            extra = {"epoch": epoch, "batch_id": batch_id}
        acid_merge_upsert(
            spark, table, batch_df, keys, file_cow=file_cow,
            allow_new_columns=allow_new_columns, extra=extra,
            backend=backend,
        )
        if exactly_once:
            state["done"] = batch_id
        state["merges"] += 1
        # maintenance runs under the table's LEASE: when an out-of-band
        # maintainer holds it, the cadence point is SKIPPED (benign — the
        # other maintainer is doing the work; the next cadence point
        # retries). Merge commits above never take the lease — the lease
        # serializes maintainers only. Safety against the STREAM's own
        # merges comes from foreachBatch serialization (maintenance and
        # merges never overlap here), which is exactly why out-of-band
        # VACUUM against a live stream stays unsafe (orphan sweep vs
        # in-flight data files) while out-of-band COMPACT is benign
        # (conditional commit, loser retries).
        from ..sinks.acid import MaintenanceBusy

        if compact_every and file_cow and state["merges"] % compact_every == 0:
            try:
                acid_compact(spark, table, target_rows=compact_target_rows,
                             lease=True, backend=backend)
            except MaintenanceBusy:
                pass
        if vacuum_every and state["merges"] % vacuum_every == 0:
            try:
                acid_vacuum(spark, table, keep=vacuum_keep, lease=True,
                            backend=backend)
            except MaintenanceBusy:
                pass

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def tuned_stream_confs(
    spark,
    *,
    state_partitions: int = 16,
    skip_no_data_batches: bool = True,
) -> None:
    """Apply the measured micro-batch fixed-cost tuning to a session before
    starting a stateful stream (round-6 probe decomposition, SCALING.md).

    - ``spark.sql.shuffle.partitions`` → ``state_partitions``: the state
      store opens/commits one store per shuffle partition per micro-batch;
      at 32 partitions the sf0.1 probe spent more summed commit time than
      compute. 16 keeps local[32] parallelism for the data while halving
      store overhead; a real cluster sizes this to key cardinality ×
      executor count instead. Streaming state partitioning is FROZEN into
      the checkpoint at first start — set it before the query, and never
      change it for an existing checkpoint.
    - no-data micro-batches off (optional): availableNow appends a final
      data-less batch purely to advance the watermark and fire timeouts.
      The near-dup/semantic-dedup operators emit NOTHING on timeout (state
      cleanup only), so skipping it saves a full batch of fixed cost per
      run. DO NOT use for operators that EMIT on timeout (sessionize's
      final sessions fire from exactly that batch).
    """
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    if skip_no_data_batches:
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")


def run_to_memory(
    stream_df: DataFrame,
    query_name: str,
    checkpoint_dir: str,
    *,
    output_mode: str = "append",
    timeout_s: int = 120,
):
    """Drain a finite stream into an in-memory table (tests/backfills):
    availableNow processes the whole backlog then stops. Returns the
    (terminated) StreamingQuery — its ``recentProgress`` carries the
    per-micro-batch metrics that metrics.freshness_report folds."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"stream {query_name} did not finish in {timeout_s}s")
    return q


_INTERVAL_UNITS_US = {
    "second": 1_000_000, "seconds": 1_000_000,
    "minute": 60_000_000, "minutes": 60_000_000,
    "hour": 3_600_000_000, "hours": 3_600_000_000,
    "day": 86_400_000_000, "days": 86_400_000_000,
}


def _interval_us(interval: str) -> int:
    """Parse a watermark interval ('<n> <unit>', or a Spark compound like
    '1 hour 30 minutes') to microseconds."""
    toks = interval.strip().split()
    if not toks or len(toks) % 2:
        raise ValueError(
            f"expected '<n> <unit>' pairs in interval {interval!r}"
        )
    total = 0
    for n, unit in zip(toks[::2], toks[1::2]):
        try:
            total += int(n) * _INTERVAL_UNITS_US[unit.lower()]
        except KeyError:
            raise ValueError(
                f"unsupported interval unit {unit!r} in {interval!r}"
            ) from None
        except ValueError as e:
            if "invalid literal" in str(e):
                raise ValueError(
                    f"expected '<n> <unit>' pairs in interval {interval!r}"
                ) from None
            raise
    return total


def streaming_simhash_near_dup(
    docs: DataFrame,
    *,
    max_hamming: int = 3,
    watermark: str = "2 hours",
    bucket_cap: int = 256,
    group_salts: int = 64,
    signature_backend: str = "arrow",
) -> DataFrame:
    """Streaming near-duplicate flagging — the dedup family's streaming
    sibling: each arriving document is checked against the documents seen
    within the watermark horizon and flagged with its nearest match.

    Composition mirrors the batch pair query, re-shaped for unbounded
    input:

    - **per-row signatures** (``dedup.with_rowwise_simhash``): a narrow
      stateless projection (no groupBy — streaming forbids stateful
      aggregation ahead of the stateful operator), bit-identical to the
      batch ``simhash_signatures``;
    - **pigeonhole banding**: 4 × 16-bit band keys explode to 4 routed
      copies per doc, so any pair within hamming ≤ 3 shares at least one
      bucket stream — banding recall is exact, like the batch query;
    - **salted coarse-group state** (``applyInPandasWithState``,
      event-time timeout): groups are (band_id, band_key % group_salts)
      — 4 × ``group_salts`` groups TOTAL — and each group's state holds
      ALL of its band-key buckets in CSR-flattened arrays (bucket_keys +
      offsets + member columns). Matching is still strictly per
      band_key bucket (the salt only co-locates buckets), so flag sets
      are identical to the per-bucket grouping this replaces; what
      changes is the per-micro-batch fixed cost. The round-6 probe
      decomposition showed the stateful operator at ~2.5 s/batch against
      a 0.37 s stateless floor, and the term was per-GROUP Python
      crossing overhead (pandas assembly + Arrow state row per group):
      1,250 docs × 4 bands touched up to ~5,000 single-row groups per
      batch. Salting bounds crossings at 4 × ``group_salts`` (default
      256) regardless of throughput — at higher rates each crossing just
      carries more rows, which the vectorized scan absorbs.

      Each bucket stays FIFO-capped at ``bucket_cap`` (a hot template
      bucket cannot grow state without bound; the cap is the recall
      trade, documented, default 256). Members carry their own event
      times and are PRUNED at each group update once the watermark
      passes member ts + horizon, so a continuously-hot bucket cannot
      match new docs against signatures older than the horizon; a bucket
      whose members all expired is dropped from the CSR on its group's
      next update, and a fully idle group is evicted by event-time
      timeout once the watermark passes its last arrival + horizon —
      state stays bounded on an unbounded stream.

    The bucket scan is vectorized: state members live in numpy int64
    arrays and each arriving doc's hamming test is one
    ``np.bitwise_xor`` + 16-bit-LUT popcount over the whole bucket —
    O(1) numpy calls per doc instead of O(bucket_cap) Python-level
    XOR/popcounts (the round-4 review's named hot-path concern).

    Determinism: within a micro-batch docs process in (ts, doc_id) order
    and the reported match minimizes (hamming, doc_id) — replay-stable.

    Output: one row per (doc, band): (doc_id, ts, band_id, band_key,
    matched_id, hamming); ``matched_id`` is NULL when nothing within
    ``max_hamming`` was in the bucket. A document is a near-dup iff ANY
    of its 4 rows carries a match — callers keep-first by dropping
    flagged doc_ids (the batch twin of that filter is
    ``simhash_near_dup_pairs`` + ``near_dup_keepers``).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.dedup import with_rowwise_simhash, with_rowwise_simhash_arrow

    horizon_us = _interval_us(watermark)

    # 'arrow' (default) computes md5+majority in a vectorized numpy kernel
    # (~40 µs/doc); 'jvm' keeps the interpreted HOF fold (~1.4 ms/doc, the
    # round-6 probe's largest per-batch term) — bit-identical by test pin,
    # kept as the A/B control and pure-JVM fallback.
    rowwise = (
        with_rowwise_simhash_arrow if signature_backend == "arrow"
        else with_rowwise_simhash
    )
    sig = rowwise(docs)
    banded = sig.select(
        "doc_id",
        "ts",
        "simhash_hi",
        "simhash_lo",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).cast("int").alias("band_id"),
                        F.col(f"sb{b}").alias("band_key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select(
        "doc_id", "ts", "simhash_hi", "simhash_lo",
        F.col("bk.band_id").alias("band_id"),
        F.col("bk.band_key").alias("band_key"),
        F.pmod(F.col("bk.band_key"), F.lit(group_salts)).cast("int").alias("salt"),
    )

    out_schema = (
        "doc_id long, ts timestamp, band_id int, band_key long, "
        "matched_id long, hamming int"
    )
    # CSR bucket map: bucket_keys[i]'s members are rows
    # [offsets[i], offsets[i+1]) of the flat member columns.
    state_schema = (
        "bucket_keys array<long>, offsets array<int>, "
        "ids array<long>, his array<long>, los array<long>, "
        "tss array<long>, last_us long"
    )

    import numpy as np

    # 16-bit popcount LUT (64 KiB, shipped once per task in the closure):
    # popcount(x) over int64 = LUT over the four 16-bit chunks. Arithmetic
    # shift + mask is chunk-exact for any two's-complement input (the
    # signatures here are non-negative 32-bit halves regardless).
    pop16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.uint16)

    def _pop64(x):
        return (
            pop16[x & 0xFFFF]
            + pop16[(x >> 16) & 0xFFFF]
            + pop16[(x >> 32) & 0xFFFF]
            + pop16[(x >> 48) & 0xFFFF]
        )

    def update(key, pdf_iter, state: GroupState):
        band_id = int(key[0])
        if state.hasTimedOut:
            state.remove()
            return
        batch = [p for p in pdf_iter if len(p)]
        if not batch:
            return
        pdf = pd.concat(batch).sort_values(["ts", "doc_id"]).reset_index(drop=True)
        wm_ms = state.getCurrentWatermarkMs()
        # Rebuild the group's bucket map from CSR state, applying per-member
        # expiry (same deadline rule as the group timeout — evict once the
        # watermark passes ts + horizon — applied to individual members so
        # hot buckets honor the horizon too). A bucket whose members all
        # expired simply drops out of the map.
        buckets: dict = {}
        last_us = 0
        if state.exists:
            s_keys, s_off, s_ids, s_his, s_los, s_tss, last_us = state.get
            a_ids = np.asarray(s_ids, dtype=np.int64)
            a_his = np.asarray(s_his, dtype=np.int64)
            a_los = np.asarray(s_los, dtype=np.int64)
            a_tss = np.asarray(s_tss, dtype=np.int64)
            for bi, bk in enumerate(s_keys):
                lo, hi = s_off[bi], s_off[bi + 1]
                keep = (a_tss[lo:hi] + horizon_us) // 1000 > wm_ms
                if keep.any():
                    buckets[int(bk)] = [
                        a_ids[lo:hi][keep], a_his[lo:hi][keep],
                        a_los[lo:hi][keep], a_tss[lo:hi][keep],
                    ]
        nb = len(pdf)
        doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        his_b = pdf["simhash_hi"].to_numpy(dtype=np.int64)
        los_b = pdf["simhash_lo"].to_numpy(dtype=np.int64)
        ts_us = (
            pdf["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64) // 1000
        )
        matched = np.full(nb, -1, dtype=np.int64)
        hams = np.full(nb, -1, dtype=np.int64)
        # Per band-key bucket, in this group's row order (pdf is sorted, so
        # each bucket's sub-batch is already (ts, doc_id)-ordered and
        # bucket-vs-bucket order is irrelevant — buckets are independent).
        for bk, rows in pdf.groupby("band_key", sort=False).indices.items():
            m = buckets.get(int(bk))
            if m is None:
                m_ids = m_his = m_los = m_tss = np.empty(0, dtype=np.int64)
            else:
                m_ids, m_his, m_los, m_tss = m
            m0 = len(m_ids)
            # Members + this bucket's docs share flat arrays; [start:cnt]
            # is the live FIFO window (≤ bucket_cap) as docs append.
            ids_a = np.concatenate([m_ids, doc_ids[rows]])
            his_a = np.concatenate([m_his, his_b[rows]])
            los_a = np.concatenate([m_los, los_b[rows]])
            tss_a = np.concatenate([m_tss, ts_us[rows]])
            start = 0
            for i, r in enumerate(rows):
                cnt = m0 + i
                if cnt - start > bucket_cap:  # FIFO cap — oldest leaves
                    start = cnt - bucket_cap
                if cnt > start:
                    h = _pop64(his_a[i + m0] ^ his_a[start:cnt]) + _pop64(
                        los_a[i + m0] ^ los_a[start:cnt]
                    )
                    sel = np.nonzero(h <= max_hamming)[0]
                    if len(sel):
                        hmin = h[sel].min()
                        hams[r] = hmin
                        matched[r] = ids_a[start:cnt][sel[h[sel] == hmin]].min()
            end = m0 + len(rows)
            start = max(0, end - bucket_cap)
            buckets[int(bk)] = [
                ids_a[start:end], his_a[start:end],
                los_a[start:end], tss_a[start:end],
            ]
        if nb:
            last_us = max(int(last_us), int(ts_us.max()))
        # Flatten the bucket map back to CSR (sorted keys: replay-stable
        # state bytes).
        keys_out = sorted(buckets)
        offsets = [0]
        for bk in keys_out:
            offsets.append(offsets[-1] + len(buckets[bk][0]))
        state.update(
            (
                [int(k) for k in keys_out],
                [int(o) for o in offsets],
                [int(x) for bk in keys_out for x in buckets[bk][0]],
                [int(x) for bk in keys_out for x in buckets[bk][1]],
                [int(x) for bk in keys_out for x in buckets[bk][2]],
                [int(x) for bk in keys_out for x in buckets[bk][3]],
                int(last_us),
            )
        )
        # Eviction deadline = last arrival + horizon, CLAMPED to just above
        # the current watermark: rows are not pre-filtered against the
        # watermark before this operator, so a group fed only by late data
        # can have last_us + horizon already behind the watermark — Spark
        # rejects a timeout in the past (INVALID_TIMEOUT_TIMESTAMP; hit at
        # the 10x tier, where event time spans 14h against a 1h horizon).
        # The clamp evicts such a group at the next watermark advance.
        deadline_ms = (last_us + horizon_us) // 1000
        state.setTimeoutTimestamp(max(deadline_ms, state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame(
            {
                "doc_id": doc_ids,
                "ts": pdf["ts"].to_numpy(),
                "band_id": band_id,
                "band_key": pdf["band_key"].to_numpy(dtype=np.int64),
                "matched_id": pd.array(
                    [None if m < 0 else int(m) for m in matched], dtype="Int64"
                ),
                "hamming": pd.array(
                    [None if h < 0 else int(h) for h in hams], dtype="Int64"
                ),
            }
        )

    return (
        banded.withWatermark("ts", watermark)
        .groupBy("band_id", "salt")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_semantic_dedup(
    vecs: DataFrame,
    centroids: DataFrame,
    *,
    threshold: float = 0.95,
    watermark: str = "2 hours",
    cell_cap: int = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Streaming SemDeDup — the semantic-dedup family's streaming sibling:
    each arriving embedding is assigned to its nearest cell of a FROZEN
    centroid model and checked against the same-cell embeddings seen within
    the watermark horizon; it is flagged with its most-similar in-horizon
    match at quantized cosine ≥ ``threshold``.

    Composes the batch ``similarity.semantic_dedup`` pieces, re-shaped for
    unbounded input (the ``streaming_simhash_near_dup`` state pattern):

    - **frozen model**: ``centroids`` is the (cid, c_dbl, cc) relation a
      batch ``similarity.kmeans_exact`` trained offline — bounded O(K·dim)
      by construction, collected once driver-side and shipped in the
      closure (streams cannot re-train; periodic re-fits swap the model
      between restarts, the standard IVF serving shape);
    - **stateless Arrow assignment** (one ``mapInPandas`` pass, no
      shuffle): micro-int quantization + 1e-6 floor-quantized distance
      argmin with ties to the lowest cid — the exact
      ``assign_to_centroids_arrow`` arithmetic, so stream and batch agree
      on every cell;
    - **per-cell state** (``applyInPandasWithState``, event-time timeout):
      each cell holds the unit vectors seen within the horizon (FIFO-capped
      at ``cell_cap``); members carry event times and are pruned once the
      watermark passes member ts + horizon; idle cells evict whole. One
      GEMM per (cell, micro-batch) scores the batch against members — the
      streaming twin of the batch per-cell pair GEMM.

    Match rule: cosine of micro-quantized unit vectors, floor-rounded to
    1e-6 BEFORE the threshold (the batch jvm pair backend's
    quantize-before-compare rule), so the flag decision is reproducible
    across engines and replays. Within a micro-batch docs process in
    (ts, id) order and the reported match maximizes (cosine, -id) — a doc
    only matches EARLIER arrivals, so on in-order input the flagged set is
    exactly the batch pair query's later-id sides. Like the batch operator
    (and the SemDeDup paper), duplicate search is within-cell only.

    Fragment edges (round 10): the cell state also carries a running
    min-label per member (an incremental per-cell union-find), and each
    arrival emits ``matched_reps`` — the distinct FRAGMENT labels of all
    its in-horizon matches, not just the best one. One edge per matched
    fragment is exactly the edge set whose offline closure
    (:func:`streaming_semantic_groups`) reproduces the batch fused
    grouping on ANY within-cell component shape — chains included — while
    staying O(#fragments) per row instead of O(#matches); the single
    best-match edge alone under-merges the {a~c, b~c, a≁c} shape
    (test-pinned).

    Output: one row per arriving vector: (``id_col``, ts, cid, matched_id,
    cosine, matched_reps); matched_id/matched_reps NULL when nothing
    within the horizon cleared the threshold. Callers keep-first by
    dropping flagged ids.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    horizon_us = _interval_us(watermark)

    model = sorted(
        centroids.select("cid", "c_dbl", "cc").collect(), key=lambda r: r["cid"]
    )
    if not model:
        raise ValueError("centroid model is empty")
    C = np.stack([np.asarray(r["c_dbl"], dtype=np.float64) for r in model])
    cc = np.array([r["cc"] for r in model], dtype=np.float64)
    cids = np.array([r["cid"] for r in model], dtype=np.int64)
    # large frozen models use the same two-level pruned argmin as the batch
    # kernels (operators/similarity._assign_block — identical result by the
    # triangle-inequality bound, so stream/batch parity is unchanged)
    from ..operators.similarity import _assign_block, _hier_backend, _hier_index

    hier = _hier_index(C) if _hier_backend(len(cids)) else None

    def assign(it):
        for pdf in it:
            if not len(pdf):
                continue
            # with_micro_vectors + assign_to_centroids_arrow, replicated so
            # stream cells match the batch pipeline bit-for-bit
            V = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            v_dbl = np.floor(V * 1e6 + 0.5) / 1e6
            vv = (v_dbl * v_dbl).sum(axis=1)
            _, j = _assign_block(v_dbl, vv, C, cc, hier)
            # zero-norm guard: an all-zero embedding must not become a NaN
            # unit vector silently stored in cell state (NaN >= t is always
            # False, and NaN cosines leak past `cosine IS NULL` filters).
            # Dividing by 1 keeps it a zero UNIT vector: cosine 0 with
            # everything, deterministically unmatched at any t > 0.
            norm = np.sqrt(vv)
            norm[norm == 0.0] = 1.0
            unit = v_dbl / norm[:, None]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "ts": pdf["ts"],
                    "cid": cids[j].astype("int32"),
                    "unit": list(unit),
                }
            )

    assigned = vecs.select(id_col, "ts", vec_col).mapInPandas(
        assign, f"{id_col} long, ts timestamp, cid int, unit array<double>"
    )

    out_schema = (
        f"{id_col} long, ts timestamp, cid int, matched_id long, "
        "cosine double, matched_reps array<long>"
    )
    state_schema = (
        "ids array<long>, units array<double>, tss array<long>, "
        "labels array<long>, dim int, last_us long"
    )

    def update(key, pdf_iter, state: GroupState):
        cid = int(key[0])
        if state.hasTimedOut:
            state.remove()
            return
        batch = [p for p in pdf_iter if len(p)]
        if not batch:
            return
        pdf = pd.concat(batch).sort_values(["ts", id_col])
        wm_ms = state.getCurrentWatermarkMs()
        if state.exists:
            s_ids, s_units, s_tss, s_labels, dim, last_us = state.get
            m_ids = np.asarray(s_ids, dtype=np.int64)
            m_tss = np.asarray(s_tss, dtype=np.int64)
            m_labels = np.asarray(s_labels, dtype=np.int64)
            m_units = np.asarray(s_units, dtype=np.float64).reshape(-1, dim)
            keep = (m_tss + horizon_us) // 1000 > wm_ms  # member horizon
            if not keep.all():
                m_ids, m_tss = m_ids[keep], m_tss[keep]
                m_labels, m_units = m_labels[keep], m_units[keep]
        else:
            m_ids = m_tss = m_labels = np.empty(0, dtype=np.int64)
            m_units = None
            last_us = 0
        U_batch = np.stack(
            [np.asarray(u, dtype=np.float64) for u in pdf["unit"]]
        )
        dim = U_batch.shape[1]
        if m_units is None:
            m_units = np.empty((0, dim), dtype=np.float64)
        nb, m0 = len(pdf), len(m_ids)
        ids_a = np.concatenate([m_ids, pdf[id_col].to_numpy(dtype=np.int64)])
        units_a = np.vstack([m_units, U_batch])
        # running per-member min-label (incremental union-find): batch rows
        # start as their own fragment; merges below fold matched fragments
        labels_a = np.concatenate(
            [m_labels, pdf[id_col].to_numpy(dtype=np.int64)]
        )
        ts_us = (
            pdf["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64) // 1000
        )
        tss_a = np.concatenate([m_tss, ts_us])
        # one GEMM scores the whole batch against members ∪ earlier batch
        # rows; per-row work is a slice over its live FIFO window
        G = np.floor((U_batch @ units_a.T) * 1e6 + 0.5) / 1e6
        matched = np.full(nb, -1, dtype=np.int64)
        cosines = np.full(nb, np.nan)
        reps_out: list[list[int] | None] = [None] * nb
        start = 0
        for i in range(nb):
            cnt = m0 + i
            if cnt - start > cell_cap:  # FIFO cap — oldest member leaves
                start = cnt - cell_cap
            if cnt > start:
                g = G[i, start:cnt]
                sel = np.nonzero(g >= threshold)[0]
                if len(sel):
                    cmax = g[sel].max()
                    matched[i] = ids_a[start:cnt][sel[g[sel] == cmax]].min()
                    cosines[i] = cmax
                    # one edge per matched FRAGMENT: enough for the offline
                    # closure to reproduce batch components on any shape,
                    # O(#fragments) not O(#matches)
                    frags = np.unique(labels_a[start:cnt][sel])
                    reps_out[i] = [int(x) for x in frags]
                    merged = min(int(frags.min()), int(ids_a[cnt]))
                    # fold every LIVE member of a matched fragment (and the
                    # arrival itself) into the merged fragment; members
                    # behind `start` are never read again
                    live = labels_a[start:cnt]
                    live[np.isin(live, frags)] = merged
                    labels_a[cnt] = merged
        end = m0 + nb
        start = max(0, end - cell_cap)
        if nb:
            last_us = max(int(last_us), int(ts_us.max()))
        state.update(
            (
                [int(x) for x in ids_a[start:end]],
                [float(x) for x in units_a[start:end].ravel()],
                [int(x) for x in tss_a[start:end]],
                [int(x) for x in labels_a[start:end]],
                int(dim),
                int(last_us),
            )
        )
        # same clamped deadline rule as streaming_simhash_near_dup: a cell
        # fed only by late rows must not set a timeout behind the watermark
        deadline_ms = (last_us + horizon_us) // 1000
        state.setTimeoutTimestamp(max(deadline_ms, state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(dtype=np.int64),
                "ts": pdf["ts"].to_numpy(),
                "cid": cid,
                "matched_id": pd.array(
                    [None if m < 0 else int(m) for m in matched], dtype="Int64"
                ),
                # unmatched rows emit SQL NULL, matching matched_id's
                # convention — a float NaN here would silently escape
                # `cosine IS NULL` filters downstream
                "cosine": pd.array(
                    [None if m < 0 else float(c) for m, c in zip(matched, cosines)],
                    dtype="Float64",
                ),
                "matched_reps": pd.Series(reps_out, dtype=object),
            }
        )

    return (
        assigned.withWatermark("ts", watermark)
        .groupBy("cid")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_semantic_groups(
    flagged: DataFrame, *, id_col: str = "vec_id"
) -> DataFrame:
    """Batch-shaped grouping view over ``streaming_semantic_dedup`` output —
    the fused grouping's representation (id, cid, group_id, keeper_id), so
    batch/stream parity reporting compares IDENTICAL structures instead of
    a flagged-id set against a component labeling (VERDICT r9 item 4).

    Stream matches are within-cell by construction, so components never
    span cells — the same argument that fused the batch grouping in round
    9 — and the same vectorized per-cell union-find
    (``dedup._union_find_min_labels``) closes the emitted
    (id, matched_id) edges with zero global grouping jobs. min_id keeper
    convention (the batch default): ``keeper_id == group_id``.

    Exactness (test-pinned): with ``matched_reps`` present (round 10 —
    one edge per matched FRAGMENT, from the stream's in-state incremental
    union-find) the closure reproduces the batch components on ANY
    within-cell shape, chains included, under the stream's own contract
    (in-order arrival, every family pair witnessed inside the horizon and
    the FIFO cap). Without it (pre-round-10 sinks) the view falls back to
    the single best-match edge, which is exact on clique-shaped duplicate
    families but can under-merge chains — e.g. {a~c, b~c, a≁c}, where
    c's one edge bypasses half the component (the pinned negative case).

    Input must be bounded (a materialized stream window / test sink), like
    any grouping report; the per-cell kernel state is O(cell) like the
    batch fused kernel.
    """
    import numpy as np
    import pandas as pd

    from ..operators.dedup import _union_find_min_labels

    has_reps = "matched_reps" in flagged.columns
    id_type = dict(flagged.dtypes)[id_col]
    schema = (
        f"{id_col} {id_type}, cid int, group_id {id_type}, "
        f"keeper_id {id_type}"
    )

    def cell_groups(key, pdf):
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        group = ids.copy()
        ea_parts, eb_parts = [], []
        if has_reps:
            for i, reps in zip(ids, pdf["matched_reps"]):
                if reps is not None and len(reps):
                    ea_parts.append(np.full(len(reps), i, dtype=np.int64))
                    eb_parts.append(np.asarray(reps, dtype=np.int64))
        else:
            has = pd.notna(pdf["matched_id"]).to_numpy()
            if has.any():
                ea_parts.append(ids[has])
                eb_parts.append(pdf["matched_id"][has].to_numpy(dtype=np.int64))
        if ea_parts:
            ea = np.concatenate(ea_parts)
            eb = np.concatenate(eb_parts)
            uids, ulabels = _union_find_min_labels(ea, eb)
            pos = np.searchsorted(uids, ids)
            pos_c = np.minimum(pos, len(uids) - 1)
            hit = uids[pos_c] == ids
            group[hit] = ulabels[pos_c[hit]]
        return pd.DataFrame(
            {
                id_col: ids,
                "cid": pdf["cid"],
                "group_id": group,
                "keeper_id": group,
            }
        )

    return flagged.groupBy("cid").applyInPandas(cell_groups, schema)


# --- streaming maintenance of the at-rest dedup indexes ----------------------
# The batch increments (dedup.simhash128_index_increment / minhash / exact)
# assume one writer appending flat files; a streaming writer needs REPLAY
# idempotence — after a crash, foreachBatch re-runs the last uncommitted
# batch, and a blind append would double the batch's signature rows (future
# increments would then emit duplicate flag rows against the doubled docs).
# The fix is layout, not a ledger: the stream OWNS its index tree and every
# batch writes to its own hive partition `ingest_batch=<id>` with overwrite —
# a replay overwrites the same directory instead of appending, and the flag
# computation excludes the batch's own partition from the stored read
# (partition-pruned, so the exclusion costs nothing). Every write this
# operator does is therefore a deterministic function of (stream content,
# batch id): replays are byte-idempotent with no commit protocol.
#
# Flag semantics across the stream's lifetime: a near-dup pair is flagged in
# exactly ONE batch — the one where the LATER member arrives (new×old) or
# both arrive (new×new). The union of all batches' flag partitions therefore
# equals the batch pair query over everything ingested — pinned in
# tests/test_streaming.py for all three families.
#
# EPOCH namespace: Spark numbers micro-batches PER CHECKPOINT, starting at
# 0 — so `ingest_batch` alone is only unique within one checkpoint's
# lifetime, and a successor stream (new checkpoint, e.g. after a source
# re-point) would silently OVERWRITE the first stream's ingest_batch=0.
# Partitions are therefore epoch=<id>/ingest_batch=<n>, with the epoch
# derived from the checkpoint directory: same checkpoint → same epoch →
# restarts continue and replays stay idempotent; a different checkpoint →
# a fresh epoch → its batches land beside (never over) prior ingests.
# (A new checkpoint over an already-ingested source re-ingests it — the
# same property as any from-scratch restart into an append sink; the
# epoch makes it visible in the tree instead of corrupting it.)

_IDX_GEOM_DEFAULTS = dict(
    num_hashes=20, bands=4, threshold=0.7, shingle_n=3, est_min_matches=10
)


def _checkpoint_epoch(checkpoint_dir: str) -> str:
    """Epoch id for a checkpoint: 'e' + md5(realpath)[:12]. Realpath so a
    respelled-but-identical checkpoint (relative vs absolute, trailing
    slash, symlink) keeps its epoch across restarts — Spark resumes the
    same batch ids, so a respelling-fresh epoch would defeat replay
    self-exclusion; letter prefix so the partition value always
    type-infers as a string."""
    import hashlib
    import os

    return (
        "e"
        + hashlib.md5(
            os.path.realpath(checkpoint_dir).encode("utf-8")
        ).hexdigest()[:12]
    )


def _stream_query_epoch(spark, checkpoint_dir: str) -> str:
    """Epoch id for EXACTLY-ONCE commit records: 'q' + the checkpoint's
    streaming-query id (the ``metadata`` JSON Spark writes at the
    checkpoint root when the query first starts). Unlike the path-hash
    epoch (_checkpoint_epoch — right for the index trees, where a
    respelled path must keep its epoch), batch-id comparability must die
    WITH the checkpoint state: a wiped-and-rebuilt checkpoint restarts
    batch numbering over a different file assignment, and a path-derived
    epoch would skip those "already seen" ids — silently dropping new
    data. The query id is regenerated exactly when the state is, which is
    the txnAppId contract. Called inside foreachBatch, where the metadata
    file is guaranteed to exist."""
    from ..sinks.acid import _fs, _read_json_file

    fs, jvm = _fs(spark, checkpoint_dir)
    meta = _read_json_file(fs, jvm, f"{checkpoint_dir.rstrip('/')}/metadata")
    qid = meta.get("id")
    if not qid:
        raise ValueError(
            f"checkpoint {checkpoint_dir!r}: no streaming-query id in its "
            f"metadata file — cannot establish an exactly-once epoch"
        )
    return f"q{qid}"


def _legacy_epochs(
    checkpoint_dir: str, extra_spellings: Sequence[str] = ()
) -> tuple[str, ...]:
    """Pre-upgrade epoch ids a checkpoint's remnants may live under: the
    pre-realpath scheme was bare md5(spelling)[:12], so the implicit set
    hashes the current spelling and its realpath; ``extra_spellings`` adds
    every spelling previous runs used (needed when the operator respells
    the path at the same restart that picks up the realpath upgrade — the
    pre-upgrade remnant is under md5(old spelling), which neither implicit
    hash covers; ADVICE r11)."""
    import hashlib
    import os

    return tuple(
        dict.fromkeys(  # dedup, preserve order
            hashlib.md5(s.encode("utf-8")).hexdigest()[:12]
            for s in (
                checkpoint_dir,
                os.path.realpath(checkpoint_dir),
                *extra_spellings,
            )
        )
    )


def _read_tree_except(spark, path: str, epoch: str, batch_id: int):
    """The index tree minus this batch's own partition (replay exclusion);
    None when the tree does not exist yet (first batch)."""
    from pyspark.errors import AnalysisException

    try:
        t = spark.read.option("basePath", path).parquet(path)
    except AnalysisException:
        return None
    # cast: legacy all-digit epoch partitions type-infer as numeric; the
    # string compare must still hit them (new epochs are 'e'-prefixed).
    # ``epoch`` may be one id or a list — a checkpoint's CURRENT id plus
    # its legacy spellings, so a batch replayed across the epoch-scheme
    # upgrade still self-excludes its old-spelling remnant.
    epochs = [epoch] if isinstance(epoch, str) else list(epoch)
    return t.filter(
        ~(
            F.col("epoch").cast("string").isin(epochs)
            & (F.col("ingest_batch") == batch_id)
        )
    ).drop("epoch", "ingest_batch")


def index_maintenance_batch(
    index_path: str,
    flags_path: str,
    batch_df: DataFrame,
    batch_id: int,
    *,
    family: str = "simhash",
    id_col: str = "doc_id",
    text_col: str = "text",
    epoch: str = "manual",
    legacy_epochs: tuple[str, ...] = (),
    **geometry,
) -> None:
    """Process ONE micro-batch: compute this batch's near-dup flags against
    the index tree (minus any replay remnant of itself), then overwrite the
    batch's flag and signature partitions (epoch=<epoch>/ingest_batch=<id>
    — see the epoch-namespace note above; batch ids are only unique within
    one checkpoint's lifetime). Public so tests (and backfills) can drive
    and REPLAY batches deterministically; stream_index_maintenance wraps it
    in foreachBatch with the checkpoint-derived epoch.

    ``family``: 'simhash' (128-bit, hamming ≤ 3), 'minhash' (frozen
    ``geometry`` — num_hashes/bands/threshold/shingle_n/est_min_matches,
    defaults matching minhash_index_write; fixed for the stream's lifetime
    by the caller), or 'exact' (canonicalized md5 digests; per-doc verdicts,
    keeper = min id ingested up to and including this batch).
    """
    from ..operators import dedup as D

    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    stored = _read_tree_except(
        spark, index_path, (epoch, *legacy_epochs), batch_id
    )
    if family == "simhash":
        sig_new = D.simhash128_signatures(batch_df, id_col, text_col)
        if id_col != "doc_id":
            sig_new = sig_new.withColumnRenamed(id_col, "doc_id")
        sig_all = stored.unionByName(sig_new) if stored is not None else sig_new
        flags = D.simhash128_flags_from_signatures(sig_new, sig_all)
        to_store = sig_new
    elif family == "minhash":
        geom = {**_IDX_GEOM_DEFAULTS, **geometry}
        rows = geom["num_hashes"] // geom["bands"]
        assert geom["num_hashes"] % geom["bands"] == 0
        sig_new = D.minhash_signature(
            D.word_shingles(batch_df, id_col, text_col, geom["shingle_n"]),
            geom["num_hashes"], id_col, with_count=True, with_hash_set=True,
        )
        if id_col != "doc_id":
            sig_new = sig_new.withColumnRenamed(id_col, "doc_id")
        sig_new = sig_new.select("*", *D._bk_cols(geom["bands"], rows))
        sig_all = stored.unionByName(sig_new) if stored is not None else sig_new
        flags = D.minhash_flags_from_signatures(
            sig_new, sig_all,
            num_hashes=geom["num_hashes"], bands=geom["bands"],
            est_min_matches=geom["est_min_matches"],
            threshold=geom["threshold"],
        )
        to_store = sig_new
    elif family == "exact":
        from pyspark.sql import Window

        fp = batch_df.select(
            F.col(id_col).alias("doc_id"),
            D._exact_fp(text_col).alias("fingerprint"),
        )
        scored = fp.withColumn(
            "new_min", F.min("doc_id").over(Window.partitionBy("fingerprint"))
        )
        if stored is not None:
            prior = stored.groupBy("fingerprint").agg(
                F.min("keeper_doc_id").alias("stored_keeper")
            )
            scored = scored.join(prior, "fingerprint", "left")
        else:
            scored = scored.withColumn("stored_keeper", F.lit(None).cast("long"))
        flags = scored.select(
            "doc_id", "fingerprint",
            F.least(F.coalesce("stored_keeper", "new_min"), F.col("new_min")).alias(
                "keeper_doc_id"
            ),
        ).withColumn("is_dup", F.col("doc_id") != F.col("keeper_doc_id"))
        to_store = D._exact_delta(batch_df, id_col, text_col)
    else:
        raise ValueError(f"unknown index family {family!r}")
    # flags BEFORE signatures: if the write below dies mid-way, the replay
    # recomputes both from the same inputs and overwrites both partitions.
    part = f"epoch={epoch}/ingest_batch={batch_id}"
    flags.write.mode("overwrite").parquet(f"{flags_path}/{part}")
    to_store.write.mode("overwrite").parquet(f"{index_path}/{part}")
    if legacy_epochs:
        # a batch replayed ACROSS the epoch-scheme upgrade self-excluded
        # its old-spelling remnant above; now physically retire it from
        # BOTH trees (flags are read directly by users — an old-epoch
        # remnant there would be duplicate flags)
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        for le in legacy_epochs:
            for tree in (index_path, flags_path):
                p = jvm.org.apache.hadoop.fs.Path(
                    f"{tree}/epoch={le}/ingest_batch={batch_id}"
                )
                fs = p.getFileSystem(conf)
                if fs.exists(p):
                    fs.delete(p, True)


def stream_index_maintenance(
    stream: DataFrame,
    index_path: str,
    flags_path: str,
    checkpoint_dir: str,
    *,
    family: str = "simhash",
    id_col: str = "doc_id",
    text_col: str = "text",
    legacy_checkpoint_spellings: Sequence[str] = (),
    **geometry,
):
    """Continuous ingest keeping a dedup index fresh: each micro-batch is
    near-dup-checked against everything ingested before it (one narrow
    index scan — never the corpus text) and its signatures join the index
    for the batches after it. Returns the un-started writer (like
    stream_merge_upsert); ``availableNow`` drains the backlog and stops.

    The epoch is the md5 of the checkpoint directory — REALPATH'd first,
    so restarting the SAME checkpoint continues its epoch (replays stay
    idempotent) even when the path is respelled (relative vs absolute,
    trailing slash, symlink): Spark resumes the same batch ids either
    way, and a respelling-derived fresh epoch would let the replayed
    uncommitted batch's old-epoch remnant survive self-exclusion and
    double its docs in the tree (ADVICE r10). A successor stream with a
    NEW checkpoint gets a fresh epoch and cannot overwrite a prior
    stream's batches (batch ids restart at 0 per checkpoint). The 'e'
    prefix keeps the partition value unambiguously a STRING — a 12-hex
    epoch that happens to be all digits would partition-type-infer as
    numeric and weaken _read_tree_except's equality filter. Trees written
    by the pre-realpath scheme are still replay-safe: each batch also
    self-excludes (and then retires) its remnant under the LEGACY epoch
    spellings, so a batch replayed across the upgrade is not doubled.

    The implicit legacy set covers md5(current spelling) and
    md5(realpath) — enough when the restart that picks up the realpath
    upgrade reuses the pre-upgrade spelling. If the operator ALSO
    respells the checkpoint path at that restart (relative → absolute,
    added trailing slash), the pre-upgrade remnant lives under
    md5(old spelling), which neither implicit hash covers (ADVICE r11):
    pass every spelling previous runs used as
    ``legacy_checkpoint_spellings`` (each is md5-hashed into the legacy
    epoch set and its remnants retired), or keep the old spelling for
    the first post-upgrade restart."""
    epoch = _checkpoint_epoch(checkpoint_dir)
    legacy = _legacy_epochs(checkpoint_dir, legacy_checkpoint_spellings)

    def _proc(batch_df: DataFrame, batch_id: int) -> None:
        index_maintenance_batch(
            index_path, flags_path, batch_df, batch_id,
            family=family, id_col=id_col, text_col=text_col, epoch=epoch,
            legacy_epochs=legacy,
            **geometry,
        )

    return (
        stream.writeStream.foreachBatch(_proc)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def index_tree_compact(
    spark: SparkSession,
    path: str,
    *,
    n_files: int = 8,
    quiesce_seconds: float = 600.0,
    force: bool = False,
) -> dict:
    """Fold a maintenance tree's accumulated epoch/batch partitions into
    ONE partition (epoch=compacted0/ingest_batch=0). Streaming ingest
    accretes a directory per micro-batch — at a partition-per-batch for
    months, the listing and footer fan-out tax every increment's stored
    read. Run ONLY when no live checkpoint is writing the tree: the
    replay contract protects live epochs by partition identity, and
    compaction rewrites identities. Signature/delta rows are a bag for
    every reader (signature families union them; the exact family
    merge-on-reads), so folding preserves all query results. Uses the
    sinks staged-swap dance — the tree always exists under some path.

    Guard (VERDICT r10): "run only when quiet" used to be a docstring
    contract; now it is enforced best-effort — the call REFUSES when the
    tree's newest write is younger than ``quiesce_seconds`` (a live
    stream's last micro-batch landing within the window is exactly the
    mis-timing that would drop a concurrently-written partition from the
    fold). Operators who have positively stopped the stream override with
    ``force=True`` (or quiesce_seconds=0). Mtimes come from the Hadoop
    ``FileSystem.listFiles`` modification times, so the guard works for
    plain local paths, ``file:`` URIs, and ``hdfs://`` alike (the r11
    os.walk guard saw zero entries for URI-spelled paths and always
    refused — ADVICE r11); object-store mtime contracts vary, so an
    empty/unlistable tree still degrades to force-required (mtime None
    → refuse unless forced).
    """
    import time

    from ..sinks import _swap_into_place

    if not force and quiesce_seconds > 0:
        newest: float | None = None
        try:
            jvm = spark._jvm
            hp = jvm.org.apache.hadoop.fs.Path(path)
            fs = hp.getFileSystem(spark._jsc.hadoopConfiguration())
            if fs.exists(hp):
                it = fs.listFiles(hp, True)  # recursive
                while it.hasNext():
                    m = it.next().getModificationTime() / 1000.0
                    newest = m if newest is None else max(newest, m)
        except Exception:
            newest = None  # unlistable: degrade to force-required
        age = None if newest is None else time.time() - newest
        if age is None or age < quiesce_seconds:
            raise RuntimeError(
                f"index_tree_compact: tree {path!r} was written "
                f"{'<unknown>' if age is None else round(age, 1)}s ago "
                f"(< quiesce_seconds={quiesce_seconds}); a live checkpoint "
                f"may still be ingesting. Stop the stream and re-run, or "
                f"pass force=True after verifying no writer is active."
            )

    t = spark.read.option("basePath", path).parquet(path)
    n_parts = t.select("epoch", "ingest_batch").distinct().count()
    rows = t.drop("epoch", "ingest_batch")
    staging = path.rstrip("/") + "__staging"
    (
        rows.repartition(max(1, n_files))
        .write.mode("overwrite")
        .parquet(f"{staging}/epoch=compacted0/ingest_batch=0")
    )
    _swap_into_place(spark, staging, path)
    return {
        "destination": path,
        "partitions_folded": n_parts,
        "rows": spark.read.parquet(path).count(),
    }
