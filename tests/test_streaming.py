"""Structured Streaming tests: batch equivalence of the windowed aggregate,
watermark-bounded dedup, sessionization, and foreachBatch MERGE — all driven
with trigger(availableNow) over finite file streams."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from stock_etl_pipeline_spark import streaming
from stock_etl_pipeline_spark.datasets import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture
def events_dir(spark, tmp_path):
    """Events re-materialized as a multi-file stream-source directory."""
    src = str(tmp_path / "events_src")
    load_table(spark, SF, "events").repartition(4).write.parquet(src)
    return src


@pytest.fixture
def dup_events_dir(spark, tmp_path):
    """The same events delivered twice (two files) — a replayed feed."""
    src = str(tmp_path / "events_dup")
    e = load_table(spark, SF, "events").coalesce(1)
    e.write.parquet(src)
    e.write.mode("append").parquet(src)
    return src


def test_stream_tumbling_matches_batch(spark, events_dir, tmp_path):
    stream = streaming.read_events_stream(spark, events_dir)
    agg = streaming.tumbling_event_counts(stream)
    streaming.run_to_memory(
        agg, "t_tumbling", str(tmp_path / "ckpt1"), output_mode="complete"
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.table("t_tumbling").collect()
    }
    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")) / 100.0).alias("v"),
        )
        .collect()
    )
    want = {(r["w"], r["event_type"]): (r["n"], r["v"]) for r in batch}
    assert got == want  # streaming plan ≡ batch plan on the same input


def test_stream_dedup_within_watermark(spark, dup_events_dir, tmp_path):
    stream = streaming.read_events_stream(spark, dup_events_dir)
    dedup = streaming.dedup_events_within_watermark(stream, watermark="10 hours")
    streaming.run_to_memory(dedup, "t_dedup", str(tmp_path / "ckpt2"))
    n_distinct = load_table(spark, SF, "events").count()
    # doubled feed in, exactly one copy per event_id out
    assert spark.table("t_dedup").count() == n_distinct
    assert (
        spark.table("t_dedup").groupBy("event_id").count().filter("count > 1").count() == 0
    )


def test_stream_sessionization(spark, events_dir, tmp_path):
    stream = streaming.read_events_stream(spark, events_dir)
    sess = streaming.sessionize_stream(stream, gap="30 minutes")
    streaming.run_to_memory(
        sess, "t_sessions", str(tmp_path / "ckpt3"), output_mode="complete"
    )
    out = spark.table("t_sessions")
    assert out.count() > 0
    # Session invariants: end > start; per-user sessions don't overlap.
    assert out.filter(F.col("session_end") <= F.col("session_start")).count() == 0
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("session_start")
    overlaps = (
        out.withColumn("prev_end", F.lag("session_end").over(w))
        .filter(F.col("prev_end").isNotNull() & (F.col("session_start") < F.col("prev_end")))
        .count()
    )
    assert overlaps == 0
    # Total events across sessions == total events.
    assert out.agg(F.sum("n_events")).collect()[0][0] == load_table(spark, SF, "events").count()


def test_stream_foreachbatch_merge(spark, events_dir, tmp_path):
    stream = streaming.read_events_stream(spark, events_dir)
    gold = str(tmp_path / "gold")
    writer = streaming.stream_merge_upsert(
        stream, gold, keys=["event_id"], checkpoint_dir=str(tmp_path / "ckpt4")
    )
    q = writer.start()
    q.awaitTermination(120)
    total = load_table(spark, SF, "events").count()
    assert spark.read.parquet(gold).count() == total

    # Replay the same files through a FRESH stream (new checkpoint): merge
    # must be idempotent — the sink must be VALUE-IDENTICAL, not merely the
    # same size (a replayed batch that rewrote rows differently would pass a
    # count check).
    before = sorted(map(repr, spark.read.parquet(gold).collect()))
    stream2 = streaming.read_events_stream(spark, events_dir)
    writer2 = streaming.stream_merge_upsert(
        stream2, gold, keys=["event_id"], checkpoint_dir=str(tmp_path / "ckpt5")
    )
    q2 = writer2.start()
    q2.awaitTermination(120)
    final = spark.read.parquet(gold)
    assert final.count() == total
    assert final.groupBy("event_id").count().filter("count > 1").count() == 0
    after = sorted(map(repr, final.collect()))
    assert after == before  # replayed micro-batch left the sink unchanged


def test_stream_acid_merge_snapshot_per_batch(spark, events_dir, tmp_path):
    """Streaming MERGE into the snapshot-committed ACID table: end state
    equals the batch MERGE result, every micro-batch published one atomic
    snapshot (commit log), and a replay through a fresh checkpoint is
    value-idempotent — extra snapshots, identical content."""
    from stock_etl_pipeline_spark.sinks import acid

    stream = streaming.read_events_stream(spark, events_dir)
    table = str(tmp_path / "acid_gold")
    q = streaming.stream_acid_merge(
        stream, table, keys=["event_id"],
        checkpoint_dir=str(tmp_path / "ckpt_acid"),
    ).start()
    q.awaitTermination(120)
    total = load_table(spark, SF, "events").count()
    out = acid.acid_read(spark, table)
    assert out.count() == total
    hist = acid.acid_history(spark, table)
    assert len(hist) >= 1 and all(h["operation"] == "merge" for h in hist)
    before = sorted(map(repr, out.collect()))

    stream2 = streaming.read_events_stream(spark, events_dir)
    q2 = streaming.stream_acid_merge(
        stream2, table, keys=["event_id"],
        checkpoint_dir=str(tmp_path / "ckpt_acid2"),
    ).start()
    q2.awaitTermination(120)
    final = acid.acid_read(spark, table)
    assert sorted(map(repr, final.collect())) == before
    assert len(acid.acid_history(spark, table)) > len(hist)  # new snapshots
    # vacuum keeps the table readable at the current snapshot
    acid.acid_vacuum(spark, table, keep=1)
    assert acid.acid_read(spark, table).count() == total


def test_stateful_user_totals_across_batches(spark, tmp_path):
    # 4-file source + maxFilesPerTrigger=1 → state must survive micro-batches.
    src = str(tmp_path / "events_4files")
    load_table(spark, SF, "events").repartition(4).write.parquet(src)
    stream = streaming.read_events_stream(spark, src, max_files_per_trigger=1)
    totals = streaming.stateful_user_totals(stream)
    streaming.run_to_memory(
        totals, "t_stateful", str(tmp_path / "ckpt6"), output_mode="update"
    )
    out = spark.table("t_stateful")
    # multiple emissions per user (one per batch that saw the user); the row
    # with the max n_events is the final state
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        out.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    )
    batch = (
        load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")) / 100.0).alias("v"),
        )
    )
    got = {r["user_id"]: (r["n_events"], r["total_value"]) for r in final.collect()}
    want = {r["user_id"]: (r["n"], r["v"]) for r in batch.collect()}
    assert got == want
    # state genuinely crossed batches: some user saw >1 emission
    assert out.count() > final.count()


def test_stateful_sessionize_with_event_time_timeout(spark, tmp_path):
    """Custom applyInPandasWithState sessions: inline close on a gap-exceeding
    event, TIMEOUT close for idle sessions once the watermark passes
    last_event + gap, open sessions never emitted."""
    import datetime as dt

    src = str(tmp_path / "sess_src")
    ckpt = str(tmp_path / "sess_ckpt")

    def ts(h, m):
        return dt.datetime(2024, 1, 1, h, m)

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    batches = [
        # batch 1: user 1 has a 2-event session; user 2 a 1-event session
        [(1, ts(10, 0), 1, "view", 1.0, "{}"),
         (2, ts(10, 5), 1, "view", 2.0, "{}"),
         (3, ts(10, 0), 2, "view", 5.0, "{}")],
        # batch 2: user 2 returns past the gap → inline-closes their first
        # session; watermark after this batch ≈ 19:59
        [(4, ts(20, 0), 2, "view", 7.0, "{}")],
        # batch 3: unrelated user advances processing; user 1's idle session
        # (timeout 10:35) is now far past the watermark → TIMEOUT emission
        [(5, ts(20, 30), 3, "view", 9.0, "{}")],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sess = streaming.stateful_sessionize(stream, gap_minutes=30)
    q = (
        sess.writeStream.format("memory")
        .queryName("t_stateful_sessions")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["session_value"])
        for r in spark.table("t_stateful_sessions").collect()
    }
    assert (1, ts(10, 0), ts(10, 35), 2, 3.0) in got      # timeout-closed
    assert (2, ts(10, 0), ts(10, 30), 1, 5.0) in got      # inline-closed
    open_sessions = {g for g in got if g[0] in (2, 3) and g[1] >= ts(20, 0)}
    assert not open_sessions                               # still open → absent


def test_stateful_sessionize_late_event_keeps_boundaries_monotone(spark, tmp_path):
    """A late event inside an open session (within watermark) must join the
    session WITHOUT moving last_event backward — session_end stays at the
    max event + gap."""
    import datetime as dt

    src = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "late_ckpt")

    def ts(h, m):
        return dt.datetime(2024, 1, 1, h, m)

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    batches = [
        [(1, ts(10, 0), 9, "view", 1.0, "{}"),
         (2, ts(10, 20), 9, "view", 2.0, "{}")],
        [(3, ts(10, 10), 9, "view", 4.0, "{}")],   # LATE, inside the session
        [(4, ts(13, 30), 8, "view", 1.0, "{}")],   # advances watermark
        [(5, ts(14, 0), 8, "view", 1.0, "{}")],    # timeout fires for user 9
    ]
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    sess = streaming.stateful_sessionize(stream, gap_minutes=30, watermark="2 hours")
    q = (
        sess.writeStream.format("memory").queryName("t_late_sessions")
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["session_value"])
        for r in spark.table("t_late_sessions").collect()
    }
    # late 10:10 event absorbed; end = 10:20 + 30m, NOT 10:10 + 30m
    assert (9, ts(10, 0), ts(10, 50), 3, 7.0) in got


def test_streaming_simhash_near_dup_across_batches(spark, tmp_path):
    """Streaming near-dup flagging: the second occurrence of a near-
    duplicate is flagged against the first — including across micro-batch
    boundaries (per-bucket state survives) — and the flag set matches the
    batch pair query's verdict on the same corpus."""
    import datetime as dt

    # 400 distinct tokens: per-bit sums are large, so a one-token edit
    # flips ≤ 3 signature bits (hamming 1 measured for the append)
    base = " ".join(f"w{i}" for i in range(400))
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    batch1 = [
        (1, t0, base),
        (2, t0 + dt.timedelta(minutes=1), "totally different words live here now ok yes"),
    ]
    batch2 = [
        (3, t0 + dt.timedelta(minutes=10), base + " extra"),  # near-dup of 1
        (4, t0 + dt.timedelta(minutes=11), base),             # exact dup of 1
        (5, t0 + dt.timedelta(minutes=12), "another unrelated document about spark plans"),
    ]
    schema = "doc_id long, ts timestamp, text string"
    src = str(tmp_path / "docs_stream")
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    flagged = streaming.streaming_simhash_near_dup(stream, watermark="1 hour")
    streaming.run_to_memory(flagged, "t_neardup", str(tmp_path / "ckpt_nd"))
    out = spark.table("t_neardup").collect()

    assert {r["doc_id"] for r in out} == {1, 2, 3, 4, 5}
    matches = {}
    for r in out:
        if r["matched_id"] is not None:
            prev = matches.get(r["doc_id"])
            cand = (r["hamming"], r["matched_id"])
            matches[r["doc_id"]] = cand if prev is None or cand < prev else prev

    # batch ground truth: every pair the batch query emits whose LATER doc
    # (by ts order = doc_id order here) should be flagged in the stream
    from stock_etl_pipeline_spark.operators import dedup as dedup_ops

    all_rows = batch1 + batch2
    d = spark.createDataFrame([(i, t) for i, _, t in all_rows], "doc_id long, text string")
    batch_pairs = dedup_ops.simhash_near_dup_pairs(d).collect()
    want_flagged = {max(r["doc_a"], r["doc_b"]) for r in batch_pairs}
    assert set(matches) == want_flagged
    # the exact dup reports hamming 0 against an earlier doc
    assert matches[4][0] == 0 and matches[4][1] in (1, 3)
    # doc 3 (near-dup arriving in batch 2) matched doc 1 from batch 1
    assert matches[3][1] == 1 and matches[3][0] <= 3


def test_streaming_simhash_member_expiry_in_hot_bucket(spark, tmp_path):
    """A continuously-hot bucket must not match new docs against members
    older than the watermark horizon: members carry event times and are
    pruned once the watermark passes member ts + horizon, even while the
    bucket itself stays alive (round-4 review finding — whole-bucket
    timeout alone let hot buckets keep arbitrarily old signatures)."""
    import datetime as dt

    text = " ".join(f"w{i}" for i in range(400))
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    docs = [
        (1, t0, text),
        (2, t0 + dt.timedelta(minutes=45), text),
        (3, t0 + dt.timedelta(minutes=150), text),
        (4, t0 + dt.timedelta(minutes=151), text),
    ]
    schema = "doc_id long, ts timestamp, text string"
    src = str(tmp_path / "docs_stream")
    for row in docs:  # one file per doc → one micro-batch per doc
        spark.createDataFrame([row], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    flagged = streaming.streaming_simhash_near_dup(stream, watermark="1 hour")
    streaming.run_to_memory(flagged, "t_member_expiry", str(tmp_path / "ckpt_me"))
    best = {}
    for r in spark.table("t_member_expiry").collect():
        if r["matched_id"] is not None:
            cand = (r["hamming"], r["matched_id"])
            prev = best.get(r["doc_id"])
            best[r["doc_id"]] = cand if prev is None or cand < prev else prev

    # doc2 sees doc1 within the horizon; doc3 still sees doc1 because the
    # watermark (lagging one batch) has not yet passed t0 + horizon.
    assert best[2] == (0, 1)
    assert best[3] == (0, 1)
    # When doc4 processes, the watermark is t0+90m: doc1 (deadline t0+60m)
    # is pruned from the still-hot bucket, so the minimal surviving match
    # is doc2 — pre-fix the answer was doc1.
    assert best[4] == (0, 2)


def test_interval_us_parser():
    from stock_etl_pipeline_spark.streaming.pipeline import _interval_us

    assert _interval_us("2 hours") == 7_200_000_000
    assert _interval_us("1 minute") == 60_000_000
    assert _interval_us("30 seconds") == 30_000_000
    # Spark compound intervals parse too
    assert _interval_us("1 hour 30 minutes") == 5_400_000_000
    assert _interval_us("1 day 2 hours 3 minutes") == 93_780_000_000
    import pytest

    with pytest.raises(ValueError, match="unsupported interval"):
        _interval_us("3 fortnights")
    with pytest.raises(ValueError, match="pairs in interval"):
        _interval_us("1 hour 30")  # dangling value
    with pytest.raises(ValueError, match="pairs in interval"):
        _interval_us("hour 1")  # value/unit swapped


def test_streaming_semantic_dedup_matches_batch(spark, tmp_path):
    """Streaming SemDeDup: embeddings arriving across micro-batches are
    flagged against earlier same-cell arrivals within the horizon. The
    full (matched_id, cosine) map must equal an independent numpy replay
    of the contract (frozen-model quantized assignment + quantized
    within-cell cosine vs earlier ids), and no batch semantic_dedup
    keeper may be flagged."""
    import numpy as np

    from stock_etl_pipeline_spark.operators import similarity

    THRESH, K = 0.4, 8
    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    v = similarity.with_micro_vectors(emb)
    cents = similarity.kmeans_exact(v, k_clusters=K, iters=2)

    # synthetic in-order event times: t0 + vec_id seconds, three files in
    # id order -> three micro-batches (maxFilesPerTrigger=1)
    t0 = 1_704_110_400  # 2024-01-01 12:00:00 UTC
    timed = emb.withColumn(
        "ts", F.timestamp_seconds(F.lit(t0) + F.col("vec_id"))
    ).select("vec_id", "ts", "embedding")
    src = str(tmp_path / "emb_stream")
    n = emb.count()
    for lo, hi in ((0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)):
        timed.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("vec_id long, ts timestamp, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    flagged_df = streaming.streaming_semantic_dedup(
        stream, cents, threshold=THRESH, watermark="2 hours"
    )
    streaming.run_to_memory(flagged_df, "t_semdedup", str(tmp_path / "ckpt_sd"))
    out = spark.table("t_semdedup").collect()
    assert len(out) == n  # one row per arriving vector
    got = {
        r["vec_id"]: (r["matched_id"], r["cosine"])
        for r in out
        if r["matched_id"] is not None
    }

    # independent numpy replay of the documented contract
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    M = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    v_dbl = np.floor(M * 1e6 + 0.5) / 1e6
    vv = (v_dbl * v_dbl).sum(axis=1)
    model = sorted(cents.collect(), key=lambda r: r["cid"])
    C = np.stack([np.asarray(r["c_dbl"], dtype=np.float64) for r in model])
    cc = np.array([r["cc"] for r in model], dtype=np.float64)
    d = vv[:, None] + cc[None, :] - 2.0 * (v_dbl @ C.T)
    cell = (np.floor(d * 1e6 + 0.5) / 1e6).argmin(axis=1)
    U = v_dbl / np.sqrt(vv)[:, None]
    G = np.floor((U @ U.T) * 1e6 + 0.5) / 1e6
    want = {}
    for i in range(len(ids)):
        prior = np.nonzero((cell[:i] == cell[i]) & (G[i, :i] >= THRESH))[0]
        if len(prior):
            cmax = G[i, prior].max()
            want[int(ids[i])] = (
                int(ids[prior[G[i, prior] == cmax]].min()),
                float(cmax),
            )
    assert len(want) > 0  # non-vacuous on this corpus at THRESH
    assert got == want

    # batch consistency: a semantic_dedup keeper has no smaller-id neighbor,
    # so it can never be flagged by the in-id-order stream
    batch = similarity.semantic_dedup(
        emb, THRESH, k_clusters=K, iters=2, pair_backend="jvm"
    ).collect()
    keepers = {r["vec_id"] for r in batch if r["keeper_id"] == r["vec_id"]}
    assert keepers.isdisjoint(got)
    # and every flagged doc is a batch non-keeper (duplicate component member)
    assert set(got) <= {r["vec_id"] for r in batch} - keepers


def test_streaming_semantic_groups_match_batch_fused(spark, tmp_path):
    """VERDICT r9 item 4: streaming_semantic_groups re-shapes the stream's
    flagged output into the batch fused grouping's representation
    (id, cid, group_id, keeper_id), and on a dup-packed CLIQUE corpus whose
    families span micro-batch boundaries the two relations must be
    identical row for row — batch/stream parity compared on identical
    structures, not a flag set vs a labeling."""
    from stock_etl_pipeline_spark.operators import similarity

    THRESH, K, N = 0.95, 4, 40
    rows = []
    for i in range(N):
        fam = i % K
        vec = [0.0] * 8
        vec[fam] = 1.0
        vec[4 + fam] = 0.001 * (i // K)  # tight clique within each family
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    v = similarity.with_micro_vectors(emb)
    cents = similarity.kmeans_exact(v, k_clusters=K, iters=2)

    t0 = 1_704_110_400
    timed = emb.withColumn(
        "ts", F.timestamp_seconds(F.lit(t0) + F.col("vec_id"))
    ).select("vec_id", "ts", "embedding")
    src = str(tmp_path / "emb_groups_stream")
    # three micro-batches by id range: every family (i % 4) spans all three
    for lo, hi in ((0, 13), (13, 26), (26, N)):
        timed.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("vec_id long, ts timestamp, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    flagged_df = streaming.streaming_semantic_dedup(
        stream, cents, threshold=THRESH, watermark="2 hours"
    )
    streaming.run_to_memory(flagged_df, "t_semgroups", str(tmp_path / "ckpt_sg"))

    stream_groups = sorted(
        tuple(r)
        for r in streaming.streaming_semantic_groups(
            spark.table("t_semgroups")
        ).collect()
    )
    batch_groups = sorted(
        tuple(r)
        for r in similarity.semantic_dedup(  # default fused int backend
            emb, THRESH, k_clusters=K, iters=2
        )
        .select("vec_id", "cid", "group_id", "keeper_id")
        .collect()
    )
    assert len(stream_groups) == N
    assert stream_groups == batch_groups
    # non-vacuous: real multi-member groups exist
    assert len({g for _, _, g, _ in batch_groups}) < N


def test_streaming_semantic_groups_exact_on_chains(spark, tmp_path):
    """Round-10 fragment edges: matched_reps carries one edge per matched
    FRAGMENT (in-state incremental union-find), so the offline closure
    reproduces the batch fused grouping on chain-shaped components too —
    including the {a~c, b~c, a≁c} shape where the single best-match edge
    provably under-merges (pinned as the negative case)."""
    import math

    from stock_etl_pipeline_spark.operators import similarity

    THRESH = 0.93
    def vec(d0, d1, angle_deg):
        v = [0.0] * 6
        v[d0] = math.cos(math.radians(angle_deg))
        v[d1] = math.sin(math.radians(angle_deg))
        return v

    rows = [
        # chain family in dims (0,1): 0~1 (cos14=.970), 1~2 (.970), 0≁2 (cos28=.883)
        (0, vec(0, 1, 0.0)), (1, vec(0, 1, 14.0)), (2, vec(0, 1, 28.0)),
        # vee family in dims (2,3): 3~5 (cos20=.940), 4~5 (.940), 3≁4 (cos40=.766)
        (3, vec(2, 3, 0.0)), (4, vec(2, 3, 40.0)), (5, vec(2, 3, 20.0)),
        # singleton in dim 4
        (6, [0.0, 0.0, 0.0, 0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    v = similarity.with_micro_vectors(emb)
    cents = similarity.kmeans_exact(v, k_clusters=1, iters=2)

    t0 = 1_704_110_400
    timed = emb.withColumn(
        "ts", F.timestamp_seconds(F.lit(t0) + F.col("vec_id"))
    ).select("vec_id", "ts", "embedding")
    src = str(tmp_path / "emb_chain_stream")
    # chain (2) and vee (5) members cross micro-batch boundaries
    for lo, hi in ((0, 2), (2, 5), (5, 7)):
        timed.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("vec_id long, ts timestamp, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    flagged_df = streaming.streaming_semantic_dedup(
        stream, cents, threshold=THRESH, watermark="2 hours"
    )
    streaming.run_to_memory(flagged_df, "t_chains", str(tmp_path / "ckpt_ch"))
    sink = spark.table("t_chains")

    # id 5 matched BOTH fragments of its family -> two reps
    r5 = next(r for r in sink.collect() if r["vec_id"] == 5)
    assert sorted(r5["matched_reps"]) == [3, 4]

    batch_groups = sorted(
        tuple(r)
        for r in similarity.semantic_dedup(emb, THRESH, k_clusters=1, iters=2)
        .select("vec_id", "cid", "group_id", "keeper_id")
        .collect()
    )
    # chain {0,1,2} and vee {3,4,5} are whole components in batch
    assert {g for i, _, g, _ in batch_groups if i in (0, 1, 2)} == {0}
    assert {g for i, _, g, _ in batch_groups if i in (3, 4, 5)} == {3}

    via_reps = sorted(
        tuple(r) for r in streaming.streaming_semantic_groups(sink).collect()
    )
    assert via_reps == batch_groups

    # negative pin: the single best-match edge alone under-merges the vee —
    # 4 never links (its only edges are through 5's second fragment)
    via_best = {
        r["vec_id"]: r["group_id"]
        for r in streaming.streaming_semantic_groups(
            sink.drop("matched_reps")
        ).collect()
    }
    assert via_best[4] == 4  # under-merged (batch says 3)
    assert via_best[5] == 3


def test_streaming_semantic_dedup_member_expiry(spark, tmp_path):
    """Per-member horizon pruning in a hot cell: identical vectors arriving
    at 0m/45m/150m/151m against a 1h horizon — the 151m arrival must match
    the 45m member (the 0m member is pruned once the watermark passes its
    ts + horizon), mirroring the simhash sibling's contract."""
    import datetime as dt

    vec = [0.6, 0.8, 0.0, 0.0]
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, vec),
        (2, t0 + dt.timedelta(minutes=45), vec),
        (3, t0 + dt.timedelta(minutes=150), vec),
        (4, t0 + dt.timedelta(minutes=151), vec),
    ]
    schema = "vec_id long, ts timestamp, embedding array<float>"
    src = str(tmp_path / "vec_stream")
    for row in rows:  # one file per vector -> one micro-batch each
        spark.createDataFrame([row], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    cents = spark.createDataFrame(
        [(0, [0.6, 0.8, 0.0, 0.0], 1.0)], "cid int, c_dbl array<double>, cc double"
    )
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    flagged = streaming.streaming_semantic_dedup(
        stream, cents, threshold=0.99, watermark="1 hour"
    )
    streaming.run_to_memory(flagged, "t_sem_expiry", str(tmp_path / "ckpt_se"))
    got = {
        r["vec_id"]: r["matched_id"] for r in spark.table("t_sem_expiry").collect()
    }
    # doc2 matches doc1 in-horizon; doc3 matches doc1 only because the
    # watermark (lagging one batch) has not yet passed t0 + horizon; by
    # doc4 the watermark is t0+90m and doc1 (deadline t0+60m) is pruned
    # from the still-hot cell, so the minimal match is doc2.
    assert got[1] is None
    assert got[2] == 1
    assert got[3] == 1
    assert got[4] == 2


def test_streaming_semantic_dedup_zero_norm_and_null_cosine(spark, tmp_path):
    """An all-zero embedding must flow through as a deterministic zero UNIT
    vector (cosine 0 with everything — never matches, never poisons cell
    state with NaN), and every unmatched row must emit cosine as SQL NULL,
    not float NaN (NaN silently escapes `cosine IS NULL` filters)."""
    import datetime as dt
    import math

    vec = [0.6, 0.8, 0.0, 0.0]
    zero = [0.0, 0.0, 0.0, 0.0]
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, zero),  # zero-norm arrival, stored as zero unit
        (2, t0 + dt.timedelta(minutes=1), vec),
        (3, t0 + dt.timedelta(minutes=2), vec),  # matches 2, NOT 1
        (4, t0 + dt.timedelta(minutes=3), zero),  # zero vs zero: cosine 0
    ]
    schema = "vec_id long, ts timestamp, embedding array<float>"
    src = str(tmp_path / "vec_stream_zn")
    for row in rows:
        spark.createDataFrame([row], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    cents = spark.createDataFrame(
        [(0, [0.6, 0.8, 0.0, 0.0], 1.0)], "cid int, c_dbl array<double>, cc double"
    )
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    flagged = streaming.streaming_semantic_dedup(
        stream, cents, threshold=0.99, watermark="1 hour"
    )
    streaming.run_to_memory(flagged, "t_sem_zn", str(tmp_path / "ckpt_zn"))
    out = {r["vec_id"]: r for r in spark.table("t_sem_zn").collect()}
    assert len(out) == 4  # the zero vector is emitted, not dropped
    assert out[1]["matched_id"] is None
    assert out[3]["matched_id"] == 2  # zero member never matched anything
    assert out[4]["matched_id"] is None  # zero-vs-zero cosine is 0, not NaN
    for vid in (1, 2, 4):  # every unmatched row: cosine SQL NULL, never NaN
        c = out[vid]["cosine"]
        assert c is None, f"vec {vid}: expected NULL cosine, got {c}"
    assert out[3]["cosine"] is not None and not math.isnan(out[3]["cosine"])


def test_tuned_stream_confs_sets_and_restores_scope(spark):
    """tuned_stream_confs sets exactly the two documented confs on the
    session: state partitions (frozen into a checkpoint at first start)
    and the no-data micro-batch toggle (must stay ON for emit-on-timeout
    operators — callers opt in per run)."""
    before_parts = spark.conf.get("spark.sql.shuffle.partitions")
    before_nodata = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", "true"
    )
    try:
        streaming.tuned_stream_confs(spark)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "16"
        assert (
            spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
            == "false"
        )
        streaming.tuned_stream_confs(
            spark, state_partitions=8, skip_no_data_batches=False
        )
        assert spark.conf.get("spark.sql.shuffle.partitions") == "8"
        # skip_no_data_batches=False must NOT flip the toggle back on a
        # session where a previous caller disabled it explicitly — it just
        # declines to touch it.
        assert (
            spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
            == "false"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before_parts)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", before_nodata
        )


# --- streaming maintenance of the at-rest dedup indexes ----------------------


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stream_index_maintenance_simhash_flags_every_pair_once(spark, tmp_path):
    """End-to-end over a 3-file stream (one file per micro-batch): the union
    of all batches' flag partitions equals the batch pair query over the
    full corpus — every near-dup pair flagged exactly once, in the batch
    where its later member arrived."""
    from pyspark.sql import types as T

    from stock_etl_pipeline_spark.operators.dedup import simhash128_near_dup_pairs

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    batches = [
        [(1, base), (2, base + " tail"), (3, "unrelated words about gardening here")],
        [(10, base), (11, "other content entirely about motorsport races")],
        [(20, base + " tail"), (21, "unrelated words about gardening here")],
    ]
    src = str(tmp_path / "docs_src")
    for rows in batches:
        _docs_df(spark, rows).coalesce(1).write.mode("append").parquet(src)
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    idx, flags = str(tmp_path / "sim_idx"), str(tmp_path / "sim_flags")
    q = streaming.stream_index_maintenance(
        stream, idx, flags, str(tmp_path / "ckpt_sim"), family="simhash"
    ).start()
    q.awaitTermination(120)

    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in spark.read.parquet(flags).collect()
    }
    corpus = _docs_df(spark, [r for b in batches for r in b])
    want = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash128_near_dup_pairs(corpus).collect()
    }
    assert got == want and got  # non-empty: the base family pairs up
    # index tree holds one signature row per ingested doc, batch-partitioned
    tree = spark.read.parquet(idx)
    assert tree.count() == 7
    assert sorted(tree.select("ingest_batch").distinct().toPandas()["ingest_batch"]) == [0, 1, 2]


def test_index_maintenance_replay_idempotent_minhash(spark, tmp_path):
    """Driving batches directly: flags across batches equal the batch LSH
    query over the union, and REPLAYING a batch (same id) leaves both the
    index tree and the flag tree value-identical — the crash-recovery
    contract foreachBatch relies on."""
    from stock_etl_pipeline_spark.operators.dedup import minhash_lsh_pairs
    from stock_etl_pipeline_spark.streaming import index_maintenance_batch

    base = (
        "the quick brown fox jumps over the lazy dog while seven wizards "
        "brew strong potions beneath ancient oak trees near the river"
    )
    b0 = [(1, base), (2, base.replace("river", "canyon")), (3, "unrelated text about economics")]
    b1 = [(10, base), (11, "fresh content with no relatives anywhere")]
    idx, flags = str(tmp_path / "mh_idx"), str(tmp_path / "mh_flags")
    index_maintenance_batch(idx, flags, _docs_df(spark, b0), 0, family="minhash")
    index_maintenance_batch(idx, flags, _docs_df(spark, b1), 1, family="minhash")

    def tree_values(path):
        return sorted(map(repr, spark.read.parquet(path).collect()))

    flags_before, idx_before = tree_values(flags), tree_values(idx)

    got = {
        (r["doc_a"], r["doc_b"], r["n_a"], r["n_b"], r["inter"], round(r["jaccard"], 9))
        for r in spark.read.parquet(flags).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"], r["n_a"], r["n_b"], r["inter"], round(r["jaccard"], 9))
        for r in minhash_lsh_pairs(
            _docs_df(spark, b0 + b1), num_hashes=20, bands=4, threshold=0.7,
            est_min_matches=10,
        ).collect()
    }
    assert got == want and got

    # replay the LAST batch (what a crash before checkpoint commit causes)
    index_maintenance_batch(idx, flags, _docs_df(spark, b1), 1, family="minhash")
    assert tree_values(flags) == flags_before
    assert tree_values(idx) == idx_before


def test_index_maintenance_exact_keeper_semantics(spark, tmp_path):
    """Exact family: per-batch verdicts match the prefix union's hash-groupBy
    (keeper = min id ingested so far), including a later batch whose id
    undercuts an indexed keeper — and replay leaves the trees unchanged."""
    from stock_etl_pipeline_spark.streaming import index_maintenance_batch

    b0 = [(10, "alpha  beta"), (11, "ALPHA BETA"), (12, "something else")]
    b1 = [(5, "Alpha\tBeta"), (30, "something  ELSE"), (31, "novel text")]
    idx, flags = str(tmp_path / "ex_idx"), str(tmp_path / "ex_flags")
    index_maintenance_batch(idx, flags, _docs_df(spark, b0), 0, family="exact")
    index_maintenance_batch(idx, flags, _docs_df(spark, b1), 1, family="exact")

    out = {
        r["doc_id"]: (r["keeper_doc_id"], r["is_dup"])
        for r in spark.read.parquet(flags).collect()
    }
    # batch 0: 10 keeps (min of {10, 11}); 11 dups it; 12 keeps
    assert out[10] == (10, False) and out[11] == (10, True) and out[12] == (12, False)
    # batch 1: 5 undercuts indexed keeper 10 -> keeps itself (verdicts are
    # as-of ingest; batch-0 verdicts are not rewritten); 30 dups 12
    assert out[5] == (5, False) and out[30] == (12, True) and out[31] == (31, False)

    before = sorted(map(repr, spark.read.parquet(idx).collect()))
    index_maintenance_batch(idx, flags, _docs_df(spark, b1), 1, family="exact")
    assert sorted(map(repr, spark.read.parquet(idx).collect())) == before


def test_stream_index_maintenance_minhash_geometry_plumbing(spark, tmp_path):
    """End-to-end through the writer for the minhash family with
    NON-default frozen geometry: kwargs must reach every micro-batch's
    signature/band/verify stages, and the flags union must equal the batch
    LSH query at that same geometry."""
    from pyspark.sql import types as T

    from stock_etl_pipeline_spark.operators.dedup import minhash_lsh_pairs

    base = (
        "one two three four five six seven eight nine ten eleven twelve "
        "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    )
    batches = [
        [(1, base), (2, "unrelated filler content with many different words here")],
        [(10, base.replace("twenty", "thirty")), (11, base)],
    ]
    src = str(tmp_path / "docs_src_mh")
    for rows in batches:
        _docs_df(spark, rows).coalesce(1).write.mode("append").parquet(src)
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    idx, flags = str(tmp_path / "mh_idx2"), str(tmp_path / "mh_flags2")
    geom = dict(num_hashes=16, bands=4, threshold=0.6, est_min_matches=8)
    q = streaming.stream_index_maintenance(
        stream, idx, flags, str(tmp_path / "ckpt_mh"), family="minhash", **geom
    ).start()
    q.awaitTermination(120)

    def pk(df):
        return {(r["doc_a"], r["doc_b"], r["inter"]) for r in df.collect()}

    got = pk(spark.read.parquet(flags))
    corpus = _docs_df(spark, [r for b in batches for r in b])
    want = pk(minhash_lsh_pairs(corpus, shingle_n=3, **geom))
    assert got == want and got


def test_index_maintenance_epoch_namespace(spark, tmp_path):
    """Batch ids restart at 0 per checkpoint: a successor stream (new
    epoch) writing batch 0 must land BESIDE the first epoch's batch 0 —
    not over it — and must near-dup-check against everything the first
    epoch ingested."""
    from stock_etl_pipeline_spark.streaming import index_maintenance_batch

    idx, flags = str(tmp_path / "ep_idx"), str(tmp_path / "ep_flags")
    b_e1 = [(1, "alpha beta gamma delta epsilon zeta"), (2, "other words here")]
    b_e2 = [(10, "alpha beta gamma delta epsilon zeta")]  # dup of doc 1
    index_maintenance_batch(idx, flags, _docs_df(spark, b_e1), 0,
                            family="exact", epoch="aaa")
    index_maintenance_batch(idx, flags, _docs_df(spark, b_e2), 0,
                            family="exact", epoch="bbb")

    tree = spark.read.parquet(idx)
    assert tree.count() == 3  # 2 fingerprints from e1 + 1 delta from e2
    assert {(r["epoch"], r["ingest_batch"]) for r in
            tree.select("epoch", "ingest_batch").distinct().collect()} == {
        ("aaa", 0), ("bbb", 0)}
    out = {r["doc_id"]: (r["keeper_doc_id"], r["is_dup"])
           for r in spark.read.parquet(flags).collect()}
    assert out[10] == (1, True)  # the new epoch saw the old epoch's keeper


def test_checkpoint_epoch_respelling_stable(tmp_path):
    """Respelled paths to the SAME checkpoint must share an epoch (replay
    self-exclusion depends on it — ADVICE r10), the value must start with
    a letter (string partition inference), and different checkpoints must
    not collide."""
    import os

    from stock_etl_pipeline_spark.streaming.pipeline import _checkpoint_epoch

    cp = tmp_path / "cp"
    cp.mkdir()
    link = tmp_path / "cp_link"
    os.symlink(cp, link)
    spellings = [str(cp), str(cp) + "/", str(cp) + "/.", str(link)]
    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        spellings.append("cp")  # relative spelling
        epochs = {_checkpoint_epoch(s) for s in spellings}
    finally:
        os.chdir(cwd)
    assert len(epochs) == 1, epochs
    e = epochs.pop()
    assert e[0] == "e" and len(e) == 13
    assert _checkpoint_epoch(str(tmp_path / "other")) != e


def test_legacy_epochs_cover_respelled_checkpoints(tmp_path):
    """ADVICE r11: the implicit legacy set only hashes the CURRENT
    spelling and its realpath. When the operator respells the checkpoint
    at the same restart that picks up the realpath upgrade, the
    pre-upgrade remnant lives under md5(old spelling) — it must be
    coverable via legacy_checkpoint_spellings."""
    import hashlib
    import os

    from stock_etl_pipeline_spark.streaming.pipeline import _legacy_epochs

    cp = tmp_path / "cp"
    cp.mkdir()
    old_spelling = "cp"  # the relative spelling previous runs used
    old_hash = hashlib.md5(old_spelling.encode()).hexdigest()[:12]

    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        # restart respelled to absolute: implicit set misses the remnant
        assert old_hash not in _legacy_epochs(str(cp))
        # the explicit spelling closes the hole (deduped, order-stable)
        covered = _legacy_epochs(str(cp), (old_spelling,))
        assert old_hash in covered
        assert len(covered) == len(set(covered))
        # same-spelling restart needs nothing: implicit set covers it
        assert old_hash in _legacy_epochs(old_spelling)
    finally:
        os.chdir(cwd)


def test_index_maintenance_legacy_epoch_replay_not_doubled(spark, tmp_path):
    """Upgrade safety (code-review r11): a batch written under the OLD
    epoch scheme (bare 12-hex md5 of the raw checkpoint path) and then
    replayed under the NEW scheme ('e'+md5(realpath)) must self-exclude
    AND retire the old remnant — otherwise its docs live in the tree
    twice and flag against themselves."""
    import hashlib

    from stock_etl_pipeline_spark.streaming import index_maintenance_batch
    from stock_etl_pipeline_spark.streaming.pipeline import _checkpoint_epoch

    cp = str(tmp_path / "cp")
    old_epoch = hashlib.md5(cp.encode()).hexdigest()[:12]
    new_epoch = _checkpoint_epoch(cp)
    idx, flags = str(tmp_path / "idx"), str(tmp_path / "flags")
    batch = _docs_df(spark, [(1, "a b c"), (2, "x y z")])

    # the pre-upgrade run wrote batch 0 under the old spelling
    index_maintenance_batch(idx, flags, batch, 0, family="exact",
                            epoch=old_epoch)
    # post-upgrade replay of the SAME batch id under the new epoch,
    # carrying the legacy spellings like stream_index_maintenance does
    index_maintenance_batch(idx, flags, batch, 0, family="exact",
                            epoch=new_epoch, legacy_epochs=(old_epoch,))

    tree = spark.read.option("basePath", idx).parquet(idx)
    assert {str(r["epoch"]) for r in
            tree.select("epoch").distinct().collect()} == {new_epoch}
    assert tree.count() == 2  # one delta row per distinct fingerprint, once
    out = {r["doc_id"]: r["is_dup"]
           for r in spark.read.parquet(flags).collect()}
    assert out == {1: False, 2: False}  # no self-duplicate flags

    # a later batch still sees the (single) retired-and-replaced state
    index_maintenance_batch(idx, flags, _docs_df(spark, [(9, "a  b c")]),
                            1, family="exact", epoch=new_epoch,
                            legacy_epochs=(old_epoch,))
    out2 = {r["doc_id"]: (r["keeper_doc_id"], r["is_dup"])
            for r in spark.read.parquet(flags).collect()}
    assert out2[9] == (1, True)


def test_index_tree_compact_preserves_results(spark, tmp_path):
    """Folding epochs/batches into one partition preserves every reader's
    view (the tree is a bag of signature/delta rows), and maintenance
    continues cleanly against the compacted tree under a fresh epoch."""
    from stock_etl_pipeline_spark.streaming import (
        index_maintenance_batch,
        index_tree_compact,
    )

    idx, flags = str(tmp_path / "cp_idx"), str(tmp_path / "cp_flags")
    index_maintenance_batch(idx, flags, _docs_df(spark, [(1, "a b c"), (2, "x y z")]),
                            0, family="exact", epoch="aaa")
    index_maintenance_batch(idx, flags, _docs_df(spark, [(3, "A  B C")]),
                            1, family="exact", epoch="aaa")
    before = sorted(map(repr, spark.read.parquet(idx)
                        .drop("epoch", "ingest_batch").collect()))
    import pytest

    # the quiesce guard sees writes moments old and refuses without force
    with pytest.raises(RuntimeError, match="quiesce"):
        index_tree_compact(spark, idx, n_files=1)
    rep = index_tree_compact(spark, idx, n_files=1, force=True)
    assert rep["partitions_folded"] == 2 and rep["rows"] == len(before)
    after_tree = spark.read.parquet(idx)
    assert {(r["epoch"], r["ingest_batch"]) for r in
            after_tree.select("epoch", "ingest_batch").distinct().collect()} == {
        ("compacted0", 0)}
    assert sorted(map(repr, after_tree.drop("epoch", "ingest_batch").collect())) == before

    # maintenance continues: new doc 0 undercuts keeper 1 for its own group,
    # dup of compacted doc 1's fingerprint is still detected
    index_maintenance_batch(idx, flags, _docs_df(spark, [(9, "a  b c")]),
                            0, family="exact", epoch="bbb")
    out = {r["doc_id"]: (r["keeper_doc_id"], r["is_dup"])
           for r in spark.read.parquet(flags).collect()}
    assert out[9] == (1, True)


def test_index_tree_compact_quiesce_guard_sees_uri_paths(spark, tmp_path):
    """The quiesce mtime guard must see files through a Spark-style
    ``file:`` URI spelling (the r11 os.walk guard saw no entries for URIs
    — newest stayed None and the call always refused even on an idle
    tree, ADVICE r11). Fresh writes under a URI spelling must REFUSE with
    a real age (not <unknown>); an aged tree must compact without force."""
    import os
    import time

    import pytest

    from stock_etl_pipeline_spark.streaming import (
        index_maintenance_batch,
        index_tree_compact,
    )

    idx, flags = str(tmp_path / "uri_idx"), str(tmp_path / "uri_flags")
    index_maintenance_batch(idx, flags, _docs_df(spark, [(1, "a b c")]),
                            0, family="exact", epoch="aaa")
    uri = "file:" + idx
    # guard SEES the fresh writes through the URI: refuses with a real age
    with pytest.raises(RuntimeError, match="quiesce") as ei:
        index_tree_compact(spark, uri, n_files=1)
    assert "<unknown>" not in str(ei.value)
    # age the tree's files past the window: compacts with NO force
    past = time.time() - 120
    for root, _dirs, files in os.walk(idx):
        for fn in files:
            os.utime(os.path.join(root, fn), (past, past))
    rep = index_tree_compact(spark, uri, n_files=1, quiesce_seconds=60)
    assert rep["partitions_folded"] == 1 and rep["rows"] == 1


def test_stream_acid_merge_maintenance_under_load(spark, events_dir, tmp_path):
    """Retention under a live stream (round 12): with vacuum_every /
    compact_every set, maintenance runs INTERLEAVED with commits (inside
    foreachBatch, which serializes them — the single-maintainer contract
    holds by construction). After the run: content equals the plain batch
    MERGE, the marker count is bounded by the retention window instead of
    growing one-per-batch, the manifest's small-file tail is folded, and
    the current snapshot reads intact at every point."""
    from stock_etl_pipeline_spark.sinks import acid

    stream = streaming.read_events_stream(
        spark, events_dir, max_files_per_trigger=1  # force 4 micro-batches
    )
    table = str(tmp_path / "acid_maint")
    q = streaming.stream_acid_merge(
        stream, table, keys=["event_id"],
        checkpoint_dir=str(tmp_path / "ckpt_maint"),
        file_cow=True,
        vacuum_every=2, vacuum_keep=2,
        compact_every=2, compact_target_rows=1_000_000,
    ).start()
    q.awaitTermination(120)

    total = load_table(spark, SF, "events").count()
    out = acid.acid_read(spark, table)
    assert out.count() == total
    assert out.groupBy("event_id").count().filter("count > 1").count() == 0

    # vacuum ran mid-stream: markers bounded by the retention window, not
    # one per batch (4 merge + >=1 compact commits happened)
    markers = acid._marker_ordinals(spark, table)
    hist = acid.acid_history(spark, table)
    assert len(hist) <= 3  # keep=2 plus at most the newest commit
    assert len(markers) == len(hist)
    ops = [h["operation"] for h in hist]
    assert acid._current_ordinal(spark, table) >= 5, ops

    # compaction ran mid-stream: the live manifest's file tail is folded
    # (4 per-batch inserts would otherwise leave >=4 entries)
    man = acid._manifest(spark, table, acid._current_ordinal(spark, table))
    assert man is not None
    assert sum(s["rows"] for s in man["files"].values()) == total

    # the maintained table keeps merging: one more upsert batch (typed
    # exactly as the pinned schema — a string-typed key against the
    # bigint pin now fails loudly per the r12 conformance fix)
    up = acid.acid_read(spark, table).limit(1)
    acid.acid_merge_upsert(spark, table, up, ["event_id"], file_cow=True)
    assert acid.acid_read(spark, table).count() == total


def test_stream_acid_merge_exactly_once_replay_skip(spark, events_dir, tmp_path):
    """exactly_once=True: commits record (query-id epoch, batch_id). A
    crash-before-checkpoint-commit restart (same checkpoint state, last
    commit record removed — Spark re-runs that batch with the SAME id)
    is SKIPPED from the commit log: zero new snapshots, identical
    content. A WIPED checkpoint gets a fresh query id — batch numbering
    restarts over a possibly-different file assignment, so those batches
    must NOT be skipped (a path-derived epoch would silently drop new
    data); they fall back to the value-idempotent re-merge."""
    import os
    import shutil

    from stock_etl_pipeline_spark.sinks import acid

    table = str(tmp_path / "acid_eo")
    ckpt = str(tmp_path / "ckpt_eo")

    def run(cp):
        stream = streaming.read_events_stream(
            spark, events_dir, max_files_per_trigger=2
        )
        q = streaming.stream_acid_merge(
            stream, table, keys=["event_id"], checkpoint_dir=cp,
            file_cow=True, exactly_once=True,
        ).start()
        q.awaitTermination(120)
        q.stop()  # release the checkpoint before the same-path restart
        q.awaitTermination(30)

    run(ckpt)
    total = load_table(spark, SF, "events").count()
    assert acid.acid_read(spark, table).count() == total
    hist = acid.acid_history(spark, table)
    assert len(hist) == 2  # 4 files / maxFilesPerTrigger=2
    assert all(h["epoch"].startswith("q") and "batch_id" in h for h in hist)
    before = sorted(map(repr, acid.acid_read(spark, table).collect()))

    # crash between table commit and checkpoint commit: remove the LAST
    # checkpoint commit record — the restart re-offers that batch with the
    # same id under the same query-id epoch, and the skip fires
    last = max(
        n for n in os.listdir(f"{ckpt}/commits") if not n.startswith(".")
    )
    os.remove(f"{ckpt}/commits/{last}")
    crc = f"{ckpt}/commits/.{last}.crc"  # RawLocalFileSystem checksum sidecar
    if os.path.exists(crc):
        os.remove(crc)
    run(ckpt)
    assert len(acid.acid_history(spark, table)) == len(hist)  # skipped
    assert sorted(map(repr, acid.acid_read(spark, table).collect())) == before

    # a WIPED checkpoint is a NEW query id: batches re-merge (extra
    # snapshots, same values) — never skipped on stale batch ids
    shutil.rmtree(ckpt)
    run(ckpt)
    assert len(acid.acid_history(spark, table)) > len(hist)
    assert sorted(map(repr, acid.acid_read(spark, table).collect())) == before


def test_stream_acid_merge_exactly_once_stale_writer_restart(
    spark, events_dir, tmp_path
):
    """The ADVICE-r12 hole: ONE writer object, .start()ed again after its
    checkpoint is wiped. The closure's high-water mark was filled under
    the first epoch; the wiped checkpoint restarts batch ids at 0 under a
    NEW query id, so carrying the stale mark forward would make
    ``batch_id <= done`` true for every new batch and silently drop them
    all. The mark must be re-derived when the observed epoch changes —
    the restart must re-merge (value-idempotent), never skip."""
    import shutil

    from stock_etl_pipeline_spark.sinks import acid

    table = str(tmp_path / "acid_eo_stale")
    ckpt = str(tmp_path / "ckpt_eo_stale")
    stream = streaming.read_events_stream(
        spark, events_dir, max_files_per_trigger=2
    )
    writer = streaming.stream_acid_merge(  # built ONCE, reused across runs
        stream, table, keys=["event_id"], checkpoint_dir=ckpt,
        file_cow=True, exactly_once=True,
    )

    def run():
        q = writer.start()
        q.awaitTermination(120)
        q.stop()
        q.awaitTermination(30)

    run()
    n_commits = len(acid.acid_history(spark, table))
    assert n_commits >= 1
    before = sorted(map(repr, acid.acid_read(spark, table).collect()))
    epoch_first = acid.acid_history(spark, table)[-1]["epoch"]

    shutil.rmtree(ckpt)  # new epoch, batch ids restart at 0 — SAME writer
    run()
    hist = acid.acid_history(spark, table)
    # every re-offered batch must have re-merged under the fresh epoch
    fresh = [h for h in hist if h.get("epoch") not in (None, epoch_first)]
    assert len(hist) > n_commits, "stale high-water mark skipped new batches"
    assert len(fresh) == n_commits
    assert sorted(map(repr, acid.acid_read(spark, table).collect())) == before


def test_stream_acid_merge_epoch_rederive_is_atomic(
    spark, events_dir, tmp_path, monkeypatch
):
    """Code-review r13: the epoch switch must derive the new high-water
    mark BEFORE assigning state — if the history scan throws mid-switch,
    a half-updated state (new epoch recorded, previous epoch's mark
    retained) would make ``batch_id <= done`` true for the retried
    batches and silently drop them. Injected: the first acid_history
    call under the new epoch fails; the retry run must re-merge every
    re-offered batch under the fresh epoch."""
    import shutil as _sh

    from stock_etl_pipeline_spark.sinks import acid

    real_history = acid.acid_history
    fail = {"n": 0}

    def flaky(spark_, table_, backend=None):
        if fail["n"] > 0:
            fail["n"] -= 1
            raise RuntimeError("injected transient listing failure")
        return real_history(spark_, table_, backend=backend)

    # patch BEFORE the writer is built: stream_acid_merge binds
    # acid_history at build time via a function-scope import
    monkeypatch.setattr(acid, "acid_history", flaky)

    table = str(tmp_path / "acid_eo_atomic")
    ckpt = str(tmp_path / "ckpt_eo_atomic")
    stream = streaming.read_events_stream(
        spark, events_dir, max_files_per_trigger=2
    )
    writer = streaming.stream_acid_merge(
        stream, table, keys=["event_id"], checkpoint_dir=ckpt,
        file_cow=True, exactly_once=True,
    )

    def run(expect_fail=False):
        q = writer.start()
        try:
            q.awaitTermination(120)
        except Exception:
            assert expect_fail, "unexpected streaming failure"
        finally:
            q.stop()
            try:
                q.awaitTermination(30)
            except Exception:
                # a failed query re-raises its exception on every await
                assert expect_fail, "unexpected streaming failure"
        if expect_fail:
            assert q.exception() is not None

    run()
    n_commits = len(real_history(spark, table))
    assert n_commits >= 1
    before = sorted(map(repr, acid.acid_read(spark, table).collect()))
    epoch_first = real_history(spark, table)[-1]["epoch"]

    _sh.rmtree(ckpt)  # new epoch; batch ids restart at 0 — SAME writer
    fail["n"] = 1  # first history scan under the new epoch throws
    run(expect_fail=True)
    assert fail["n"] == 0  # the injected failure actually fired

    run()  # retry over the same (new) checkpoint: same epoch, ids re-offered
    hist = real_history(spark, table)
    fresh = [h for h in hist if h.get("epoch") not in (None, epoch_first)]
    assert len(fresh) == n_commits, (
        "half-updated epoch state skipped the retried batches"
    )
    assert sorted(map(repr, acid.acid_read(spark, table).collect())) == before


def test_stream_acid_merge_schema_evolution_mid_stream(spark, tmp_path):
    """allow_new_columns threaded through stream_acid_merge (VERDICT r12
    item 3): a widening batch arriving mid-table-life evolves the pinned
    manifest schema ONCE (nullable; untouched carried-forward files read
    NULL), later wide batches re-use the evolved schema, pre-evolution
    snapshots time-travel with their at-commit schema, and an
    exactly-once replay of the widening stream adds no duplicate
    snapshot."""
    import os

    from stock_etl_pipeline_spark.sinks import acid

    narrow_dir = str(tmp_path / "narrow")
    wide_dir = str(tmp_path / "wide")
    for i in (0, 1):
        spark.createDataFrame(
            [(i * 10 + j, f"v{i * 10 + j}") for j in range(3)],
            "k long, v string",
        ).coalesce(1).write.mode("append").parquet(narrow_dir)
    # wide files: one updates an existing key, one inserts new keys
    spark.createDataFrame(
        [(0, "V0", 0.5)], "k long, v string, w double"
    ).coalesce(1).write.mode("append").parquet(wide_dir)
    spark.createDataFrame(
        [(100, "new", 1.5)], "k long, v string, w double"
    ).coalesce(1).write.mode("append").parquet(wide_dir)

    table = str(tmp_path / "acid_ev_stream")
    ckpt1, ckpt2 = str(tmp_path / "ck1"), str(tmp_path / "ck2")

    def run(writer):
        q = writer.start()
        q.awaitTermination(120)
        q.stop()
        q.awaitTermination(30)

    narrow = spark.readStream.schema("k long, v string").option(
        "maxFilesPerTrigger", 1
    ).parquet(narrow_dir)
    run(streaming.stream_acid_merge(
        narrow, table, keys=["k"], checkpoint_dir=ckpt1,
        file_cow=True, exactly_once=True,
    ))
    pre_ord = acid._current_ordinal(spark, table)
    assert acid.acid_read(spark, table).columns == ["k", "v"]

    wide = spark.readStream.schema("k long, v string, w double").option(
        "maxFilesPerTrigger", 1
    ).parquet(wide_dir)
    writer2 = streaming.stream_acid_merge(
        wide, table, keys=["k"], checkpoint_dir=ckpt2,
        file_cow=True, allow_new_columns=True, exactly_once=True,
    )
    run(writer2)

    got = acid.acid_read(spark, table)
    assert got.columns == ["k", "v", "w"]
    by_k = {r["k"]: (r["v"], r["w"]) for r in got.collect()}
    assert by_k[0] == ("V0", 0.5) and by_k[100] == ("new", 1.5)
    assert by_k[1] == ("v1", None)  # untouched rows read NULL through w

    # the pinned schema widened ONCE: both wide commits carry the SAME
    # schema json, with w appearing exactly once
    hist = acid.acid_history(spark, table)
    wide_ords = [h["ordinal"] for h in hist if h["ordinal"] > pre_ord]
    assert len(wide_ords) == 2
    schemas = [acid._manifest(spark, table, o)["schema"] for o in wide_ords]
    assert schemas[0] == schemas[1]
    assert schemas[0].count('"w"') == 1

    # time travel: pre-evolution snapshots keep their at-commit schema
    assert acid.acid_read(spark, table, ordinal=pre_ord).columns == ["k", "v"]

    # exactly-once replay of the WIDENING stream: remove the last
    # checkpoint commit record — the re-offered batch is skipped from the
    # commit log (no new snapshot), content identical
    before = sorted(map(repr, got.collect()))
    n_before = len(acid.acid_history(spark, table))
    last = max(
        n for n in os.listdir(f"{ckpt2}/commits") if not n.startswith(".")
    )
    os.remove(f"{ckpt2}/commits/{last}")
    crc = f"{ckpt2}/commits/.{last}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    run(writer2)
    assert len(acid.acid_history(spark, table)) == n_before
    assert sorted(map(repr, acid.acid_read(spark, table).collect())) == before


def test_stream_maintenance_skips_benignly_when_lease_held(
    spark, events_dir, tmp_path
):
    """VERDICT r12 item 8, the racing-maintainer outcome as pinned
    behavior: while an OUT-OF-BAND maintainer holds the table's lease,
    the stream's every-batch maintenance cadence SKIPS (merge commits
    keep landing — the lease never blocks committers, only maintainers),
    so no compact/vacuum commit appears and markers accumulate one per
    batch. After the lease is released, a second stream run's cadence
    maintains again: history ops include compact and the marker count
    collapses to the retention window."""
    from stock_etl_pipeline_spark.sinks import acid

    table = str(tmp_path / "acid_lease_stream")

    def run(ckpt):
        stream = streaming.read_events_stream(
            spark, events_dir, max_files_per_trigger=1  # 4 micro-batches
        )
        q = streaming.stream_acid_merge(
            stream, table, keys=["event_id"], checkpoint_dir=ckpt,
            file_cow=True,
            vacuum_every=1, vacuum_keep=2,
            compact_every=1, compact_target_rows=1_000_000,
        ).start()
        q.awaitTermination(120)
        q.stop()
        q.awaitTermination(30)

    token = acid.acid_acquire_maintenance(spark, table)
    run(str(tmp_path / "ck_held"))
    hist = acid.acid_history(spark, table)
    ops = [h["operation"] for h in hist]
    assert ops and all(op == "merge" for op in ops)  # cadence skipped
    assert len(acid._marker_ordinals(spark, table)) == 4  # one per batch
    total = load_table(spark, SF, "events").count()
    assert acid.acid_read(spark, table).count() == total  # commits landed

    acid.acid_release_maintenance(spark, table, token)
    files_before = len(
        acid._manifest(spark, table, acid._current_ordinal(spark, table))["files"]
    )
    run(str(tmp_path / "ck_free"))  # re-offers all 4 batches (new ckpt)
    # cadence maintains again — the evidence is PHYSICAL (retention erases
    # the compact commits from history by design: vacuum_keep=2): the
    # marker count collapsed to the retention window instead of growing by
    # 8+ commits, the small-file tail folded, and the lease is free again
    assert len(acid._marker_ordinals(spark, table)) <= 3
    files_after = len(
        acid._manifest(spark, table, acid._current_ordinal(spark, table))["files"]
    )
    assert files_after < files_before
    assert acid.acid_read(spark, table).count() == total
    acid.acid_release_maintenance(
        spark, table, acid.acid_acquire_maintenance(spark, table)
    )
