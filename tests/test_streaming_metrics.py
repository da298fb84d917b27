"""Watermark-lateness observability: observed per-batch metrics, dropped-
late-row counters, and the freshness-gate report contract
(streaming/metrics.py)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from stock_etl_pipeline_spark import streaming
from stock_etl_pipeline_spark.datasets import load_table

SF = "/root/testdata/sf0.001"


# --- pure fold over synthetic progress dicts (no Spark) ----------------------


def _progress(n_rows, min_ts, max_ts, dropped=0, watermark=None):
    return {
        "observedMetrics": {
            "freshness": {
                "n_rows": n_rows,
                "min_event_ts": min_ts,
                "max_event_ts": max_ts,
            }
        },
        "stateOperators": [{"numRowsDroppedByWatermark": dropped}],
        "eventTime": {"watermark": watermark},
    }


def test_report_folds_batches_and_flags_lateness():
    passed, rep = streaming.freshness_report(
        [
            _progress(100, "2024-01-01T00:00:00Z", "2024-01-02T00:00:00Z"),
            _progress(
                50,
                "2024-01-01T12:00:00Z",
                "2024-01-03T00:00:00Z",
                dropped=7,
                watermark="2024-01-02T22:00:00Z",
            ),
        ],
        as_of="2024-01-03 01:00:00",
        max_behind_s=7200,
    )
    assert passed  # only 1h behind; lateness is a warning, not an error
    m = rep["metrics"]
    assert m["n_rows"] == 150
    assert m["rows_dropped_late"] == 7
    assert m["max_event_ts"] == "2024-01-03T00:00:00"
    assert m["min_event_ts"] == "2024-01-01T00:00:00"
    assert m["watermark"] == "2024-01-02T22:00:00"
    assert m["seconds_behind"] == 3600
    assert rep["warnings"] and "7 rows dropped" in rep["warnings"][0]


def test_report_staleness_gate_errors():
    passed, rep = streaming.freshness_report(
        [_progress(10, "2024-01-01T00:00:00Z", "2024-01-01T00:00:00Z")],
        as_of="2024-01-08 00:00:00",
        max_behind_s=86400,
    )
    assert not passed
    assert "behind" in rep["errors"][0]


def test_report_empty_stream_errors():
    passed, rep = streaming.freshness_report([])
    assert not passed
    assert rep["metrics"]["n_rows"] == 0


# --- live stream: late batch dropped by the watermark ------------------------


def _late_batch_source(spark, tmp_path):
    """File source where the LAST batch is weeks older than the watermark.

    Three files, not two: Spark's late-event filter uses the watermark in
    effect BEFORE the batch that advances it (one-batch lag — measured on
    this Spark version: a late batch right after the advancing batch passes
    through with the initial 1970 watermark). Batch 0 advances the watermark,
    batch 1 lets it take effect, batch 2's ancient rows then hit the filter.
    """
    src = str(tmp_path / "late_src")
    e = load_table(spark, SF, "events")
    e.orderBy(F.col("ts").desc()).limit(100).coalesce(1).write.parquet(src)
    time.sleep(1.1)  # file-source processes oldest mod-time first
    e.orderBy(F.col("ts").desc()).limit(120).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    e.orderBy("ts").limit(100).coalesce(1).write.mode("append").parquet(src)
    return src, 100 + 120 + 100


def test_stream_counts_dropped_late_rows(spark, tmp_path):
    src, n_arrivals = _late_batch_source(spark, tmp_path)
    stream = streaming.read_events_stream(spark, src, max_files_per_trigger=1)
    agg = streaming.tumbling_event_counts(
        streaming.observe_freshness(stream), watermark="1 hour"
    )
    q = streaming.run_to_memory(agg, "t_late", str(tmp_path / "ckpt_late"))
    passed, rep = streaming.freshness_report(q.recentProgress, max_dropped_late=0)
    m = rep["metrics"]
    # observe sees every ARRIVED row (it sits upstream of the state store) …
    assert m["n_rows"] == n_arrivals
    # … but the ancient batch falls behind the settled watermark and is
    # dropped at the state operator, which the report surfaces.
    assert m["rows_dropped_late"] > 0
    assert m["n_batches"] == 3
    assert passed  # dropped-late is a warning by default
    assert rep["warnings"] and "dropped past the watermark" in rep["warnings"][0]
    # the dropped rows never reach the sink's finalized windows
    emitted = spark.table("t_late").agg(F.sum("n_events")).collect()[0][0] or 0
    assert emitted < n_arrivals


def test_lateness_listener_live(spark, tmp_path):
    listener = streaming.lateness_listener()
    spark.streams.addListener(listener)
    try:
        src = str(tmp_path / "lsrc")
        load_table(spark, SF, "events").limit(500).coalesce(1).write.parquet(src)
        stream = streaming.read_events_stream(spark, src)
        agg = streaming.tumbling_event_counts(streaming.observe_freshness(stream))
        streaming.run_to_memory(agg, "t_listener", str(tmp_path / "ckpt_l"))
        # listener events are delivered async — poll briefly
        deadline = time.time() + 30
        while listener.fold.n_rows == 0 and time.time() < deadline:
            time.sleep(0.2)
        passed, rep = listener.report()
        assert passed
        assert rep["metrics"]["n_rows"] == 500
        assert rep["metrics"]["n_batches"] >= 1
    finally:
        spark.streams.removeListener(listener)


@pytest.mark.perf_floor
def test_streaming_neardup_warm_throughput_floor(spark, tmp_path):
    """Warm-started steady-state docs/s floor for the streaming near-dup
    operator — the CI tripwire for throughput regressions (VERDICT r7
    item 4: the stream_probe measured the steady state manually; nothing
    asserted it).

    Shape replicates ``scripts/stream_probe.py --warm-start --dup-factor``:
    a 2-doc untimed stream first (codegen + Python worker pool + state
    store init all pay there), then a timed availableNow run over a
    dup-packed corpus (4,000 docs, buckets of ~8) where the per-doc bucket
    scan — the vectorization target — dominates per-batch fixed cost.

    Floor calibration (round 8, local[4] tuned confs): measured 562 docs/s
    on the r8 host. The floor is 220 (~40%) on purpose: 40% still catches
    the regressions that matter (the round-6 fixed-cost work alone was a
    1.9x swing; losing the Arrow signature kernel or the salted CSR state
    is >2.5x) while absorbing round-scale host drift. Host robustness
    beyond the margin (ADVICE r8): the floor additionally scales by
    ``perf_floors.arrow_host_scale`` (a fixed Arrow probe measuring THIS
    run's Python-band speed, never scaling the floor up), and the whole
    assertion is ``perf_floor``-marked / env-skippable.
    ``SPARK_GRAFT_STREAM_FLOOR`` overrides the floor verbatim (no host
    scale) — set it above the measured rate to demonstrate the assert
    bites (injected slowdown).
    """
    import os

    from stock_etl_pipeline_spark.datasets import load_table as _lt

    from .perf_floors import arrow_host_scale, skip_if_perf_floors_disabled

    skip_if_perf_floors_disabled()

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    old_nodata = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", "true"
    )
    streaming.tuned_stream_confs(spark)
    try:
        base = F.to_timestamp(F.lit("2024-01-01 12:00:00"))
        dup = 8
        copies = F.array(
            *[
                F.struct(
                    (F.col("doc_id") * dup + k).alias("doc_id"),
                    (
                        F.col("text")
                        if k == 0
                        else F.concat(F.col("text"), F.lit(f" copy{k}"))
                    ).alias("text"),
                )
                for k in range(dup)
            ]
        )
        rows = (
            _lt(spark, "/root/testdata/sf0.01", "documents")
            .select("doc_id", "text")
            .select(F.explode(copies).alias("c"))
            .select("c.*")
        )
        staged = rows.select(
            "doc_id",
            (base + F.make_dt_interval(secs=F.col("doc_id").cast("double"))).alias(
                "ts"
            ),
            "text",
            (F.col("doc_id") % 2).alias("b"),
        )
        n_in = staged.count()
        src = str(tmp_path / "floor_src")
        for b in range(2):
            staged.filter(F.col("b") == b).drop("b").coalesce(1).write.mode(
                "append"
            ).parquet(src)
        wsrc = str(tmp_path / "floor_warm")
        staged.drop("b").limit(2).coalesce(1).write.parquet(wsrc)

        def mkstream(path):
            return (
                spark.readStream.schema("doc_id long, ts timestamp, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(path)
            )

        streaming.run_to_memory(
            streaming.streaming_simhash_near_dup(mkstream(wsrc), watermark="1 hour"),
            "t_floor_warm",
            str(tmp_path / "ck_warm"),
            timeout_s=300,
        )
        t0 = time.perf_counter()
        streaming.run_to_memory(
            streaming.streaming_simhash_near_dup(mkstream(src), watermark="1 hour"),
            "t_floor_main",
            str(tmp_path / "ck_main"),
            timeout_s=300,
        )
        wall = time.perf_counter() - t0
        docs_per_s = n_in / wall
        # work-integrity guard: a "fast" run that drops the bucket scan
        # (the thing the floor protects) cannot pass — the dup copies must
        # actually be flagged.
        flagged = (
            spark.table("t_floor_main")
            .filter(F.col("matched_id").isNotNull())
            .select("doc_id")
            .distinct()
            .count()
        )
        assert flagged > n_in // 2, f"near-dup flags collapsed: {flagged}/{n_in}"
        env_floor = os.environ.get("SPARK_GRAFT_STREAM_FLOOR")
        floor = (
            float(env_floor)
            if env_floor is not None
            else 220.0 * arrow_host_scale(spark)
        )
        assert docs_per_s >= floor, (
            f"streaming near-dup steady state regressed: {docs_per_s:.0f} "
            f"docs/s < floor {floor:.0f} (wall {wall:.2f}s over {n_in} docs)"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", old_nodata
        )


@pytest.mark.perf_floor
def test_streaming_semantic_dedup_warm_throughput_floor(spark, tmp_path):
    """Sibling of the near-dup floor for ``streaming_semantic_dedup``
    (VERDICT r8 item 5: the semantic stream measured 482 docs/s warm in
    round 7 but had no tripwire, so a regression in the pruned-argmin
    streaming path would only surface manually).

    Shape replicates ``scripts/stream_probe.py --operator semantic
    --warm-start --dup-factor 8``: a frozen K=8 model trained offline by
    the batch ``kmeans_exact`` on the base corpus, a 2-vector untimed
    warm stream, then a timed availableNow run over a dup-packed corpus
    (4,000 vectors, exact-clone groups of 8) where the per-cell GEMM +
    state scan dominates per-batch fixed cost. Exact clones score cosine
    1.0 against their earlier siblings, so the work-integrity guard
    (flags must not collapse) holds by construction.

    Floor calibration (round 9 host, local[4] tuned confs): measured
    627 docs/s warm (the same run measured near-dup at 509, so the two
    siblings are like-for-like); floor 200 (~32%, inside the near-dup
    margin rationale), host-scaled by the same fixed Arrow probe.
    ``SPARK_GRAFT_SEM_STREAM_FLOOR`` overrides verbatim — set it above
    the measured rate to demonstrate the assert bites (injected
    slowdown)."""
    import os

    from stock_etl_pipeline_spark.datasets import load_table as _lt
    from stock_etl_pipeline_spark.operators import similarity

    from .perf_floors import arrow_host_scale, skip_if_perf_floors_disabled

    skip_if_perf_floors_disabled()

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    old_nodata = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", "true"
    )
    streaming.tuned_stream_confs(spark)
    try:
        emb = _lt(spark, "/root/testdata/sf0.01", "embeddings").select(
            "vec_id", "embedding"
        )
        # frozen model on the BASE corpus (exact clones would not move it)
        cents = similarity.kmeans_exact(
            similarity.with_micro_vectors(emb), k_clusters=8, iters=2
        )
        base = F.to_timestamp(F.lit("2024-01-01 12:00:00"))
        dup = 8
        copies = F.array(
            *[
                F.struct(
                    (F.col("vec_id") * dup + k).alias("vec_id"),
                    F.col("embedding").alias("embedding"),
                )
                for k in range(dup)
            ]
        )
        staged = (
            emb.select(F.explode(copies).alias("c"))
            .select("c.*")
            .select(
                "vec_id",
                (
                    base + F.make_dt_interval(secs=F.col("vec_id").cast("double"))
                ).alias("ts"),
                "embedding",
                (F.col("vec_id") % 2).alias("b"),
            )
        )
        n_in = staged.count()
        src = str(tmp_path / "semfloor_src")
        for b in range(2):
            staged.filter(F.col("b") == b).drop("b").coalesce(1).write.mode(
                "append"
            ).parquet(src)
        wsrc = str(tmp_path / "semfloor_warm")
        staged.drop("b").limit(2).coalesce(1).write.parquet(wsrc)

        def mkstream(path):
            return (
                spark.readStream.schema(
                    "vec_id long, ts timestamp, embedding array<float>"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(path)
            )

        streaming.run_to_memory(
            streaming.streaming_semantic_dedup(
                mkstream(wsrc), cents, threshold=0.95, watermark="1 hour"
            ),
            "t_semfloor_warm",
            str(tmp_path / "ck_semwarm"),
            timeout_s=300,
        )
        t0 = time.perf_counter()
        streaming.run_to_memory(
            streaming.streaming_semantic_dedup(
                mkstream(src), cents, threshold=0.95, watermark="1 hour"
            ),
            "t_semfloor_main",
            str(tmp_path / "ck_semmain"),
            timeout_s=300,
        )
        wall = time.perf_counter() - t0
        docs_per_s = n_in / wall
        flagged = (
            spark.table("t_semfloor_main")
            .filter(F.col("matched_id").isNotNull())
            .select("vec_id")
            .distinct()
            .count()
        )
        assert flagged > n_in // 2, f"semantic flags collapsed: {flagged}/{n_in}"
        env_floor = os.environ.get("SPARK_GRAFT_SEM_STREAM_FLOOR")
        floor = (
            float(env_floor)
            if env_floor is not None
            else 200.0 * arrow_host_scale(spark)
        )
        assert docs_per_s >= floor, (
            f"streaming semantic dedup steady state regressed: "
            f"{docs_per_s:.0f} docs/s < floor {floor:.0f} "
            f"(wall {wall:.2f}s over {n_in} docs)"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", old_nodata
        )
