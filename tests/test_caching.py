"""Pipeline-scoped cache pool: persisted intermediates must not accumulate
across pipeline invocations in a long-lived session, and releasing them must
never change results (persist is advisory — lineage recomputes)."""

from __future__ import annotations

from stock_etl_pipeline_spark import caching


def test_begin_pipeline_releases_previous_generation(spark):
    a = caching.eager_cache(spark.range(10))
    b = caching.lazy_cache(spark.range(20))
    assert a.storageLevel.useMemory and b.storageLevel.useMemory
    caching.begin_pipeline()
    assert not a.storageLevel.useMemory
    assert not b.storageLevel.useMemory
    assert a.count() == 10  # released cache recomputes from lineage


def test_dedup_pipelines_do_not_accumulate_cached_blocks(spark):
    """Running minhash then simhash leaves at most the LAST pipeline's
    intermediates pinned — the previous generation is released at the next
    begin_pipeline()."""
    from stock_etl_pipeline_spark.operators import dedup

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again today ok"),
        (2, "the quick brown fox jumps over the lazy dog again today yes"),
        (3, "unrelated text about completely different things entirely here"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    caching.release()
    mh = dedup.minhash_lsh_pairs(d, num_hashes=12, bands=4, threshold=0.5)
    mh_result = {(r["doc_a"], r["doc_b"]) for r in mh.collect()}
    first_gen = list(caching._TRACKED)
    assert first_gen  # minhash tracked its signature relation

    dedup.simhash_near_dup_pairs(d).collect()
    assert all(not df.storageLevel.useMemory for df in first_gen)
    assert len(caching._TRACKED) == 1  # only the simhash signatures

    # Releasing under the still-lazy minhash DataFrame must not change its
    # values — the plan recomputes from lineage.
    caching.release()
    assert {(r["doc_a"], r["doc_b"]) for r in mh.collect()} == mh_result


def test_plan_only_mode_disables_cache_helpers(spark, monkeypatch):
    """SPARK_GRAFT_PLAN_ONLY=1 (bench.py's plan-fingerprint pass) must make
    both cache helpers identity functions: no persist marker (which would
    put InMemoryRelation in the optimized plan and tie the fingerprint to
    cache state), no eager fill, nothing tracked for release."""
    from stock_etl_pipeline_spark import caching

    df = spark.range(10)
    monkeypatch.setenv("SPARK_GRAFT_PLAN_ONLY", "1")
    caching.release()
    out_e = caching.eager_cache(df)
    out_l = caching.lazy_cache(df)
    assert out_e is df and out_l is df
    assert not df.storageLevel.useMemory and not df.storageLevel.useDisk
    assert caching._TRACKED == []
    monkeypatch.delenv("SPARK_GRAFT_PLAN_ONLY")
    out = caching.eager_cache(spark.range(5))
    assert out.storageLevel.useMemory  # normal mode unaffected
    caching.release()


def test_plan_only_warns_once_and_rearms(spark, monkeypatch, caplog):
    """Suppressing a persist under SPARK_GRAFT_PLAN_ONLY=1 logs ONE
    WARNING (ADVICE r9: a leaked env var must be visible in run output,
    not manifest only as mysterious slowdowns), does not repeat on the
    next suppression, and re-arms after the flag clears."""
    import logging

    from stock_etl_pipeline_spark import caching

    df = spark.range(3)
    monkeypatch.setenv("SPARK_GRAFT_PLAN_ONLY", "1")
    caching._PLAN_ONLY_WARNED = False
    with caplog.at_level(logging.WARNING, logger="stock_etl_pipeline_spark.caching"):
        caching.eager_cache(df)
        caching.lazy_cache(df)
    hits = [r for r in caplog.records if "SPARK_GRAFT_PLAN_ONLY" in r.message]
    assert len(hits) == 1

    monkeypatch.delenv("SPARK_GRAFT_PLAN_ONLY")
    caplog.clear()
    out = caching.eager_cache(spark.range(2))
    assert out.storageLevel.useMemory
    caching.release()

    monkeypatch.setenv("SPARK_GRAFT_PLAN_ONLY", "1")
    with caplog.at_level(logging.WARNING, logger="stock_etl_pipeline_spark.caching"):
        caching.lazy_cache(df)
    hits = [r for r in caplog.records if "SPARK_GRAFT_PLAN_ONLY" in r.message]
    assert len(hits) == 1  # re-armed after the clean interval
    monkeypatch.delenv("SPARK_GRAFT_PLAN_ONLY")
