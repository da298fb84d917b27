"""Deterministic sampling/splits (operators/sampling.py) and histogram
quantiles (operators/sketches.py): stability under repartitioning and
accuracy vs exact. Cross-engine equality is covered by oracle parity on
doc_train_split / price_quantile_sketch."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_etl_pipeline_spark.datasets import load_table
from stock_etl_pipeline_spark.operators import sampling, sketches
from stock_etl_pipeline_spark.workload import load_all

SF = "/root/testdata/sf0.01"


def test_sample_is_repartition_stable(spark):
    """The property df.sample cannot give: identical membership regardless
    of physical layout."""
    d = load_table(spark, SF, "documents")
    ids = lambda df: {r[0] for r in df.select("doc_id").collect()}
    s1 = ids(sampling.deterministic_sample(d.repartition(1), "doc_id", 0.3))
    s13 = ids(sampling.deterministic_sample(d.repartition(13), "doc_id", 0.3))
    assert s1 == s13
    n = d.count()
    assert 0.2 < len(s1) / n < 0.4  # ~binomial(n, 0.3)


def test_sample_fraction_monotone(spark):
    """A 10% sample is a subset of the 30% sample (nested by construction —
    same u, larger cut). Lets a pipeline grow a sample without resampling."""
    d = load_table(spark, SF, "documents")
    ids = lambda f: {
        r[0]
        for r in sampling.deterministic_sample(d, "doc_id", f).select("doc_id").collect()
    }
    assert ids(0.1) <= ids(0.3)


def test_split_partitions_corpus(spark):
    d = load_table(spark, SF, "documents")
    labeled = d.select(
        sampling.split_column("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).alias(
            "split"
        )
    )
    counts = {r["split"]: r["n"] for r in labeled.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = d.count()
    assert sum(counts.values()) == n  # total partition, no row lost
    assert 0.75 < counts["train"] / n < 0.85
    assert 0.05 < counts["val"] / n < 0.15
    assert 0.05 < counts["test"] / n < 0.15


def test_histogram_quantiles_accuracy(spark):
    out = {
        r["q"]: r
        for r in load_all()["price_quantile_sketch"].fn(spark, SF).collect()
    }
    assert set(out) == {0.5, 0.9, 0.99}
    for r in out.values():
        # value error ≤ one bucket width; on this distribution that is well
        # under 1% relative
        assert r["rel_err"] < 0.01, dict(r.asDict())
        assert r["approx_price"] >= r["exact_price"] - 1e-9  # right-edge estimate


def test_stratified_keep_deterministic_and_per_stratum(spark):
    from stock_etl_pipeline_spark.operators import sampling

    df = spark.range(4000).selectExpr(
        "id AS doc_id", "CASE WHEN id % 2 = 0 THEN 'en' ELSE 'fr' END AS lang"
    )
    kept = df.select(
        "doc_id", "lang",
        sampling.stratified_keep("doc_id", "lang", {"en": 0.5}).alias("k"),
    )
    rates = {
        r["lang"]: r["rate"]
        for r in kept.groupBy("lang")
        .agg((F.sum(F.col("k").cast("int")) / F.count("*")).alias("rate"))
        .collect()
    }
    assert rates["fr"] == 1.0                  # default keeps everything
    assert 0.4 < rates["en"] < 0.6             # ~half of en survives
    # repartition-stable
    a = sorted(map(repr, kept.collect()))
    b = sorted(map(repr, kept.repartition(13).collect()))
    assert a == b


def test_stratified_keep_independent_of_split(spark):
    """The salted hash family must decorrelate keep from split: the kept
    fraction inside 'train' must match the global kept fraction (within
    noise), not collapse to a boundary artifact."""
    from stock_etl_pipeline_spark.operators import sampling

    df = spark.range(8000).selectExpr("id AS doc_id", "'en' AS lang")
    lab = df.select(
        sampling.split_column("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).alias("split"),
        sampling.stratified_keep("doc_id", "lang", {"en": 0.5}).alias("k"),
    )
    rates = {
        r["split"]: r["rate"]
        for r in lab.groupBy("split")
        .agg((F.sum(F.col("k").cast("int")) / F.count("*")).alias("rate"))
        .collect()
    }
    for split, rate in rates.items():
        assert 0.42 < rate < 0.58, (split, rates)


def test_salted_hash_sql_twin_agrees(spark, tmp_path):
    import duckdb

    from stock_etl_pipeline_spark.operators import sampling

    p = str(tmp_path / "ids.parquet")
    spark.range(500).selectExpr("id AS doc_id").write.parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW ids AS SELECT * FROM read_parquet('{p}/*.parquet')")
    want = dict(con.execute(
        f"SELECT doc_id, {sampling.sql_hash_unit_salted('doc_id', 'strat|')} FROM ids"
    ).fetchall())
    got = {
        r["doc_id"]: r["u"]
        for r in spark.read.parquet(p)
        .select("doc_id", sampling.hash_unit_salted("doc_id", "strat|").alias("u"))
        .collect()
    }
    assert got == want


# --- sequence packing --------------------------------------------------------


def _pack_reference(rows, seq_len, shards, salt="pack"):
    """Pure-Python replay of pack_sequences' layout."""
    import hashlib

    out = {}
    by_shard = {}
    for doc_id, n in rows:
        h = hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()[:15]
        u = int(h, 16) / float(1 << 60)
        shard = int(u * shards)
        by_shard.setdefault(shard, []).append((u, doc_id, n))
    for shard, docs in by_shard.items():
        cum = 0
        for u, doc_id, n in sorted(docs):
            start = cum
            out[doc_id] = (
                shard,
                start // seq_len,
                start % seq_len,
                (start + max(n, 1) - 1) // seq_len,
            )
            cum += n
    return out


def test_pack_sequences_matches_python_reference(spark):
    from stock_etl_pipeline_spark.operators.sampling import pack_sequences

    rows = [(i, (i * 37) % 900 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (r["shard"], r["seq_id"], r["offset"], r["end_seq"])
        for r in pack_sequences(df, seq_len=512, shards=8).collect()
    }
    assert got == _pack_reference(rows, 512, 8)


def test_pack_sequences_repartition_invariant(spark):
    from stock_etl_pipeline_spark.operators.sampling import pack_sequences

    rows = [(i, (i * 13) % 300 + 1) for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    a = {tuple(r) for r in pack_sequences(df, seq_len=256, shards=4).collect()}
    b = {
        tuple(r)
        for r in pack_sequences(df.repartition(11), seq_len=256, shards=4).collect()
    }
    assert a == b


def test_pack_sequences_straddle_and_contiguity(spark):
    """Within a shard, consecutive docs tile the token stream with no gaps,
    and end_seq > seq_id exactly when a doc straddles a window boundary."""
    from stock_etl_pipeline_spark.operators.sampling import pack_sequences

    rows = [(i, 200) for i in range(60)]  # uniform 200-token docs, 512 windows
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences(df, seq_len=512, shards=3).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        rs = sorted(rs, key=lambda r: (r["seq_id"], r["offset"]))
        cum = 0
        for r in rs:
            assert r["seq_id"] * 512 + r["offset"] == cum
            straddles = (cum % 512) + 200 > 512
            assert (r["end_seq"] > r["seq_id"]) == straddles
            cum += 200


def test_pack_sequences_rejects_bad_seq_len(spark):
    import pytest

    from stock_etl_pipeline_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame([(1, 5)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(df, seq_len=0)


def test_sample_to_token_budget_matches_naive_window(spark):
    """The bucketed two-phase selection must equal the naive global ordered
    cumsum (the defining semantics) for budgets hitting every regime —
    empty, boundary inside a bucket, exact boundary, everything — including
    zero-token docs and quality ties, and at a coarse bucket count that
    forces all three of full/straddling/excluded bucket classes."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from stock_etl_pipeline_spark.operators.sampling import sample_to_token_budget

    rows = []
    for i in range(200):
        q = ((i * 37) % 101) / 100.0          # ties: 101 levels over 200 docs
        n = (i * 13) % 50                      # includes zero-token docs
        rows.append((i, n, q))
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long, quality_score double")

    w = Window.orderBy(F.col("quality_score").desc(), F.col("doc_id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    naive = df.withColumn("cum", F.sum("n_tokens").over(w))
    total = df.agg(F.sum("n_tokens")).collect()[0][0]
    boundary_cum = naive.filter(F.col("doc_id") == 57).collect()[0]["cum"]

    for budget in [0, 1, 137, 1000, boundary_cum, total, total + 10]:
        want = {
            r["doc_id"] for r in naive.filter(F.col("cum") <= budget).collect()
        }
        for buckets in (4, 1024):
            got = {
                r["doc_id"]
                for r in sample_to_token_budget(
                    df, budget, buckets=buckets
                ).collect()
            }
            assert got == want, (budget, buckets, len(got), len(want))


def test_sample_to_token_budget_degenerate_quality(spark):
    """All-equal quality collapses to one bucket (width-0 guard): selection
    is then purely by id order; empty input returns empty."""
    from stock_etl_pipeline_spark.operators.sampling import sample_to_token_budget

    df = spark.createDataFrame(
        [(i, 10, 0.5) for i in range(10)],
        "doc_id long, n_tokens long, quality_score double",
    )
    got = sorted(
        r["doc_id"] for r in sample_to_token_budget(df, 35).collect()
    )
    assert got == [0, 1, 2]  # 30 <= 35 < 40, id order
    assert sample_to_token_budget(df.limit(0), 100).count() == 0


def test_sample_to_token_budget_null_contract(spark, tmp_path):
    """NULL quality sorts last (kept only with leftover budget) and NULL
    counts contribute 0 tokens — and the DuckDB naive-window twin agrees
    row-for-row (ADVICE r10: NULL quality used to crash the bucket walk
    with a None sort key; an all-NULL-count bucket crashed the cum add).
    """
    import duckdb

    from stock_etl_pipeline_spark.operators import sampling
    from stock_etl_pipeline_spark.operators.sampling import sample_to_token_budget

    rows = [
        (1, 10, 0.9),
        (2, None, 0.8),    # NULL count: free (0 tokens)
        (3, 10, None),     # NULL quality: sorts after every real quality
        (4, 10, 0.7),
        (5, None, None),   # both NULL
        (6, 15, 0.6),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, n_tokens long, quality_score double"
    )
    p = str(tmp_path / "nulls.parquet")
    df.write.parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW docs AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    for budget in [0, 5, 10, 20, 30, 35, 40, 100]:
        want = sorted(
            r[0]
            for r in con.execute(
                sampling.sql_sample_to_token_budget(
                    "docs", budget, select="doc_id"
                )
            ).fetchall()
        )
        for buckets in (2, 1024):
            got = sorted(
                r["doc_id"]
                for r in sample_to_token_budget(
                    df, budget, buckets=buckets
                ).collect()
            )
            assert got == want, (budget, buckets, got, want)
    # all-NULL quality must not return empty: ids in id order under budget
    df2 = spark.createDataFrame(
        [(i, 10, None) for i in range(5)],
        "doc_id long, n_tokens long, quality_score double",
    )
    got = sorted(
        r["doc_id"] for r in sample_to_token_budget(df2, 25).collect()
    )
    assert got == [0, 1]


def test_sample_to_token_budget_by_strata(spark):
    """Per-stratum budgets select independently (each stratum's prefix by
    quality then id), and unlisted strata drop via default_budget=0."""
    from stock_etl_pipeline_spark.operators.sampling import (
        sample_to_token_budget_by,
    )

    rows = [
        (1, "en", 10, 0.9), (2, "en", 10, 0.8), (3, "en", 10, 0.7),
        (4, "de", 10, 0.1), (5, "de", 10, 0.9),
        (6, "zh", 1, 0.99),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, n_tokens long, quality_score double"
    )
    got = sorted(
        r["doc_id"]
        for r in sample_to_token_budget_by(
            df, {"en": 20, "de": 10}, strata_col="lang"
        ).collect()
    )
    # en: 1, 2 fit 20; de: 5 (best quality) fits 10, 4 would exceed; zh dropped
    assert got == [1, 2, 5]


def test_sample_to_token_budget_cache_arm_equality(spark, monkeypatch):
    """The r13 pipeline cache (the operator's three actions share one
    computation of the input) must not change the selected set: cached and
    uncached arms are row-identical, including the straddling bucket."""
    from stock_etl_pipeline_spark.caching import release
    from stock_etl_pipeline_spark.operators.sampling import (
        sample_to_token_budget,
    )

    rows = [(i, (i * 37) % 101 + 1, ((i * 61) % 997) / 997.0) for i in range(300)]
    df = spark.createDataFrame(
        rows, "doc_id long, n_tokens long, quality_score double"
    )
    monkeypatch.delenv("SPARK_GRAFT_SAMPLE_CACHE", raising=False)
    cached = sorted(map(repr, sample_to_token_budget(df, 2_000).collect()))
    release()
    monkeypatch.setenv("SPARK_GRAFT_SAMPLE_CACHE", "0")
    plain = sorted(map(repr, sample_to_token_budget(df, 2_000).collect()))
    assert cached == plain and 0 < len(cached) < 300
