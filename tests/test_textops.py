"""PII detection/redaction operators (operators/text.py): counting and
redaction share patterns, both engines agree, redaction is idempotent."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from stock_etl_pipeline_spark.operators import text as textops

ROWS = [
    (1, "contact me at jane.doe+x@example.co.uk or call +1 (555) 123-4567"),
    (2, "server at 192.168.1.100 responded; backup 10.0.0.7 did not"),
    (3, "no sensitive content in this perfectly ordinary sentence"),
    (4, "doubled email a@b.io a@b.io and digits 1234567 8890011223"),
    (5, "ssn 123-45-6789 on file; card 4111 1111 1111 1111 expires soon"),
]


def _df(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_counts_and_redaction(spark):
    out = {r["doc_id"]: r for r in textops.with_pii_columns(_df(spark)).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] >= 1
    assert out[2]["n_ipv4"] == 2
    assert out[3]["n_email"] == out[3]["n_phone"] == out[3]["n_ipv4"] == 0
    assert out[3]["redacted_len"] == len(ROWS[2][1])  # untouched
    assert out[4]["n_email"] == 2
    assert out[5]["n_ssn"] == 1 and out[5]["n_cc"] == 1
    assert out[1]["n_ssn"] == 0 and out[2]["n_cc"] == 0


def test_redaction_removes_all_matches_and_is_idempotent(spark):
    once = _df(spark).select(
        "doc_id", textops.redact_pii("text").alias("text")
    )
    # no pattern survives its own redaction pass
    counts = textops.with_pii_columns(once)
    bad = counts.filter(
        (F.col("n_email") > 0)
        | (F.col("n_ipv4") > 0)
        | (F.col("n_ssn") > 0)
        | (F.col("n_cc") > 0)
    ).count()
    assert bad == 0
    twice = once.select("doc_id", textops.redact_pii("text").alias("text"))
    a = sorted(map(repr, once.collect()))
    b = sorted(map(repr, twice.collect()))
    assert a == b


REP_ROWS = [
    (1, "spam spam spam spam"),  # 1 distinct word, 1 distinct bigram
    (2, "all words here are different tokens"),  # no repetition
    (3, "one"),  # no bigrams -> NULL bigram ratio
    (4, ""),  # no words -> NULL ratios
    (5, "a b a b a"),  # bigrams: 'a b','b a','a b','b a' -> 2 distinct
    (6, "Case case CASE"),  # lowercased before counting
]


def _rep_df(spark):
    return spark.createDataFrame(REP_ROWS, "doc_id long, text string")


def test_repetition_metrics(spark):
    d = _rep_df(spark).withColumn("ws", textops.word_array("text"))
    rep = textops.repetition_cols(F.col("ws"))
    out = {
        r["doc_id"]: r
        for r in d.select(
            "doc_id", *[c.alias(k) for k, c in rep.items()]
        ).collect()
    }
    assert out[1]["n_distinct_words"] == 1
    assert abs(out[1]["word_rep_ratio"] - 0.75) < 1e-9
    assert out[1]["n_distinct_bigrams"] == 1
    assert abs(out[1]["bigram_rep_ratio"] - (1 - 1 / 3)) < 1e-9
    assert out[2]["word_rep_ratio"] == 0.0 and out[2]["bigram_rep_ratio"] == 0.0
    assert out[3]["bigram_rep_ratio"] is None  # one word, no bigrams
    assert out[4]["word_rep_ratio"] is None and out[4]["bigram_rep_ratio"] is None
    assert out[5]["n_distinct_bigrams"] == 2
    assert out[6]["n_distinct_words"] == 1  # case-insensitive


def test_repetition_sql_twin_agrees(spark, tmp_path):
    p = str(tmp_path / "rep.parquet")
    _rep_df(spark).write.parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW d AS SELECT * FROM read_parquet('{p}/*.parquet')")
    cols = textops.sql_repetition_cols("ws")
    sql = f"""
      WITH w AS (
        SELECT doc_id, regexp_extract_all(lower(text), '{textops.WORD_RE}') AS ws
        FROM d
      )
      SELECT doc_id, {", ".join(f"{e} AS {k}" for k, e in cols.items())} FROM w
    """
    want = {r[0]: r[1:] for r in con.execute(sql).fetchall()}
    d = _rep_df(spark).withColumn("ws", textops.word_array("text"))
    rep = textops.repetition_cols(F.col("ws"))
    got = {
        r["doc_id"]: tuple(r[k] for k in cols)
        for r in d.select("doc_id", *[c.alias(k) for k, c in rep.items()]).collect()
    }
    assert got == want


def test_sql_twins_agree(spark, tmp_path):
    p = str(tmp_path / "pii.parquet")
    _df(spark).write.parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW d AS SELECT * FROM read_parquet('{p}/*.parquet')")
    sql = f"""
      SELECT doc_id,
        {textops.sql_pii_count('text', 'email')} AS n_email,
        {textops.sql_pii_count('text', 'phone')} AS n_phone,
        {textops.sql_pii_count('text', 'ipv4')} AS n_ipv4,
        {textops.sql_pii_count('text', 'ssn')} AS n_ssn,
        {textops.sql_pii_count('text', 'cc')} AS n_cc,
        CAST(length({textops.sql_redact_pii('text')}) AS BIGINT) AS redacted_len
      FROM d
    """
    want = {r[0]: r[1:] for r in con.execute(sql).fetchall()}
    got = {
        r["doc_id"]: (
            r["n_email"], r["n_phone"], r["n_ipv4"], r["n_ssn"], r["n_cc"],
            r["redacted_len"],
        )
        for r in textops.with_pii_columns(_df(spark)).collect()
    }
    assert got == want


def test_tfidf_top_terms_matches_python_reference(spark):
    import math

    rows = [
        (1, "apple banana apple cherry"),
        (2, "banana banana durian"),
        (3, "apple cherry cherry cherry elderberry"),
        (4, ""),  # no terms -> absent from output
    ]
    got = {}
    out = textops.tfidf_top_terms(
        spark.createDataFrame(rows, "doc_id long, text string"), k=2
    ).collect()
    for r in out:
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], r["term"], r["tf"], r["df"], round(r["tfidf"], 9))
        )

    # pure-python reference
    docs = {i: t.lower().split() for i, t in rows}
    n = len(docs)  # count_distinct(doc_id) includes the empty doc
    df_map: dict[str, int] = {}
    for ws in docs.values():
        for t in set(ws):
            df_map[t] = df_map.get(t, 0) + 1
    want = {}
    for i, ws in docs.items():
        if not ws:
            continue
        tf = {t: ws.count(t) for t in set(ws)}
        scored = sorted(
            (
                (t, c, df_map[t], c * (math.log((n + 1) / (df_map[t] + 1)) + 1))
                for t, c in tf.items()
            ),
            key=lambda x: (-x[3], x[0]),
        )[:2]
        want[i] = [
            (rk + 1, t, c, d, round(s, 9)) for rk, (t, c, d, s) in enumerate(scored)
        ]
    for i in want:
        assert sorted(got[i]) == sorted(want[i]), (i, got.get(i), want[i])
    assert 4 not in got


def test_tfidf_rank_is_partitioning_invariant(spark):
    """The quantized ranking key + term tie-break must give byte-identical
    top-k under any shuffle parallelism (the engine's determinism contract
    — a raw-float ranking key could flip ranks with aggregation order)."""
    from stock_etl_pipeline_spark.datasets import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        a = sorted(
            map(repr, textops.tfidf_top_terms(d, k=3, rank_digits=4).collect())
        )
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = sorted(
            map(repr, textops.tfidf_top_terms(d.repartition(7), k=3, rank_digits=4).collect())
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b and len(a) > 0


def test_char_bigram_lm_score_signal_and_determinism(spark):
    """The reference-model score separates in-domain from out-of-domain
    text (that's the CCNet move), 1-char/empty docs emit explicit
    (n_bigrams=0, lm_score NULL) rows instead of vanishing (ADVICE r10;
    Spark's sequence(1,0) descending-range trap is guarded), and scores
    are partitioning-invariant (integer probabilities, exact sums)."""
    from stock_etl_pipeline_spark.operators.text import char_bigram_lm_score

    ref = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog again and again",),
         ("plain english sentences about ordinary things and places",)],
        "text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "the brown dog jumps over things"),      # in-domain
            (2, "zzqx qxzz xqzq zqxq qqxx zzzz"),        # garbage
            (3, "x"),                                      # no bigrams
            (4, ""),                                       # empty
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in char_bigram_lm_score(docs, ref).collect()}
    assert set(out) == {1, 2, 3, 4}  # short docs present, not dropped
    for short in (3, 4):
        assert out[short]["n_bigrams"] == 0
        assert out[short]["lm_score"] is None
    # clear separation, not a cliff: add-one smoothing hands unseen
    # contexts 1/V mass, sizeable under a 2-sentence test reference
    assert out[1]["lm_score"] > out[2]["lm_score"] * 1.5
    assert out[1]["n_bigrams"] == 30

    again = {
        r["doc_id"]: r["lm_score"]
        for r in char_bigram_lm_score(docs.repartition(7), ref.repartition(3)).collect()
    }
    assert again == {k: v["lm_score"] for k, v in out.items()}


def test_docs_spread_invariance_at_firing_sf(spark, monkeypatch):
    """Round 14: the four heavy per-row text queries take the guarded
    single-partition spread (workload.docs._docs_spread). At sf0.1 the
    corpus (5000 docs ≥ _SPREAD_MIN_DOCS, one parquet row group) actually
    fires it — pin that (a) the spread really engages there (the scan
    plans 1 partition, the query input > 1) and (b) doc_text_stats rows
    are identical with the spread suppressed (per-doc kernels are
    partitioning-invariant)."""
    from stock_etl_pipeline_spark.workload import docs as wdocs
    from stock_etl_pipeline_spark.workload import load_all

    sf_dir = "/root/testdata/sf0.1"
    bare = wdocs.load_table(spark, sf_dir, "documents")
    spread = wdocs._docs_spread(spark, sf_dir)
    assert bare.rdd.getNumPartitions() == 1
    assert spread.rdd.getNumPartitions() > 1
    fn = load_all()["doc_text_stats"].fn
    got = {tuple(r) for r in fn(spark, sf_dir).collect()}
    monkeypatch.setattr(
        wdocs, "_docs_spread", lambda sp, sd: wdocs.load_table(sp, sd, "documents")
    )
    unspread = {tuple(r) for r in fn(spark, sf_dir).collect()}
    assert got == unspread and len(got) == 5000
