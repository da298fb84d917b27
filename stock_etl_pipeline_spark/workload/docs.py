"""Text-analysis and deduplication queries over the ``documents`` table —
the training-data-pipeline surface (token stats, quality scoring, language ID,
fingerprinting, exact + n-gram-Jaccard near dedup).

All scalar text ops are per-row deterministic regex/string functions available
identically in Spark (Java regex) and DuckDB (RE2) — patterns kept to the
common subset (char classes, literal alternations, \\S/\\s/\\b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datasets import load_table, table_row_count
from ..functions import pround, sql_pround
from ..operators import dedup, sampling
from ..operators import text as textops
from . import spec, spec_tests_only

_TOKEN_RE = r"\S+"
_PUNCT_RE = r"[.,!?;:]"
_STOP_RE = r"\b(the|a|of|and|to|in|is)\b"

_SQL_N_TOKENS = f"len(regexp_extract_all(text, '{_TOKEN_RE}'))"
_SQL_N_STOP = f"len(regexp_extract_all(lower(text), '{_STOP_RE}'))"
_SQL_STOP_RATIO = f"CAST({_SQL_N_STOP} AS DOUBLE) / NULLIF({_SQL_N_TOKENS}, 0)"
_SQL_QUALITY = (
    f"least(1.0, {_SQL_N_TOKENS} / 100.0) * 0.6"
    f" + least(1.0, ({_SQL_STOP_RATIO}) * 5) * 0.4"
)

_sql_rep = textops.sql_repetition_cols("ws")
_TEXT_STATS_ORACLE = rf"""
WITH w AS (
  SELECT *, regexp_extract_all(lower(text), '{textops.WORD_RE}') AS ws FROM documents
)
SELECT doc_id, lang, source, n_chars,
  CAST(length(text) AS BIGINT) AS text_len,
  CAST({_SQL_N_TOKENS} AS BIGINT) AS n_tokens,
  CAST(len(regexp_extract_all(text, '{_PUNCT_RE}')) AS BIGINT) AS n_punct,
  CAST({_SQL_N_STOP} AS BIGINT) AS n_stopwords,
  {sql_pround(_SQL_STOP_RATIO, 6)} AS stopword_ratio,
  {sql_pround(_SQL_QUALITY, 6)} AS quality_score,
  {_sql_rep["n_distinct_words"]} AS n_distinct_words,
  {sql_pround(_sql_rep["word_rep_ratio"], 6)} AS word_rep_ratio,
  {_sql_rep["n_distinct_bigrams"]} AS n_distinct_bigrams,
  {sql_pround(_sql_rep["bigram_rep_ratio"], 6)} AS bigram_rep_ratio,
  {textops.sql_pii_count("text", "email")} AS n_email,
  {textops.sql_pii_count("text", "phone")} AS n_phone,
  {textops.sql_pii_count("text", "ipv4")} AS n_ipv4,
  {textops.sql_pii_count("text", "ssn")} AS n_ssn,
  {textops.sql_pii_count("text", "cc")} AS n_cc,
  CAST(length({textops.sql_redact_pii("text")}) AS BIGINT) AS redacted_len
FROM w
""".strip()


@spec(
    "doc_text_stats",
    oracle=_TEXT_STATS_ORACLE,
    tags=("text", "quality", "pii", "repetition"),
    bench=True,
)
def q_doc_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + punctuation/stopword ratios + composite quality score
    (length-normalized + stopword-informed) + within-doc repetition signals
    (Gopher-style duplicate word/bigram fractions via array higher-order
    functions — no explode) + PII hygiene profile (email / phone / IPv4 /
    SSN / card counts and the post-redaction length, operators/text.py) —
    all JVM-side regex in one narrow pass, no UDFs, no shuffle beyond the
    guarded single-partition spread (_docs_spread — 2.5x at sf0.1; the
    regex suite ran on one core off the one-row-group scan)."""
    d = _docs_spread(spark, sf_dir)
    n_tokens = F.size(F.regexp_extract_all(F.col("text"), F.lit(_TOKEN_RE), 0))
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(_PUNCT_RE), 0))
    n_stop = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(_STOP_RE), 0))
    stop_ratio = n_stop.cast("double") / F.nullif(n_tokens, F.lit(0))
    quality = pround(
        F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * 0.6
        + F.least(F.lit(1.0), stop_ratio * 5) * 0.4,
        6,
    )
    rep = textops.repetition_cols(F.col("ws"))
    return d.withColumn("ws", textops.word_array("text")).select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.length("text").cast("long").alias("text_len"),
        n_tokens.cast("long").alias("n_tokens"),
        n_punct.cast("long").alias("n_punct"),
        n_stop.cast("long").alias("n_stopwords"),
        pround(stop_ratio, 6).alias("stopword_ratio"),
        quality.alias("quality_score"),
        rep["n_distinct_words"].alias("n_distinct_words"),
        pround(rep["word_rep_ratio"], 6).alias("word_rep_ratio"),
        rep["n_distinct_bigrams"].alias("n_distinct_bigrams"),
        pround(rep["bigram_rep_ratio"], 6).alias("bigram_rep_ratio"),
        textops.pii_count("text", "email").alias("n_email"),
        textops.pii_count("text", "phone").alias("n_phone"),
        textops.pii_count("text", "ipv4").alias("n_ipv4"),
        textops.pii_count("text", "ssn").alias("n_ssn"),
        textops.pii_count("text", "cc").alias("n_cc"),
        F.length(textops.redact_pii("text")).cast("long").alias("redacted_len"),
    )


# Language ID: marker-word argmax with a deterministic CASE tie-break order.
_LANG_MARKERS = {
    "en": r"\b(the|and|of|to|is)\b",
    "es": r"\b(el|la|de|y|que)\b",
    "fr": r"\b(le|la|et|les|des)\b",
    "de": r"\b(der|die|und|das|ist)\b",
}
_LANG_PREDICT_SQL = """CASE WHEN c_en = 0 AND c_es = 0 AND c_fr = 0 AND c_de = 0 THEN 'unknown'
       WHEN c_en >= c_es AND c_en >= c_fr AND c_en >= c_de THEN 'en'
       WHEN c_es >= c_fr AND c_es >= c_de THEN 'es'
       WHEN c_fr >= c_de THEN 'fr'
       ELSE 'de' END"""

# doc_lang_id (per-doc marker-argmax prediction) + doc_lang_dist (corpus
# language/source distribution) FUSED into one registry slot (round-3
# headroom for doc_tfidf_top): block-discriminated union on a unified
# schema — the source_report pattern. Both blocks scan documents once.
_LANG_REPORT_ORACLE = rf"""
WITH scored AS (
  SELECT doc_id, lang AS labeled_lang,
    CAST(len(regexp_extract_all(lower(text), '{_LANG_MARKERS["en"]}')) AS BIGINT) AS c_en,
    CAST(len(regexp_extract_all(lower(text), '{_LANG_MARKERS["es"]}')) AS BIGINT) AS c_es,
    CAST(len(regexp_extract_all(lower(text), '{_LANG_MARKERS["fr"]}')) AS BIGINT) AS c_fr,
    CAST(len(regexp_extract_all(lower(text), '{_LANG_MARKERS["de"]}')) AS BIGINT) AS c_de
  FROM documents
)
SELECT 'id' AS block, doc_id, labeled_lang AS lang, CAST(NULL AS VARCHAR) AS source,
  c_en, c_es, c_fr, c_de,
  {_LANG_PREDICT_SQL} AS predicted_lang,
  CAST(NULL AS BIGINT) AS n_docs, CAST(NULL AS BIGINT) AS total_chars,
  CAST(NULL AS DOUBLE) AS avg_chars
FROM scored
UNION ALL
SELECT 'dist' AS block, CAST(NULL AS BIGINT) AS doc_id, lang, source,
  CAST(NULL AS BIGINT) AS c_en, CAST(NULL AS BIGINT) AS c_es,
  CAST(NULL AS BIGINT) AS c_fr, CAST(NULL AS BIGINT) AS c_de,
  CAST(NULL AS VARCHAR) AS predicted_lang,
  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
  {sql_pround("CAST(sum(n_chars) AS BIGINT) * 1.0 / count(n_chars)", 6)} AS avg_chars
FROM documents
GROUP BY lang, source
""".strip()


@spec("doc_lang_report", oracle=_LANG_REPORT_ORACLE, tags=("text", "lang_id", "agg"))
def q_doc_lang_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    counts = {
        lang: F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(pat), 0)).cast(
            "long"
        )
        for lang, pat in _LANG_MARKERS.items()
    }
    c = {k: F.col(f"c_{k}") for k in counts}
    predicted = (
        F.when(
            (c["en"] == 0) & (c["es"] == 0) & (c["fr"] == 0) & (c["de"] == 0),
            F.lit("unknown"),
        )
        .when((c["en"] >= c["es"]) & (c["en"] >= c["fr"]) & (c["en"] >= c["de"]), F.lit("en"))
        .when((c["es"] >= c["fr"]) & (c["es"] >= c["de"]), F.lit("es"))
        .when(c["fr"] >= c["de"], F.lit("fr"))
        .otherwise(F.lit("de"))
    )
    id_block = (
        d.select(
            "doc_id",
            F.col("lang").alias("lang"),
            *[counts[k].alias(f"c_{k}") for k in counts],
        )
        .withColumn("predicted_lang", predicted)
        .select(
            F.lit("id").alias("block"),
            "doc_id",
            "lang",
            F.lit(None).cast("string").alias("source"),
            "c_en",
            "c_es",
            "c_fr",
            "c_de",
            "predicted_lang",
            F.lit(None).cast("long").alias("n_docs"),
            F.lit(None).cast("long").alias("total_chars"),
            F.lit(None).cast("double").alias("avg_chars"),
        )
    )
    dist_block = (
        d.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            pround(F.sum("n_chars") * 1.0 / F.count("n_chars"), 6).alias("avg_chars"),
        )
        .select(
            F.lit("dist").alias("block"),
            F.lit(None).cast("long").alias("doc_id"),
            "lang",
            "source",
            *[F.lit(None).cast("long").alias(f"c_{k}") for k in ("en", "es", "fr", "de")],
            F.lit(None).cast("string").alias("predicted_lang"),
            "n_docs",
            "total_chars",
            "avg_chars",
        )
    )
    return id_block.unionByName(dist_block)


# Document fingerprint + exact dedup (hash-groupBy — the scalable exact-dedup
# primitive: one shuffle on the 128-bit digest, never on the text itself).
_EXACT_DEDUP_ORACLE = r"""
SELECT md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fingerprint,
  CAST(min(doc_id) AS BIGINT) AS keeper_doc_id,
  count(*) AS n_copies
FROM documents
GROUP BY md5(lower(regexp_replace(text, '\s+', ' ', 'g')))
""".strip()


@spec("doc_exact_dedup", oracle=_EXACT_DEDUP_ORACLE, tags=("dedup", "fingerprint"), bench=True)
def q_doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.regexp_replace(F.col("text"), r"\s+", " ")))
    return (
        d.select(fp.alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


# Duplicate-span analysis (exact substring-dedup shape, Lee et al. 2021):
# position-indexed word 8-grams, corpus-wide occurrence counts mark every
# position inside a span that appears >= 2 times ANYWHERE (cross-doc or
# within-doc), gaps-and-islands gives the longest duplicated run per doc.
_SPAN_N = 8
_span_parts_sql = ", ' ', ".join(f"w[i+{j}]" for j in range(_SPAN_N))
_SPAN_DEDUP_ORACLE = rf"""
WITH words AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents
),
pos AS (
  SELECT doc_id, w,
    unnest(generate_series(1, greatest(len(w) - {_SPAN_N - 1}, 0))) AS i
  FROM words
),
occ AS (
  SELECT doc_id, i AS p,
    (('0x' || substring(md5(concat({_span_parts_sql})), 1, 15))::BIGINT) AS gram
  FROM pos
),
cnt AS (SELECT gram, count(*) AS c FROM occ GROUP BY gram),
flagged AS (
  SELECT o.doc_id, o.p, (c.c >= 2) AS dup
  FROM occ o JOIN cnt c ON o.gram = c.gram
),
runs AS (
  SELECT doc_id, p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
  FROM flagged WHERE dup
),
runlen AS (SELECT doc_id, grp, count(*) AS rl FROM runs GROUP BY doc_id, grp),
maxrun AS (SELECT doc_id, max(rl) AS max_dup_run FROM runlen GROUP BY doc_id),
perdoc AS (
  SELECT doc_id, count(*) AS n_grams,
    CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams
  FROM flagged GROUP BY doc_id
)
SELECT p.doc_id, p.n_grams, p.n_dup_grams,
  {sql_pround("p.n_dup_grams * 1.0 / p.n_grams", 6)} AS dup_frac,
  CAST(COALESCE(m.max_dup_run, 0) AS BIGINT) AS max_dup_run
FROM perdoc p LEFT JOIN maxrun m ON p.doc_id = m.doc_id
""".strip()


@spec(
    "doc_span_dedup",
    oracle=_SPAN_DEDUP_ORACLE,
    tags=("dedup", "span", "substring"),
    bench=True,
)
def q_doc_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span statistics per document (operators/dedup.
    duplicate_span_stats): word 8-grams with positions, corpus-wide
    occurrence counts, positions in ≥2x spans flagged, gaps-and-islands
    longest run. The exact-substring-dedup signal (Lee et al. 2021) the
    set-level dedup family cannot see — a doc that is 40% verbatim
    boilerplate has low whole-doc Jaccard against any single other doc but
    a high dup_frac here. Complements doc_minhash_* (whole-doc near-dup)
    and doc_decontaminate (n-gram overlap vs a fixed eval set)."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.duplicate_span_stats(d, n=_SPAN_N, n_docs=_n_docs(d, sf_dir))


# N-gram Jaccard near-dedup: word-3-shingles → df-capped set join → pair
# similarity. The DOCUMENT-FREQUENCY CAP is what makes the raw shingle join
# survive scale: a shingle appearing in d documents contributes d(d-1)/2
# candidate pairs, so boilerplate shingles ("terms of service apply") alone
# make the join super-linear. Dropping shingles with df > cap bounds every
# shingle's pair mass at cap²/2 — total work becomes linear in the corpus —
# while near-dup signal lives in LOW-df shingles, which all survive.
# Jaccard is computed over the capped shingle sets on BOTH engines.
_JACCARD_THRESHOLD = 0.2
_SHINGLE_DF_CAP = 64
_NGRAM_JACCARD_ORACLE = rf"""
WITH words AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents
),
pos AS (
  SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i FROM words
),
sh0 AS (
  SELECT DISTINCT doc_id, concat(w[i], ' ', w[i+1], ' ', w[i+2]) AS shingle FROM pos
),
sh AS (
  SELECT doc_id, shingle FROM (
    SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df FROM sh0
  ) WHERE df <= {_SHINGLE_DF_CAP}
),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, ca.n AS n_a, cb.n AS n_b, inter,
  {sql_pround("inter * 1.0 / (ca.n + cb.n - inter)", 6)} AS jaccard
FROM pairs
JOIN cnt ca ON doc_a = ca.doc_id
JOIN cnt cb ON doc_b = cb.doc_id
WHERE inter * 1.0 / (ca.n + cb.n - inter) >= {_JACCARD_THRESHOLD}
""".strip()


@spec_tests_only("doc_ngram_jaccard", oracle=_NGRAM_JACCARD_ORACLE, tags=("dedup", "similarity_join"))
def q_doc_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-trigram Jaccard similarity join (near-dup detection) with the
    standard document-frequency cap on shingles (df ≤ 64).

    Tests-only tier (round 5): this is the didactic raw-shingle-join
    baseline beside the scale-shaped LSH family (doc_minhash_lsh /
    doc_minhash_capped cover the same near-dup semantics under the driver
    gate); demoted to free a registry slot per the round-4 verdict. Full
    DuckDB parity still runs in tests/test_oracle_parity.py.

    Scale shape: shingle explode (narrow) → distinct (shuffle on shingle) →
    df-count window + filter (REUSES the shingle partitioning — no extra
    exchange) → self-equi-join on shingle (same partitioning again) →
    pair-count aggregate. The df cap bounds per-shingle join fan-out at
    cap², turning the formerly super-linear hot-shingle mass (13.8× at the
    10× soak before the cap) into linear work; the MinHash-LSH sibling
    (doc_minhash_lsh) remains the banded alternative."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.lower(F.col("text")), r"\s+")
    sh0 = (
        d.select("doc_id", words.alias("w"))
        .select(
            "doc_id",
            F.explode(
                # size guard: sequence(1, 0) is DESCENDING [1, 0] in Spark —
                # unguarded, short docs crash on element_at (see
                # operators/dedup.word_shingles)
                F.expr(
                    "IF(size(w) >= 3, transform(sequence(1, size(w) - 2), "
                    "i -> concat(element_at(w, i), ' ', element_at(w, i+1), ' ', element_at(w, i+2))), array())"
                )
            ).alias("shingle"),
        )
        .distinct()
    )
    sh = (
        sh0.withColumn("df", F.count("*").over(Window.partitionBy("shingle")))
        .filter(F.col("df") <= _SHINGLE_DF_CAP)
        .select("doc_id", "shingle")
    )
    # Three consumers (per-doc counts + both self-join sides) and no exchange
    # reuse across them — persist and eagerly fill, like the simhash
    # signature relation (measured 24.9 → 16.4 s at the 100x soak tier).
    # Pool-tracked: released at the next pipeline's begin_pipeline().
    from ..caching import begin_pipeline, eager_cache

    begin_pipeline()
    sh = eager_cache(sh)
    cnt = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    ca = cnt.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    cb = cnt.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    jac = F.col("inter") * 1.0 / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        # per-doc count relation: one row per document — unbounded, so no
        # forced broadcast (soak finding; AQE broadcasts when actually small)
        pairs.join(ca, "doc_a")
        .join(cb, "doc_b")
        .filter(jac >= _JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "n_a", "n_b", "inter", pround(jac, 6).alias("jaccard"))
    )


# --- TF-IDF salient terms (operators/text.tfidf_top_terms) ------------------
# Ranking key is floor-rounded to 4 digits on BOTH sides before the window
# (quantize-before-rank: a last-ulp ln() difference between engines cannot
# swap ranks); ties break on the term string.
_TFIDF_K = 5
_TFIDF_DIGITS = 4

_TFIDF_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{textops.WORD_RE}')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, term
),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (SELECT count(DISTINCT doc_id) AS __n FROM documents),
scored AS (
  SELECT doc_id, tf.term AS term, tf, df,
    {sql_pround("tf * (ln((__n + 1.0) / (df + 1.0)) + 1.0)", _TFIDF_DIGITS)} AS tfidf
  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, tf, df, tfidf,
    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INTEGER) AS rnk
  FROM scored
)
SELECT doc_id, term, tf, df, tfidf, rnk FROM ranked WHERE rnk <= {_TFIDF_K}
""".strip()


@spec("doc_tfidf_top", oracle=_TFIDF_ORACLE, tags=("text", "tfidf", "salience"))
def q_doc_tfidf_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-5 salient terms by smoothed TF-IDF
    (operators/text.tfidf_top_terms): one (doc, term) frequency aggregate,
    one term-df aggregate, a co-partitioned term join (vocabulary scales
    with the corpus — never broadcast), corpus size as a 1-row broadcast
    aggregate, and a per-doc window bounded by the doc's distinct terms."""
    d = load_table(spark, sf_dir, "documents")
    out = textops.tfidf_top_terms(
        d, k=_TFIDF_K, rank_digits=_TFIDF_DIGITS
    )
    return out.withColumnRenamed("rank", "rnk")


# --- MinHash-LSH near-dedup (operators/dedup.py — the 100 TB dedup path) ----
# Oracle = the IDENTICAL LSH construction in DuckDB (md5 seed-prefixed hashes,
# lexicographic-min signatures, banded candidates, exact-Jaccard verify), so
# parity is guaranteed by construction and does not depend on LSH recall.
#
# Band geometry (k=20, b=4, r=5): candidate mass from BACKGROUND similarity
# scales with the SQUARE of the corpus (every unrelated doc pair collides
# with probability ~j_bg^r), so r must be large enough that j_bg^r times
# n²/2 stays linear. The 100x soak measured the old r=3 at 21.4M candidates
# from 500k docs (j_bg ≈ 0.05 template text: 0.05³ ≈ 1e-4 over 1.25e11
# pairs); r=5 puts the same corpus at ~1e-6 of pairs while keeping 253/256
# of the true j ≥ 0.7 pairs at sf0.1 (the S-curve at 0.7 is 1-(1-0.7⁵)⁴ ≈
# 0.53 per band set — real near-dups sit at j ≈ 0.9+ where recall is ~1).
_MH_K = 20
_MH_BANDS = 4
_MH_ROWS = _MH_K // _MH_BANDS
_MH_THRESHOLD = 0.7

_mh_hash_cols = ",\n    ".join(
    f"({a} * b + {c}) % {dedup.MINHASH_M} AS h{j}"
    for j, (a, c) in enumerate(dedup._mix_constants(_MH_K))
)
_mh_min_cols = ", ".join(f"min(h{j}) AS minh_{j}" for j in range(_MH_K))
_mh_band_selects = "\n    UNION ALL ".join(
    "SELECT doc_id, {b} AS band_id, md5(concat_ws('|', {cols})) AS band_key FROM sig".format(
        b=b,
        cols=", ".join(f"minh_{b * _MH_ROWS + r}" for r in range(_MH_ROWS)),
    )
    for b in range(_MH_BANDS)
)
# Signature-estimate prefilter: ≥ half of the k minhash components must
# match before the exact verify (operators/dedup.signature_estimate_filter).
_MH_EST_MIN = _MH_K // 2
_mh_est_matches = " + ".join(
    f"(CASE WHEN ea.minh_{j} = eb.minh_{j} THEN 1 ELSE 0 END)"
    for j in range(_MH_K)
)
_MH_JAC = "inter * 1.0 / (ca.n + cb.n - inter)"


def _minhash_oracle(shingle_ctes: str, base_expr: str | None = None) -> str:
    """MinHash-LSH oracle over any CTE chain ending in ``sh(doc_id, shingle)``
    — shared by the exact and the df-capped variants (identical signature /
    banding / prefilter / verify arithmetic; only the shingle relation
    differs). ``base_expr`` overrides the md5→b60 fold when ``shingle``
    already IS the 60-bit base hash (the capped b60 chain): the affine
    families then read ``shingle % M`` directly."""
    base = (
        f"({base_expr}) % {dedup.MINHASH_M}"
        if base_expr is not None
        else dedup.sql_minhash_base("shingle")
    )
    return rf"""
WITH
  {shingle_ctes},
  based AS (SELECT doc_id, {base} AS b FROM sh),
  hashed AS (SELECT doc_id,
    {_mh_hash_cols}
    FROM based),
  sig AS (SELECT doc_id, {_mh_min_cols} FROM hashed GROUP BY doc_id),
  bands AS (
    {_mh_band_selects}
  ),
  cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
  ),
  cand2 AS (
    SELECT c.doc_a, c.doc_b
    FROM cand c
    JOIN sig ea ON ea.doc_id = c.doc_a
    JOIN sig eb ON eb.doc_id = c.doc_b
    WHERE ({_mh_est_matches}) >= {_MH_EST_MIN}
  ),
  cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
  ints AS (
    SELECT doc_a, doc_b, count(*) AS inter
    FROM cand2
    JOIN sh sa ON sa.doc_id = doc_a
    JOIN sh sb ON sb.doc_id = doc_b AND sa.shingle = sb.shingle
    GROUP BY doc_a, doc_b
  )
SELECT doc_a, doc_b, ca.n AS n_a, cb.n AS n_b, inter,
  {sql_pround(_MH_JAC, 6)} AS jaccard
FROM ints JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
WHERE {_MH_JAC} >= {_MH_THRESHOLD}
""".strip()


_MINHASH_ORACLE = _minhash_oracle(dedup.sql_word_shingles("documents"))


def _n_docs(d, sf_dir: str | None) -> int:
    """Corpus size for plan-time decisions: parquet-footer count when the
    relation is the unfiltered table of a known sf_dir (driver-side, no
    job — datasets.table_row_count), count() job otherwise."""
    n = table_row_count(sf_dir, "documents") if sf_dir else None
    return d.count() if n is None else n


def _docs_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents scan, round-robined across the cores when it arrives as
    ONE effective partition (dedup._spread_single_partition — the guarded
    probe: fires only at 1 planned partition / 1 total parquet row group
    AND ≥ _SPREAD_MIN_DOCS docs, so a genuinely multi-split corpus is
    never shuffled).

    Round 14: the heavy per-row text queries inherited the scan's single
    partition and ran their whole kernel on ONE core — the exact
    pathology the Arrow signature fills fixed in round 8, unfixed on the
    JVM-expression queries. Interleaved 5-rep sweep at sf0.1 (base →
    spread medians): doc_lm_quality 8.28 → 2.08 s (3.98x),
    doc_decontaminate 6.16 → 2.25 (2.73x), doc_token_fingerprint
    5.12 → 2.14 (2.39x), doc_text_stats 1.11 → 0.45 (2.5x). Applied
    ONLY to those four: the same sweep measured cheap-row-work queries
    LOSING to the text shuffle (doc_exact_dedup 0.52x, doc_train_split
    0.69x, doc_tfidf_top 0.70x, doc_lang_report 0.80x,
    doc_corpus_construction 0.92x — its heavy inner chains run after a
    join that already spreads) — those keep the bare scan. Per-doc
    results are partitioning-invariant and every aggregate downstream is
    order-independent by the engine's integer-exactness contract
    (odd-parallelism probe green)."""
    d = load_table(spark, sf_dir, "documents")
    return dedup._spread_single_partition(d, _n_docs(d, sf_dir))


def _mh_geometry(d, sf_dir: str | None = None) -> tuple[int, int, int, int]:
    """Tiered (num_hashes, bands, est_min_matches, n_docs) for this corpus
    (operators/dedup.lsh_tier_geometry). With ``sf_dir`` the corpus size
    comes from the parquet footers driver-side (datasets.table_row_count —
    identical number, no scheduled job; the count() job cost ~0.25 s fixed
    per query at bench scale); otherwise — or when the footer read bows out
    — it falls back to the count() job. Every driver/bench SF (≤ 5k docs)
    lands in tier 0 = (_MH_K, _MH_BANDS, _MH_EST_MIN) — exactly the
    geometry the static oracle strings above are generated with — so
    correctness comparisons and golden plans are unaffected. Only the soak
    tiers (500k+ docs) switch to the sharper r=6/r=8 geometries. n_docs
    rides along so callers can thread it (backend auto-resolution,
    single-partition spread) without a second count."""
    n = table_row_count(sf_dir, "documents") if sf_dir else None
    if n is None:
        n = d.count()
    return (*dedup.lsh_tier_geometry(n), n)

# Capped-set variant: shingles with df > cap are removed BEFORE signatures,
# so signatures, banding, the estimate prefilter AND the exact verify all
# operate on the capped sets — one consistent similarity definition in both
# engines. Uses the aggregate-then-anti-join formulation (hot set is tiny).
_MH_DF_CAP = 64
# Capped chain is b60-keyed end-to-end (operators/dedup.word_shingles_b60):
# the DISTINCT, the df cap, the per-doc counts, and the exact-set intersect
# all operate on the 60-bit fold — identically in both engines, so a 60-bit
# collision merges the same shingles on both sides and results stay
# bit-equal by construction. The shared template's ``based`` step consumes
# ``shingle`` (here already the BIGINT b60) via base_expr.
_capped_shingle_ctes = f"""{dedup.sql_word_shingles_b60("documents", out="sh0")},
  hot AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > {_MH_DF_CAP}),
  sh AS (SELECT doc_id, shingle FROM sh0 WHERE shingle NOT IN (SELECT shingle FROM hot))"""
_MINHASH_CAPPED_ORACLE = _minhash_oracle(_capped_shingle_ctes, base_expr="shingle")


# --- cluster-representative dedup over the minhash pair graph ---------------
# The LINEAR-OUTPUT dedup shape (SCALING.md, 100x finding #2): pair
# enumeration is quadratic per duplicate group, but the training pipeline
# wants "which doc do I keep" — one row per clustered doc. Min-label
# propagation over the pair graph, 3 fixed rounds (exact for components of
# diameter ≤ 3; LSH dup clusters are near-cliques), and because every round
# is a plain join+aggregate the ORACLE replays the whole iterative
# algorithm as 3 generated CTE rounds — a driver-checked graph algorithm.
_CC_ROUNDS = 3
# The cluster query consumes the CAPPED candidate pipeline (df ≤ 64 before
# signatures): for the keep/drop decision a dup-heavy corpus feeds into,
# boilerplate must not shield a duplicate (capped-set Jaccard is the desired
# dedup semantics, SCALING.md round-3 experiment), and the cap removes the
# n²·j_bg^r background-candidate mass that made the exact pipeline the
# repo's largest 100x ratio. The exact-set pair query (doc_minhash_lsh)
# stays beside it as the exact baseline.


_pairs_body = (
    _MINHASH_CAPPED_ORACLE.split("WITH\n", 1)[1]
    .rsplit("SELECT doc_a", 1)[0]
    .rstrip()
    .rstrip(",")
)
_DEDUP_CLUSTERS_ORACLE = f"""
WITH
  {_pairs_body},
  verified AS (
    SELECT doc_a, doc_b
    FROM ints JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
    WHERE {_MH_JAC} >= {_MH_THRESHOLD}
  ),
  edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM verified
    UNION
    SELECT doc_b AS src, doc_a AS dst FROM verified
  ),
  {dedup.sql_propagation_rounds(_CC_ROUNDS)}
SELECT id AS doc_id, label AS keeper_id FROM l{_CC_ROUNDS}
""".strip()


@spec("doc_dedup_clusters", oracle=_DEDUP_CLUSTERS_ORACLE, tags=("dedup", "clusters", "graph"))
def q_doc_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-representative near-dup output: CAPPED minhash-LSH pairs
    (identical construction to doc_minhash_capped — df ≤ 64 before
    signatures) collapsed to one (doc_id, keeper_id) row per clustered
    document via 3 rounds of min-label propagation
    (operators/dedup.near_dup_keepers). Output is LINEAR in the corpus even
    when duplicate groups are huge — the shape a 100 TB dedup pipeline
    feeds into its keep/drop filter. The capped candidate source is the
    scale choice AND the semantic one: boilerplate shingles must not
    shield a duplicate from the keep/drop decision, and the cap removes
    the n²·j_bg^r background-candidate term (SCALING.md: 8x of the 100x
    band-collision mass)."""
    import os

    d = load_table(spark, sf_dir, "documents")
    k, b, est_min, n = _mh_geometry(d, sf_dir)
    pairs = dedup.minhash_lsh_pairs(
        d,
        num_hashes=k,
        bands=b,
        threshold=_MH_THRESHOLD,
        est_min_matches=est_min,
        shingle_df_cap=_MH_DF_CAP,
        n_docs=n,
    )
    return dedup.near_dup_keepers(
        pairs,
        rounds=_CC_ROUNDS,
        # soak/CI runs set this to demand the convergence certificate (one
        # extra propagation round must change nothing); the driver/bench
        # path skips the extra action
        verify_converged=os.environ.get("SPARK_GRAFT_VERIFY_CC") == "1",
    )


@spec("doc_minhash_lsh", oracle=_MINHASH_ORACLE, tags=("dedup", "minhash", "lsh"), bench=True)
def q_doc_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup pairs, exact-verified at Jaccard ≥ 0.7 via
    signature-resident hash sets, with the signature-estimate prefilter
    between banding and the verify. Band geometry is TIERED by corpus size
    (operators/dedup.lsh_tier_geometry): k=20/4×5 through 5M docs (the
    frozen oracle geometry — measured fastest at the 100x tier once the
    set-resident verify made per-candidate cost O(|set|)), then k=48/8×6
    and k=96/12×8 as candidate ENUMERATION itself needs r to grow ~log n.
    Candidate generation is a self-equi-join on uniform (band_id,
    band_key) md5 buckets — sub-quadratic, skew-free (vs. the raw shingle
    join in doc_ngram_jaccard)."""
    d = load_table(spark, sf_dir, "documents")
    k, b, est_min, n = _mh_geometry(d, sf_dir)
    pairs = dedup.minhash_lsh_pairs(
        d, num_hashes=k, bands=b, threshold=_MH_THRESHOLD,
        est_min_matches=est_min, n_docs=n,
    )
    return pairs.select(
        "doc_a", "doc_b", "n_a", "n_b", "inter", pround(F.col("jaccard"), 6).alias("jaccard")
    )


@spec(
    "doc_minhash_capped",
    oracle=_MINHASH_CAPPED_ORACLE,
    tags=("dedup", "minhash", "lsh", "df_cap"),
    bench=True,
)
def q_doc_minhash_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH with the shingle document-frequency cap (df ≤ 64) applied
    BEFORE signatures — the scale path for the n²·j_bg^r background-candidate
    term (SCALING.md): background similarity between unrelated docs lives in
    ubiquitous boilerplate shingles, so capping df drives j_bg → 0 and the
    quadratic candidate mass with it, letting the k=20/r=5 band geometry stay
    fixed as the corpus grows. Near-dup signal (low-df shingles) survives the
    cap, and Jaccard — estimate and exact — is defined over the capped sets
    identically in both engines. Sits beside doc_minhash_lsh (exact sets) the
    way doc_ngram_jaccard's cap sits beside its uncapped didactic form."""
    d = load_table(spark, sf_dir, "documents")
    k, b, est_min, n = _mh_geometry(d, sf_dir)
    pairs = dedup.minhash_lsh_pairs(
        d,
        num_hashes=k,
        bands=b,
        threshold=_MH_THRESHOLD,
        est_min_matches=est_min,
        shingle_df_cap=_MH_DF_CAP,
        n_docs=n,
    )
    return pairs.select(
        "doc_a", "doc_b", "n_a", "n_b", "inter", pround(F.col("jaccard"), 6).alias("jaccard")
    )


# --- SimHash near-dedup -----------------------------------------------------
_SH_MAX_HAMMING = 3
_SH_BANDS = 4
_sh_width = dedup.SIMHASH_BITS // _SH_BANDS
_sh_band_selects = "\n    UNION ALL ".join(
    f"SELECT doc_id, simhash, {b} AS band_id,"
    f" substring(simhash, {b * _sh_width + 1}, {_sh_width}) AS band_key FROM sig"
    for b in range(_SH_BANDS)
)
_SIMHASH_ORACLE = rf"""
WITH
  {dedup.sql_simhash_signatures("documents")},
  bands AS (
    {_sh_band_selects}
  ),
  cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS simhash_a,
                    b.doc_id AS doc_b, b.simhash AS simhash_b
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
  )
SELECT doc_a, doc_b, simhash_a, simhash_b,
  CAST({dedup.sql_hamming("simhash_a", "simhash_b")} AS INTEGER) AS hamming
FROM cand
WHERE {dedup.sql_hamming("simhash_a", "simhash_b")} <= {_SH_MAX_HAMMING}
""".strip()


@spec("doc_simhash_pairs", oracle=_SIMHASH_ORACLE, tags=("dedup", "simhash"), bench=True)
def q_doc_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit frequency-weighted SimHash near-dup pairs (hamming ≤ 3), banded
    4×16 bits — banding is pigeonhole-EXACT for hamming ≤ 3, so recall is 100%
    with no cross join. One aggregate pass computes all 64 signature bits."""
    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.simhash_near_dup_pairs(
        d, max_hamming=_SH_MAX_HAMMING, bands=_SH_BANDS, n_docs=_n_docs(d, sf_dir)
    )
    return pairs.withColumn("hamming", F.col("hamming").cast("int"))


# --- SimHash-128: the wide-band scale sibling --------------------------------
# Same four-step plan as the 64-bit query, but all 128 md5 bits and 4 × 32-bit
# band keys — 2^16x sparser buckets kill the template-corpus hot-bucket term
# (134 vs 199 s at the 100x tier, SCALING.md round 4). A DIFFERENT metric
# than 64-bit hamming (≈2x the distance per edit), so it sits BESIDE
# doc_simhash_pairs, like doc_minhash_capped beside doc_minhash_lsh.
_sh128_band_selects = "\n    UNION ALL ".join(
    f"SELECT doc_id, simhash128, {b} AS band_id,"
    f" substring(simhash128, {b * 32 + 1}, 32) AS band_key FROM sig"
    for b in range(4)
)
_SIMHASH128_ORACLE = rf"""
WITH
  {dedup.sql_simhash128_signatures("documents")},
  bands AS (
    {_sh128_band_selects}
  ),
  cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, a.simhash128 AS simhash_a,
                    b.doc_id AS doc_b, b.simhash128 AS simhash_b
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
  )
SELECT doc_a, doc_b, simhash_a, simhash_b,
  CAST({dedup.sql_hamming("simhash_a", "simhash_b", n_bits=dedup.SIMHASH128_BITS)} AS INTEGER) AS hamming
FROM cand
WHERE {dedup.sql_hamming("simhash_a", "simhash_b", n_bits=dedup.SIMHASH128_BITS)} <= {_SH_MAX_HAMMING}
""".strip()


@spec(
    "doc_simhash128_pairs",
    oracle=_SIMHASH128_ORACLE,
    tags=("dedup", "simhash", "scale_sibling"),
    bench=True,
)
def q_doc_simhash128_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """128-bit SimHash near-dup pairs (hamming ≤ 3) over 4 × 32-bit bands —
    each band int IS its LSH key (no string slicing), pigeonhole-exact for
    hamming ≤ 3, and the 32-bit key space keeps correlated template corpora
    from concentrating into the hot buckets that dominate the 64-bit
    variant's banding stage at the 100x tier."""
    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.simhash128_near_dup_pairs(
        d, max_hamming=_SH_MAX_HAMMING, n_docs=_n_docs(d, sf_dir)
    )
    return pairs.withColumn("hamming", F.col("hamming").cast("int"))


# --- BPE-ish subword token counting ----------------------------------------
# A GPT-2-style pre-tokenizer simplified to the regex subset both engines
# share: letter runs, digit runs, and single non-alphanumeric marks.
_BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

# --- Karp-Rabin rolling-hash fingerprint ------------------------------------
# Polynomial hash of every char-8-gram: h = Σ ascii(c_j)·B^(7-j) mod M with
# B = 131, M = 2^31−1. Pure 64-bit integer arithmetic (max partial value
# ≈ 6.7e17 < 2^63), bit-identical in any engine; the per-document sketch is
# the min/max gram hash + distinct-gram count (winnowing-style selection).
_KR_B_POWS = [131**k for k in range(8)]  # B^0 .. B^7
_KR_M = 2147483647
_KR_GRAM = 8


def _kr_hash_terms(gram_expr: str) -> str:
    return " + ".join(
        f"CAST(ascii(substring({gram_expr}, {j + 1}, 1)) AS BIGINT) * {_KR_B_POWS[_KR_GRAM - 1 - j]}"
        for j in range(_KR_GRAM)
    )


# Fused with the BPE-ish token counting (same per-doc grain, two explode+agg
# branches joined on doc_id — one registered query covers both operators).
_TOKEN_FP_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_BPE_RE}')) AS tok
  FROM documents
),
tok_stats AS (
  SELECT doc_id,
    count(*) AS n_bpe_tokens,
    CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct_tokens,
    CAST(sum(length(tok)) AS BIGINT) AS total_token_chars,
    CAST(sum(CASE WHEN tok BETWEEN '0' AND '9~' AND substring(tok, 1, 1) BETWEEN '0' AND '9' THEN 1 ELSE 0 END) AS BIGINT) AS n_numeric_tokens
  FROM toks GROUP BY doc_id
),
grams AS (
  SELECT doc_id,
    (({_kr_hash_terms(f"substring(text, i, {_KR_GRAM})")}) % {_KR_M}) AS h
  FROM (
    SELECT doc_id, text,
      unnest(generate_series(1, greatest(length(text) - {_KR_GRAM - 1}, 0))) AS i
    FROM documents
  )
),
gram_stats AS (
  SELECT doc_id,
    count(*) AS n_grams,
    CAST(count(DISTINCT h) AS BIGINT) AS n_distinct_grams,
    min(h) AS fp_min,
    max(h) AS fp_max
  FROM grams GROUP BY doc_id
)
SELECT t.doc_id, n_bpe_tokens, n_distinct_tokens, total_token_chars,
  n_numeric_tokens, n_grams, n_distinct_grams, fp_min, fp_max
FROM tok_stats t LEFT JOIN gram_stats g ON t.doc_id = g.doc_id
""".strip()


@spec("doc_token_fingerprint", oracle=_TOKEN_FP_ORACLE, tags=("text", "tokenize", "fingerprint"))
def q_doc_token_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword (BPE-ish regex) token counting + rolling-hash (Karp-Rabin)
    char-8-gram fingerprinting, joined per doc_id. Token stats: per-doc token
    totals, distinct vocabulary size, character mass, numeric-token count.
    Fingerprint: the min/max gram hash (winnowing primitive for plagiarism /
    near-dup detection) — all arithmetic exact int64, stable across engines
    and cluster sizes. Both branches are explode + aggregate with doc_id as
    the (dense, uniform) shuffle key; the join is co-partitioned on the same
    key, so fusing costs no extra exchange over either standalone query.
    The scan takes the guarded spread (_docs_spread, 2.39x at sf0.1: both
    explode branches ran on one core off the one-row-group scan)."""
    d = _docs_spread(spark, sf_dir)
    toks = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_RE), 0)
        ).alias("tok"),
    )
    is_numeric = F.substring("tok", 1, 1).between("0", "9") & F.col("tok").between(
        "0", "9~"
    )
    tok_stats = toks.groupBy("doc_id").agg(
        F.count("*").alias("n_bpe_tokens"),
        F.countDistinct("tok").alias("n_distinct_tokens"),
        F.sum(F.length("tok")).alias("total_token_chars"),
        F.sum(F.when(is_numeric, 1).otherwise(0)).alias("n_numeric_tokens"),
    )
    grams = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"IF(length(text) >= {_KR_GRAM}, "
                f"transform(sequence(1, length(text) - {_KR_GRAM - 1}), "
                f"i -> substring(text, i, {_KR_GRAM})), array())"
            )
        ).alias("gram"),
    )
    h = F.expr(f"({_kr_hash_terms('gram')}) % {_KR_M}")
    gram_stats = (
        grams.select("doc_id", h.alias("h"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.countDistinct("h").alias("n_distinct_grams"),
            F.min("h").alias("fp_min"),
            F.max("h").alias("fp_max"),
        )
    )
    return tok_stats.join(gram_stats, "doc_id", "left")


# --- benchmark decontamination ----------------------------------------------
# The training-data hygiene step between dedup and split: training documents
# sharing too many char-8-gram fingerprints with the evaluation set must be
# flagged (n-gram-overlap decontamination, the standard published recipe).
# The eval set here is a deterministic pseudo-holdout (doc_id % 97 == 0);
# in production it would be the real benchmark corpus. Reuses the exact
# Karp-Rabin gram hashes from doc_token_fingerprint, so the overlap join
# carries BIGINTs, never text.
#
# Scale shape: eval grams are DISTINCT (one row per gram hash — bounded by
# the eval corpus, typically ~1e6 grams: AQE broadcasts it); train grams
# join-filter against it (semi join), then one aggregate per contaminated
# doc. No shuffle of the full training gram relation when the broadcast
# fires; with a huge eval set it degrades to a co-partitioned equi-join.
_DECON_EVAL_MOD = 97
_DECON_MIN_SHARED = 8

_DECON_ORACLE = rf"""
WITH grams AS (
  SELECT doc_id,
    (({_kr_hash_terms(f"substring(text, i, {_KR_GRAM})")}) % {_KR_M}) AS h
  FROM (
    SELECT doc_id, text,
      unnest(generate_series(1, greatest(length(text) - {_KR_GRAM - 1}, 0))) AS i
    FROM documents
  )
),
eval_grams AS (
  SELECT DISTINCT h FROM grams WHERE doc_id % {_DECON_EVAL_MOD} = 0
),
train_grams AS (
  SELECT DISTINCT doc_id, h FROM grams WHERE doc_id % {_DECON_EVAL_MOD} <> 0
),
overlap AS (
  SELECT t.doc_id, count(*) AS n_shared_grams
  FROM train_grams t JOIN eval_grams e ON t.h = e.h
  GROUP BY t.doc_id
)
SELECT doc_id, n_shared_grams,
  n_shared_grams >= {_DECON_MIN_SHARED} AS contaminated
FROM overlap
""".strip()


@spec("doc_decontaminate", oracle=_DECON_ORACLE, tags=("decontamination", "ngram", "hygiene"))
def q_doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per training doc, the count of distinct
    char-8-gram Karp-Rabin fingerprints shared with the (deterministic
    pseudo-)eval set, plus the threshold flag (≥ 8 shared grams) a
    pipeline's keep/drop filter consumes. Gram hashes are exact int64 —
    identical in both engines. The scan takes the guarded spread
    (_docs_spread, 2.73x at sf0.1: the 8-gram explode feeding BOTH join
    sides ran on one core off the one-row-group scan — the spread beat an
    eager gram cache, 1.14 vs 1.29 s, because parallel recompute is
    cheaper than persist-and-rescan here)."""
    d = _docs_spread(spark, sf_dir)
    grams = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"IF(length(text) >= {_KR_GRAM}, "
                f"transform(sequence(1, length(text) - {_KR_GRAM - 1}), "
                f"i -> substring(text, i, {_KR_GRAM})), array())"
            )
        ).alias("gram"),
    ).select("doc_id", F.expr(f"({_kr_hash_terms('gram')}) % {_KR_M}").alias("h"))
    is_eval = F.col("doc_id") % _DECON_EVAL_MOD == 0
    eval_grams = grams.filter(is_eval).select("h").distinct()
    train_grams = grams.filter(~is_eval).select("doc_id", "h").distinct()
    # semi-join keeps only overlapping grams; no broadcast hint (the eval
    # relation is bounded by the benchmark corpus, not by construction —
    # AQE broadcasts it when it is actually small)
    overlap = train_grams.join(eval_grams, "h")
    return overlap.groupBy("doc_id").agg(
        F.count("*").alias("n_shared_grams")
    ).withColumn(
        "contaminated", F.col("n_shared_grams") >= F.lit(_DECON_MIN_SHARED)
    )


# --- deterministic train/val/test split -------------------------------------
# Spark's df.sample is seeded per-partition: the same row flips in/out when
# the input is repartitioned or compacted. Hash-based assignment is a pure
# function of doc_id — stable across partitionings, re-runs, and engines
# (operators/sampling.py).
_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}
# Corpus balancing: downsample the overrepresented language (en keeps 50%),
# everything else kept whole — the per-stratum deterministic Bernoulli a
# balanced-mix training pipeline applies before splitting.
_BALANCE = {"en": 0.5}

# Sequence-packing block (round 4): the concatenate-then-chop dataloader
# layout (sampling.pack_sequences) summarized per hash shard — n_chars is
# the length unit (a deterministic column; packing semantics are
# unit-agnostic). The window cumsum replays exactly in DuckDB, so the
# layout itself — shard, window id, offset, straddle — is driver-checked.
_PACK_SEQ_LEN = 2048
_PACK_SHARDS = 8

_SPLIT_ORACLE = f"""
WITH labeled AS (
  SELECT doc_id, lang,
    {sampling.sql_split_column("doc_id", _SPLITS)} AS split,
    {sampling.sql_stratified_keep("doc_id", "lang", _BALANCE)} AS kept
  FROM documents
),
pk AS (
  SELECT doc_id, n_chars,
    CAST(floor(u * {_PACK_SHARDS}) AS INTEGER) AS shard, u
  FROM (SELECT doc_id, n_chars,
          {sampling.sql_hash_unit_salted("doc_id", "pack")} AS u
        FROM documents)
),
pos AS (
  SELECT shard, doc_id, n_chars,
    sum(n_chars) OVER (PARTITION BY shard ORDER BY u, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chars AS start_tok
  FROM pk
),
packstats AS (
  SELECT shard,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(max((start_tok + greatest(n_chars, 1) - 1) // {_PACK_SEQ_LEN}) + 1 AS BIGINT) AS n_seqs,
    CAST(count(*) FILTER (
      WHERE (start_tok + greatest(n_chars, 1) - 1) // {_PACK_SEQ_LEN} > start_tok // {_PACK_SEQ_LEN}
    ) AS BIGINT) AS n_straddle
  FROM pos GROUP BY shard
)
SELECT 'split' AS block, split, lang, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(*) FILTER (WHERE kept) AS BIGINT) AS n_balanced,
  CAST(NULL AS INTEGER) AS shard, CAST(NULL AS BIGINT) AS n_seqs,
  CAST(NULL AS BIGINT) AS n_straddle
FROM labeled GROUP BY split, lang
UNION ALL
SELECT 'pack' AS block, CAST(NULL AS VARCHAR) AS split,
  CAST(NULL AS VARCHAR) AS lang, n_docs,
  CAST(NULL AS BIGINT) AS n_balanced, shard, n_seqs, n_straddle
FROM packstats
""".strip()


@spec("doc_train_split", oracle=_SPLIT_ORACLE, tags=("sampling", "split", "balancing", "packing"))
def q_doc_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by hashing doc_id, counted per
    (split, lang), alongside the stratified-balancing survivor count (en
    downsampled to 50% via an INDEPENDENT salted hash — the keep decision
    must not correlate with the split decision). Same doc lands in the same
    split/sample no matter how the corpus is partitioned, grown, or
    re-ingested — the property per-partition-seeded sampling cannot give a
    training pipeline.

    The 'pack' block summarizes sampling.pack_sequences' deterministic
    concatenate-then-chop layout per hash shard (docs, windows, boundary
    straddles at seq_len {2048} chars) — the dataloader-facing layout,
    driver-checked via the replayed window cumsum."""
    d = load_table(spark, sf_dir, "documents")
    labeled = d.select(
        sampling.split_column("doc_id", _SPLITS).alias("split"),
        "lang",
        sampling.stratified_keep("doc_id", "lang", _BALANCE).alias("kept"),
    )
    null_pack = [
        F.lit(None).cast("int").alias("shard"),
        F.lit(None).cast("bigint").alias("n_seqs"),
        F.lit(None).cast("bigint").alias("n_straddle"),
    ]
    split_block = (
        labeled.groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_if(F.col("kept")).alias("n_balanced"),
        )
        .select(F.lit("split").alias("block"), "split", "lang", "n_docs", "n_balanced", *null_pack)
    )
    packed = sampling.pack_sequences(
        d.select("doc_id", F.col("n_chars").alias("n_tokens")),
        seq_len=_PACK_SEQ_LEN,
        shards=_PACK_SHARDS,
    )
    pack_block = (
        packed.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            (F.max("end_seq") + F.lit(1)).alias("n_seqs"),
            F.count_if(F.col("end_seq") > F.col("seq_id")).alias("n_straddle"),
        )
        .select(
            F.lit("pack").alias("block"),
            F.lit(None).cast("string").alias("split"),
            F.lit(None).cast("string").alias("lang"),
            "n_docs",
            F.lit(None).cast("bigint").alias("n_balanced"),
            "shard",
            "n_seqs",
            "n_straddle",
        )
    )
    return split_block.unionByName(pack_block)


# --- token-budget corpus selection ------------------------------------------

_BUDGET_TOKENS = 12_000  # ~45% of the sf0.01 corpus's token mass

_TOKEN_BUDGET_ORACLE = f"""
WITH scored AS (
  SELECT doc_id,
    CAST({_SQL_N_TOKENS} AS BIGINT) AS n_tokens,
    {sql_pround(_SQL_QUALITY, 6)} AS quality_score
  FROM documents
)
{sampling.sql_sample_to_token_budget(
    "scored", _BUDGET_TOKENS,
    select="doc_id, n_tokens, quality_score",
)}
""".strip()


@spec_tests_only(
    "doc_token_budget_sample",
    oracle=_TOKEN_BUDGET_ORACLE,
    tags=("sampling", "tokens", "quality"),
)
def q_doc_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy quality-first selection under a token budget ("fill the
    training mix with the best 12k tokens"): score each doc with
    doc_text_stats' token count + composite quality, then
    sampling.sample_to_token_budget — bucketed two-phase selection whose
    kept SET equals the oracle's global ordered cumsum while only the
    straddling quality bucket pays an ordered window (the wholesale-kept
    mass is a filter). Tests-only: DuckDB parity runs through
    tests/test_oracle_parity.py (the r13 slot rotation was rolled back to
    keep the driver registry identical to round 12)."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.regexp_extract_all(F.col("text"), F.lit(_TOKEN_RE), 0))
    n_stop = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(_STOP_RE), 0))
    stop_ratio = n_stop.cast("double") / F.nullif(n_tokens, F.lit(0))
    quality = pround(
        F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * 0.6
        + F.least(F.lit(1.0), stop_ratio * 5) * 0.4,
        6,
    )
    scored = d.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        quality.alias("quality_score"),
    )
    return sampling.sample_to_token_budget(scored, _BUDGET_TOKENS)


_MIX_BUDGETS = {"en": 6_000, "de": 2_000, "fr": 1_500, "es": 1_500}  # zh -> default 0

_TOKEN_MIX_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang,
    CAST({_SQL_N_TOKENS} AS BIGINT) AS n_tokens,
    {sql_pround(_SQL_QUALITY, 6)} AS quality_score
  FROM documents
)
{sampling.sql_sample_to_token_budget_by(
    "scored", _MIX_BUDGETS, strata_col="lang",
    select="doc_id, lang, n_tokens, quality_score",
)}
""".strip()


@spec_tests_only(
    "doc_token_mix_sample",
    oracle=_TOKEN_MIX_ORACLE,
    tags=("sampling", "tokens", "mix"),
)
def q_doc_token_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token budgets — the mix-ratio selection a pretraining
    corpus plan specifies ("6k en tokens, 2k de, ..."): quality-first fill
    within each language via the PARTITIONED ordered cumsum (strata spread
    the sort; unlisted languages default to budget 0 and drop out)."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.regexp_extract_all(F.col("text"), F.lit(_TOKEN_RE), 0))
    n_stop = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(_STOP_RE), 0))
    stop_ratio = n_stop.cast("double") / F.nullif(n_tokens, F.lit(0))
    quality = pround(
        F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * 0.6
        + F.least(F.lit(1.0), stop_ratio * 5) * 0.4,
        6,
    )
    scored = d.select(
        "doc_id",
        "lang",
        n_tokens.cast("long").alias("n_tokens"),
        quality.alias("quality_score"),
    )
    return sampling.sample_to_token_budget_by(
        scored, _MIX_BUDGETS, strata_col="lang"
    )


# --- benchmark decontamination ----------------------------------------------

_B60_5GRAM = (
    "(('0x' || substring(md5(concat(w[i+0], ' ', w[i+1], ' ', w[i+2], ' ', "
    "w[i+3], ' ', w[i+4])), 1, 15))::BIGINT)"
)

_CONTAMINATION_ORACLE = f"""
WITH
train AS (SELECT doc_id, text FROM documents WHERE doc_id % 89 <> 3),
bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 89 = 3),
tw AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w FROM train),
tp AS (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 4, 0))) AS i FROM tw),
tsh AS (SELECT DISTINCT doc_id, {_B60_5GRAM} AS b60 FROM tp),
bw AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w FROM bench),
bp AS (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 4, 0))) AS i FROM bw),
bsh AS (SELECT DISTINCT {_B60_5GRAM} AS b60 FROM bp),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
    CAST(sum(CASE WHEN b60 IN (SELECT b60 FROM bsh) THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
  FROM tsh GROUP BY doc_id
)
SELECT t.doc_id,
  CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
  CAST(coalesce(n_overlap, 0) AS BIGINT) AS n_overlap,
  {sql_pround("CAST(n_overlap AS DOUBLE) / NULLIF(n_grams, 0)", 6)} AS overlap_frac,
  (coalesce(n_overlap, 0) >= 1) AS is_contaminated
FROM train t LEFT JOIN agg USING (doc_id)
""".strip()


@spec_tests_only(
    "doc_benchmark_contamination",
    oracle=_CONTAMINATION_ORACLE,
    tags=("decontamination", "ngram"),
)
def q_doc_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination sweep: hold out a deterministic slice of
    documents as the "eval set" (doc_id % 89 == 3) and flag every training
    doc sharing a word 5-gram with it — dedup.ngram_contamination, the
    broadcast-membership pass (benchmark gram set is bounded by
    construction; the training side never shuffles text)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 89 == 3)
    train = d.filter(F.col("doc_id") % 89 != 3)
    return dedup.ngram_contamination(train, bench, n=5, min_overlap=1)


# --- end-to-end corpus construction -----------------------------------------

_CC_BUDGET = 6_000

_CORPUS_CONSTRUCTION_ORACLE = f"""
WITH
train AS (SELECT doc_id, text FROM documents WHERE doc_id % 89 <> 3),
bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 89 = 3),
fp AS (
  SELECT doc_id, md5(lower(regexp_replace(text, '\\s+', ' '))) AS fingerprint
  FROM train
),
keepers AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fingerprint),
kept AS (SELECT t.doc_id, t.text FROM train t JOIN keepers USING (doc_id)),
tw AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w FROM kept),
tp AS (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 4, 0))) AS i FROM tw),
tsh AS (SELECT DISTINCT doc_id, {_B60_5GRAM} AS b60 FROM tp),
bw AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w FROM bench),
bp AS (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 4, 0))) AS i FROM bw),
bsh AS (SELECT DISTINCT {_B60_5GRAM} AS b60 FROM bp),
contaminated AS (
  SELECT DISTINCT doc_id FROM tsh WHERE b60 IN (SELECT b60 FROM bsh)
),
clean AS (
  SELECT * FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
),
scored AS (
  SELECT doc_id,
    CAST({_SQL_N_TOKENS} AS BIGINT) AS n_tokens,
    {sql_pround(_SQL_QUALITY, 6)} AS quality_score
  FROM clean
)
{sampling.sql_sample_to_token_budget(
    "scored", _CC_BUDGET,
    select="doc_id, n_tokens, quality_score",
)}
""".strip()


@spec(
    "doc_corpus_construction",
    oracle=_CORPUS_CONSTRUCTION_ORACLE,
    tags=("pipeline", "dedup", "decontamination", "sampling"),
    bench=True,
)
def q_doc_corpus_construction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole corpus-construction pipeline in one call — what a user of
    this engine runs to turn a raw crawl into a training mix:

      1. hold out the eval slice (doc_id % 89 == 3) as the benchmark set;
      2. exact-dedup the train side (min-id keeper per canonicalized md5
         fingerprint — doc_exact_dedup's discipline);
      3. drop every keeper sharing a word 5-gram with the benchmark
         (dedup.ngram_contamination, broadcast gram membership);
      4. score survivors (doc_text_stats' token count + quality) and fill
         a 6k-token budget quality-first (sample_to_token_budget).

    Every stage is the already-pinned operator; this spec pins their
    COMPOSITION against a single chained-CTE DuckDB oracle."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 89 == 3)
    train = d.filter(F.col("doc_id") % 89 != 3)
    fp = train.select(
        "doc_id",
        F.md5(F.lower(F.regexp_replace("text", r"\s+", " "))).alias("fingerprint"),
    )
    keepers = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    kept = train.join(keepers.select("doc_id"), "doc_id")
    flags = dedup.ngram_contamination(kept, bench, n=5, min_overlap=1)
    clean = kept.join(
        flags.filter(~F.col("is_contaminated")).select("doc_id"), "doc_id"
    )
    n_tokens = F.size(F.regexp_extract_all(F.col("text"), F.lit(_TOKEN_RE), 0))
    n_stop = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(_STOP_RE), 0))
    stop_ratio = n_stop.cast("double") / F.nullif(n_tokens, F.lit(0))
    quality = pround(
        F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * 0.6
        + F.least(F.lit(1.0), stop_ratio * 5) * 0.4,
        6,
    )
    scored = clean.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        quality.alias("quality_score"),
    )
    return sampling.sample_to_token_budget(scored, _CC_BUDGET)


# --- LM-based quality scoring ------------------------------------------------

_LM_QUALITY_ORACLE = f"""
WITH
ref_en AS (SELECT text FROM documents WHERE lang = 'en'),
docs_all AS (SELECT doc_id, text FROM documents),
{textops.sql_char_bigram_lm_score("docs_all", "ref_en")}
""".strip()


@spec(
    "doc_lm_quality",
    oracle=_LM_QUALITY_ORACLE,
    tags=("quality", "lm", "text"),
)
def q_doc_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring: fit a character-bigram model on the
    trusted slice (lang = 'en') and score EVERY document's mean scaled
    conditional probability under it (textops.char_bigram_lm_score) — the
    'score candidate text under a reference-corpus model' move, with
    integer-exact probabilities so the ranking is engine- and
    fold-order-independent (a log-prob mean would hang on libm ulps).
    In-domain docs score high; other languages and garbage score low.
    The scan takes the guarded spread (_docs_spread, 3.98x at sf0.1: the
    bigram scoring pass ran on one core off the one-row-group scan)."""
    d = _docs_spread(spark, sf_dir)
    ref = d.filter(F.col("lang") == "en").select("text")
    return textops.char_bigram_lm_score(d.select("doc_id", "text"), ref)
