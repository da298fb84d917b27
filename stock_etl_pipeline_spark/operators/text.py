"""Text hygiene operators for training-data pipelines: PII detection and
redaction (emails, phone-like numbers, IPv4), plus within-document
repetition signals (duplicate word / bigram fractions) — all JVM-side
regex and array higher-order functions, no UDFs, no shuffle.

Patterns are kept to the regex subset Spark (Java) and DuckDB (RE2)
evaluate identically — char classes, bounded quantifiers, literal
alternations; no backreferences or lookaround (RE2 has neither). Counting
uses the SAME pattern as redaction, so `n_redacted = Σ counts` holds by
construction and both engines agree token-for-token.

Reference parity: the reference pipeline has no PII handling — this is
part of the engine's training-data extension surface (a web-scale corpus
pipeline redacts before anything else sees the text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Shared Spark/DuckDB-portable patterns.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# 7+ digit runs allowing separators, anchored on digits at both ends —
# loose on purpose (recall over precision; redaction is the safe direction).
PHONE_RE = r"\+?[0-9][0-9() .-]{5,}[0-9]"
IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
# US-SSN-shaped: ddd-dd-dddd (the dashes are load-bearing — without them
# any 9-digit run would alias with phone/cc).
SSN_RE = r"[0-9]{3}-[0-9]{2}-[0-9]{4}"
# Payment-card-shaped: 4 groups of 4 (last group 1-4) with optional
# space/dash separators — covers 13-16 digit PAN formats.
CC_RE = r"[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{1,4}"

PII_PATTERNS: dict[str, str] = {
    "email": EMAIL_RE,
    "phone": PHONE_RE,
    "ipv4": IPV4_RE,
    "ssn": SSN_RE,
    "cc": CC_RE,
}

REDACTION_TOKEN = "[PII]"

# Redaction order, most-specific → loosest: an email holds digit runs a
# later phone pass would half-eat; card and SSN shapes are proper subsets
# of the loose phone pattern, so they must claim their matches first; the
# catch-all phone pass goes last. Same order on both engines keeps
# redaction deterministic and idempotent.
REDACTION_ORDER: tuple[str, ...] = ("email", "cc", "ssn", "ipv4", "phone")


def pii_count(col: Column | str, kind: str) -> Column:
    """Occurrences of one PII pattern in a string column (JVM regex)."""
    return F.size(F.regexp_extract_all(F.col(col) if isinstance(col, str) else col,
                                       F.lit(PII_PATTERNS[kind]), 0)).cast("long")


def sql_pii_count(col: str, kind: str) -> str:
    """DuckDB twin of pii_count."""
    return f"CAST(len(regexp_extract_all({col}, '{PII_PATTERNS[kind]}')) AS BIGINT)"


def redact_pii(col: Column | str, kinds: tuple[str, ...] = REDACTION_ORDER) -> Column:
    """Replace every PII match with REDACTION_TOKEN, applying patterns in
    the fixed REDACTION_ORDER (see the constant's comment)."""
    out = F.col(col) if isinstance(col, str) else col
    for kind in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[kind], REDACTION_TOKEN)
    return out


def sql_redact_pii(col: str, kinds: tuple[str, ...] = REDACTION_ORDER) -> str:
    out = col
    for kind in kinds:
        out = f"regexp_replace({out}, '{PII_PATTERNS[kind]}', '{REDACTION_TOKEN}', 'g')"
    return out


# --- within-document repetition (Gopher/C4-style quality signals) -----------
# Repeated words / word-bigrams inside a single document are the classic
# low-quality signal (boilerplate loops, keyword stuffing, scraper echo).
# Both metrics are computed per-row with array higher-order functions —
# NO explode, NO shuffle: the narrow doc_text_stats scan stays narrow, which
# is what lets the quality pass run as one map stage over 100 TB.
WORD_RE = r"\S+"


def word_array(col: Column | str) -> Column:
    """Lowercased whitespace-token array (JVM regex, per-row)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(WORD_RE), 0)


def bigram_array(ws: Column) -> Column:
    """Adjacent word pairs from a token-array column, built with an indexed
    transform over a slice — stays inside whole-stage codegen. Spark lambda
    index is 0-based; the DuckDB twin's is 1-based (sql_repetition_cols)."""
    head = F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0)))
    return F.transform(
        head, lambda x, i: F.concat(x, F.lit(" "), F.element_at(ws, i + F.lit(2)))
    )


def repetition_cols(ws: Column) -> dict[str, Column]:
    """Distinct-word / distinct-bigram counts and duplicate fractions.
    word_rep_ratio is NULL only for empty docs (a one-word doc yields 0.0);
    bigram_rep_ratio is NULL for empty/one-word docs — no bigrams means no
    bigram-repetition evidence either way."""
    n_words = F.size(ws)
    nd_words = F.size(F.array_distinct(ws))
    bg = bigram_array(ws)
    n_bg = F.size(bg)
    nd_bg = F.size(F.array_distinct(bg))
    return {
        "n_distinct_words": nd_words.cast("long"),
        "word_rep_ratio": F.lit(1.0) - nd_words.cast("double") / F.nullif(n_words, F.lit(0)),
        "n_distinct_bigrams": nd_bg.cast("long"),
        "bigram_rep_ratio": F.lit(1.0) - nd_bg.cast("double") / F.nullif(n_bg, F.lit(0)),
    }


def sql_repetition_cols(ws: str = "ws") -> dict[str, str]:
    """DuckDB twins of repetition_cols over a list column ``ws``
    (1-based slice + 1-based lambda index)."""
    bg = f"list_transform({ws}[1:len({ws})-1], (x, i) -> concat(x, ' ', {ws}[i+1]))"
    return {
        "n_distinct_words": f"CAST(len(list_distinct({ws})) AS BIGINT)",
        "word_rep_ratio": (
            f"1.0 - CAST(len(list_distinct({ws})) AS DOUBLE) / NULLIF(len({ws}), 0)"
        ),
        "n_distinct_bigrams": f"CAST(len(list_distinct({bg})) AS BIGINT)",
        "bigram_rep_ratio": (
            f"1.0 - CAST(len(list_distinct({bg})) AS DOUBLE) / NULLIF(len({bg}), 0)"
        ),
    }


# --- TF-IDF salient terms ----------------------------------------------------


def tfidf_top_terms(
    df: DataFrame,
    *,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    rank_digits: int | None = None,
) -> DataFrame:
    """Per-document top-k salient terms by smoothed TF-IDF
    (tfidf = tf · (ln((N+1)/(df+1)) + 1), scikit-style smoothing so a
    term present in every document still scores > 0).

    Scale shape: one (doc, term) frequency aggregate (map-side combine),
    one term-level df aggregate, a co-partitioned equi-join on the term
    (the vocabulary grows with the corpus — never broadcast), and a
    per-document window bounded by the document's distinct-term count.
    The corpus size N joins in as a 1-row broadcast aggregate — no
    driver-side count. Ranking is deterministic: ties break on the term
    string — and with ``rank_digits`` set, the ranking key (and the
    emitted score) is floor-rounded first, so a last-ulp ln() difference
    between engines cannot swap ranks (the ANN queries' quantize-before-
    rank pattern; required for the DuckDB oracle twin).

    Returns (id_col, term, tf, df, tfidf, rank) with rank 1..k.
    """
    from pyspark.sql import Window

    toks = (
        df.select(
            id_col,
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0)
            ).alias("term"),
        )
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    docfreq = toks.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.select(
        F.count_distinct(F.col(id_col)).alias("__n")
    )  # 1-row relation; broadcast by AQE
    raw = F.col("tf") * (
        F.log((F.col("__n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)
    )
    if rank_digits is not None:
        from ..functions import pround

        raw = pround(raw, rank_digits)
    scored = (
        toks.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", raw)
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", "rank")
    )


def with_pii_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-kind PII counts and the redacted text length — the profile
    columns a corpus-hygiene report needs. One narrow pass, no shuffle."""
    out = df
    for kind in PII_PATTERNS:
        out = out.withColumn(f"n_{kind}", pii_count(text_col, kind))
    return out.withColumn(
        "redacted_len", F.length(redact_pii(text_col)).cast("long")
    )


# --- character-bigram LM quality scoring (CCNet-style) -----------------------

LM_SCALE = 1_000_000


def _char_bigrams(text_col: str) -> str:
    """Spark SQL: all consecutive lowercase char pairs of ``text_col`` —
    substring-based so the DuckDB twin is a literal re-spelling (splitting
    on an empty regex differs between engines; substring does not)."""
    # IF guard, not greatest(): Spark's sequence(1, 0) is the DESCENDING
    # [1, 0] (DuckDB's generate_series(1, 0) is empty) — a 1-char doc must
    # yield no bigrams in BOTH engines.
    return (
        f"IF(length({text_col}) >= 2, "
        f"transform(sequence(1, length({text_col}) - 1), "
        f"i -> substring(lower({text_col}), i, 2)), array())"
    )


def char_bigram_lm_score(
    df: DataFrame,
    ref: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_text_col: str = "text",
) -> DataFrame:
    """Reference-corpus language-model quality score (the CCNet move:
    score candidate text under a model fit on a trusted corpus; low score
    = out-of-domain or garbage): a character-bigram model with add-one
    smoothing, scored as the MEAN SCALED conditional probability

        p_scaled(b) = floor(LM_SCALE · (cnt(b) + 1) / (cnt(first(b)) + V))

    over the doc's bigrams — (id, n_bigrams, lm_score). Integer counts,
    one integer division per DISTINCT (doc, bigram-position) pair and an
    integer sum make the score exact in any engine/fold order — a log-prob
    mean would hang the verdict on libm's last ulp. Monotone in the usual
    average-likelihood ranking, which is all a quality FILTER consumes.

    Scale shape: the model is two aggregates over the reference corpus
    (bigram counts + start-char counts; vocabulary ≤ charset², reference
    bounded by the caller's choice of trusted slice) joined to the
    candidate bigram stream — AQE broadcasts the model when small, and
    nothing wider than a 2-char key ever shuffles. V (distinct chars) is
    one bounded collect.

    EVERY input doc gets a row: docs with < 2 characters have no bigrams
    and emit (n_bigrams=0, lm_score NULL) — same discipline as
    ngram_contamination — so a downstream quality filter joining on
    lm_score makes an explicit keep/drop decision on short docs instead of
    silently losing them (ADVICE r10).
    """
    big = F.explode(F.expr(_char_bigrams(ref_text_col))).alias("bg")
    ref_bigrams = ref.select(big)
    model = ref_bigrams.groupBy("bg").agg(F.count("*").alias("cnt_b"))
    starts = (
        ref_bigrams.select(F.substring("bg", 1, 1).alias("c0"))
        .groupBy("c0")
        .agg(F.count("*").alias("cnt_f"))
    )
    v = (
        ref.select(
            F.explode(
                F.expr(
                    f"IF(length({ref_text_col}) >= 1, "
                    f"transform(sequence(1, length({ref_text_col})), "
                    f"i -> substring(lower({ref_text_col}), i, 1)), array())"
                )
            ).alias("c")
        )
        .agg(F.countDistinct("c"))
        .collect()[0][0]
        or 1
    )
    doc_bg = df.select(
        F.col(id_col), F.explode(F.expr(_char_bigrams(text_col))).alias("bg")
    ).withColumn("c0", F.substring("bg", 1, 1))
    scored = (
        doc_bg.join(model, "bg", "left")
        .join(starts, "c0", "left")
        .select(
            id_col,
            F.floor(
                F.lit(LM_SCALE)
                * (F.coalesce("cnt_b", F.lit(0)) + 1).cast("double")
                / (F.coalesce("cnt_f", F.lit(0)) + F.lit(int(v))).cast("double")
            ).alias("p_scaled"),
        )
    )
    from ..functions import pround

    agg = scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        pround(F.sum("p_scaled") / F.count("*"), 4).alias("lm_score"),
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
            "lm_score",
        )
    )


def sql_char_bigram_lm_score(
    doc_table: str,
    ref_table: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`char_bigram_lm_score` as a chained-CTE query
    (ends in a SELECT; embed after a WITH that defines the two tables)."""
    from ..functions import sql_pround

    def bigrams(tbl, tcol):
        return (
            f"SELECT unnest(list_transform(generate_series(1, "
            f"greatest(length({tcol}) - 1, 0)), "
            f"i -> substring(lower({tcol}), i, 2))) AS bg FROM {tbl}"
        )

    return f"""
rbg AS ({bigrams(ref_table, ref_text_col)}),
model AS (SELECT bg, CAST(count(*) AS BIGINT) AS cnt_b FROM rbg GROUP BY bg),
starts AS (SELECT substring(bg, 1, 1) AS c0, CAST(count(*) AS BIGINT) AS cnt_f
           FROM rbg GROUP BY 1),
vocab AS (
  SELECT greatest(CAST(count(DISTINCT c) AS BIGINT), 1) AS v FROM (
    SELECT unnest(list_transform(generate_series(1, greatest(length({ref_text_col}), 0)),
      i -> substring(lower({ref_text_col}), i, 1))) AS c FROM {ref_table})
),
dbg AS (
  SELECT {id_col},
    unnest(list_transform(generate_series(1, greatest(length({text_col}) - 1, 0)),
      i -> substring(lower({text_col}), i, 2))) AS bg
  FROM {doc_table}
),
pscore AS (
  SELECT {id_col},
    floor({LM_SCALE} * CAST(coalesce(cnt_b, 0) + 1 AS DOUBLE)
          / CAST(coalesce(cnt_f, 0) + v AS DOUBLE)) AS p_scaled
  FROM dbg
  LEFT JOIN model USING (bg)
  LEFT JOIN starts ON substring(dbg.bg, 1, 1) = starts.c0
  CROSS JOIN vocab
),
lm_agg AS (
  SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_bigrams,
    {sql_pround("CAST(sum(p_scaled) AS DOUBLE) / count(*)", 4)} AS lm_score
  FROM pscore GROUP BY {id_col}
)
SELECT {id_col}, CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams, lm_score
FROM {doc_table} LEFT JOIN lm_agg USING ({id_col})
""".strip()
