"""Text hygiene operators for training-data pipelines: PII detection and
redaction (emails, phone-like numbers, IPv4), all JVM-side regex.

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

PII_PATTERNS: dict[str, str] = {
    "email": EMAIL_RE,
    "phone": PHONE_RE,
    "ipv4": IPV4_RE,
}

REDACTION_TOKEN = "[PII]"


def pii_count(col: Column | str, kind: str) -> Column:
    """Occurrences of one PII pattern in a string column (JVM regex)."""
    return F.size(F.regexp_extract_all(F.col(col) if isinstance(col, str) else col,
                                       F.lit(PII_PATTERNS[kind]), 0)).cast("long")


def sql_pii_count(col: str, kind: str) -> str:
    """DuckDB twin of pii_count."""
    return f"CAST(len(regexp_extract_all({col}, '{PII_PATTERNS[kind]}')) AS BIGINT)"


def redact_pii(col: Column | str, kinds: tuple[str, ...] = ("email", "phone", "ipv4")) -> Column:
    """Replace every PII match with REDACTION_TOKEN, applying patterns in a
    FIXED order (email first: an email contains digit runs a later phone
    pass could half-eat; applying the more specific pattern first keeps
    redaction idempotent)."""
    out = F.col(col) if isinstance(col, str) else col
    for kind in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[kind], REDACTION_TOKEN)
    return out


def sql_redact_pii(col: str, kinds: tuple[str, ...] = ("email", "phone", "ipv4")) -> str:
    out = col
    for kind in kinds:
        out = f"regexp_replace({out}, '{PII_PATTERNS[kind]}', '{REDACTION_TOKEN}', 'g')"
    return out


def with_pii_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-kind PII counts and the redacted text length — the profile
    columns a corpus-hygiene report needs. One narrow pass, no shuffle."""
    out = df
    for kind in PII_PATTERNS:
        out = out.withColumn(f"n_{kind}", pii_count(text_col, kind))
    return out.withColumn(
        "redacted_len", F.length(redact_pii(text_col)).cast("long")
    )
