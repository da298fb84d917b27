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


def with_pii_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-kind PII counts and the redacted text length — the profile
    columns a corpus-hygiene report needs. One narrow pass, no shuffle."""
    out = df
    for kind in PII_PATTERNS:
        out = out.withColumn(f"n_{kind}", pii_count(text_col, kind))
    return out.withColumn(
        "redacted_len", F.length(redact_pii(text_col)).cast("long")
    )
