"""Transform stage: canonicalize → cast → derive metrics.

Spark twin of the reference's eager pandas transform
(reference dags/utils/transformers.py:10-76) — here a single lazy
DataFrame → DataFrame composition (all narrow ops; no shuffle; stays entirely
inside whole-stage codegen).

Per-row operator inventory covered: P1/P2 (rename+projection via the sources
module), P5 string→date, P6 date→string at sink only, P7 float casts, P8
volume null→0 + long cast, P9 processing timestamp, P10 daily_change_pct,
P11 daily_volatility (SURVEY.md §2.3).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import pround

CANONICAL_COLUMNS = [
    "date",
    "symbol",
    "open",
    "high",
    "low",
    "close",
    "volume",
    "data_source",
]


def derive_metrics(df: DataFrame, round_digits: int = 2) -> DataFrame:
    """Append the two derived metrics (reference dags/utils/transformers.py:62-65).

    daily_change_pct = round((close-open)/open*100, 2)
    daily_volatility = round((high-low)/open*100, 2)

    Rounding is the engine's portable floor-based pround (half-way → +inf);
    pandas .round() is banker's rounding, so exact reference fidelity at
    half-way cases is impossible anyway — pround is canonical engine-wide.
    """
    open_, high, low, close = (F.col(c) for c in ("open", "high", "low", "close"))
    return df.withColumns(
        {
            "daily_change_pct": pround((close - open_) / open_ * 100, round_digits),
            "daily_volatility": pround((high - low) / open_ * 100, round_digits),
        }
    )


def transform_stock_data(
    df: DataFrame,
    processed_at: dt.datetime | None = None,
) -> DataFrame:
    """Full transform stage (reference dags/utils/transformers.py:10-76).

    - cast date (P5), prices to double (P7)
    - volume: null→0 + cast long (P8 — reference transformers.py:54-55;
      note this loses the null/zero distinction, faithful to reference)
    - processed_at stamp (P9) — pass a frozen ``processed_at`` for
      reproducible tests (SURVEY.md §7 frozen-clock requirement)
    - derived metrics (P10/P11)
    """
    stamp = (
        F.lit(processed_at).cast("timestamp")
        if processed_at is not None
        else F.current_timestamp()
    )
    out = df.withColumns(
        {
            "date": F.col("date").cast("date"),
            "open": F.col("open").cast("double"),
            "high": F.col("high").cast("double"),
            "low": F.col("low").cast("double"),
            "close": F.col("close").cast("double"),
            "volume": F.coalesce(F.col("volume"), F.lit(0)).cast("long"),
            "processed_at": stamp,
        }
    )
    if "extracted_at" in out.columns:
        out = out.drop("extracted_at")
    return derive_metrics(out)
