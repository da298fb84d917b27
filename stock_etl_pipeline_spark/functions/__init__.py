"""Scalar/aggregate expression helpers shared across operators.

Cross-engine determinism discipline (the reason these exist):

- ``round()`` is NOT portable across engines: Spark rounds the shortest
  decimal representation HALF_UP (BigDecimal.valueOf), DuckDB rounds the
  binary double — they disagree on every value whose decimal form ends in 5
  (common for money). ``pround`` is floor-based: a pure deterministic IEEE
  function of the input double, identical in any engine.
- Float SUM/AVG accumulation order differs between engines (Spark partial
  aggregates per partition; DuckDB segment trees), so two engines summing the
  same doubles get different last bits — fatal for exact value-hash
  comparison. ``exact_sum``/``exact_avg`` scale to integers first (exact,
  order-independent), sum as longs, and divide once — bitwise identical
  everywhere. Use for any value on a fixed decimal grid (money, 2-decimal
  metrics); scale 100 for cents, 10^6 for micro-units.

These helpers also serve the engine's own reproducibility story (same result
on local[4] and a 1000-executor cluster), not just oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(col: Column, digits: int) -> Column:
    """Portable deterministic rounding: floor(x * 10^d + 0.5) / 10^d.

    Half-way cases go toward +inf (not away-from-zero) — consistent across
    engines, which is what matters for oracle parity.
    """
    scale = float(10**digits)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def scaled_long(col: Column, scale: float = 100.0) -> Column:
    """Deterministically map a fixed-grid double to an exact integer
    (e.g. dollars → cents)."""
    return F.floor(col * F.lit(scale) + F.lit(0.5)).cast("long")


def exact_sum(col: Column, scale: float = 100.0) -> Column:
    """Order-independent sum for fixed-grid doubles: integer sum / scale.

    Long-overflow headroom: values ≤ 10^7 × scale 100 × 10^9 rows ≈ 10^18 —
    fine to ~sf1000 of this workload; at larger scale switch to decimal(38).
    """
    return F.sum(scaled_long(col, scale)) / F.lit(scale)


def exact_avg(col: Column, scale: float = 100.0) -> Column:
    """Order-independent average: integer sum / (scale · count)."""
    return F.sum(scaled_long(col, scale)) / (F.lit(scale) * F.count(col))


# --- SQL-text twins (DuckDB oracle side) -----------------------------------


# Divisors/multipliers that must stay DOUBLE are written CAST(x AS DOUBLE):
# a bare float literal parses as DECIMAL in Spark SQL *text* (unlike the
# DataFrame API's lit()), and bigint/decimal yields DECIMAL — a silent type
# divergence from DuckDB, whose floor() stays DOUBLE. The CAST is a no-op in
# DuckDB and pins Spark SQL to double arithmetic, so one SQL string
# evaluates identically in both engines.


def _dbl(x: float) -> str:
    return f"CAST({x} AS DOUBLE)"


def sql_pround(expr: str, digits: int) -> str:
    scale = float(10**digits)
    return f"floor(({expr}) * {scale} + 0.5) / {_dbl(scale)}"


def sql_scaled_long(expr: str, scale: float = 100.0) -> str:
    return f"CAST(floor(({expr}) * {scale} + 0.5) AS BIGINT)"


def sql_exact_sum(expr: str, scale: float = 100.0) -> str:
    return f"(CAST(sum({sql_scaled_long(expr, scale)}) AS BIGINT) / {_dbl(scale)})"


def sql_exact_avg(expr: str, scale: float = 100.0) -> str:
    return (
        f"(CAST(sum({sql_scaled_long(expr, scale)}) AS BIGINT)"
        f" / ({_dbl(scale)} * count({expr})))"
    )
