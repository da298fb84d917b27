"""Distinct-count sketches: HyperLogLog and KMV (k-minimum-values), built
engine-portable so the DuckDB oracle replays the exact same sketch.

Why sketches at all: exact ``COUNT(DISTINCT x)`` shuffles every distinct
value; at 100 TB the distinct set itself is the bottleneck. Both sketches
reduce a group's distinct-count state to a FIXED-SIZE summary with
map-side partial aggregation:

- **HLL**: 2^b registers, register j = max rho (leading-zero rank) of
  hashes landing in bucket j. The shuffle carries ≤ 2^b small ints per
  group regardless of cardinality; merge = elementwise max (what the
  partial aggregate already does).
- **KMV**: the k smallest normalized hash values; estimate (k−1)/u_k from
  the k-th order statistic. Merge = k smallest of the union. No
  logarithms anywhere — every arithmetic step is exact in doubles
  (integer / 2^60 and (k−1)/u_k are single correctly-rounded ops), so
  cross-engine equality is unconditional.

Portability discipline (same md5 approach as operators/dedup.py): bucket =
first 2 hex nibbles; rank source = next 15 nibbles as a 60-bit int (fits
int64 in both engines; hex-parse differs only syntactically —
``conv(...,16,10)`` vs ``('0x'||...)::BIGINT``). rho via binary-string
length (``bin()`` exists in both) — no floating log2, whose edge rounding
could disagree. The only transcendental is HLL's small-range linear-count
``ln(m/zeros)``; its cross-engine risk is sub-ulp and the estimate is
floor-rounded to 1e-6 on both sides (functions.pround discipline).

Spark's built-in ``approx_count_distinct`` is the production shortcut but
is NOT oracle-checkable (its HLL++ internals aren't replayable in SQL);
these operators trade a constant factor for verifiability — the register
construction itself is the contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# m = 2^HLL_B registers; relative error ≈ 1.04/sqrt(m) ≈ 6.5% at b=8.
HLL_B = 8
HLL_M = 1 << HLL_B
# alpha_m for m = 256: 0.7213/(1 + 1.079/m)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)

KMV_K = 64
_KMV_SCALE = float(1 << 60)  # 60-bit hash → u = v / 2^60 ∈ [0, 1)


# --- shared hash pieces ------------------------------------------------------


def _bucket(col: str) -> Column:
    """First 8 hash bits → register index 0..255."""
    return F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 2), 16, 10).cast(
        "int"
    )


def _rank_value(col: str) -> Column:
    """Next 60 hash bits as a BIGINT (the rho / order-statistic source)."""
    return F.conv(F.substring(F.md5(F.col(col).cast("string")), 3, 15), 16, 10).cast(
        "long"
    )


def sql_bucket(col: str) -> str:
    return f"CAST(('0x' || substring(md5(CAST({col} AS VARCHAR)), 1, 2))::BIGINT AS INTEGER)"


def sql_rank_value(col: str) -> str:
    return f"('0x' || substring(md5(CAST({col} AS VARCHAR)), 3, 15))::BIGINT"


# --- HyperLogLog -------------------------------------------------------------


def _rho() -> Column:
    """1-based position of the highest set bit from the top of the 60-bit
    lane: 61 − bit_length(v); all-zero lane saturates at 61. bin() strips
    leading zeros, so length(bin(v)) IS bit_length — integer-exact, unlike
    floor(log2(v)) whose double rounding can disagree at powers of two."""
    v = F.col("v")
    return F.when(v == 0, F.lit(61)).otherwise(
        F.lit(61) - F.length(F.expr("bin(v)"))
    ).cast("int")


def hll_registers(df: DataFrame, col: str, group_cols: list[str] | None = None) -> DataFrame:
    """Register relation: (groups..., bucket, register) with register =
    max rho. One hash aggregate; partial combine reduces every partition's
    contribution to ≤ m rows per group before the shuffle."""
    keys = list(group_cols or [])
    hashed = df.select(
        *keys, _bucket(col).alias("bucket"), _rank_value(col).alias("v")
    ).withColumn("rho", _rho())
    return hashed.groupBy(*keys, "bucket").agg(F.max("rho").alias("register"))


def hll_estimate(
    df: DataFrame, col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """HLL distinct estimate per group (column ``hll_distinct``), with the
    standard small-range linear-counting correction.

    Order-independence detail: the indicator sum Σ 2^−register is NOT safe
    to accumulate in doubles (terms span 2^−1..2^−61; double addition of
    mixed magnitudes rounds, so partition order would leak into the result).
    Instead each register contributes the INTEGER 2^(61−register) and the
    sum runs in DECIMAL(38,0) (≤ 256·2^60 < 10^38 — exact, order-free);
    one double conversion at the end is a single deterministic rounding.
    """
    keys = list(group_cols or [])
    regs = hll_registers(df, col, keys)
    m = F.lit(float(HLL_M))
    # register ∈ [1, 61] (v has ≤ 60 bits), so the shift is in [0, 60]
    term = F.expr("CAST(shiftleft(1L, 61 - register) AS DECIMAL(38,0))")
    agg = regs.groupBy(*keys).agg(
        F.sum(term).alias("num"), F.count("*").alias("n_nonempty")
    )
    zeros = (m - F.col("n_nonempty")).cast("double")
    # empty registers contribute 2^0 = 1 each — integer-exact in doubles
    sum_pow = F.col("num").cast("double") / F.lit(float(1 << 61)) + zeros
    raw = F.lit(HLL_ALPHA) * m * m / sum_pow
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0), m * F.log(m / zeros)
    ).otherwise(raw)
    return agg.select(
        *keys,
        (F.floor(est * 1e6 + F.lit(0.5)) / 1e6).alias("hll_distinct"),
    )


def sql_hll_estimate(table: str, col: str, group_cols: list[str] | None = None) -> str:
    """DuckDB twin of hll_estimate: same registers, same correction, same
    1e-6 floor rounding. Returns a full SELECT."""
    keys = list(group_cols or [])
    key_sel = ", ".join(keys)
    key_prefix = f"{key_sel}, " if keys else ""
    group_regs = f"GROUP BY {key_prefix}bucket".rstrip(", ")
    group_est = f"GROUP BY {key_sel}" if keys else ""
    # bare float literals parse as DECIMAL in SQL text (repo-wide gotcha —
    # datasets.PRICES_VIEW_SQL rationale); force DOUBLE arithmetic
    m = f"CAST({float(HLL_M)} AS DOUBLE)"
    alpha = f"CAST({HLL_ALPHA!r} AS DOUBLE)"
    return f"""
WITH h AS (
  SELECT {key_prefix}{sql_bucket(col)} AS bucket, {sql_rank_value(col)} AS v
  FROM {table}
),
r AS (
  SELECT {key_prefix}bucket,
    max(CASE WHEN v = 0 THEN 61 ELSE 61 - length(bin(v)) END) AS register
  FROM h {group_regs}
),
s AS (
  SELECT {key_prefix}
    sum(CAST(1::BIGINT << (61 - register) AS HUGEINT)) AS num,
    count(*) AS n_nonempty
  FROM r {group_est}
),
e AS (
  SELECT {key_prefix}
    CAST(num AS DOUBLE) / CAST({float(1 << 61)} AS DOUBLE)
      + ({m} - n_nonempty) AS sum_pow,
    {m} - n_nonempty AS zeros
  FROM s
)
SELECT {key_prefix}
  floor((CASE WHEN {alpha} * {m} * {m} / sum_pow <= 2.5 * {m} AND zeros > 0
         THEN {m} * ln({m} / zeros)
         ELSE {alpha} * {m} * {m} / sum_pow
    END) * 1000000.0 + 0.5) / 1000000.0 AS hll_distinct
FROM e
""".strip()


# --- KMV ---------------------------------------------------------------------


# --- fixed-grid histogram quantiles -----------------------------------------

HIST_BUCKETS = 1024


def histogram_quantiles(
    df: DataFrame, col: str, qs: list[float], n_buckets: int = HIST_BUCKETS
) -> DataFrame:
    """Approximate quantiles from a fixed-grid histogram: two aggregate
    passes (global min/max/count, then bucket counts), rank error ≤ one
    bucket's mass, value error ≤ (max−min)/n_buckets.

    This is the scale path sketched in symbol_stats' docstring: exact
    percentile sorts the group; the histogram shuffles ≤ n_buckets longs
    TOTAL with map-side combine, and merges across partitions by addition.
    Estimate = right edge of the first bucket whose cumulative count reaches
    ceil(q·n) — pure integer compare over exact-double bucket edges, so the
    DuckDB twin reproduces it bit-identically (no interpolation, whose
    division could round differently from a different factoring).

    Returns (q, approx_value) — one row per requested quantile.
    """
    rng = df.agg(
        F.min(col).alias("lo"), F.max(col).alias("hi"), F.count("*").alias("n")
    )
    # Width clamped away from zero so a CONSTANT column (hi == lo) still
    # buckets every row at 0 instead of dividing by zero; the edge formula
    # below then returns exactly lo for every q (it multiplies by the
    # UNclamped hi-lo = 0). Mirrored verbatim in the SQL twin.
    width = F.greatest(
        (F.col("hi") - F.col("lo")) / F.lit(float(n_buckets)), F.lit(1e-300)
    )
    bucket = F.least(
        F.greatest(
            F.floor((F.col(col) - F.col("lo")) / width).cast("long"), F.lit(0)
        ),
        F.lit(n_buckets - 1),
    )
    hist = (
        df.join(F.broadcast(rng))
        .select(bucket.alias("bucket"), "lo", "hi", "n")
        .groupBy("bucket", "lo", "hi", "n")
        .agg(F.count("*").alias("cnt"))
    )
    from pyspark.sql import Window

    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    qdf = cum.select(
        "*", F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    )
    # first bucket whose cumulative count reaches ceil(q*n)
    hit = qdf.filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
    edge = F.col("lo") + (F.min("bucket") + 1) * (
        (F.col("hi") - F.col("lo")) / F.lit(float(n_buckets))
    )
    return (
        hit.groupBy("q", "lo", "hi")
        .agg(edge.alias("approx_value"))
        .select("q", "approx_value")
    )


def sql_histogram_quantiles(
    table: str, col: str, qs: list[float], n_buckets: int = HIST_BUCKETS
) -> str:
    """DuckDB twin of histogram_quantiles (identical bucket/edge arithmetic)."""
    q_list = ", ".join(f"CAST({float(q)!r} AS DOUBLE)" for q in qs)
    nb = f"CAST({float(n_buckets)} AS DOUBLE)"
    return f"""
WITH rng AS (
  SELECT min({col}) AS lo, max({col}) AS hi, count(*) AS n FROM {table}
),
h AS (
  SELECT least(greatest(CAST(floor(({col} - lo) / greatest((hi - lo) / {nb}, 1e-300)) AS BIGINT),
               0), {n_buckets - 1}) AS bucket,
         lo, hi, n
  FROM {table}, rng
),
c AS (
  SELECT bucket, lo, hi, n, count(*) AS cnt FROM h GROUP BY bucket, lo, hi, n
),
cum AS (
  SELECT *, sum(cnt) OVER (ORDER BY bucket
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM c
),
qq AS (SELECT unnest([{q_list}]) AS q),
hit AS (
  SELECT qq.q, cum.lo, cum.hi, cum.bucket
  FROM cum, qq WHERE cum.cum >= ceil(qq.q * cum.n)
)
SELECT q, lo + (min(bucket) + 1) * ((hi - lo) / {nb}) AS approx_value
FROM hit GROUP BY q, lo, hi
""".strip()


def kmv_estimate(
    df: DataFrame, col: str, group_cols: list[str] | None = None, k: int = KMV_K
) -> DataFrame:
    """KMV distinct estimate per group (column ``kmv_distinct``).

    k-th smallest DISTINCT hash u_k → (k−1)/u_k; fewer than k distinct
    hashes means the group is small enough to count exactly (the sketch
    holds the whole distinct set). Every step is exact double arithmetic —
    no rounding needed for cross-engine equality.
    """
    from pyspark.sql import Window

    keys = list(group_cols or [])
    hashed = df.select(*keys, _rank_value(col).alias("v")).dropDuplicates(
        keys + ["v"]
    )
    w = Window.partitionBy(*[F.col(c) for c in keys]).orderBy("v")
    topk = hashed.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= k)
    return topk.groupBy(*keys).agg(
        F.when(
            F.count("*") < k, F.count("*").cast("double")
        )
        .otherwise(F.lit(float(k - 1)) / (F.max("v") / F.lit(_KMV_SCALE)))
        .alias("kmv_distinct")
    )


def sql_kmv_estimate(
    table: str, col: str, group_cols: list[str] | None = None, k: int = KMV_K
) -> str:
    keys = list(group_cols or [])
    key_sel = ", ".join(keys)
    key_prefix = f"{key_sel}, " if keys else ""
    part = f"PARTITION BY {key_sel} " if keys else ""
    group = f"GROUP BY {key_sel}" if keys else ""
    return f"""
WITH h AS (
  SELECT DISTINCT {key_prefix}{sql_rank_value(col)} AS v FROM {table}
),
rk AS (
  SELECT {key_prefix}v, row_number() OVER ({part}ORDER BY v) AS r FROM h
)
SELECT {key_prefix}
  CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
       ELSE CAST({k - 1} AS DOUBLE)
            / (CAST(max(v) AS DOUBLE) / CAST({_KMV_SCALE!r} AS DOUBLE))
  END AS kmv_distinct
FROM rk WHERE r <= {k} {group}
""".strip()
