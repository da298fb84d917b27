"""Readers for the driver's parquet tables and the deterministic ``prices``
stand-in derivation.

The driver testdata (TESTDATA.md) is a TPC-H-ish star schema; the reference's
domain is daily stock prices. ``PRICES_VIEW_SQL`` maps ``lineitem`` onto the
canonical price-facts shape (FIXTURES.md F5) with pure deterministic scalar
arithmetic, expressed in the ANSI-SQL subset that both Spark SQL and DuckDB
evaluate identically — the same text is the oracle's CTE, guaranteeing that
Spark results and DuckDB oracle results are derived from the same rows.

``prices_df`` is the idiomatic DataFrame-API twin used by the engine's own
operators (identical expressions → identical doubles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Fixed "today" for freshness/interval queries so results are reproducible and
# oracle-comparable (lineitem spans 1995-01-02 .. 2001-11-04; events are 2024).
# The reference pins no clock and uses wall-clock now() everywhere
# (dags/utils/validators.py:130,286) — SURVEY.md §7 calls for a frozen clock.
AS_OF_DATE = "2001-11-08"
EVENTS_AS_OF_TS = "2024-01-15 00:00:00"

# Number of synthetic symbols in the prices view. 16 keeps per-symbol series
# long (≈37k rows/symbol at sf0.1) — window partitions stay meaningful while
# still exercising multi-key shuffles.
N_SYMBOLS = 16

# Deterministic stand-in for FIXTURES.md F5: one price row per lineitem row.
# Invariants hold by construction (l_discount, l_tax ∈ [0, ~0.1]):
# low ≤ open ≤ close ≤ high, close > 0. Valid Spark SQL *and* DuckDB SQL.
# 2-decimal "cents" rounding is floor-based (floor(x+0.5)/100), NOT round():
# round() semantics differ between engines on half-way doubles
# (functions.pround rationale). Divisors are CAST(... AS DOUBLE) because a
# bare 100.0 literal parses as DECIMAL in Spark SQL text (unlike lit() in
# the DataFrame API) and floor() returns BIGINT there — bigint/decimal
# would silently yield DECIMAL columns that hash-mismatch DuckDB's doubles.
PRICES_VIEW_SQL = f"""
SELECT
  CAST(l_shipdate AS DATE) AS date,
  concat('SYM', lpad(CAST(l_partkey % {N_SYMBOLS} AS STRING), 2, '0')) AS symbol,
  floor(l_extendedprice * (1 - l_discount) + 0.5) / CAST(100.0 AS DOUBLE) AS open,
  floor(l_extendedprice * (1 + l_tax) + 0.5) / CAST(100.0 AS DOUBLE) AS high,
  floor(l_extendedprice * (1 - l_discount) * (1 - l_tax) + 0.5) / CAST(100.0 AS DOUBLE) AS low,
  floor(l_extendedprice + 0.5) / CAST(100.0 AS DOUBLE) AS close,
  CAST(floor(l_quantity) AS BIGINT) * 100 AS volume,
  CASE WHEN l_linenumber % 2 = 0 THEN 'alpha_vantage' ELSE 'yahoo_finance' END AS data_source
FROM lineitem
""".strip()


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def table_row_count(sf_dir: str, name: str, *, max_files: int = 256) -> int | None:
    """Exact row count of an UNFILTERED table from parquet footer metadata,
    driver-side — no Spark job.

    Several pipelines need the corpus size before they can build their plan
    (LSH tier geometry, signature backend tiers, single-partition spread).
    ``df.count()`` answers that with a full scheduled job (~0.25 s fixed at
    bench scale even though the vectorized reader never decodes a column);
    the footers already carry the identical number. Same driver-side-footer
    discipline as ``_parquet_ts_is_nanos`` above.

    Returns None (callers fall back to ``df.count()``) when the dataset
    resolves to more than ``max_files`` fragments — at that file count a
    sequential driver loop over footers loses to the distributed job — or
    when anything about the footer read fails (non-local path, schema
    evolution across files, missing pyarrow).

    Non-local schemes are refused UP FRONT (same guard as
    ``operators.dedup._total_row_groups``, VERDICT r13 item 2): with an
    fsspec backend installed, ``pyarrow.dataset`` would happily issue up
    to ``max_files`` SERIAL remote footer reads on the driver inside the
    query path before the fragment-count check ever ran — the distributed
    ``count()`` is the right tool there."""
    try:
        from urllib.parse import urlparse

        import pyarrow.dataset as ds

        if urlparse(table_path(sf_dir, name)).scheme not in ("", "file"):
            return None
        dataset = ds.dataset(table_path(sf_dir, name), format="parquet")
        files = getattr(dataset, "files", None)
        if files is not None and len(files) > max_files:
            return None
        # count_rows on an unfiltered parquet dataset is resolved from
        # row-group metadata (no column decode).
        return int(dataset.count_rows())
    except Exception:
        return None


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # The driver's events.parquet carries TIMESTAMP(NANOS) which the
        # vectorized Parquet reader rejects; read nanos as long and truncate
        # to microseconds (matching DuckDB's ns→µs truncation) JVM-side.
        # Schema-driven, not name-driven: a re-materialized events table
        # (bronze layers, the soak tier) already has µs timestamps and must
        # pass through untouched. The nanosAsLong conf is session-global by
        # Spark's design (it applies at scan execution, so it cannot be
        # set-and-restored around a lazy read) — gate the mutation on the
        # footer actually containing ns so µs tables never flip it.
        from pyspark.sql.types import LongType

        path = table_path(sf_dir, name)
        if _parquet_ts_is_nanos(path):
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn(
                "ts", F.expr("timestamp_micros(CAST(ts div 1000 AS BIGINT))")
            )
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def _parquet_ts_is_nanos(path: str) -> bool:
    """True iff the parquet file/directory's ``ts`` column is TIMESTAMP(NANOS)
    (driver-side footer peek — no Spark job, no session conf mutation)."""
    try:
        import pyarrow as pa
        import pyarrow.dataset as ds

        field = ds.dataset(path, format="parquet").schema.field("ts")
        return pa.types.is_timestamp(field.type) and field.type.unit == "ns"
    except Exception:
        return False


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    """Register each parquet table as a temp view (for the SQL API surface)."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def prices_df(lineitem: DataFrame) -> DataFrame:
    """DataFrame-API twin of PRICES_VIEW_SQL (identical expressions)."""
    ep, disc, tax = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    half = F.lit(0.5)
    hundred = F.lit(100.0)
    return lineitem.select(
        F.col("l_shipdate").cast("date").alias("date"),
        F.concat(
            F.lit("SYM"),
            F.lpad((F.col("l_partkey") % N_SYMBOLS).cast("string"), 2, "0"),
        ).alias("symbol"),
        (F.floor(ep * (1 - disc) + half) / hundred).alias("open"),
        (F.floor(ep * (1 + tax) + half) / hundred).alias("high"),
        (F.floor(ep * (1 - disc) * (1 - tax) + half) / hundred).alias("low"),
        (F.floor(ep + half) / hundred).alias("close"),
        (F.floor(F.col("l_quantity")).cast("long") * 100).alias("volume"),
        F.when(F.col("l_linenumber") % 2 == 0, F.lit("alpha_vantage"))
        .otherwise(F.lit("yahoo_finance"))
        .alias("data_source"),
    )


def load_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prices_df(load_table(spark, sf_dir, "lineitem"))


def oracle_with_prices(body_sql: str) -> str:
    """Wrap an oracle query body with the prices CTE (DuckDB runs this on its
    pre-registered parquet views)."""
    return f"WITH prices AS (\n{PRICES_VIEW_SQL}\n)\n{body_sql}"
