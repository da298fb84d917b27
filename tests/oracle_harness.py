"""Local replica of the driver's oracle comparison: run a Spark query and its
DuckDB oracle SQL over the same parquet tables; compare row count, column
names, and order-insensitive values (with float tolerance for diagnostics —
the driver's hash has none, so exact mismatches are reported distinctly).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb

from stock_etl_pipeline_spark.datasets import TABLE_NAMES, table_path


@dataclass
class CompareResult:
    name: str
    ok: bool
    row_count_spark: int = 0
    row_count_oracle: int = 0
    problems: list[str] = field(default_factory=list)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _norm(v):
    """Normalize a cell for order-insensitive exact comparison."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and format at full precision
        return repr(v + 0.0)
    return str(v)


def compare(name: str, spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> CompareResult:
    res = CompareResult(name=name, ok=True)
    spark_rows = spark_df.collect()
    spark_cols = spark_df.columns
    rel = con.sql(sql)
    oracle_cols = rel.columns
    oracle_rows = rel.fetchall()
    res.row_count_spark = len(spark_rows)
    res.row_count_oracle = len(oracle_rows)

    if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in oracle_cols):
        res.ok = False
        res.problems.append(f"columns differ: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}")
        return res
    if len(spark_rows) != len(oracle_rows):
        res.ok = False
        res.problems.append(f"row count: spark={len(spark_rows)} oracle={len(oracle_rows)}")

    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i].lower())
    o_order = sorted(range(len(oracle_cols)), key=lambda i: oracle_cols[i].lower())
    s_set = sorted(tuple(_norm(r[i]) for i in order) for r in spark_rows)
    o_set = sorted(tuple(_norm(r[i]) for i in o_order) for r in oracle_rows)
    if s_set != o_set:
        res.ok = False
        diff_s = [r for r in s_set if r not in set(o_set)][:3]
        diff_o = [r for r in o_set if r not in set(s_set)][:3]
        res.problems.append(f"values differ; spark-only sample={diff_s} oracle-only sample={diff_o}")
    return res
