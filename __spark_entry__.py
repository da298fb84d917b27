"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``stock_etl_pipeline_spark/`` — this file only
adapts the workload registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (W1 rolling moving averages — SURVEY.md §7 step 2) on
    /root/testdata/sf0.001."""
    from stock_etl_pipeline_spark.session import apply_session_defaults
    from stock_etl_pipeline_spark.workload import load_all

    apply_session_defaults(spark)
    return load_all()["moving_averages"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from stock_etl_pipeline_spark.workload import load_all

    return {name: s.fn for name, s in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each query (omitted for genuinely
    non-SQL-expressible ops → driver records a rows-only check)."""
    from stock_etl_pipeline_spark.workload import load_all

    return {name: s.oracle for name, s in load_all().items() if s.oracle is not None}
