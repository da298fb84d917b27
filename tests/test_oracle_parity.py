"""Oracle parity for every registered query — the local twin of the driver's
CORRECTNESS gate (sf0.01, DuckDB oracle, order-insensitive exact values)."""

from __future__ import annotations

import pytest

from stock_etl_pipeline_spark.workload import all_specs

from .oracle_harness import compare, duckdb_connection

REGISTRY = all_specs()  # driver registry + tests-only tier: identical parity evidence
ORACLE_CHECKED = sorted(n for n, s in REGISTRY.items() if s.oracle)


@pytest.fixture(scope="module")
def con(sf_oracle):
    c = duckdb_connection(sf_oracle)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_oracle_parity(name, spark, sf_oracle, con):
    s = REGISTRY[name]
    df = s.fn(spark, sf_oracle)
    result = compare(name, df, con, s.oracle)
    assert result.ok, f"{name}: {result.problems}"
    assert result.row_count_spark == result.row_count_oracle


def test_all_queries_return_rows(spark, sf_oracle):
    for name, s in REGISTRY.items():
        n = s.fn(spark, sf_oracle).count()
        assert n >= 0, name
