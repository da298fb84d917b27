"""Entry-path-C fidelity for ALL FIVE reference SQL templates
(reference plugins/helpers/queries.py:22-163; SURVEY.md §3.3).

Two templates run via ``spark.sql`` as registered driver queries
(sql_cross_source, sql_moving_averages). The other three are registered as
DataFrame twins (daily_metrics, profile_suite, ingestion_stats) — this test
closes the loop on them: their oracle texts are written in the SHARED
Spark/DuckDB dialect, so executing the oracle through ``spark.sql`` and
comparing against the DataFrame implementation proves the SQL entry path
produces the identical relation. (The driver separately proves oracle ≡
DataFrame via DuckDB; together the three representations agree.)
"""

from __future__ import annotations

import math

import pytest

from stock_etl_pipeline_spark.datasets import load_table
from stock_etl_pipeline_spark.workload import load_all

SF = "/root/testdata/sf0.01"
REGISTRY = load_all()

# template name -> views its oracle text reads (prices CTE reads lineitem)
TEMPLATES = {
    "daily_metrics": ("lineitem",),
    "profile_suite": ("lineitem",),
    "ingestion_stats": ("events",),
}


# The engine's shared SQL subset has a handful of SPELLING divergences where
# the two engines name the same function differently; semantics are
# identical. These literal bridges are the complete list the oracle corpus
# needs — anything beyond spelling would belong in the query itself.
DIALECT_BRIDGE = [
    # datetime unit: DuckDB quotes it, Spark wants a bare keyword
    ("date_diff('day',", "date_diff(DAY,"),
    # sorted-distinct collection rendering (the documented two-step A6/A3
    # semantics): list(DISTINCT)/list_sort/array_to_string in DuckDB,
    # collect_set/sort_array/array_join in Spark
    ("array_to_string(list_sort(list(DISTINCT ", "array_join(sort_array(collect_set("),
    ("array_to_string(list_sort(list(", "array_join(sort_array(collect_list("),
    ("array_to_string(", "array_join("),
    ("list_sort(", "sort_array("),
    # JSON path extraction: DuckDB json_extract ≡ Spark get_json_object
    # (both return the scalar at the path; the CAST normalizes the type)
    ("json_extract(", "get_json_object("),
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v + 0.0)
    return str(v)


def _rowset(df):
    cols = sorted(range(len(df.columns)), key=lambda i: df.columns[i].lower())
    return sorted(tuple(_norm(r[i]) for i in cols) for r in df.collect())


@pytest.mark.parametrize("name", sorted(TEMPLATES))
def test_sql_text_path_matches_dataframe_twin(spark, name):
    for view in TEMPLATES[name]:
        load_table(spark, SF, view).createOrReplaceTempView(view)
    spec = REGISTRY[name]
    sql = spec.oracle
    for duck, sparkish in DIALECT_BRIDGE:
        sql = sql.replace(duck, sparkish)
    via_sql = spark.sql(sql)
    via_df = spec.fn(spark, SF)
    assert sorted(c.lower() for c in via_sql.columns) == sorted(
        c.lower() for c in via_df.columns
    )
    assert _rowset(via_sql) == _rowset(via_df)
