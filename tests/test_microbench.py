"""Stage-breakdown harness sanity: every stage prefix builds and runs, and
deltas cover the registered composite queries (workload/microbench.py)."""

from __future__ import annotations

from stock_etl_pipeline_spark.workload import load_all
from stock_etl_pipeline_spark.workload.microbench import STAGES, run_breakdown

SF = "/root/testdata/sf0.001"


def test_breakdown_runs_and_covers_stages(spark):
    out = run_breakdown(spark, SF, reps=1)
    assert set(out) == set(STAGES)
    for name, stages in STAGES.items():
        got = out[name]
        assert set(got) == {label for label, _ in stages} | {"total"}
        assert got["total"] >= 0
        # deltas sum to the final prefix time (floored negatives aside)
        assert sum(v for k, v in got.items() if k != "total") >= got["total"] * 0.5


def test_breakdown_names_are_registered_queries():
    registry = load_all()
    for name in STAGES:
        assert name in registry, f"{name} not a registered query"


def test_ab_parse_arm():
    from scripts.ab import parse_arm

    assert parse_arm("doc_simhash_pairs") == {
        "label": "doc_simhash_pairs", "query": "doc_simhash_pairs", "env": {},
    }
    assert parse_arm("k50=embedding_semantic_dedup:SPARK_GRAFT_SEM_CELLS=50") == {
        "label": "k50",
        "query": "embedding_semantic_dedup",
        "env": {"SPARK_GRAFT_SEM_CELLS": "50"},
    }
    assert parse_arm("a=q:X=1,Y=2")["env"] == {"X": "1", "Y": "2"}
