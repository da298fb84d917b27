"""Physical-plan assertions: the scale properties the engine is designed
around, locked in as tests so a regression in plan shape fails CI —
predicate pushdown to the parquet scan, column pruning, broadcast joins for
dimensions, map-side partial aggregation, and shuffle counts."""

from __future__ import annotations

import re

import pytest

from stock_etl_pipeline_spark.plans import explain_formatted, n_shuffles
from stock_etl_pipeline_spark.workload import all_specs

SF = "/root/testdata/sf0.001"
REGISTRY = all_specs()  # plan budgets cover the tests-only tier too


def plan(spark, name: str) -> str:
    return explain_formatted(REGISTRY[name].fn(spark, SF))


def test_pricing_summary_pushdown_and_pruning(spark):
    p = plan(spark, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in p
    # Column pruning: comment/address columns never leave the scan.
    assert "l_comment" not in p
    assert "partial_sum" in p  # map-side combine before the exchange
    assert n_shuffles(p) == 1  # exactly the aggregate exchange


def test_transform_metrics_is_narrow(spark):
    # Pure per-row transform stage: no shuffle at any point.
    assert n_shuffles(plan(spark, "transform_metrics")) == 0


def test_regional_revenue_broadcasts_dimensions(spark):
    p = plan(spark, "regional_revenue")
    assert "BroadcastHashJoin" in p
    # The region filter reaches the region scan (pushdown through the
    # broadcast chain), so only ASIA rows are ever read.
    assert "EqualTo(r_name,ASIA)" in p
    # At most the fact⋈fact join + final agg shuffle big data (at tiny SF,
    # AQE broadcasts the fact join too and this drops to 1).
    assert n_shuffles(p) <= 3


def test_top_customers_broadcasts_customer_dim(spark):
    p = plan(spark, "top_customers")
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p  # top-k never materializes a full sort


def test_moving_averages_single_window_sort(spark):
    p = plan(spark, "moving_averages")
    # Two exchanges total: the (symbol, date) dedup aggregate, then the
    # (symbol) window repartition of the already-reduced daily rows. A
    # single-shuffle variant (pre-partition by symbol) would cap aggregate
    # parallelism at the symbol cardinality — worse at scale.
    assert "Window" in p
    # all four moving averages share ONE Window operator node
    assert len(re.findall(r"\(\d+\)\s+Window\b", p)) == 1
    assert n_shuffles(p) == 2


def test_quality_suite_single_pass(spark):
    p = plan(spark, "quality_suite")
    # Whole suite = one aggregate job: no joins anywhere in the plan.
    assert "Join" not in p
    assert "partial" in p  # partial aggregation present


def test_merge_upsert_broadcast_anti_join(spark):
    p = plan(spark, "merge_upsert")
    # The daily source must broadcast; the warehouse side must NOT shuffle
    # for the anti join.
    assert "BroadcastHashJoin" in p and "LeftAnti" in p


def test_asof_single_shuffle(spark):
    p = plan(spark, "price_asof_align")
    # union + window formulation: per-side pre-aggregates (2 exchanges) and
    # the symbol window partitioning; no range-join fan-out node.
    assert "Window" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_embedding_topk_broadcasts_queries(spark):
    p = plan(spark, "embedding_topk")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    # corpus side is never exchanged before scoring
    assert n_shuffles(p) <= 1


def test_scans_prune_document_columns(spark):
    p = plan(spark, "doc_exact_dedup")
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m, p
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"doc_id", "text"}  # lang/source/n_chars pruned


@pytest.mark.parametrize(
    "name",
    ["doc_minhash_lsh", "doc_simhash_pairs", "embedding_ann_lsh"],
)
def test_lsh_paths_avoid_cross_joins(spark, name):
    p = plan(spark, name)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


# --- golden shuffle budget ---------------------------------------------------
# tests/golden_plans.json records each query's Exchange and cartesian-product
# node counts at sf0.001. A new plan may use FEWER shuffles (improvement —
# regenerate the file) but never more without an explicit golden update.
import json
import pathlib

_GOLDEN = json.loads(
    (pathlib.Path(__file__).parent / "golden_plans.json").read_text()
)


@pytest.mark.parametrize("name", sorted(_GOLDEN))
def test_shuffle_budget(spark, name):
    from stock_etl_pipeline_spark.plans import summarize

    ps = summarize(REGISTRY[name].fn(spark, SF))
    want = _GOLDEN[name]
    assert ps.shuffles <= want["shuffles"], (
        f"{name}: plan now uses {ps.shuffles} shuffles (golden {want['shuffles']})"
    )
    assert ps.cartesian_products <= want["cartesian"]


def test_window_suite_single_exchange_serves_all_frames(spark):
    """The fusion's contract: strict MA + lag/lead + rank family + RANGE
    frame share the per-symbol partitioning — one dedup-agg exchange + one
    window exchange, no joins, multiple Window nodes off the same sort
    lineage."""
    p = plan(spark, "window_suite")
    assert "Join" not in p
    assert len(re.findall(r"\(\d+\)\s+Window\b", p)) >= 3
    assert n_shuffles(p) == 2


def test_profile_suite_joins_are_single_row(spark):
    """The five profiling sub-reports cross-join as 1-row relations — every
    join input must be an aggregate (never a raw scan on both sides)."""
    p = plan(spark, "profile_suite")
    # the only join mechanism should be broadcast nested loop over 1-row
    # sides (or AQE-planned equivalents) — a SortMergeJoin would mean a
    # data-sized relation slipped into the cross-join lattice
    assert "SortMergeJoin" not in p


def test_minhash_prefilter_lands_before_verify(spark):
    """The signature-estimate prefilter must appear in the optimized plan
    (a filter over >= min-matches of minhash equality comparisons)."""
    from stock_etl_pipeline_spark.workload import docs as docs_mod

    p = plan(spark, "doc_minhash_lsh")
    assert f">= {docs_mod._MH_EST_MIN}" in p or f">= {docs_mod._MH_EST_MIN})" in p
