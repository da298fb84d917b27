"""Registry contract: the driver's CORRECTNESS gate records the FIRST 50
queries in registration order (observed cap, round 1) — these assertions
keep every query inside the recorded window and the riskiest families at
the front. Breaking them silently costs driver-side correctness evidence."""

from __future__ import annotations

from stock_etl_pipeline_spark.workload import load_all

REGISTRY = load_all()
DRIVER_WINDOW = 50


def test_registry_fits_driver_window():
    assert len(REGISTRY) <= DRIVER_WINDOW, (
        f"{len(REGISTRY)} registered queries exceed the driver's "
        f"{DRIVER_WINDOW}-entry CORRECTNESS window — fuse or retire one "
        f"(see ROADMAP.md invariants)"
    )


def test_riskiest_families_register_first():
    names = list(REGISTRY)
    first_family = [n for n in names[:12]]
    assert all(
        n.startswith("embedding_") or n in
        {"pricing_summary", "top_customers", "regional_revenue",
         "order_priority", "regional_rollup"}
        for n in first_family
    ), f"vectors/tpch must register first, got {first_family}"


def test_every_query_has_oracle():
    # Every registered query currently carries a SQL twin; a future
    # non-SQL-expressible op may relax this CONSCIOUSLY (update this test
    # with the name and the reason).
    missing = [n for n, s in REGISTRY.items() if not s.oracle]
    assert missing == [], missing


def test_bench_set_is_nonempty_and_registered():
    bench = [n for n, s in REGISTRY.items() if s.bench]
    assert len(bench) >= 20


def test_golden_plan_keys_subset_of_registry():
    # A fusion/rename that retires a query must also update
    # tests/golden_plans.json — a stale golden key would KeyError in
    # test_plans.test_shuffle_budget (round-2 regression). Lock it here so
    # the failure names the orphaned key directly.
    import json
    import pathlib

    golden = json.loads(
        (pathlib.Path(__file__).parent / "golden_plans.json").read_text()
    )
    from stock_etl_pipeline_spark.workload import all_specs

    orphaned = sorted(set(golden) - set(all_specs()))
    assert orphaned == [], (
        f"golden_plans.json keys not in registry (retired without golden "
        f"update?): {orphaned}"
    )
