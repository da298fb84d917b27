"""Round-close fingerprint-snapshot freshness check (VERDICT r10 item 1).

Round 10's defect: the committed ``PLANHASH_r10.json`` snapshot was
refreshed mid-session and then kernel-touching commits kept landing, so
the canonical snapshot disagreed with HEAD on 16/32 kernel hashes —
which would have marked the whole doc+embedding family as phantom
"touched" in round 11's untouched-median ruler (scripts/round_compare.py)
and halved its basis.

This script makes snapshot freshness checkable in one command:

    python scripts/fp_check.py                    # kernel hashes only, ~1 s
    python scripts/fp_check.py --plans            # + plan hashes (needs Spark)
    python scripts/fp_check.py --snapshot PLANHASH_r10.json

It recomputes fingerprints from the CURRENT working tree and compares
them to the committed snapshot (default: PLANHASH.json at the repo
root). Kernel hashes are pure source-closure md5s — no Spark, so the
default mode is fast enough to run after every kernel commit. Plan
hashes need a SparkSession and the sf0.001 data; ``--plans`` runs them
when you want the full invariant (round close).

ROUND-CLOSE PROTOCOL (also in ROADMAP.md): after the LAST kernel-touching
commit of a session, run ``python bench.py`` (refreshes PLANHASH.json),
``python scripts/fp_check.py`` (must print OK), then commit
PLANHASH.json AND copy it to PLANHASH_r{N}.json in the same commit.
Exit code 1 on any mismatch, with the disagreeing queries listed.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    snap_path = os.path.join(REPO, "PLANHASH.json")
    if "--snapshot" in sys.argv:
        snap_path = sys.argv[sys.argv.index("--snapshot") + 1]
        if not os.path.isabs(snap_path):
            snap_path = os.path.join(REPO, snap_path)
    with_plans = "--plans" in sys.argv

    with open(snap_path) as f:
        snap = json.load(f)

    from stock_etl_pipeline_spark.fingerprints import FP_VERSION, kernel_fingerprint
    from stock_etl_pipeline_spark.workload import load_all

    if snap.get("fp_version") != FP_VERSION:
        print(
            f"STALE SCHEME: snapshot fp_version={snap.get('fp_version')} "
            f"!= code FP_VERSION={FP_VERSION}; hashes are incomparable "
            f"across versions — refresh the snapshot with bench.py"
        )
        return 1

    registry = load_all()
    bench_specs = {n: s for n, s in sorted(registry.items()) if s.bench}

    bad: list[str] = []
    kh = snap.get("kernel_hash", {})
    for name, s in bench_specs.items():
        fresh = kernel_fingerprint(s.fn)
        if fresh != kh.get(name):
            bad.append(f"kernel {name}: snapshot={kh.get(name)} fresh={fresh}")
    missing = sorted(set(kh) - set(bench_specs))
    extra = sorted(set(bench_specs) - set(kh))
    for n in missing:
        bad.append(f"kernel {n}: in snapshot but not in bench set")
    for n in extra:
        bad.append(f"kernel {n}: in bench set but missing from snapshot")

    if with_plans:
        from stock_etl_pipeline_spark.fingerprints import plan_fingerprint
        from stock_etl_pipeline_spark.session import get_spark

        # default matches bench.py's sf so plan hashes are computed under
        # identical scan relations (paths/schemas can reach the plan string)
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        spark = get_spark(app_name="fp_check")
        ph = snap.get("plan_hash", {})
        os.environ["SPARK_GRAFT_PLAN_ONLY"] = "1"
        try:
            for name, s in bench_specs.items():
                spark.catalog.clearCache()
                try:
                    fresh = plan_fingerprint(s.fn(spark, sf_dir))
                except Exception as e:  # pragma: no cover - env-dependent
                    bad.append(f"plan {name}: fresh computation failed: {e}")
                    continue
                if fresh != ph.get(name):
                    bad.append(
                        f"plan {name}: snapshot={ph.get(name)} fresh={fresh}"
                    )
        finally:
            del os.environ["SPARK_GRAFT_PLAN_ONLY"]

    # INCR artifact freshness GATE (round 12, VERDICT r11 item 2 — r11's
    # informational report let INCR_r11.json close the round measured at
    # bd58d0c while dedup kernels kept landing). The gate is per-FAMILY and
    # exact: the artifact records fp3 closure hashes of each family's
    # measurement entrypoints (incr_lab.FAMILY_KERNEL_FNS); a family whose
    # closure is byte-identical since measurement is FRESH even when HEAD
    # moved (the documented exemption), a family whose closure moved is a
    # round-close FAILURE until incr_lab --json re-measures it.
    import glob
    import subprocess

    incrs = sorted(glob.glob(os.path.join(REPO, "INCR_r*.json")))
    if incrs:
        with open(incrs[-1]) as f:
            incr = json.load(f)
        incr_name = os.path.basename(incrs[-1])
        gaps = {
            k: v.get("full_over_incr")
            for k, v in (incr.get("families") or {}).items()
        }
        recorded = incr.get("family_kernels")
        if recorded:
            import importlib.util

            spec = importlib.util.spec_from_file_location(
                "incr_lab", os.path.join(REPO, "scripts", "incr_lab.py")
            )
            incr_lab = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(incr_lab)
            fresh_fams = incr_lab.family_kernel_hashes()
            stale_fams = sorted(
                f for f, h in fresh_fams.items() if recorded.get(f) != h
            )
            exempt = sorted(set(fresh_fams) - set(stale_fams))
            if stale_fams:
                bad.append(
                    f"INCR {incr_name}: family kernels moved since "
                    f"measurement: {stale_fams} (closure-exempt: {exempt}) "
                    f"— re-run scripts/incr_lab.py --json"
                )
            else:
                print(
                    f"INCR: {incr_name} fresh (all family kernel closures "
                    f"unchanged since measurement at {incr.get('head')}), "
                    f"full/incr gaps {gaps}"
                )
        else:
            # pre-r12 artifact: no per-family closures — only exact-HEAD
            # equality can prove freshness
            head = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, cwd=REPO,
            ).stdout.strip()
            if incr.get("head") == head:
                print(f"INCR: {incr_name} at HEAD, full/incr gaps {gaps}")
            else:
                bad.append(
                    f"INCR {incr_name}: measured at {incr.get('head')} "
                    f"(HEAD is {head}) and carries no family_kernels map — "
                    f"unverifiable; re-run scripts/incr_lab.py --json"
                )

    if bad:
        print(f"FRESHNESS CHECK FAILED ({snap_path}): {len(bad)} issue(s)")
        for line in bad:
            print("  " + line)
        return 1
    mode = "kernel+plan" if with_plans else "kernel"
    print(f"OK: {snap_path} is fresh at HEAD ({mode}, {len(bench_specs)} queries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
