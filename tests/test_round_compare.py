"""scripts/round_compare.py ruler + auto-touched logic (pure python)."""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "round_compare.py")


def _run(old: dict, new: dict, tmp_path, extra=()):
    a, b = str(tmp_path / "a.json"), str(tmp_path / "b.json")
    json.dump(old, open(a, "w"))
    json.dump(new, open(b, "w"))
    res = subprocess.run(
        [sys.executable, SCRIPT, a, b, "--json", *extra],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr
    return json.loads(res.stdout)


def _bench(queries, sj, sa, ph=None, kh=None):
    d = {
        "value": sum(queries.values()), "queries": queries,
        "sentinel_sec": sj, "sentinel_arrow_sec": sa,
    }
    if ph is not None:
        d["plan_hash"] = ph
    if kh is not None:
        d["kernel_hash"] = kh
    return d


def test_sentinel_ruler_kept_when_agreeing(tmp_path):
    """Same-host modest drift: untouched median ≈ sentinel → sentinel rules."""
    q_old = {"pricing_summary": 1.0, "doc_minhash_lsh": 2.0}
    q_new = {"pricing_summary": 1.1, "doc_minhash_lsh": 2.2}
    out = _run(_bench(q_old, 1.0, 1.0), _bench(q_new, 1.1, 1.1), tmp_path)
    assert out["ruler"]["jvm"][1] == "sentinel"
    assert out["ruler"]["arrow"][1] == "sentinel"
    # normalized ≈ 1.0 → nothing flagged
    assert not any(r["flag"] for r in out["queries"])


def test_untouched_median_override_when_sentinels_break(tmp_path):
    """The round-9 case: sentinels claim the host got 2x faster while
    untouched code reads ~1.1x raw → the median overrides, and the one
    genuinely regressed query is flagged against the MEDIAN, not the
    sentinel (which would flag everything)."""
    q_old = {"a": 1.0, "b": 1.0, "c": 1.0, "bad": 1.0}
    q_new = {"a": 1.1, "b": 1.12, "c": 1.08, "bad": 2.0}
    out = _run(_bench(q_old, 1.0, 1.0), _bench(q_new, 0.5, 0.5), tmp_path)
    assert out["ruler"]["jvm"][1].startswith("untouched-median")
    flagged = [r["query"] for r in out["queries"] if r["flag"]]
    assert flagged == ["bad"]


def test_large_untouched_cohort_outranks_sentinel(tmp_path):
    """The r10→r11 blind spot (VERDICT r11 item 1): the untouched-JVM
    cohort reads a sustained 1.42x while the best-of-N sub-second JVM
    sentinel reads 1.18x — UNDER the 1.3x override, so the sentinel used
    to rule and spuriously flag the most scan-heavy untouched cells at
    norm 1.27–1.40. With ≥ MIN_COHORT (8) untouched queries in the band,
    the median is the ruler OUTRIGHT: the cohort cells normalize to ~1.0
    and nothing untouched is flagged."""
    q_old = {f"q{i}": 1.0 for i in range(9)}
    # a sustained-scan-drift round: everything untouched moved ~1.42x,
    # the heaviest cells a bit more (the exact r10→r11 shape)
    q_new = {f"q{i}": 1.42 for i in range(6)}
    q_new.update({"q6": 1.60, "q7": 1.65, "q8": 1.38})
    out = _run(_bench(q_old, 1.0, 1.0), _bench(q_new, 1.18, 1.18), tmp_path)
    assert out["ruler"]["jvm"][1] == "untouched-median(n=9)"
    # 1.65/1.42 = 1.16 < FLAG_X: the scan-heavy tail is clean, not flagged
    assert not any(r["flag"] for r in out["queries"])
    # median 1.42 vs sentinel 1.18 disagree only 1.20x (< DISAGREE_X):
    # coherent, no incoherence report — but the median still ruled
    assert out["sentinel_disagree"] == {}


def test_small_cohort_keeps_sentinel_rule(tmp_path):
    """Below MIN_COHORT the old rule holds: a 3-query median that agrees
    with the sentinel does not displace it (a tiny cohort is noisier than
    the probe)."""
    q_old = {"a": 1.0, "b": 1.0, "c": 1.0}
    q_new = {"a": 1.1, "b": 1.1, "c": 1.1}
    out = _run(_bench(q_old, 1.0, 1.0), _bench(q_new, 1.1, 1.1), tmp_path)
    assert out["ruler"]["jvm"][1] == "sentinel"


def test_incoherent_sentinel_reported_when_median_rules(tmp_path):
    """When a ≥MIN_COHORT median rules AND the sentinel disagrees with it
    by more than DISAGREE_X, the disagreement is surfaced as a coherence
    report (the probe is mismeasuring its band)."""
    q_old = {f"q{i}": 1.0 for i in range(8)}
    q_new = {f"q{i}": 1.5 for i in range(8)}
    out = _run(_bench(q_old, 1.0, 1.0), _bench(q_new, 1.0, 1.0), tmp_path)
    assert out["ruler"]["jvm"][1] == "untouched-median(n=8)"
    assert out["sentinel_disagree"]["jvm"] == 1.5


def test_auto_touched_from_plan_hash(tmp_path):
    """Differing plan fingerprints mark a query touched: it is excluded
    from the median ruler and never flagged (touched cells are the
    round's own responsibility, adjudicated by its A/Bs)."""
    q_old = {"a": 1.0, "b": 1.0, "c": 1.0}
    q_new = {"a": 1.0, "b": 1.0, "c": 3.0}
    ph_old = {"a": "h1", "b": "h2", "c": "h3"}
    ph_new = {"a": "h1", "b": "h2", "c": "CHANGED"}
    out = _run(
        _bench(q_old, 1.0, 1.0, ph_old), _bench(q_new, 1.0, 1.0, ph_new), tmp_path
    )
    assert out["touched"] == ["c"]
    assert out["touched_src"].startswith("plan+kernel-hash")
    c = next(r for r in out["queries"] if r["query"] == "c")
    assert c["touched"] and not c["flag"]
    # the untouched median ignores c: ruler stays ~1.0
    assert abs(out["untouched_median"]["jvm"] - 1.0) < 1e-9


def test_parsed_null_wrapper_reconstructed_from_tail(tmp_path):
    """The r9 truncation shape (VERDICT r9 item 1): a driver wrapper with
    "parsed": null must be reconstructed from its head-truncated tail —
    surviving timing cells compared, fingerprints recovered under the
    correct map, partial flagged, total recomputed over common cells."""
    q = {"alpha": 1.0, "beta": 2.0, "gamma": 3.0}
    inner = json.dumps({
        "metric": "workload_total", "value": 6.0, "unit": "sec",
        "queries": q, "sf": 0.1, "sentinel_sec": 0.4,
        "sentinel_arrow_sec": 0.5,
        "plan_hash": {"alpha": "a" * 12, "beta": "b" * 12, "gamma": "c" * 12},
    })
    # truncate the head: drop "metric"/"value" and chop MID-pair through
    # alpha so its opening quote is gone (must be dropped, not guessed)
    tail = inner[inner.index('"alpha"') + 3:]
    wrapper = {"n": 9, "rc": 0, "cpus": 32, "sf": 0.1, "tail": tail,
               "parsed": None}
    old = _bench(q, 0.4, 0.5,
                 ph={"alpha": "a" * 12, "beta": "b" * 12, "gamma": "X" * 12})
    a, b = str(tmp_path / "old.json"), str(tmp_path / "new.json")
    json.dump(old, open(a, "w"))
    json.dump(wrapper, open(b, "w"))
    res = subprocess.run(
        [sys.executable, SCRIPT, a, b, "--json"],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr
    out = json.loads(res.stdout)
    assert out["partial"] is True
    # alpha's timing pair was chopped mid-pair -> only beta/gamma compared
    names = {r["query"] for r in out["queries"]}
    assert names == {"beta", "gamma"}
    assert out["total_basis"] == "common-2"
    # gamma's recovered plan hash differs from old -> touched
    assert out["touched"] == ["gamma"]


def test_real_r9_artifact_loads(tmp_path):
    """The in-tree BENCH_r09.json (parsed: null) must be consumable
    against BENCH_r08.json — the exact pair that crashed in round 9."""
    res = subprocess.run(
        [sys.executable, SCRIPT,
         os.path.join(REPO, "BENCH_r08.json"),
         os.path.join(REPO, "BENCH_r09.json"), "--json"],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr
    out = json.loads(res.stdout)
    assert out["partial"] is True
    assert len(out["queries"]) >= 20
    # r8 predates fingerprints entirely -> fallback: full median basis,
    # and the round-9 override must fire (sentinels claim ~0.5x)
    assert out["ruler"]["jvm"][1].startswith("untouched-median")
    assert not any(r["flag"] for r in out["queries"])


def test_kernel_hash_edit_flips_touched(tmp_path):
    """A kernel-body-only edit (plan hash STABLE, kernel hash moved) marks
    the query touched — the round-9 blind spot closed (VERDICT item 3)."""
    q_old = {"a": 1.0, "b": 1.0, "c": 1.0}
    q_new = {"a": 1.0, "b": 1.0, "c": 2.5}
    ph = {"a": "1" * 12, "b": "2" * 12, "c": "3" * 12}  # identical plans
    kh_old = {"a": "d" * 12, "b": "e" * 12, "c": "f" * 12}
    kh_new = {"a": "d" * 12, "b": "e" * 12, "c": "0" * 12}  # c's kernel edited
    out = _run(
        _bench(q_old, 1.0, 1.0, ph=ph, kh=kh_old),
        _bench(q_new, 1.0, 1.0, ph=ph, kh=kh_new),
        tmp_path,
    )
    assert out["touched"] == ["c"]
    c = next(r for r in out["queries"] if r["query"] == "c")
    assert c["touched"] and not c["flag"]
    assert abs(out["untouched_median"]["jvm"] - 1.0) < 1e-9


def test_none_hash_either_side_excluded_as_unknown(tmp_path):
    """A query whose hash is None on either side (fingerprinting failed)
    is excluded from the untouched median and reported — never silently
    treated as untouched (ADVICE r9)."""
    q_old = {"a": 1.0, "b": 1.0, "c": 1.0, "d": 1.0}
    q_new = {"a": 1.2, "b": 1.2, "c": 1.2, "d": 5.0}  # d regressed 5x...
    ph_old = {"a": "1" * 12, "b": "2" * 12, "c": "3" * 12, "d": None}
    ph_new = {"a": "1" * 12, "b": "2" * 12, "c": "3" * 12, "d": None}
    out = _run(
        _bench(q_old, 1.0, 1.0, ph=ph_old),
        _bench(q_new, 1.0, 1.0, ph=ph_new),
        tmp_path,
    )
    assert out["unknown"] == ["d"]
    assert "unknown excluded" in out["touched_src"]
    # ...and d does NOT poison the median (1.2, not dragged by 5.0)
    assert abs(out["untouched_median"]["jvm"] - 1.2) < 1e-9
    d = next(r for r in out["queries"] if r["query"] == "d")
    assert d["unknown"] and not d["touched"]


def test_fp_sidecar_merge(tmp_path):
    """--fp-new merges a PLANHASH.json sidecar into a bench file that has
    no inline fingerprints (the new compact-final-line format)."""
    q = {"a": 1.0, "b": 1.0}
    old = _bench(q, 1.0, 1.0, ph={"a": "1" * 12, "b": "2" * 12},
                 kh={"a": "aa" * 6, "b": "bb" * 6})
    new = _bench({"a": 1.0, "b": 3.0}, 1.0, 1.0)  # no inline fingerprints
    sc = str(tmp_path / "PLANHASH.json")
    json.dump({"metric": "code_fingerprints",
               "plan_hash": {"a": "1" * 12, "b": "9" * 12},
               "kernel_hash": {"a": "aa" * 6, "b": "bb" * 6}}, open(sc, "w"))
    out = _run(old, new, tmp_path, extra=("--fp-new", sc))
    assert out["touched"] == ["b"]
    assert out["unknown"] == []


def test_wrapper_with_valid_parsed_scrapes_tail_fingerprints(tmp_path):
    """A driver wrapper whose final line parsed fine still carries its
    fingerprints only in the TAIL text (output contract: the compact
    final line has no hash maps) — load() must scrape them so the
    artifact is self-contained without sidecar flags."""
    q = {"a": 1.0, "b": 1.0}
    inner = _bench(q, 1.0, 1.0)
    tail = (
        '{"metric": "code_fingerprints", "fp_version": 2, '
        '"plan_hash": {"a": "111111111111", "b": "222222222222"}, '
        '"kernel_hash": {"a": "dddddddddddd", "b": "eeeeeeeeeeee"}}\n'
        + json.dumps(inner)
    )
    wrapper = {"n": 1, "rc": 0, "parsed": inner, "tail": tail}
    old = _bench(q, 1.0, 1.0, ph={"a": "1" * 12, "b": "2" * 12},
                 kh={"a": "d" * 12, "b": "0" * 12})  # b's kernel differs
    old["fp_version"] = 2
    out = _run(old, wrapper, tmp_path)
    assert out["touched"] == ["b"]
    assert out["unknown"] == []


def test_fp_version_mismatch_uses_compat_map(tmp_path):
    """The round AFTER an FP_VERSION bump (v2 -> v3, round 11): the new
    side's sidecar carries a compat block with the OLD scheme's kernel
    hashes — the tool compares old-scheme to old-scheme through it and
    keeps the touched-derivation instead of falling back to the full
    median."""
    q_old = {"a": 1.0, "b": 1.0}
    q_new = {"a": 1.0, "b": 2.5}
    ph = {"a": "1" * 12, "b": "2" * 12}
    old = _bench(q_old, 1.0, 1.0, ph=ph, kh={"a": "d" * 12, "b": "e" * 12})
    old["fp_version"] = 2
    new = _bench(q_new, 1.0, 1.0, ph=ph, kh={"a": "x" * 12, "b": "y" * 12})
    new["fp_version"] = 3  # v3 hashes differ wholesale from v2 — incomparable
    new["compat"] = {
        "fp_version": 2,
        "plan_hash": ph,
        "kernel_hash": {"a": "d" * 12, "b": "0" * 12},  # b's kernel edited
    }
    out = _run(old, new, tmp_path)
    assert out["touched"] == ["b"]
    assert "compat v2" in out["touched_src"]
    assert abs(out["untouched_median"]["jvm"] - 1.0) < 1e-9


def test_fp_version_mismatch_falls_back_to_full_median(tmp_path):
    """Hashes from different hashing schemes (fp_version 1 vs 2 — the
    round-10 analyzed-plan switch) are incomparable: every hash differs, so
    cross-version derivation would mark everything touched and empty the
    ruler. The tool must instead fall back to the full-median basis and say
    why."""
    q_old = {"a": 1.0, "b": 1.0, "doc_minhash_lsh": 1.0}
    q_new = {"a": 1.1, "b": 1.1, "doc_minhash_lsh": 1.1}
    old = _bench(
        q_old, 1.0, 1.0,
        ph={"a": "1" * 12, "b": "2" * 12, "doc_minhash_lsh": "3" * 12},
    )
    new = _bench(
        q_new, 1.1, 1.1,
        ph={"a": "a" * 12, "b": "b" * 12, "doc_minhash_lsh": "c" * 12},
        kh={"a": "d" * 12, "b": "e" * 12, "doc_minhash_lsh": "f" * 12},
    )
    new["fp_version"] = 2  # old side has none -> v1
    out = _run(old, new, tmp_path)
    assert out["touched"] == []
    assert "schemes differ: v1 vs v2" in out["touched_src"]
    # full basis: medians exist for both bands despite every hash moving
    assert out["untouched_median"]["jvm"] == 1.1
    assert out["untouched_median"]["arrow"] == 1.1


def test_fp_version_match_still_derives(tmp_path):
    q_old = {"a": 1.0, "b": 1.0}
    q_new = {"a": 1.0, "b": 1.0}
    old = _bench(q_old, 1.0, 1.0, ph={"a": "1" * 12, "b": "2" * 12})
    new = _bench(q_new, 1.0, 1.0, ph={"a": "1" * 12, "b": "f" * 12})
    old["fp_version"] = 2
    new["fp_version"] = 2
    out = _run(old, new, tmp_path)
    assert out["touched"] == ["b"]
