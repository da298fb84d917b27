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


def _bench(queries, sj, sa, ph=None):
    d = {
        "value": sum(queries.values()), "queries": queries,
        "sentinel_sec": sj, "sentinel_arrow_sec": sa,
    }
    if ph is not None:
        d["plan_hash"] = ph
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
    assert out["ruler"]["jvm"][1] == "untouched-median"
    flagged = [r["query"] for r in out["queries"] if r["flag"]]
    assert flagged == ["bad"]


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
    assert out["touched_src"] == "plan-hash"
    c = next(r for r in out["queries"] if r["query"] == "c")
    assert c["touched"] and not c["flag"]
    # the untouched median ignores c: ruler stays ~1.0
    assert abs(out["untouched_median"]["jvm"] - 1.0) < 1e-9
