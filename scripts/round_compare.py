#!/usr/bin/env python
"""Round-over-round bench comparison with the BASELINE.md rules applied.

Mechanizes the two-band + untouched-median procedure so a round
comparison is one command instead of a hand-built table:

1. per-band sentinel drift (JVM / Arrow);
2. per-band MEDIAN RAW ratio of the UNTOUCHED queries (pass the touched
   set via --touched; everything else is assumed code-identical);
3. the override check: if a band's sentinel drift and its untouched
   median disagree by more than DISAGREE_X (1.3), the untouched median
   becomes that band's ruler (SCALING.md round 9: sentinels do not
   transport across host pairs whose sentinel ratio moves ~2x);
4. per-query table: raw ratio, ruler-normalized ratio, band, touched
   flag — normalized cells > FLAG_X (1.25) are marked for adjudication
   (check BASELINE.md's scope-grown-queries footnote before calling one
   a regression).

Usage:
  python scripts/round_compare.py BENCH_rOLD.json BENCH_rNEW.json \
      [--touched q1,q2] [--json]

Accepts either the driver's wrapper files ({"parsed": {...}}) or raw
bench.py output lines.
"""
from __future__ import annotations

import json
import statistics
import sys

ARROW_BAND = {
    "doc_minhash_lsh", "doc_minhash_capped", "doc_simhash_pairs",
    "doc_simhash128_pairs", "embedding_topk", "embedding_near_dup",
    "embedding_bucketed_near_dup", "embedding_ann_lsh",
    "embedding_ann_multiprobe", "embedding_ann_multitable",
    "embedding_ivf_topk", "embedding_ivf_pq", "embedding_semantic_dedup",
}
DISAGREE_X = 1.3
FLAG_X = 1.25


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    return d.get("parsed", d)


def main() -> int:
    argv = sys.argv
    skip = {argv[argv.index("--touched") + 1]} if "--touched" in argv else set()
    paths = [a for a in argv[1:] if not a.startswith("--") and a not in skip]
    if len(paths) != 2:
        raise SystemExit(__doc__)
    old, new = load(paths[0]), load(paths[1])
    if "--touched" in argv:
        touched = set(argv[argv.index("--touched") + 1].split(","))
        touched_src = "explicit"
    elif old.get("plan_hash") and new.get("plan_hash"):
        # auto-derive from bench.py's plan fingerprints (round 9): a query
        # whose optimized-plan hash moved was touched. Caveat (see
        # bench.py): a Python-kernel BODY change inside an identical plan
        # node does not move the hash — pass --touched for such rounds.
        touched = {
            q
            for q in set(old["plan_hash"]) & set(new["plan_hash"])
            if old["plan_hash"][q] != new["plan_hash"][q]
            or old["plan_hash"][q] is None
        }
        touched_src = "plan-hash"
    else:
        touched = set()
        touched_src = "none (pass --touched or use plan_hash benches)"
    common = sorted(set(old["queries"]) & set(new["queries"]))
    drift = {}
    for band, key in (("jvm", "sentinel_sec"), ("arrow", "sentinel_arrow_sec")):
        if key in old and key in new:
            drift[band] = new[key] / old[key]
    rulers, medians = {}, {}
    for band in ("jvm", "arrow"):
        un = [
            new["queries"][q] / old["queries"][q]
            for q in common
            if q not in touched and (q in ARROW_BAND) == (band == "arrow")
        ]
        medians[band] = statistics.median(un) if un else None
        ruler, src = drift.get(band), "sentinel"
        if medians[band] is not None and (
            ruler is None
            or max(medians[band] / ruler, ruler / medians[band]) > DISAGREE_X
        ):
            ruler, src = medians[band], "untouched-median"
        rulers[band] = (ruler, src)
    rows = []
    for q in common:
        band = "arrow" if q in ARROW_BAND else "jvm"
        raw = new["queries"][q] / old["queries"][q]
        ruler = rulers[band][0]
        norm = raw / ruler if ruler else None
        rows.append(
            {
                "query": q, "band": band, "raw": round(raw, 3),
                "norm": round(norm, 3) if norm else None,
                "touched": q in touched,
                "flag": bool(norm and norm > FLAG_X and q not in touched),
            }
        )
    out = {
        "old": paths[0], "new": paths[1],
        "touched": sorted(touched), "touched_src": touched_src,
        "total_raw": round(new["value"] / old["value"], 3),
        "sentinel_drift": {k: round(v, 3) for k, v in drift.items()},
        "untouched_median": {
            k: round(v, 3) for k, v in medians.items() if v is not None
        },
        "ruler": {k: (round(v[0], 3), v[1]) for k, v in rulers.items() if v[0]},
        "queries": rows,
    }
    if "--json" in argv:
        print(json.dumps(out))
        return 0
    print(f"total raw {out['total_raw']}  sentinel drift {out['sentinel_drift']}")
    print(f"untouched medians {out['untouched_median']}  rulers {out['ruler']}")
    print(f"\n{'query':30s} {'band':6s} {'raw':>7s} {'norm':>7s}  notes")
    for r in sorted(rows, key=lambda r: -(r["norm"] or 0)):
        notes = ("TOUCHED " if r["touched"] else "") + ("ADJUDICATE" if r["flag"] else "")
        print(
            f"{r['query']:30s} {r['band']:6s} {r['raw']:7.3f} "
            f"{r['norm'] if r['norm'] is not None else float('nan'):7.3f}  {notes}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
