#!/usr/bin/env python
"""Round-over-round bench comparison with the BASELINE.md rules applied.

Mechanizes the two-band + untouched-median procedure so a round
comparison is one command instead of a hand-built table:

1. per-band sentinel drift (JVM / Arrow);
2. per-band MEDIAN RAW ratio of the UNTOUCHED queries;
3. ruler choice (round 12, VERDICT r11 item 1): when a band has at
   least MIN_COHORT (8) untouched queries, the untouched median IS the
   ruler and the sentinel is demoted to a coherence check (reported as
   ``sentinel_disagree`` when they differ >DISAGREE_X) — a best-of-N
   sub-second probe systematically under-reads sustained scan-tier
   drift (round 9, and again r10→r11 where the untouched-JVM cohort
   moved 1.42x raw while the JVM sentinel read 1.181, spuriously
   flagging six untouched scan-heavy cells at norm 1.27–1.40), while a
   ≥8-query median of the very cells being normalized is robust to up
   to half of them genuinely regressing — and fp3 per-function closures
   already remove genuinely-touched queries from the cohort. Below
   MIN_COHORT the old rule holds: sentinel rules unless it disagrees
   with the (small) median by more than DISAGREE_X (1.3);
4. per-query table: raw ratio, ruler-normalized ratio, band, touched
   flag — normalized cells > FLAG_X (1.25) are marked for adjudication
   (check BASELINE.md's scope-grown-queries footnote before calling one
   a regression).

Touched derivation (unless ``--touched`` overrides): a query is TOUCHED
when its plan fingerprint OR its kernel (module-source-closure)
fingerprint moved between the two rounds — see
stock_etl_pipeline_spark/fingerprints.py. A query whose fingerprints are
unknown on either side (hash None, map truncated, old round predates
kernel hashes AND plan hash missing) is EXCLUDED from the untouched
median and reported, never silently assumed untouched (ADVICE r9).

Input files may be, per side:
- the driver's wrapper ({"parsed": {...}, "tail": "..."}). When
  ``parsed`` is null (the r9 truncation), the queries/sentinels/
  fingerprints are reconstructed from the raw ``tail`` text and the
  comparison runs on the surviving cells, labeled partial.
- a raw bench.py output file (the final JSON line, or the full stdout
  with the code_fingerprints line before it).
Optional ``--fp-old FILE`` / ``--fp-new FILE`` merge fingerprints from a
PLANHASH.json sidecar (bench.py writes one next to itself each run).

Usage:
  python scripts/round_compare.py BENCH_rOLD.json BENCH_rNEW.json \
      [--touched q1,q2] [--fp-old PLANHASH.json] [--fp-new PLANHASH.json] \
      [--json]
"""
from __future__ import annotations

import json
import re
import statistics
import sys

ARROW_BAND = {
    "doc_minhash_lsh", "doc_minhash_capped", "doc_simhash_pairs",
    "doc_simhash128_pairs", "embedding_topk", "embedding_near_dup",
    "embedding_bucketed_near_dup", "embedding_ann_lsh",
    # embedding_ann_multitable: benched r4-r12, demoted to tests-only in
    # r13 — kept for historical-pair replays, absent from new benches
    "embedding_ann_multiprobe", "embedding_ann_multitable",
    "embedding_ivf_topk", "embedding_ivf_pq", "embedding_semantic_dedup",
}
DISAGREE_X = 1.3
FLAG_X = 1.25
MIN_COHORT = 8  # untouched queries per band: median outranks sentinel

_SCALARS = {"value", "sf", "sentinel_sec", "sentinel_arrow_sec", "fp_version"}
_WRAPPER_SCALARS = {"n", "rc", "cpus"}


def _from_text(text: str) -> dict:
    """Reconstruct a bench dict from raw (possibly head-truncated) output.

    Numeric '"name": 1.23' pairs are query timings (scalar keys split
    out); '"name": "<12 hex>"' pairs are plan fingerprints. A pair whose
    opening quote fell off the truncation edge is dropped, never guessed.
    """
    d: dict = {"queries": {}, "partial": True}
    for k, v in re.findall(r'"([A-Za-z0-9_]+)":\s*(-?[0-9]+(?:\.[0-9]+)?)\b', text):
        if k in _SCALARS:
            d[k] = float(v)
        elif k not in _WRAPPER_SCALARS:
            d["queries"][k] = float(v)
    # 12-hex string pairs are fingerprints; bucket them by the enclosing
    # map's surviving '"plan_hash": {' / '"kernel_hash": {' marker. Pairs
    # BEFORE the first visible marker belong to a map whose name fell off
    # the truncation edge — unattributable, dropped (the affected queries
    # surface as 'unknown' and are excluded from the ruler, never guessed).
    marks = [
        (m.start(), m.group(1))
        for m in re.finditer(r'"(plan_hash|kernel_hash)":\s*\{', text)
    ]
    for i, (pos, name) in enumerate(marks):
        end = marks[i + 1][0] if i + 1 < len(marks) else len(text)
        pairs = dict(
            re.findall(r'"([A-Za-z0-9_]+)":\s*"([0-9a-f]{12})"', text[pos:end])
        )
        if pairs:
            d[name] = pairs
    return d


def load(path: str) -> dict:
    with open(path) as f:
        raw = f.read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = _from_text(raw)  # raw bench stdout (possibly multi-line)
        if not d["queries"]:
            raise SystemExit(f"{path}: not JSON and no bench cells recoverable")
        return d
    # driver wrapper: a present-but-null "parsed" means the final line
    # overflowed the tail window (BENCH_r09.json) — reconstruct from tail.
    if "parsed" in d or "tail" in d:
        parsed = d.get("parsed") or {}
        if parsed.get("queries"):
            # the final line never carries fingerprints (output contract):
            # scrape whatever survives in the tail window so a wrapper is
            # self-contained when possible (sidecars still override)
            rec = _from_text(d.get("tail", ""))
            for k in ("plan_hash", "kernel_hash", "fp_version"):
                if k in rec and k not in parsed:
                    parsed[k] = rec[k]
            return parsed
        rec = _from_text(d.get("tail", ""))
        if not rec["queries"]:
            raise SystemExit(
                f"{path}: wrapper has parsed={parsed or None} and no bench "
                "cells recoverable from its tail — artifact is unusable"
            )
        return rec
    if "queries" not in d:
        # raw JSON but not a bench line (e.g. a fingerprints sidecar)
        if "plan_hash" in d or "kernel_hash" in d:
            raise SystemExit(
                f"{path}: looks like a fingerprints sidecar — pass it via "
                "--fp-old/--fp-new, not as a bench file"
            )
        raise SystemExit(f"{path}: no 'queries' map in artifact")
    return d


def _fp_maps(
    bench: dict, sidecar_path: str | None
) -> tuple[dict, dict, int, dict]:
    """Fingerprint maps + scheme version (1 = pre-version artifacts) + the
    compat block (previous-scheme hashes bench.py emits into the sidecar
    for one round after an FP_VERSION bump)."""
    ph = dict(bench.get("plan_hash") or {})
    kh = dict(bench.get("kernel_hash") or {})
    ver = bench.get("fp_version")
    compat = dict(bench.get("compat") or {})
    if sidecar_path:
        with open(sidecar_path) as f:
            sc = json.load(f)
        ph.update(sc.get("plan_hash") or {})
        kh.update(sc.get("kernel_hash") or {})
        ver = sc.get("fp_version", ver)
        compat = dict(sc.get("compat") or compat)
    return ph, kh, int(ver) if ver else 1, compat


def _pair_state(a, b):
    """None = unknown (either side missing/null), else a == b."""
    if a is None or b is None:
        return None
    return a == b


def main() -> int:
    argv = sys.argv

    def opt(name: str) -> str | None:
        return argv[argv.index(name) + 1] if name in argv else None

    opt_vals = {v for n in ("--touched", "--fp-old", "--fp-new") if (v := opt(n))}
    paths = [a for a in argv[1:] if not a.startswith("--") and a not in opt_vals]
    if len(paths) != 2:
        raise SystemExit(__doc__)
    old, new = load(paths[0]), load(paths[1])
    common = sorted(set(old["queries"]) & set(new["queries"]))
    if not common:
        raise SystemExit(f"no common queries between {paths[0]} and {paths[1]}")

    unknown: set[str] = set()
    if opt("--touched") is not None:
        touched = set(opt("--touched").split(","))
        touched_src = "explicit"
    else:
        ph_old, kh_old, ver_old, compat_old = _fp_maps(old, opt("--fp-old"))
        ph_new, kh_new, ver_new, compat_new = _fp_maps(new, opt("--fp-new"))
        compat_note = ""
        if ver_old != ver_new:
            # the round after an FP_VERSION bump: the bumped side's compat
            # block carries the OLD scheme's hashes — compare old-scheme to
            # old-scheme through it instead of dropping the derivation.
            # KERNEL hashes only (ADVICE r11): compat PLAN hashes are only
            # comparable under identical plan-construction history, and a
            # bench-set membership change in the bump round shifts the
            # session-global lambda-variable counter for every later
            # lambda-bearing query — spuriously marking them plan-touched
            # and shrinking the untouched ruler in exactly the round the
            # compat map exists to protect. Plan movement across a version
            # bump is advisory; touched derives from the kernel hash alone.
            if int(compat_new.get("fp_version") or 0) == ver_old:
                kh_new = dict(compat_new.get("kernel_hash") or {})
                ph_new, ph_old = {}, {}
                ver_new = ver_old
                compat_note = (
                    f" (new side via compat v{ver_old} map; kernel-only — "
                    "compat plan hashes advisory)"
                )
            elif int(compat_old.get("fp_version") or 0) == ver_new:
                kh_old = dict(compat_old.get("kernel_hash") or {})
                ph_old, ph_new = {}, {}
                ver_old = ver_new
                compat_note = (
                    f" (old side via compat v{ver_new} map; kernel-only — "
                    "compat plan hashes advisory)"
                )
        touched = set()
        if (ph_old or kh_old) and (ph_new or kh_new) and ver_old != ver_new:
            # hashes from different hashing SCHEMES are incomparable —
            # deriving touched across the boundary would mark everything
            # and empty the ruler; fall back to the full-median basis.
            touched_src = (
                f"none (fingerprint schemes differ: v{ver_old} vs v{ver_new}"
                " — incomparable; ruler basis includes ALL queries)"
            )
        elif (ph_old or kh_old) and (ph_new or kh_new):
            # per-query: touched if any fingerprint pair moved; unknown
            # (excluded from the ruler, reported) if NO pair is known on
            # both sides — a None/truncated hash is never assumed stable.
            for q in common:
                s_plan = _pair_state(ph_old.get(q), ph_new.get(q))
                s_kern = _pair_state(kh_old.get(q), kh_new.get(q))
                if s_plan is False or s_kern is False:
                    touched.add(q)
                elif s_plan is None and s_kern is None:
                    unknown.add(q)
            touched_src = "plan+kernel-hash" + compat_note
            if unknown:
                touched_src += (
                    f" ({len(unknown)} unknown excluded from ruler: "
                    + ",".join(sorted(unknown)) + ")"
                )
        else:
            # a side with NO fingerprint maps at all (pre-r9 bench, or a
            # wrapper whose fingerprint line fell outside the tail and no
            # --fp-* sidecar given): fall back to the pre-fingerprint
            # behavior — all queries feed the median — rather than an
            # empty ruler basis that silently reinstates the sentinel.
            unknown = set()
            touched_src = (
                "none (a side lacks fingerprints — pass --touched or "
                "--fp-old/--fp-new; ruler basis includes ALL queries)"
            )

    ruler_excluded = touched | unknown

    drift = {}
    for band, key in (("jvm", "sentinel_sec"), ("arrow", "sentinel_arrow_sec")):
        if key in old and key in new:
            drift[band] = new[key] / old[key]
    rulers, medians, coherence = {}, {}, {}
    for band in ("jvm", "arrow"):
        un = [
            new["queries"][q] / old["queries"][q]
            for q in common
            if q not in ruler_excluded and (q in ARROW_BAND) == (band == "arrow")
        ]
        medians[band] = statistics.median(un) if un else None
        sent = drift.get(band)
        if medians[band] is not None and len(un) >= MIN_COHORT:
            # a ≥MIN_COHORT untouched cohort is a better ruler than a
            # sub-second probe by construction — the sentinel becomes a
            # coherence check (disagreement reported, never overriding)
            ruler, src = medians[band], f"untouched-median(n={len(un)})"
            if sent is not None:
                ratio = max(medians[band] / sent, sent / medians[band])
                if ratio > DISAGREE_X:
                    coherence[band] = round(ratio, 3)
        else:
            ruler, src = sent, "sentinel"
            if medians[band] is not None and (
                ruler is None
                or max(medians[band] / ruler, ruler / medians[band]) > DISAGREE_X
            ):
                ruler, src = medians[band], f"untouched-median(n={len(un)})"
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
                "unknown": q in unknown,
                "flag": bool(norm and norm > FLAG_X and q not in touched),
            }
        )
    if "value" in old and "value" in new:
        total_raw, total_basis = new["value"] / old["value"], "value"
    else:
        so = sum(old["queries"][q] for q in common)
        sn = sum(new["queries"][q] for q in common)
        total_raw, total_basis = sn / so, f"common-{len(common)}"
    out = {
        "old": paths[0], "new": paths[1],
        "partial": bool(old.get("partial") or new.get("partial")),
        "touched": sorted(touched), "touched_src": touched_src,
        "unknown": sorted(unknown),
        "total_raw": round(total_raw, 3), "total_basis": total_basis,
        "sentinel_drift": {k: round(v, 3) for k, v in drift.items()},
        "untouched_median": {
            k: round(v, 3) for k, v in medians.items() if v is not None
        },
        "ruler": {k: (round(v[0], 3), v[1]) for k, v in rulers.items() if v[0]},
        "sentinel_disagree": coherence,
        "queries": rows,
    }
    if "--json" in argv:
        print(json.dumps(out))
        return 0
    print(
        f"total raw {out['total_raw']} ({total_basis})"
        f"  sentinel drift {out['sentinel_drift']}"
        + ("  [PARTIAL artifact]" if out["partial"] else "")
    )
    print(f"untouched medians {out['untouched_median']}  rulers {out['ruler']}")
    if coherence:
        print(
            f"SENTINEL INCOHERENT with ruling untouched median (> {DISAGREE_X}x): "
            f"{coherence} — probe under/over-reads this band's sustained drift"
        )
    print(f"touched [{touched_src}]: {', '.join(sorted(touched)) or '-'}")
    if unknown:
        print(f"unknown (excluded from ruler): {', '.join(sorted(unknown))}")
    print(f"\n{'query':30s} {'band':6s} {'raw':>7s} {'norm':>7s}  notes")
    for r in sorted(rows, key=lambda r: -(r["norm"] or 0)):
        notes = (
            ("TOUCHED " if r["touched"] else "")
            + ("UNKNOWN " if r["unknown"] else "")
            + ("ADJUDICATE" if r["flag"] else "")
        )
        print(
            f"{r['query']:30s} {r['band']:6s} {r['raw']:7.3f} "
            f"{r['norm'] if r['norm'] is not None else float('nan'):7.3f}  {notes}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
