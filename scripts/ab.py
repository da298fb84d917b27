#!/usr/bin/env python
"""Interleaved A/B timing harness (ROADMAP round-4 item: first-class script).

Sequential fresh-JVM runs on this host drift by up to ±2.2x across minutes
(doc_minhash_lsh at the 100x tier measured 143/221/312 s in back-to-back
isolated runs — SCALING.md round 4), so back-to-back one-arm-then-the-other
comparisons are untrustworthy. INTERLEAVING is the fix: run A B A B ... so
both arms sample the same drift, then compare per-rep and by median. This
script is the first-class version of the ad-hoc harnesses that found the
round-4 LSH geometry inversion.

Usage:
  python scripts/ab.py --arm doc_simhash_pairs --arm doc_simhash128_pairs \
      [--sf-dir /root/testdata/sf0.1] [--reps 5] [--isolate]

Arm syntax: ``[label=]query[:KEY=VAL,KEY=VAL]`` — optional label (defaults
to the query name), optional environment overrides applied only while that
arm runs (e.g. an engine knob like SPARK_GRAFT_VERIFY_CC=1). Two arms may
name the SAME query with different env to A/B a knob.

``--isolate`` gives every (rep, arm) cell a fresh subprocess/JVM via
scripts/soak.py --run-one (warm-up included there), still interleaved.
In-process mode (default) shares one session and clears the cache before
every timed run — cheaper, and drift-fair because of the interleaving.

Output: one JSON line per cell, then a per-arm summary (min / median / all
reps) and each arm's median ratio vs the FIRST arm. Medians, not means:
drift spikes are one-sided.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_arm(text: str) -> dict:
    env = {}
    if ":" in text:
        text, env_part = text.split(":", 1)
        for kv in env_part.split(","):
            k, _, v = kv.partition("=")
            env[k] = v
    label, _, query = text.rpartition("=")
    return {"label": label or query, "query": query or text, "env": env}


def run_cell_isolated(arm: dict, sf_dir: str) -> float:
    # AB_TREE=<path> is a pseudo-env consumed HERE, not by the child: it
    # points the cell at another checkout's scripts/soak.py (e.g. a git
    # worktree of a prior round's commit), so two arms can be r4-code vs
    # r5-code paired deltas under the same interleaved drift sampling.
    env = dict(arm["env"])
    tree = env.pop("AB_TREE", None) or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    soak = os.path.join(tree, "scripts", "soak.py")
    cmd = [sys.executable, soak, "--run-one", arm["query"], "--tier-dir", sf_dir]
    child_env = {**os.environ, **env}
    res = subprocess.run(cmd, capture_output=True, text=True, env=child_env)
    marker = [ln for ln in res.stdout.splitlines() if ln.startswith('{"query"')]
    if res.returncode != 0 or not marker:
        sys.stderr.write(res.stdout[-2000:] + res.stderr[-2000:])
        raise SystemExit(f"arm {arm['label']} failed (rc={res.returncode})")
    return float(json.loads(marker[-1])["sec"])


def run_cell_inproc(spark, registry, arm: dict, sf_dir: str) -> float:
    saved = {k: os.environ.get(k) for k in arm["env"]}
    os.environ.update(arm["env"])
    try:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        registry[arm["query"]].fn(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        return round(time.perf_counter() - t0, 2)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main() -> int:
    argv = sys.argv
    arms = [parse_arm(argv[i + 1]) for i, a in enumerate(argv) if a == "--arm"]
    if len(arms) < 2:
        raise SystemExit("need at least two --arm entries")
    labels = [a["label"] for a in arms]
    if len(set(labels)) != len(labels):
        raise SystemExit(f"duplicate arm labels: {labels} (use label=query)")
    sf_dir = (
        argv[argv.index("--sf-dir") + 1]
        if "--sf-dir" in argv
        else "/root/testdata/sf0.1"
    )
    reps = int(argv[argv.index("--reps") + 1]) if "--reps" in argv else 5
    isolate = "--isolate" in argv

    from stock_etl_pipeline_spark.workload import load_all

    registry = load_all()
    unknown = [a["query"] for a in arms if a["query"] not in registry]
    if unknown:
        raise SystemExit(f"--arm queries not in registry: {unknown}")

    spark = None
    if not isolate:
        from stock_etl_pipeline_spark.session import get_spark

        spark = get_spark(app_name="ab")
        # one untimed warm-up (same policy as bench.py): JVM + codegen
        registry["source_report"].fn(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()

    times: dict[str, list[float]] = {a["label"]: [] for a in arms}
    for rep in range(reps):
        for arm in arms:
            sec = (
                run_cell_isolated(arm, sf_dir)
                if isolate
                else run_cell_inproc(spark, registry, arm, sf_dir)
            )
            times[arm["label"]].append(sec)
            print(
                json.dumps(
                    {"rep": rep, "arm": arm["label"], "sec": sec, "sf_dir": sf_dir}
                ),
                flush=True,
            )

    print(f"\n{'arm':32s} {'min':>8s} {'median':>8s}  reps")
    med0 = statistics.median(times[labels[0]])
    for label in labels:
        ts = times[label]
        med = statistics.median(ts)
        ratio = f"  ({med / med0:.2f}x vs {labels[0]})" if label != labels[0] else ""
        print(
            f"{label:32s} {min(ts):8.2f} {med:8.2f}  "
            + " ".join(f"{t:.2f}" for t in ts)
            + ratio
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
