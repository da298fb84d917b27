#!/usr/bin/env python
"""Index-at-rest increment lab (round 10).

Measures the daily-increment near-dup workflow against its alternative:

  full     re-run the batch pair query over corpus ∪ increment
           (what a pipeline without a persisted index must do every day)
  incr     simhash128_index_increment: sign ONLY the increment, one banded
           join against the persisted signature index (append=False so
           reps are independent)
  index    the one-time simhash128_index_write cost (amortized across all
           future increments; reported once, not part of the A/B)

Corpus = the soak tier's documents (build with scripts/soak.py
--build-only); increment = sf0.1 documents with ids offset into a disjoint
range (1% of the 100x corpus — the daily-batch shape). Arms interleave
within one warm session; pair counts are asserted consistent: incr flags ==
full flags minus corpus-internal pairs (the exactness contract pinned at
unit scale in tests/test_dedup.py, re-checked here at tier scale on rep 0).

``--family minhash`` runs the same A/B for the MinHash index
(minhash_index_write/increment at the corpus tier's LSH geometry with the
df-64 cap): the full arm re-runs minhash_lsh_pairs over the union with the
INDEX'S frozen ban list (banned_b60=<idx>_banned) so the exactness check
is well-defined — frozen-list semantics are the index's contract, and the
batch query accepts the same list precisely for this comparison.

Usage: python scripts/incr_lab.py [--tier /root/repo/.soak/sf10] [--reps 2]
                                  [--family simhash|minhash|exact|ivf|all]
                                  [--json INCR.json]
Output: one JSON line per (rep, arm), then a min summary per family.
``--json PATH`` (VERDICT r10 item 7) additionally writes the combined
machine-comparable artifact — {"metric": "incr_lab", "head": <git sha>,
"families": {family: summary}} — the per-round INCR_r{N}.json beside
BENCH_r{N}.json, so the four increment-vs-full gaps stop living only in
SCALING.md prose. With --json and no --family, ALL families run.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INCR_OFFSET = 10**12

# The measurement entrypoints each family's arms call — the exact set of
# kernels whose edits can shift that family's increment economics. The
# artifact records kernel_fingerprint-derived hashes of these so
# scripts/fp_check.py can verify freshness PER FAMILY (VERDICT r11 item 2):
# a family whose closure is byte-identical since measurement is fresh even
# when HEAD moved; a family whose closure moved must be re-measured.
FAMILY_KERNEL_FNS: dict[str, tuple[str, tuple[str, ...]]] = {
    "exact": ("operators.dedup", (
        "exact_dedup_index_write", "exact_dedup_index_increment", "_exact_fp",
    )),
    "minhash": ("operators.dedup", (
        "minhash_index_write", "minhash_index_increment", "minhash_lsh_pairs",
        "lsh_tier_geometry",
    )),
    "simhash": ("operators.dedup", (
        "simhash128_index_write", "simhash128_index_increment",
        "simhash128_near_dup_pairs",
    )),
    "ivf": ("operators.similarity", ("ivf_clustered_write", "ivf_append")),
}


def family_kernel_hashes() -> dict[str, str]:
    """One 12-hex hash per family: md5 over (entrypoint name, fp3 kernel
    hash) pairs of that family's measurement entrypoints."""
    import hashlib
    import importlib

    from stock_etl_pipeline_spark.fingerprints import kernel_fingerprint

    out: dict[str, str] = {}
    for fam, (modname, fn_names) in FAMILY_KERNEL_FNS.items():
        mod = importlib.import_module(f"stock_etl_pipeline_spark.{modname}")
        acc = hashlib.md5()
        for fn_name in fn_names:
            h = kernel_fingerprint(getattr(mod, fn_name))
            acc.update(fn_name.encode())
            acc.update((h or "none").encode())
        out[fam] = acc.hexdigest()[:12]
    return out


def main() -> int:
    argv = sys.argv
    tier = (
        argv[argv.index("--tier") + 1]
        if "--tier" in argv
        else "/root/repo/.soak/sf10"
    )
    reps = (
        int(argv[argv.index("--reps") + 1])
        if "--reps" in argv
        else (3 if "--json" in argv else 2)
    )  # short incr arms need ~3 reps to reach the warm floor (ivf: 8s
    # rep0 vs 1.75s rep2 in a fresh JVM) — artifact runs default to 3
    json_out = argv[argv.index("--json") + 1] if "--json" in argv else None
    incr_ratio = (
        int(argv[argv.index("--incr-ratio") + 1])
        if "--incr-ratio" in argv
        else None
    )
    family = (
        argv[argv.index("--family") + 1]
        if "--family" in argv
        else ("all" if json_out else "simhash")
    )
    families = (
        ["exact", "minhash", "simhash", "ivf"] if family == "all" else [family]
    )

    summaries: dict[str, dict] = {}
    if len(families) > 1:
        # one fresh JVM per family: a combined session depresses the short
        # incr arms ~2x via block-manager/JVM residue from earlier families
        # (measured r11: simhash 3.09x combined vs 6.51x isolated, the
        # isolated number reproducing r10's 6.4x) — the artifact must
        # carry the comparable isolated economics
        for fam in families:
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--tier", tier, "--reps", str(reps), "--family", fam]
                + (["--incr-ratio", str(incr_ratio)] if incr_ratio else []),
                capture_output=True, text=True,
            )
            sys.stdout.write(res.stdout)
            sys.stdout.flush()
            if res.returncode != 0:
                sys.stderr.write(res.stderr[-2000:])
                raise SystemExit(f"family {fam} failed rc={res.returncode}")
            last = [
                ln for ln in res.stdout.splitlines()
                if ln.startswith("{") and '"full_over_incr"' in ln
            ][-1]
            summaries[fam] = json.loads(last)
    else:
        from stock_etl_pipeline_spark.session import get_spark

        spark = get_spark(app_name="incr_lab")
        fam = families[0]
        summaries[fam] = (
            _ivf_flow(spark, tier, reps)
            if fam == "ivf"
            else _pair_family_flow(spark, tier, reps, fam,
                                   incr_ratio=incr_ratio)
        )
    if json_out:
        try:
            head = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ).stdout.strip()
        except OSError:
            head = None
        artifact = {
            "metric": "incr_lab",
            "tier": tier,
            "reps": reps,
            "head": head,
            # per-family closure hashes of the measurement entrypoints:
            # fp_check.py fails the round close when a family's kernels
            # moved after measurement (and exempts the ones that didn't)
            "family_kernels": family_kernel_hashes(),
            "families": summaries,
        }
        with open(json_out, "w") as f:
            json.dump(artifact, f, indent=1)
        print(json.dumps({"written": json_out, "head": head}), flush=True)
    return 0


def _pair_family_flow(spark, tier: str, reps: int, family: str,
                      incr_ratio: int | None = None) -> dict:
    from pyspark.sql import functions as F

    from stock_etl_pipeline_spark.datasets import load_table
    from stock_etl_pipeline_spark.operators.dedup import (
        _exact_fp,
        exact_dedup_index_increment,
        exact_dedup_index_write,
        lsh_tier_geometry,
        minhash_index_increment,
        minhash_index_write,
        minhash_lsh_pairs,
        simhash128_index_increment,
        simhash128_index_write,
        simhash128_near_dup_pairs,
    )

    corpus = load_table(spark, tier, "documents").select("doc_id", "text")
    incr = (
        load_table(spark, "/root/testdata/sf0.1", "documents")
        .select((F.col("doc_id") + INCR_OFFSET).alias("doc_id"), "text")
    )
    n_corpus = corpus.count()
    if incr_ratio:
        # corpus:increment >= incr_ratio via deterministic mod-sampling of
        # the increment feed (representative doc mix, no ordering pass) —
        # VERDICT r12 item 5: the minhash gap is corpus-size-dependent and
        # the default 10:1 shape understates the at-rest index's advantage
        n_src = incr.count()
        m = max(1, -(-n_src * incr_ratio // n_corpus))  # ceil
        incr = incr.filter(F.pmod(F.col("doc_id"), m) == 0)
    n_incr = incr.count()
    print(json.dumps({"family": family, "corpus_docs": n_corpus,
                      "incr_docs": n_incr,
                      "ratio": round(n_corpus / max(1, n_incr), 1)}),
          flush=True)

    idx = os.path.join(
        os.path.dirname(tier.rstrip("/")), f"{family}_incr_index"
    )
    if family == "minhash":
        k, b, est = lsh_tier_geometry(n_corpus)
        geom = dict(num_hashes=k, bands=b, est_min_matches=est, threshold=0.7)
        write = lambda: minhash_index_write(
            corpus, idx, n_files=32, n_docs=n_corpus, shingle_df_cap=64, **geom
        )
        run_incr = lambda: minhash_index_increment(
            spark, idx, incr, append=False, n_docs=n_incr
        )
        run_full = lambda rel, n: minhash_lsh_pairs(
            rel, banned_b60=spark.read.parquet(idx + "_banned"), n_docs=n, **geom
        )
    elif family == "exact":
        write = lambda: exact_dedup_index_write(corpus, idx, n_files=32)
        run_incr = lambda: exact_dedup_index_increment(
            spark, idx, incr, append=False
        )

        # per-doc verdicts for the increment recomputed from scratch over
        # the union — what a no-index pipeline must do daily
        def run_full(rel, n):
            canon = rel.unionByName(incr).select(
                "doc_id", _exact_fp("text").alias("fingerprint")
            )
            keep = canon.groupBy("fingerprint").agg(
                F.min("doc_id").alias("keeper_doc_id")
            )
            return (
                canon.join(keep, "fingerprint")
                .join(incr.select("doc_id"), "doc_id")
                .select(
                    "doc_id", "fingerprint", "keeper_doc_id",
                    (F.col("doc_id") != F.col("keeper_doc_id")).alias("is_dup"),
                )
            )
    else:
        write = lambda: simhash128_index_write(
            corpus, idx, n_files=32, n_docs=n_corpus
        )
        run_incr = lambda: simhash128_index_increment(
            spark, idx, incr, append=False, n_docs=n_incr
        )
        run_full = lambda rel, n: simhash128_near_dup_pairs(rel, n_docs=n)

    t0 = time.perf_counter()
    write()
    t_index = time.perf_counter() - t0
    print(json.dumps({"arm": "index_once", "sec": round(t_index, 2)}), flush=True)

    results: dict[str, list[float]] = {"full": [], "incr": []}
    union = corpus.unionByName(incr)
    full_rel = corpus if family == "exact" else union  # exact unions internally
    for rep in range(reps):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n_flags = run_incr().count()
        dt = time.perf_counter() - t0
        results["incr"].append(dt)
        print(json.dumps({"rep": rep, "arm": "incr", "sec": round(dt, 2),
                          "pairs": n_flags}), flush=True)

        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n_full = run_full(full_rel, n_corpus + n_incr).count()
        dt = time.perf_counter() - t0
        results["full"].append(dt)
        print(json.dumps({"rep": rep, "arm": "full", "sec": round(dt, 2),
                          "pairs": n_full}), flush=True)

        if rep == 0:
            spark.catalog.clearCache()
            if family == "exact":
                got = sorted(map(repr, run_incr().collect()))
                want = sorted(map(repr, run_full(full_rel, 0).collect()))
                assert got == want, "exactness violated: verdict mismatch"
                print(json.dumps({"check": "incr verdicts == full recompute",
                                  "rows": len(got), "ok": True}), flush=True)
            else:
                n_internal = run_full(corpus, n_corpus).count()
                assert n_flags == n_full - n_internal, (
                    f"exactness violated: incr {n_flags} != "
                    f"full {n_full} - internal {n_internal}"
                )
                print(json.dumps({"check": "incr == full - internal",
                                  "internal_pairs": n_internal, "ok": True}),
                      flush=True)

    summary = {
        "tier": tier,
        "family": family,
        "reps": reps,
        "corpus_docs": n_corpus,
        "incr_docs": n_incr,
        "corpus_over_incr": round(n_corpus / max(1, n_incr), 1),
        "index_once_sec": round(t_index, 2),
        "incr_min_sec": round(min(results["incr"]), 2),
        "full_min_sec": round(min(results["full"]), 2),
        "full_over_incr": round(min(results["full"]) / min(results["incr"]), 2),
    }
    print(json.dumps(summary), flush=True)
    return summary


def _ivf_flow(spark, tier: str, reps: int) -> dict:
    """IVF family: ivf_append (assign the increment against the FROZEN
    sidecar model + range-clustered file append) vs the no-index
    alternative (full retrain + rewrite over corpus ∪ increment). Each rep
    appends into a FRESH copy of the base layout (append mutates it);
    rep-0 exactness: the appended tree's per-cell (count, id-sum) equals a
    one-shot clustered write over the union under the SAME model — the
    tier-scale form of the row-for-row pin in tests/test_zorder.py."""
    import shutil

    from pyspark.sql import functions as F

    from stock_etl_pipeline_spark.datasets import load_table
    from stock_etl_pipeline_spark.operators.similarity import (
        ivf_append,
        ivf_clustered_write,
    )

    corpus = load_table(spark, tier, "embeddings")
    incr = load_table(spark, "/root/testdata/sf0.1", "embeddings").select(
        (F.col("vec_id") + INCR_OFFSET).alias("vec_id"), "embedding", "label"
    )
    n_corpus, n_incr = corpus.count(), incr.count()
    print(json.dumps({"family": "ivf", "corpus_docs": n_corpus,
                      "incr_docs": n_incr}), flush=True)
    base = os.path.join(os.path.dirname(tier.rstrip("/")), "ivf_incr_index")
    t0 = time.perf_counter()
    ivf_clustered_write(corpus, base, k_clusters=64, n_files=32)
    t_index = time.perf_counter() - t0
    print(json.dumps({"arm": "index_once", "sec": round(t_index, 2)}), flush=True)

    results = {"full": [], "incr": []}
    union = corpus.unionByName(incr)
    for rep in range(reps):
        work = base + f"_rep{rep}"
        for suffix in ("", "_model"):
            shutil.rmtree(work + suffix, ignore_errors=True)
            shutil.copytree(base + suffix, work + suffix)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        ivf_append(spark, work, incr)
        dt = time.perf_counter() - t0
        results["incr"].append(dt)
        print(json.dumps({"rep": rep, "arm": "incr", "sec": round(dt, 2)}),
              flush=True)

        spark.catalog.clearCache()
        full_path = base + "_fullrebuild"
        t0 = time.perf_counter()
        ivf_clustered_write(union, full_path, k_clusters=64, n_files=32)
        dt = time.perf_counter() - t0
        results["full"].append(dt)
        print(json.dumps({"rep": rep, "arm": "full", "sec": round(dt, 2)}),
              flush=True)

        if rep == 0:
            model = spark.read.parquet(base + "_model")
            check_path = base + "_samemodel_check"
            ivf_clustered_write(
                union, check_path, k_clusters=64, n_files=32, centroids=model
            )

            def cells(p):
                return {
                    (r["cell_id"], r["n"], r["ids"])
                    for r in spark.read.parquet(p)
                    .groupBy("cell_id")
                    .agg(F.count("*").alias("n"), F.sum("vec_id").alias("ids"))
                    .collect()
                }

            assert cells(work) == cells(check_path), "append != same-model write"
            print(json.dumps({"check": "append == same-model one-shot write",
                              "ok": True}), flush=True)

    summary = {
        "tier": tier,
        "family": "ivf",
        "reps": reps,
        "index_once_sec": round(t_index, 2),
        "incr_min_sec": round(min(results["incr"]), 2),
        "full_min_sec": round(min(results["full"]), 2),
        "full_over_incr": round(min(results["full"]) / min(results["incr"]), 2),
    }
    print(json.dumps(summary), flush=True)
    return summary


if __name__ == "__main__":
    raise SystemExit(main())
