#!/usr/bin/env python
"""SemDeDup recall@K probe (round 8).

For each candidate cell count K: train the exact k-means coarse quantizer,
assign the corpus, and measure what fraction of TRUE cosine >= threshold
pairs are co-assigned to the same cell — the pairs the within-cell search
can possibly see. Ground truth is the exact integer-ratio cosine of a
deterministic sample (first N vec_ids) against the full corpus, computed
driver-side in CHUNKS of sample rows: the collected micro-int matrix is
~100 MB at 200k x 64, and each GEMM chunk is chunk x corpus doubles
(~100 MB at 64 x 200k) regardless of --sample — so driver memory is
bounded by the CORPUS size alone (ADVICE r8: the unchunked sample x
corpus matrix was 1.6 GB at the defaults). Shrink nothing for bigger
samples; shrink the corpus (or collect less) past ~10M vectors.

Run this BEFORE choosing K on a new corpus: recall is NOT monotone in K
(SCALING.md round 8 — it peaks where cells align with the corpus's
intrinsic cluster structure), so neither "few cells = safe" nor
"more cells = faster but lossy" holds without measurement.

Usage:
  python scripts/recall_probe.py [--sf-dir DIR] [--threshold 0.4]
      [--sample 1000] [--cells 64,256,1024,4096]
Output: one JSON line per K plus a summary line.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import numpy as np

    argv = sys.argv
    sf_dir = (
        argv[argv.index("--sf-dir") + 1]
        if "--sf-dir" in argv
        else "/root/testdata/sf0.1"
    )
    thresh = (
        float(argv[argv.index("--threshold") + 1]) if "--threshold" in argv else 0.4
    )
    n_sample = int(argv[argv.index("--sample") + 1]) if "--sample" in argv else 1000
    cells = [
        int(k)
        for k in (
            argv[argv.index("--cells") + 1] if "--cells" in argv else "64,256,1024,4096"
        ).split(",")
    ]

    from stock_etl_pipeline_spark.datasets import load_table
    from stock_etl_pipeline_spark.operators import similarity as S
    from stock_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="recall-probe")
    e = load_table(spark, sf_dir, "embeddings")
    v = S.with_micro_vectors(e.select("vec_id", "embedding"), "embedding")

    pdf = v.select("vec_id", "v_dbl").toPandas()
    ids = pdf["vec_id"].to_numpy()
    order = np.argsort(ids)
    ids = ids[order]
    M = np.stack(pdf["v_dbl"].to_numpy())[order]
    Mi = np.rint(M * 1e6)  # exact micro ints (v_dbl = v_int/1e6 exactly)
    mx = float(np.abs(Mi).max()) or 1.0
    if Mi.shape[1] * mx * mx >= float(1 << 53):
        raise SystemExit("exact-integer contract exceeded; cannot probe")
    norms = np.sqrt((Mi * Mi).sum(axis=1))
    sample = np.arange(min(n_sample, len(ids)))

    # chunked sample x corpus GEMM: accumulate qualifying pairs per chunk so
    # the dense cosine block never exceeds chunk x corpus (~100 MB at 200k)
    chunk = 64
    qa_parts, qb_parts = [], []
    for lo in range(0, len(sample), chunk):
        s = sample[lo : lo + chunk]
        G = (Mi[s] @ Mi.T) / np.outer(norms[s], norms)
        ca, cb = np.nonzero(G >= thresh - 1e-6)
        q = np.floor(G[ca, cb] * 1e6 + 0.5) / 1e6
        keep = (q >= thresh) & (ids[s[ca]] != ids[cb])
        qa_parts.append(ca[keep] + lo)
        qb_parts.append(cb[keep])
    qa = np.concatenate(qa_parts) if qa_parts else np.empty(0, dtype=np.int64)
    qb = np.concatenate(qb_parts) if qb_parts else np.empty(0, dtype=np.int64)
    print(json.dumps({"sf_dir": sf_dir, "true_pairs": int(len(qa))}), flush=True)

    vc = v.persist()
    vc.count()
    out: dict[str, float] = {}
    for K in cells:
        cent = S.kmeans_exact(
            vc, k_clusters=K, iters=2, id_col="vec_id", assign_backend="arrow"
        )
        asg = S.assign_to_centroids_arrow(
            vc.select("vec_id", "v_dbl", "vv"), cent, id_col="vec_id"
        )
        cp = asg.select("vec_id", "cid").toPandas()
        cid_of = np.empty(len(ids), dtype=np.int64)
        pos = np.searchsorted(ids, cp["vec_id"].to_numpy())
        cid_of[pos] = cp["cid"].to_numpy()
        recall = float((cid_of[sample[qa]] == cid_of[qb]).mean()) if len(qa) else 1.0
        out[str(K)] = round(recall, 4)
        print(json.dumps({"K": K, "recall": out[str(K)]}), flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
