"""Stage-level micro-benchmark prefixes for the composite operators.

``bench.py`` times whole queries; this module decomposes the multi-stage
ones (LSH dedup, SimHash, block-GEMM near-dup, IVF ANN) into CUMULATIVE
prefixes so a perf pass can see WHERE a query spends its time — signature
build vs candidate join vs verification — instead of guessing.

Method: each entry lists ``(stage_label, builder)`` where ``builder(spark,
sf_dir)`` returns the DataFrame for the pipeline truncated at that stage.
The runner times each prefix END-TO-END from a fresh plan and reports
deltas (prefix[i] − prefix[i−1]). Two caveats the deltas inherit:

- A fresh plan per prefix is essential: re-collecting one DataFrame object
  reuses its registered shuffle map outputs, and the rerun would time only
  the last stage (measured pitfall — see SCALING.md).
- Deltas include each prefix's own planning/codegen, so a stage that adds a
  giant expression tree (SimHash's 64-bit aggregate) shows its compile cost
  in its delta. That is intentional: at bench scale, compile time IS part of
  where the time goes.

Parameters are imported from the workload modules, so the prefixes always
match what the headline queries actually run.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datasets import load_table
from ..operators import dedup, similarity
from . import docs, vectors

Builder = Callable[[SparkSession, str], DataFrame]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# --- MinHash + LSH -----------------------------------------------------------

_MH_ROWS = docs._MH_K // docs._MH_BANDS


def _mh_shingles(spark, sf_dir):
    return dedup.word_shingles(_docs(spark, sf_dir))


def _mh_signatures(spark, sf_dir):
    # the SHIPPED uncapped backend (auto → the Arrow kernel at every scale);
    # the relational word_shingles → minhash_signature chain stays visible
    # through the separate "shingles" stage above it
    return dedup.minhash_signature_arrow(_docs(spark, sf_dir), docs._MH_K)


def _mh_candidates(spark, sf_dir):
    sig = _mh_signatures(spark, sf_dir)
    return dedup.lsh_candidate_pairs(
        dedup.lsh_band_keys(sig, docs._MH_BANDS, _MH_ROWS)
    )


def _mh_verified(spark, sf_dir):
    return dedup.minhash_lsh_pairs(
        _docs(spark, sf_dir),
        num_hashes=docs._MH_K,
        bands=docs._MH_BANDS,
        threshold=docs._MH_THRESHOLD,
    )


# --- SimHash -----------------------------------------------------------------


def _sh_tokfreq(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return (
        d.select("doc_id", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("freq"))
    )


def _sh_signatures(spark, sf_dir):
    # tier-0 shipped backend at bench SFs (auto → arrow ≤ SIG_ARROW_MAX_DOCS)
    return dedup.simhash_signatures_arrow(_docs(spark, sf_dir))


def _sh_pairs(spark, sf_dir):
    return dedup.simhash_near_dup_pairs(
        _docs(spark, sf_dir), max_hamming=docs._SH_MAX_HAMMING, bands=docs._SH_BANDS
    )


# --- SimHash-128 + capped MinHash (round-12 watch cells) ---------------------
# Both flagged 1.3-1.5x normalized on the r11→r12 builder pairs with
# byte-identical code (drift-suspected, SCALING round 12); these prefixes
# are the ready decompose harness if either repeats on the r12→r13 pair.


def _sh128_signatures(spark, sf_dir):
    # the SHIPPED backend at bench SFs (auto → arrow ≤ SIG_ARROW_MAX_DOCS),
    # same rule as the 64-bit prefix — the deltas must subtract the
    # signature builder the pairs stage actually runs
    return dedup.simhash128_signatures_arrow(_docs(spark, sf_dir))


def _sh128_pairs(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return dedup.simhash128_near_dup_pairs(
        d, max_hamming=docs._SH_MAX_HAMMING, n_docs=d.count()
    )


def _mhc_shingles(spark, sf_dir):
    return dedup.word_shingles_b60(_docs(spark, sf_dir))


def _mhc_pairs(spark, sf_dir):
    return docs.q_doc_minhash_capped(spark, sf_dir)


# --- embedding near-dup (block GEMM) ----------------------------------------


def _gemm_pairs(spark, sf_dir):
    return similarity.matmul_near_dup_pairs(
        _emb(spark, sf_dir),
        vectors._NEAR_DUP_THRESHOLD - 1e-4,
        id_col="vec_id",
        n_blocks=8,
    )


# --- IVF ANN -----------------------------------------------------------------


def _ivf_centroids(spark, sf_dir):
    cu = similarity.with_micro_vectors(_emb(spark, sf_dir))
    return similarity.kmeans_exact(
        cu, k_clusters=vectors._IVF_K, iters=vectors._IVF_ITERS
    )


def _ivf_assignments(spark, sf_dir):
    cu = similarity.with_micro_vectors(_emb(spark, sf_dir))
    cents = similarity.kmeans_exact(
        cu, k_clusters=vectors._IVF_K, iters=vectors._IVF_ITERS
    )
    return similarity.assign_to_centroids(cu, cents)


def _ivf_topk(spark, sf_dir):
    return vectors.q_embedding_ivf_topk(spark, sf_dir)


# --- LSH ANN -----------------------------------------------------------------


def _ann_buckets(spark, sf_dir):
    return similarity.hyperplane_signature(
        _emb(spark, sf_dir), vectors._PLANES
    ).select("vec_id", "bucket")


def _ann_topk(spark, sf_dir):
    return vectors.q_embedding_ann_lsh(spark, sf_dir)


STAGES: dict[str, list[tuple[str, Builder]]] = {
    "doc_minhash_lsh": [
        ("shingles", _mh_shingles),
        ("signatures", _mh_signatures),
        ("candidates", _mh_candidates),
        ("verified", _mh_verified),
    ],
    "doc_simhash_pairs": [
        ("tok_freq", _sh_tokfreq),
        ("signatures", _sh_signatures),
        ("pairs", _sh_pairs),
    ],
    "doc_simhash128_pairs": [
        ("signatures128", _sh128_signatures),
        ("pairs", _sh128_pairs),
    ],
    "doc_minhash_capped": [
        ("shingles_b60", _mhc_shingles),
        ("pairs", _mhc_pairs),
    ],
    "embedding_near_dup": [
        ("gemm_pairs", _gemm_pairs),
    ],
    "embedding_ivf_topk": [
        ("kmeans", _ivf_centroids),
        ("assignment", _ivf_assignments),
        ("topk", _ivf_topk),
    ],
    "embedding_ann_lsh": [
        ("buckets", _ann_buckets),
        ("topk", _ann_topk),
    ],
    # SemDeDup composition: the first two stages are the same k-means model
    # and corpus assignment the IVF index builds; the final stage adds the
    # within-cell pair join + label grouping + keeper selection.
    "embedding_semantic_dedup": [
        ("kmeans", _ivf_centroids),
        ("assignment", _ivf_assignments),
        ("dedup", lambda spark, sf_dir: vectors.q_embedding_semantic_dedup(spark, sf_dir)),
    ],
    # IVF-PQ (the largest sf0.1 bench entry): same shared coarse stages,
    # so the final delta isolates everything PQ adds on top of the IVF
    # model — codebook training, residual encode, ADC scoring, re-rank.
    "embedding_ivf_pq": [
        ("kmeans", _ivf_centroids),
        ("assignment", _ivf_assignments),
        ("pq", lambda spark, sf_dir: vectors.q_embedding_ivf_pq(spark, sf_dir)),
    ],
}


def run_breakdown(spark: SparkSession, sf_dir: str, *, reps: int = 1) -> dict:
    """Time every prefix (best of ``reps``) and return per-stage deltas."""
    import time

    def run(builder: Builder) -> float:
        best = float("inf")
        for _ in range(reps):
            # Rebuild the plan per rep AND clear the cache: a rebuilt
            # same-plan DataFrame still reuses any persisted intermediate
            # (the pipelines persist signatures/capped relations eagerly),
            # so without the clear a rep or a later prefix times the cached
            # tail and the stage deltas misattribute (see bench.py).
            spark.catalog.clearCache()
            # Build INSIDE the timer: pipelines with eager internal
            # materialization (minhash's persisted signature fill runs a
            # count() during plan construction) would otherwise do their
            # most expensive stage before t0 and the prefix would time
            # only the tail.
            t0 = time.perf_counter()
            df = builder(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        return best

    out: dict[str, dict[str, float]] = {}
    for name, stages in STAGES.items():
        prev = 0.0
        deltas: dict[str, float] = {}
        for label, builder in stages:
            t = run(builder)
            deltas[label] = round(max(t - prev, 0.0), 3)
            prev = t
        deltas["total"] = round(prev, 3)
        out[name] = deltas
    return out
