"""Embedding similarity search over the ``embeddings`` table
(``array<float>`` column, 64-dim).

Brute-force cosine top-k is the correctness baseline; the scale path
(LSH-bucketed ANN) lives in operators/similarity.py. Scoring uses the exact
integer-ratio cosine (similarity.with_int_vector — the dot of micro-quantized
int64 vectors is an exact integer < 2^53 in any engine or fold order), so
engine parity needs no matching accumulation order anywhere in this module.

Determinism: ranking orders by the ROUNDED cosine (4 digits, floor-based)
with neighbor-id tiebreak; the pre-rounding value is already bit-identical
across engines by the integer contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..datasets import load_table, table_row_count
from ..functions import pround, sql_pround
from ..operators import dedup, similarity
from . import spec, spec_tests_only

_N_QUERIES = 5
_TOP_K = 10

# v_int/vvi: the exact integer-cosine scoring representation — the dot is
# an exact integer < 2^53 in any engine/fold order, so parity needs no
# matching accumulation order (round 7; see similarity.with_int_vector).
_VI_SQL, _VVI_SQL = similarity.sql_with_int_vector("embedding")

_TOPK_ORACLE = f"""
WITH m AS (
  SELECT vec_id, {_VI_SQL} AS v_int, {_VVI_SQL} AS vvi FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, v_int AS vi_q, vvi AS vvi_q FROM m WHERE vec_id < {_N_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
    {sql_pround(similarity.sql_int_cosine("q.vi_q", "q.vvi_q", "e.v_int", "e.vvi"), 4)} AS cosine
  FROM q CROSS JOIN m e
  WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, cosine, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= {_TOP_K}
""".strip()


@spec("embedding_topk", oracle=_TOPK_ORACLE, tags=("similarity", "ann"), bench=True)
def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the (small) query set against the
    corpus — embarrassingly parallel, no shuffle until the tiny top-k agg.
    Scores on the exact integer-ratio cosine (bit-identical in every
    engine), quantized to 4 digits with neighbor-id tiebreak."""
    e = similarity.with_int_vector(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ).select("vec_id", "v_int", "vvi")
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v_int").alias("vi_q"),
        F.col("vvi").alias("vvi_q"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(e)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            pround(
                similarity.int_cosine("vi_q", "vvi_q", "v_int", "vvi"), 4
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K)
    )


_NEAR_DUP_THRESHOLD = 0.99

_ND_COS = sql_pround(
    similarity.sql_int_cosine("a.v_int", "a.vvi", "b.v_int", "b.vvi"), 4
)
_NEAR_DUP_ORACLE = f"""
WITH m AS (
  SELECT vec_id, {_VI_SQL} AS v_int, {_VVI_SQL} AS vvi FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {_ND_COS} AS cosine
FROM m a JOIN m b ON a.vec_id < b.vec_id
WHERE {_ND_COS} >= {_NEAR_DUP_THRESHOLD}
""".strip()


@spec("embedding_near_dup", oracle=_NEAR_DUP_ORACLE, tags=("dedup", "similarity"), bench=True)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via distributed block GEMM
    (operators/similarity.py): unit-normalize once, shard into block pairs,
    one Arrow/numpy float64 matmul per block pair — identical output to the
    all-pairs oracle, ~50× faster than the interpreted per-pair fold it
    replaced at sf0.1.

    The operator threshold carries 1e-4 slack so the final filter on the
    ROUNDED cosine (oracle semantics) can't drop a boundary pair."""
    e = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.matmul_near_dup_pairs(
        e, _NEAR_DUP_THRESHOLD - 1e-4, id_col="vec_id", n_blocks=8
    )
    return pairs.select(
        "vec_a", "vec_b", pround(F.col("cosine"), 4).alias("cosine")
    ).filter(F.col("cosine") >= _NEAR_DUP_THRESHOLD)


# Bucketed-GEMM scale path for the exact near-dup above (the registered
# mitigation for its O(n²) contract): hyperplane-LSH buckets FIRST, exact
# GEMM only within each bucket. The SAME literal planes are baked into the
# oracle SQL so DuckDB replays the identical bucketing — parity by
# construction. Precision is exact (every emitted cosine is computed and
# thresholded); only recall is approximate, OR-ed across the four tables.
_BNE_BITS, _BNE_TABLES = 6, 4
_BNE_PLANES = [
    similarity.make_planes(dim=64, n_planes=_BNE_BITS, seed=42 + 1000 * t)
    for t in range(_BNE_TABLES)
]
_BNE_BUCKETS = [
    similarity.sql_hyperplane_bucket("embedding", p) for p in _BNE_PLANES
]
_BNE_COS = sql_pround(
    similarity.sql_int_cosine("a.v_int", "a.vvi", "b.v_int", "b.vvi"), 4
)
# Threshold tuned to the synthetic corpus's cosine range (max pairwise
# cosine ~0.51 at sf0.01, ~0.6 at sf0.1): the exact sibling's 0.99 row is
# VACUOUS at driver scale (0 pairs exist). 0.4 keeps the driver row
# non-vacuous (17 pairs at sf0.01) while the operator stays threshold-
# agnostic; tests/test_dedup.py pins the high-threshold planted-family
# behavior separately.
_BUCKETED_THRESHOLD = 0.4

_BUCKETED_NEAR_DUP_ORACLE = f"""
WITH u AS (
  SELECT vec_id, {_VI_SQL} AS v_int, {_VVI_SQL} AS vvi,
    {_BNE_BUCKETS[0]} AS b0, {_BNE_BUCKETS[1]} AS b1,
    {_BNE_BUCKETS[2]} AS b2, {_BNE_BUCKETS[3]} AS b3
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {_BNE_COS} AS cosine
FROM u a JOIN u b ON a.vec_id < b.vec_id
  AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
WHERE {_BNE_COS} >= {_BUCKETED_THRESHOLD}
""".strip()


@spec(
    "embedding_bucketed_near_dup",
    oracle=_BUCKETED_NEAR_DUP_ORACLE,
    tags=("dedup", "similarity", "lsh"),
    bench=True,
)
def q_embedding_bucketed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via bucketed block GEMM (operators/similarity.py):
    the 100 TB composition the exact `embedding_near_dup` docstring names.
    Σ_bucket n_b² flops instead of n², replication factor exactly L=4, one
    vectorized numpy matmul per (table, bucket) group.

    Same rounding slack as the exact sibling: the operator threshold
    carries 1e-4 so the final filter on the ROUNDED cosine (oracle
    semantics) can't drop a boundary pair."""
    e = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.bucketed_matmul_near_dup_pairs(
        e,
        _BUCKETED_THRESHOLD - 1e-4,
        dim=64,
        id_col="vec_id",
        bits_per_table=_BNE_BITS,
        n_tables=_BNE_TABLES,
        seed=42,
    )
    return pairs.select(
        "vec_a", "vec_b", pround(F.col("cosine"), 4).alias("cosine")
    ).filter(F.col("cosine") >= _BUCKETED_THRESHOLD)


# --- LSH-bucketed ANN (approximate scale path) ------------------------------
# The same literal hyperplanes are baked into the oracle SQL, so the oracle
# replays the identical bucketing — parity by construction, recall visible in
# the output (compare to embedding_topk's exact ranks).
_N_PLANES = 6
_PLANES = similarity.make_planes(dim=64, n_planes=_N_PLANES, seed=42)

_ANN_BUCKET_SQL = similarity.sql_hyperplane_bucket("embedding", _PLANES)
_ANN_ORACLE = f"""
WITH u AS (
  SELECT vec_id, {_ANN_BUCKET_SQL} AS bucket,
    {_VI_SQL} AS v_int, {_VVI_SQL} AS vvi
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, bucket, v_int AS vi_q, vvi AS vvi_q
      FROM u WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
    {sql_pround(similarity.sql_int_cosine("q.vi_q", "q.vvi_q", "c.v_int", "c.vvi"), 4)} AS cosine
  FROM q JOIN u c ON q.bucket = c.bucket AND c.vec_id <> q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, cosine, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= {_TOP_K}
""".strip()


@spec("embedding_ann_lsh", oracle=_ANN_ORACLE, tags=("similarity", "ann", "lsh"), bench=True)
def q_embedding_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: 6 random-hyperplane sign bits bucket the corpus
    (expected bucket ≈ 1/64 of the data); search joins query↔corpus on the
    bucket string only. At 100 TB this is the shape that survives: a
    co-partitioned equi-join on a uniform key instead of a broadcast scan of
    everything, recall tunable via plane count / multi-probe."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES).withColumnRenamed("vec_id", "query_id")
    topk = similarity.ann_bucketed_topk(
        e, q, _PLANES, _TOP_K, id_col="vec_id", query_id_col="query_id", rank_digits=4
    )
    return topk.select(
        "query_id", "neighbor_id", "cosine", F.col("rnk").cast("int").alias("rnk")
    )


_LABEL_CENTROID_ORACLE = f"""
SELECT label, count(*) AS n_vectors,
  {sql_pround("avg(CAST(embedding[1] AS DOUBLE))", 4)} AS centroid_dim0,
  {sql_pround("avg(CAST(embedding[2] AS DOUBLE))", 4)} AS centroid_dim1,
  {sql_pround("avg(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'))", 4)} AS avg_component_sum
FROM embeddings
GROUP BY label
""".strip()


@spec("embedding_label_stats", oracle=_LABEL_CENTROID_ORACLE, tags=("agg", "array"))
def q_embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-column aggregation: per-label counts, leading centroid dims, and
    mean component sum (array fold entirely JVM-side)."""
    e = load_table(spark, sf_dir, "embeddings")
    comp_sum = F.expr(
        "aggregate(embedding, 0D, (acc, v) -> acc + CAST(v AS DOUBLE))"
    )
    return e.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        pround(F.avg(F.element_at("embedding", 1).cast("double")), 4).alias("centroid_dim0"),
        pround(F.avg(F.element_at("embedding", 2).cast("double")), 4).alias("centroid_dim1"),
        pround(F.avg(comp_sum), 4).alias("avg_component_sum"),
    )


# --- multi-probe ANN ---------------------------------------------------------
# Home bucket + every 1-bit-flip bucket (7 probes at 6 planes): a true
# neighbor escapes only if >= 2 hyperplanes separate it from the query.
# Oracle replays the identical probe expansion.
_probe_exprs = ["b.bucket"] + [
    similarity.sql_flip_bit("b.bucket", i, _N_PLANES) for i in range(_N_PLANES)
]
_ANN_MP_ORACLE = f"""
WITH b AS (
  SELECT vec_id, {_ANN_BUCKET_SQL} AS bucket,
    {_VI_SQL} AS v_int, {_VVI_SQL} AS vvi
  FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, v_int AS vi_q, vvi AS vvi_q,
    unnest([{", ".join(_probe_exprs)}]) AS bucket
  FROM b
  WHERE vec_id < {_N_QUERIES}
),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
    {sql_pround(similarity.sql_int_cosine("q.vi_q", "q.vvi_q", "c.v_int", "c.vvi"), 4)} AS cosine
  FROM q JOIN b c ON q.bucket = c.bucket AND c.vec_id <> q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, cosine, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= {_TOP_K}
""".strip()


@spec("embedding_ann_multiprobe", oracle=_ANN_MP_ORACLE, tags=("similarity", "ann", "lsh", "multiprobe"), bench=True)
def q_embedding_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN: 7 probes per query (home + 1-bit flips) against
    single-bucket corpus placement — recall close to exact top-k at ~7/64 of
    the brute-force candidate work, still a plain co-partitioned equi-join."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES).withColumnRenamed("vec_id", "query_id")
    topk = similarity.ann_bucketed_topk(
        e, q, _PLANES, _TOP_K, id_col="vec_id", query_id_col="query_id",
        rank_digits=4, multiprobe=True,
    )
    return topk.select(
        "query_id", "neighbor_id", "cosine", F.col("rnk").cast("int").alias("rnk")
    )


# --- multi-table LSH ANN (OR-construction) ----------------------------------
_MT_BITS = 5
_MT_TABLES = 8
_MT_PLANES = [
    similarity.make_planes(dim=64, n_planes=_MT_BITS, seed=42 + 1000 * t)
    for t in range(_MT_TABLES)
]
_mt_idx_selects = "\n  UNION ALL ".join(
    f"SELECT vec_id, {t} AS table_id,"
    f" {similarity.sql_hyperplane_bucket('embedding', _MT_PLANES[t])} AS bucket"
    f" FROM embeddings"
    for t in range(_MT_TABLES)
)
_ANN_MT_ORACLE = f"""
WITH idx AS (
  {_mt_idx_selects}
),
u AS (
  SELECT vec_id, {_VI_SQL} AS v_int, {_VVI_SQL} AS vvi FROM embeddings
),
cand AS (
  SELECT DISTINCT qi.vec_id AS query_id, ci.vec_id AS neighbor_id
  FROM idx qi
  JOIN idx ci ON qi.table_id = ci.table_id AND qi.bucket = ci.bucket
  WHERE qi.vec_id < {_N_QUERIES} AND ci.vec_id <> qi.vec_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
    {sql_pround(similarity.sql_int_cosine("uq.v_int", "uq.vvi", "un.v_int", "un.vvi"), 4)} AS cosine
  FROM cand c
  JOIN u uq ON uq.vec_id = c.query_id
  JOIN u un ON un.vec_id = c.neighbor_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, cosine, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= {_TOP_K}
""".strip()


@spec("embedding_ann_multitable", oracle=_ANN_MT_ORACLE, tags=("similarity", "ann", "lsh", "multitable"), bench=True)
def q_embedding_ann_multitable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table LSH ANN (8 tables × 5 sign bits, OR-construction): a
    neighbor is a candidate if ANY table agrees — recall ≈ 1-(1-p^5)^8 vs
    p^6 single-table, at the cost of indexing the corpus 8×. The scale
    shape stays a co-partitioned equi-join on (table_id, bucket)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES).withColumnRenamed("vec_id", "query_id")
    topk = similarity.ann_multitable_topk(
        e, q, dim=64, bits_per_table=_MT_BITS, n_tables=_MT_TABLES, k=_TOP_K,
    )
    return topk.select(
        "query_id", "neighbor_id", "cosine", F.col("rnk").cast("int").alias("rnk")
    )


# --- IVF ANN over exact deterministic k-means -------------------------------
# Even the ITERATIVE algorithm carries a full oracle: micro-unit integer
# quantization makes every k-means step (centroid sums, means, argmin
# assignment) bit-identical across engines, so DuckDB replays the exact same
# 2 iterations the Spark side runs.
_IVF_K = 8
_IVF_ITERS = 2
_IVF_NPROBE = 2
_IVF_DIST = (
    "floor((t.vv + c.cc - 2 * list_dot_product(t.v_dbl, c.c_dbl)) * 1000000.0 + 0.5)"
    " / 1000000.0"
)


def _ivf_iteration(i: int, prev_c: str) -> str:
    return f"""
a{i} AS (
  SELECT vec_id, v_int, cid FROM (
    SELECT t.vec_id, t.v_int, c.cid,
      row_number() OVER (PARTITION BY t.vec_id
        ORDER BY {_IVF_DIST} ASC, c.cid ASC) AS r
    FROM vv0 t CROSS JOIN {prev_c} c
  ) WHERE r = 1
),
s{i} AS (
  SELECT cid, i, CAST(sum(v_int[i]) AS BIGINT) AS s, count(*) AS n
  FROM a{i}, (SELECT unnest(generate_series(1, 64)) AS i) g
  GROUP BY cid, i
),
c{i} AS (
  SELECT cid, list(dv ORDER BY i) AS c_dbl FROM (
    SELECT cid, i, CAST(s AS DOUBLE) / (1000000.0 * n) AS dv FROM s{i}
  ) GROUP BY cid
),
c{i}x AS (SELECT cid, c_dbl, list_dot_product(c_dbl, c_dbl) AS cc FROM c{i})
""".strip()


_ivf_iters_sql = ",\n".join(
    _ivf_iteration(i + 1, "c0" if i == 0 else f"c{i}x") for i in range(_IVF_ITERS)
)
_IVF_ORACLE = f"""
WITH vx AS (
  SELECT vec_id,
    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS v_int,
    list_transform(list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)), x -> x / 1000000.0) AS v_dbl
  FROM embeddings
),
vv0 AS (SELECT vec_id, v_int, v_dbl, list_dot_product(v_dbl, v_dbl) AS vv,
               list_dot_product(v_int, v_int) AS vvi
        FROM vx),
c0 AS (SELECT CAST(vec_id AS INTEGER) AS cid, v_dbl AS c_dbl, vv AS cc
       FROM vv0 WHERE vec_id < {_IVF_K}),
{_ivf_iters_sql},
ca AS (
  SELECT vec_id AS neighbor_id, cid, v_int AS n_int, vvi AS n_vvi FROM (
    SELECT t.vec_id, t.v_int, t.vvi, c.cid,
      row_number() OVER (PARTITION BY t.vec_id
        ORDER BY {_IVF_DIST} ASC, c.cid ASC) AS r
    FROM vv0 t CROSS JOIN c{_IVF_ITERS}x c
  ) WHERE r = 1
),
qa AS (
  SELECT vec_id AS query_id, cid, v_int AS q_int, vvi AS q_vvi FROM (
    SELECT t.vec_id, t.v_int, t.vvi, c.cid,
      row_number() OVER (PARTITION BY t.vec_id
        ORDER BY {_IVF_DIST} ASC, c.cid ASC) AS r
    FROM vv0 t CROSS JOIN c{_IVF_ITERS}x c
    WHERE t.vec_id < {_N_QUERIES}
  ) WHERE r <= {_IVF_NPROBE}
),
scored AS (
  SELECT q.query_id, c.neighbor_id,
    {sql_pround(similarity.sql_int_cosine("q.q_int", "q.q_vvi", "c.n_int", "c.n_vvi"), 4)} AS cosine
  FROM qa q JOIN ca c ON q.cid = c.cid AND c.neighbor_id <> q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, cosine, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= {_TOP_K}
""".strip()

# Note: vx computes v_int twice textually — DuckDB CSE handles it; keeping
# the CTE single-pass matters less than keeping it mechanically generated.


# Execution-backend tier for the IVF family: at driver scale (≤ 1k vectors,
# the frozen tier-0 envelope every CORRECTNESS run exercises) the jvm
# expression chain runs — it is the DuckDB-oracle-exact path. Above it the
# Arrow kernels take over: same results by contract (equivalence-pinned in
# tests/test_ann_recall.py, last-ulp caveat documented on the kernels), but
# the bounded-model training chain runs driver-side and each data-sized pass
# is one shuffle-free kernel job — measured 8.4 s → 2.4 s for ivf_pq at
# sf0.1, and the 100x A/B in SCALING.md. Unlike the minhash/semantic tiers
# this knob never changes QUERY SEMANTICS, only the execution backend, so
# the boundary can sit right above driver scale. SPARK_GRAFT_PQ_ASSIGN
# overrides for scripts/ab.py env-arms.
_ANN_TIER0_MAX = 1_000


def _ann_backend(n_vecs: int) -> str:
    import os

    return os.environ.get("SPARK_GRAFT_PQ_ASSIGN") or (
        "jvm" if n_vecs <= _ANN_TIER0_MAX else "arrow"
    )


def _n_vecs(e, sf_dir: str | None) -> int:
    """Corpus size for backend/tier selection: parquet-footer count when the
    relation is the unfiltered embeddings table of a known sf_dir
    (driver-side, no job — datasets.table_row_count), count() job
    otherwise. The number is identical either way; only the scheduled job
    (~0.25 s fixed per query at bench scale) disappears."""
    n = table_row_count(sf_dir, "embeddings") if sf_dir else None
    return e.count() if n is None else n


@spec("embedding_ivf_topk", oracle=_IVF_ORACLE, tags=("similarity", "ann", "ivf", "kmeans"), bench=True)
def q_embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: 2-iteration exact k-means (8 cells) coarse quantizer, 2-cell
    probes, exact cosine within probed cells. Data-adaptive cells beat
    data-oblivious hyperplanes at moderate neighbor similarity; the corpus
    shuffles once on cell id, queries touch nprobe/K of the data. The
    count() picking the execution backend is a metadata-only parquet job."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES).withColumnRenamed("vec_id", "query_id")
    topk = similarity.ivf_topk(
        e, q, k_clusters=_IVF_K, iters=_IVF_ITERS, nprobe=_IVF_NPROBE, k=_TOP_K,
        id_col="vec_id", query_id_col="query_id",
        assign_backend=_ann_backend(_n_vecs(e, sf_dir)),
    )
    return topk.select(
        "query_id", "neighbor_id", "cosine", F.col("rnk").cast("int").alias("rnk")
    )


# --- IVF-PQ: product-quantized residual codebook over the IVF cells ---------
# The compressed-index path: corpus vectors are encoded as (cell id, one
# 4-bit code per 8-dim subspace) and queries score candidates via ADC lookup
# tables (per-query and per-cell code→dot tables), touching raw vectors only
# for the exact re-rank of the shortlist. Every training/encoding step is
# micro-int exact and every ADC sum is a fixed-order expression, so even this
# doubly-iterative construction replays bit-identically in DuckDB.
_PQ_SUBS = 8
_PQ_DSUB = 8
_PQ_CODES = 16
_PQ_SHORTLIST = 3 * _TOP_K

_pq_subs_selects = "\n  UNION ALL ".join(
    f"SELECT vec_id, cid, {m} AS sub_id,"
    f" list_transform(generate_series({m * _PQ_DSUB + 1}, {(m + 1) * _PQ_DSUB}), i -> r_int[i]) AS r_sub_int"
    f" FROM res"
    for m in range(_PQ_SUBS)
)
_PQ_DIST = (
    "floor((t.rr + c.ww - 2 * list_dot_product(t.r_sub_dbl, c.w_dbl))"
    " * 1000000.0 + 0.5) / 1000000.0"
)

# ADC lookup-table pieces — centroid / query sub-vector splits (literal-m
# UNION ALL, same mechanical generation as the residual split above) and the
# FIXED-ORDER left-to-right sums that mirror the Spark expressions exactly
# (parity requires the identical IEEE operation sequence, so these are never
# written as float aggregations across rows).
_pq_cq_subs = "\n  UNION ALL ".join(
    f"SELECT cid, {m} AS sub_id,"
    f" list_transform(generate_series({m * _PQ_DSUB + 1}, {(m + 1) * _PQ_DSUB}), i -> cq_dbl[i]) AS cq_sub"
    f" FROM cqd"
    for m in range(_PQ_SUBS)
)
_pq_q_subs = "\n  UNION ALL ".join(
    f"SELECT vec_id AS query_id, {m} AS sub_id,"
    f" list_transform(generate_series({m * _PQ_DSUB + 1}, {(m + 1) * _PQ_DSUB}), i -> v_dbl[i]) AS q_sub"
    f" FROM vv0 WHERE vec_id < {_N_QUERIES}"
    for m in range(_PQ_SUBS)
)
_pq_aa_sum = "q.cqq" + "".join(
    f" + t.t_arr[{m + 1}][e.code_arr[{m + 1}] + 1]" for m in range(_PQ_SUBS)
)
_pq_adot_sum = "x.qcd" + "".join(
    f" + w.q_arr[{m + 1}][e.code_arr[{m + 1}] + 1]" for m in range(_PQ_SUBS)
)


def _pq_code_assign(name: str, cb: str) -> str:
    return f"""
{name} AS (
  SELECT vec_id, cid, sub_id, code_id, r_sub_int FROM (
    SELECT t.vec_id, t.cid, t.sub_id, c.code_id, t.r_sub_int,
      row_number() OVER (PARTITION BY t.vec_id, t.sub_id
        ORDER BY {_PQ_DIST} ASC, c.code_id ASC) AS r
    FROM subsx t JOIN {cb} c ON t.sub_id = c.sub_id
  ) WHERE r = 1
)
""".strip()


_IVF_PQ_ORACLE = f"""
WITH vx AS (
  SELECT vec_id,
    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS v_int,
    list_transform(list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)), x -> x / 1000000.0) AS v_dbl
  FROM embeddings
),
vv0 AS (SELECT vec_id, v_int, v_dbl, list_dot_product(v_dbl, v_dbl) AS vv,
               list_dot_product(v_int, v_int) AS vvi
        FROM vx),
c0 AS (SELECT CAST(vec_id AS INTEGER) AS cid, v_dbl AS c_dbl, vv AS cc
       FROM vv0 WHERE vec_id < {_IVF_K}),
{_ivf_iters_sql},
cqd AS (
  SELECT cid,
    list_transform(c_dbl, x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS c_int,
    list_transform(list_transform(c_dbl, x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)), x -> x / 1000000.0) AS cq_dbl
  FROM c{_IVF_ITERS}x
),
ca0 AS (
  SELECT vec_id, cid, v_int FROM (
    SELECT t.vec_id, t.v_int, c.cid,
      row_number() OVER (PARTITION BY t.vec_id
        ORDER BY {_IVF_DIST} ASC, c.cid ASC) AS r
    FROM vv0 t CROSS JOIN c{_IVF_ITERS}x c
  ) WHERE r = 1
),
res AS (
  SELECT a.vec_id, a.cid,
    list_transform(generate_series(1, 64), i -> a.v_int[i] - q.c_int[i]) AS r_int
  FROM ca0 a JOIN cqd q ON a.cid = q.cid
),
subs0 AS (
  {_pq_subs_selects}
),
subsx AS (
  SELECT vec_id, cid, sub_id, r_sub_int,
    list_transform(r_sub_int, x -> x / 1000000.0) AS r_sub_dbl,
    list_dot_product(list_transform(r_sub_int, x -> x / 1000000.0),
                     list_transform(r_sub_int, x -> x / 1000000.0)) AS rr
  FROM subs0
),
cb0 AS (
  SELECT sub_id, CAST(vec_id AS INTEGER) AS code_id, r_sub_dbl AS w_dbl,
    list_dot_product(r_sub_dbl, r_sub_dbl) AS ww
  FROM subsx WHERE vec_id < {_PQ_CODES}
),
{_pq_code_assign("acb0", "cb0")},
pqs1 AS (
  SELECT sub_id, code_id, i, CAST(sum(r_sub_int[i]) AS BIGINT) AS s, count(*) AS n
  FROM acb0, (SELECT unnest(generate_series(1, {_PQ_DSUB})) AS i) g
  GROUP BY sub_id, code_id, i
),
cb1 AS (
  SELECT sub_id, code_id, list(dv ORDER BY i) AS w_dbl FROM (
    SELECT sub_id, code_id, i, CAST(s AS DOUBLE) / (1000000.0 * n) AS dv FROM pqs1
  ) GROUP BY sub_id, code_id
),
cb1x AS (SELECT sub_id, code_id, w_dbl, list_dot_product(w_dbl, w_dbl) AS ww FROM cb1),
{_pq_code_assign("codes", "cb1x")},
cqsub AS (
  {_pq_cq_subs}
),
cwt0 AS (
  SELECT s.cid, s.sub_id, c.code_id,
    2 * list_dot_product(s.cq_sub, c.w_dbl) + c.ww AS tv
  FROM cqsub s JOIN cb1x c ON s.sub_id = c.sub_id
),
cwt1 AS (SELECT cid, sub_id, list(tv ORDER BY code_id) AS tl FROM cwt0 GROUP BY cid, sub_id),
cwt AS (SELECT cid, list(tl ORDER BY sub_id) AS t_arr FROM cwt1 GROUP BY cid),
cqq AS (SELECT cid, list_dot_product(cq_dbl, cq_dbl) AS cqq FROM cqd),
enc0 AS (SELECT vec_id, cid, list(code_id ORDER BY sub_id) AS code_arr FROM codes GROUP BY vec_id, cid),
enc AS (
  SELECT e.vec_id AS neighbor_id, e.cid, e.code_arr, {_pq_aa_sum} AS aa
  FROM enc0 e JOIN cqq q ON e.cid = q.cid JOIN cwt t ON e.cid = t.cid
),
qsub AS (
  {_pq_q_subs}
),
qw0 AS (
  SELECT s.query_id, s.sub_id, c.code_id, list_dot_product(s.q_sub, c.w_dbl) AS qv
  FROM qsub s JOIN cb1x c ON s.sub_id = c.sub_id
),
qw1 AS (SELECT query_id, sub_id, list(qv ORDER BY code_id) AS ql FROM qw0 GROUP BY query_id, sub_id),
qwt AS (SELECT query_id, list(ql ORDER BY sub_id) AS q_arr FROM qw1 GROUP BY query_id),
qa AS (
  SELECT vec_id AS query_id, cid, v_dbl AS q_dbl, vv AS q_vv,
         v_int AS q_int, vvi AS q_vvi FROM (
    SELECT t.vec_id, t.v_dbl, t.vv, t.v_int, t.vvi, c.cid,
      row_number() OVER (PARTITION BY t.vec_id
        ORDER BY {_IVF_DIST} ASC, c.cid ASC) AS r
    FROM vv0 t CROSS JOIN c{_IVF_ITERS}x c
    WHERE t.vec_id < {_N_QUERIES}
  ) WHERE r <= {_IVF_NPROBE}
),
qx AS (
  SELECT qa.query_id, qa.cid, qa.q_dbl, qa.q_vv, qa.q_int, qa.q_vvi,
    list_dot_product(qa.q_dbl, cq.cq_dbl) AS qcd
  FROM qa JOIN cqd cq ON qa.cid = cq.cid
),
scored AS (
  SELECT x.query_id, e.neighbor_id, x.q_int, x.q_vvi,
    floor(({_pq_adot_sum}) / (sqrt(x.q_vv) * sqrt(e.aa)) * 10000.0 + 0.5) / 10000.0 AS approx_cosine
  FROM qx x JOIN enc e ON x.cid = e.cid AND e.neighbor_id <> x.query_id
    JOIN qwt w ON w.query_id = x.query_id
),
short AS (
  SELECT query_id, neighbor_id, q_int, q_vvi, approx_cosine FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY approx_cosine DESC, neighbor_id) AS s
    FROM scored
  ) WHERE s <= {_PQ_SHORTLIST}
),
rer AS (
  SELECT sh.query_id, sh.neighbor_id, sh.approx_cosine,
    {sql_pround(similarity.sql_int_cosine("sh.q_int", "sh.q_vvi", "t.v_int", "t.vvi"), 4)} AS cosine
  FROM short sh JOIN vv0 t ON t.vec_id = sh.neighbor_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM rer
)
SELECT query_id, neighbor_id, approx_cosine, cosine, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= {_TOP_K}
""".strip()


@spec("embedding_ivf_pq", oracle=_IVF_PQ_ORACLE, tags=("similarity", "ann", "ivf", "pq"), bench=True)
def q_embedding_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN: the IVF coarse cells plus a product-quantization residual
    codebook (8 subspaces × 16 codewords, 1 Lloyd step), scoring candidates
    via ADC lookup tables and exact-re-ranking a 3k shortlist. Encoded
    corpus storage is ~(cell id + 8×4-bit codes) per vector — the index that
    fits in memory at 100 TB where raw vectors do not; raw vectors are
    touched only for the shortlist re-rank. Above tier 0 the training chain
    runs on the Arrow kernels (see _ann_backend); the count() is a
    metadata-only parquet job."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES).withColumnRenamed("vec_id", "query_id")
    topk = similarity.ivf_pq_topk(
        e, q,
        dim=64, k_clusters=_IVF_K, iters=_IVF_ITERS, nprobe=_IVF_NPROBE,
        n_subspaces=_PQ_SUBS, n_codes=_PQ_CODES, pq_iters=1, k=_TOP_K,
        shortlist_factor=3, id_col="vec_id", query_id_col="query_id",
        assign_backend=_ann_backend(_n_vecs(e, sf_dir)),
    )
    return topk.select(
        "query_id", "neighbor_id", "approx_cosine", "cosine",
        F.col("rnk").cast("int").alias("rnk"),
    )


# --- semantic dedup (SemDeDup): k-means cells → within-cell pairs → keeper --
# The LLM-corpus semantic-dedup shape (Abbas et al. 2023) driver-checked
# end-to-end: the SAME exact k-means replay the IVF oracle established,
# within-cell pair generation on the micro-quantized dot product (cosine
# floor-rounded to 1e-6 BEFORE the threshold — bit-identical in both
# engines), 3 generated rounds of min-label propagation (the
# doc_dedup_clusters pattern, factored as dedup.sql_propagation_rounds),
# and the paper's farthest-from-centroid keeper policy decided on the
# SAME quantized distances the assignment argmin uses. Since round 7 the
# pair stage runs the exact fixed-point GEMM (pair_backend="int") at EVERY
# tier — the oracle below computes the identical integer dot, so the fast
# path and the driver-checked path are the same code; tests/test_dedup.py
# pins the jvm/gemm equivalences beside it.
_SEM_THRESHOLD = 0.4
_SEM_ROUNDS = 3
# The integer-cosine contract (round 7, unifying the pair tier): the dot is
# the EXACT integer dot of the micro-quantized vectors. DuckDB's
# list_dot_product accumulates in float64, but every product (≤ max|v_int|²)
# and every partial sum (≤ dim·max|v_int|², ~2^44 on this data) is an
# exactly-representable integer < 2^53, so no accumulation order can round —
# the same argument that makes the Spark int backend's float64 GEMM exact
# (operators/similarity.py, pair_backend="int", guarded at 2^53). sqrt /
# multiply / divide / floor-quantize are then single IEEE ops on exact
# inputs: bit-identical in any engine.
_SEM_QCOS = (
    "floor(list_dot_product(a.v_int, b.v_int) / (sqrt(a.vvi) * sqrt(b.vvi))"
    " * 1000000.0 + 0.5) / 1000000.0"
)

_SEMANTIC_ORACLE = f"""
WITH vx AS (
  SELECT vec_id,
    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS v_int,
    list_transform(list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)), x -> x / 1000000.0) AS v_dbl
  FROM embeddings
),
vv0 AS (SELECT vec_id, v_int, v_dbl, list_dot_product(v_dbl, v_dbl) AS vv,
               list_dot_product(v_int, v_int) AS vvi
        FROM vx),
c0 AS (SELECT CAST(vec_id AS INTEGER) AS cid, v_dbl AS c_dbl, vv AS cc
       FROM vv0 WHERE vec_id < {_IVF_K}),
{_ivf_iters_sql},
caq AS (
  SELECT vec_id, cid, v_int, vvi, cdist FROM (
    SELECT t.vec_id, t.v_int, t.vvi, c.cid, {_IVF_DIST} AS cdist,
      row_number() OVER (PARTITION BY t.vec_id
        ORDER BY {_IVF_DIST} ASC, c.cid ASC) AS r
    FROM vv0 t CROSS JOIN c{_IVF_ITERS}x c
  ) WHERE r = 1
),
prs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM caq a JOIN caq b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE {_SEM_QCOS} >= {_SEM_THRESHOLD}
),
edges AS (
  SELECT vec_a AS src, vec_b AS dst FROM prs
  UNION
  SELECT vec_b AS src, vec_a AS dst FROM prs
),
{dedup.sql_propagation_rounds(_SEM_ROUNDS)},
lbl AS (
  SELECT q.vec_id, q.cid, q.cdist, COALESCE(l.label, q.vec_id) AS group_id
  FROM caq q LEFT JOIN l{_SEM_ROUNDS} l ON l.id = q.vec_id
),
reps AS (
  SELECT group_id, vec_id AS keeper_id FROM (
    SELECT group_id, vec_id, row_number() OVER (
      PARTITION BY group_id ORDER BY cdist DESC, vec_id ASC) AS r
    FROM lbl
  ) WHERE r = 1
)
SELECT l.vec_id, CAST(l.cid AS INTEGER) AS cid, l.group_id, r.keeper_id
FROM lbl l JOIN reps r USING (group_id)
""".strip()


# Cell-count tier (the lsh_tier_geometry pattern): tier 0 — ≤ 40k vectors —
# is the FROZEN oracle geometry (8 cells, jvm pairs, 3 propagation rounds;
# every driver/bench SF lands here). Above it the pair stage switches to the
# Arrow-GEMM kernel + exact connected components (the production fast path
# the equivalence tests pin to the oracle path), and the cell count follows
# a √n rule: total cost is a·n·K for the JVM-row assignment cross join plus
# g·n²/K for the per-cell BLAS GEMM, minimized at K* = √(n·g/a) ∝ √n —
# total work O(n^1.5), with the n²/K term carried by BLAS flops, not JVM
# rows. The measured constants (100x tier: 50M assignment rows dominated
# while 2.5G GEMM MACs were seconds) put K* ≈ √n/7 — ~100 cells of ~5k at
# 500k vectors, ~1000 cells of ~50k at 50M. A LINEAR cells rule (fixed cell
# size) would make the assignment term n²/cell — quadratic in JVM rows.
_SEM_TIER0_MAX = 40_000


def _sem_tier(n_vecs: int) -> dict:
    # Both tiers run pair_backend="int" since round 7: the exact fixed-point
    # GEMM is bit-deterministic across engines/orders/BLAS, so the fast path
    # IS the oracle-checked path — no more jvm-join tier-0 / gemm tier-1
    # split, and no last-ulp caveat anywhere in the pair stage.
    import os

    pair = os.environ.get("SPARK_GRAFT_SEM_PAIRS", "int")
    if n_vecs <= _SEM_TIER0_MAX:
        # Tier 0 is PINNED to "int" (the knob is tier-1-only, like
        # SEM_CELLS/SEM_ASSIGN): the oracle replays the exact integer dot,
        # and the gemm arm thresholds the raw unquantized BLAS cosine —
        # letting the knob through here could drop/keep boundary pairs and
        # fail driver verification on the frozen tier-0 geometry.
        #
        # Round 14: the tier-0 ASSIGNMENT runs the Arrow kernel — with the
        # jvm-order dot fold it is bit-identical to the broadcast-join
        # argmin (full-output equality pinned at sf0.1), shuffle-free, and
        # emits cdist directly instead of re-joining centroids: 6-rep
        # interleaved A/B 2.36 -> 2.01 s median on the cell. Guarded on
        # the fold being active: the gemm dot arm restores the last-ulp
        # caveat, so it must never reach this declared query's geometry
        # (kmeans_exact applies the same guard to its own default).
        # SPARK_GRAFT_SEM_T0_ASSIGN=jvm keeps the join arm for A/B.
        from ..operators.similarity import _assign_dot_mode

        t0_assign = os.environ.get("SPARK_GRAFT_SEM_T0_ASSIGN") or (
            "arrow" if _assign_dot_mode() == "fold" else "jvm"
        )
        return dict(
            k_clusters=_IVF_K, pair_backend="int",
            propagation_rounds=_SEM_ROUNDS, assign_backend=t0_assign,
        )
    # Tier-1 experiment knobs (never tier 0 — the oracle geometry stays
    # frozen): SPARK_GRAFT_SEM_CELLS pins the cell count (or, as
    # "auto-probe", runs the recall-per-cost probe —
    # similarity.probe_cell_count) and SPARK_GRAFT_SEM_ASSIGN pins the
    # assignment backend, so scripts/ab.py env-arms can A/B the √n
    # constant, the probe, and the Arrow/JVM assignment at the soak tiers.
    override = os.environ.get("SPARK_GRAFT_SEM_CELLS")
    if override == "auto-probe":
        k = "auto-probe"
    elif override:
        k = int(override)
    else:
        k = max(_IVF_K + 1, round(n_vecs**0.5 / 7))
    return dict(
        k_clusters=k,
        pair_backend=pair,
        propagation_rounds=None,
        assign_backend=os.environ.get("SPARK_GRAFT_SEM_ASSIGN", "arrow"),
    )


@spec(
    "embedding_semantic_dedup",
    oracle=_SEMANTIC_ORACLE,
    tags=("similarity", "dedup", "semdedup", "kmeans", "graph"),
    bench=True,
)
def q_embedding_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: exact k-means cells (the IVF
    coarse quantizer), within-cell pairs at quantized cosine ≥ 0.4,
    component grouping, farthest-from-centroid keeper per group — one
    (vec_id, cid, group_id, keeper_id) row per vector, linear output. The
    pair stage is the exact fixed-point GEMM at every tier (bit-identical
    to the oracle's integer dot); tier 0's fixed propagation rounds make
    the iterative grouping oracle-replayable, larger corpora switch to
    proportionally more cells and exact connected components
    (tests/test_dedup.py pins the grouping equivalences). The count() is a
    metadata-only parquet job, same as _mh_geometry."""
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(
        e,
        _SEM_THRESHOLD,
        iters=_IVF_ITERS,
        keep="far_from_centroid",
        **_sem_tier(_n_vecs(e, sf_dir)),
    )


# --- prototypicality pruning -------------------------------------------------

_PROTO_DIM = 64
_PROTO_TAU = 0.2

_proto_sums = ",\n    ".join(
    f"CAST(sum(v_int[{i + 1}]) AS BIGINT) AS s{i}" for i in range(_PROTO_DIM)
)
_proto_cint = ", ".join(
    f"CAST(floor(CAST(s{i} AS DOUBLE) / n) AS BIGINT)" for i in range(_PROTO_DIM)
)
_PROTO_COS = similarity.sql_int_cosine("m.v_int", "m.vvi", "c2.c_int", "c2.cvi")

_PROTOTYPICALITY_ORACLE = f"""
WITH m AS (
  SELECT vec_id, label, {_VI_SQL} AS v_int, {_VVI_SQL} AS vvi FROM embeddings
),
s AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n,
    {_proto_sums}
  FROM m GROUP BY label
),
c AS (SELECT label, n, [{_proto_cint}] AS c_int FROM s),
c2 AS (
  SELECT label, n, c_int,
    CAST(list_dot_product(c_int, c_int) AS BIGINT) AS cvi
  FROM c
)
SELECT m.vec_id, m.label, c2.n AS n_label,
  {sql_pround(_PROTO_COS, 6)} AS proto_cosine,
  ({_PROTO_COS} >= {_PROTO_TAU}) AS is_prototypical
FROM m JOIN c2 ON m.label = c2.label
""".strip()


@spec_tests_only(
    "embedding_prototypicality",
    oracle=_PROTOTYPICALITY_ORACLE,
    tags=("pruning", "embedding", "centroid"),
)
def q_embedding_prototypicality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-pruning signal: cosine of each vector to its OWN label's
    centroid, thresholded at τ — similarity.label_prototypicality. The
    centroid lives in the exact integer representation (per-dim BIGINT
    sums, floor-mean micro-units), so the τ verdict is engine- and
    fold-order-independent; a float centroid would make boundary verdicts
    an artifact of summation order."""
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.label_prototypicality(
        e, dim=_PROTO_DIM, tau=_PROTO_TAU
    )
