"""ANN recall against the exact top-k baseline: the three LSH variants must
rank in their theoretical recall order (single-probe < multi-probe <
multi-table OR-construction), and the multi-table index must clear an
absolute floor for this data's similarity regime."""

from __future__ import annotations

import pytest

from stock_etl_pipeline_spark.workload import load_all

SF = "/root/testdata/sf0.01"
from stock_etl_pipeline_spark.workload import all_specs

REGISTRY = all_specs()  # driver tier + tests-only (multitable demoted r13)


@pytest.fixture(scope="module")
def recalls(spark):
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in REGISTRY["embedding_topk"].fn(spark, SF).collect()
    }

    def recall(name: str) -> float:
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in REGISTRY[name].fn(spark, SF).collect()
        }
        return len(exact & approx) / len(exact)

    return {
        "single": recall("embedding_ann_lsh"),
        "multiprobe": recall("embedding_ann_multiprobe"),
        "multitable": recall("embedding_ann_multitable"),
        "ivf": recall("embedding_ivf_topk"),
        "ivf_pq": recall("embedding_ivf_pq"),
    }


def test_recall_ordering(recalls):
    assert recalls["single"] <= recalls["multiprobe"] <= recalls["multitable"]


def test_multitable_recall_floor(recalls):
    # 8 tables × 5 bits at this corpus's neighbor-similarity regime: the
    # OR-construction must recover a substantial fraction of true top-10.
    assert recalls["multitable"] >= 0.4, recalls


def test_ivf_beats_lsh_on_clustered_data(recalls):
    # Data-adaptive k-means cells align with the corpus's cluster structure;
    # data-oblivious hyperplanes can't — IVF should dominate every LSH
    # variant here (measured ≈ 0.9 at sf0.01).
    assert recalls["ivf"] >= 0.8, recalls
    assert recalls["ivf"] > recalls["multitable"]


def test_ivf_pq_recall_close_to_ivf(recalls):
    # PQ compresses the residuals (8 subspaces x 16 codes) and re-ranks a 3k
    # shortlist exactly, so it may drop a few tail neighbors vs uncompressed
    # IVF but must stay close (and far above chance).
    assert recalls["ivf_pq"] >= recalls["ivf"] - 0.2, recalls
    assert recalls["ivf_pq"] >= 0.6, recalls


def test_bucketed_matmul_near_dup_precision_and_recall(spark):
    """The bucketed GEMM scale path: precision 1.0 by construction (every
    emitted cosine is exact), recall governed by the (b, L) OR-construction
    at near-dup similarity (cos ≈ 0.99 → per-plane p ≈ 0.955, b=6 L=4 →
    theoretical recall ≈ 0.996). Planted near-dup families: the testdata
    embeddings have NO high-cosine pairs (max pairwise ≈ 0.48), so the
    near-dup regime must be synthesized."""
    import random

    from stock_etl_pipeline_spark.operators import similarity as sim

    rng = random.Random(7)
    dim, rows = 64, []
    vid = 0
    for _fam in range(40):
        base = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        for _copy in range(3):  # 3 members -> 3 true pairs per family
            rows.append(
                (vid, [b + rng.gauss(0.0, 0.04) for b in base])
            )
            vid += 1
    for _ in range(80):  # background noise vectors, no near-dups
        rows.append((vid, [rng.gauss(0.0, 1.0) for _ in range(dim)]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    threshold = 0.95
    exact = {
        (r["vec_a"], r["vec_b"]): round(r["cosine"], 9)
        for r in sim.matmul_near_dup_pairs(
            df, threshold, n_blocks=4
        ).collect()
    }
    approx_df = sim.bucketed_matmul_near_dup_pairs(
        df, threshold, dim=dim, bits_per_table=6, n_tables=4
    )
    assert "CartesianProduct" not in approx_df._jdf.queryExecution().executedPlan().toString()
    approx = {
        (r["vec_a"], r["vec_b"]): round(r["cosine"], 9)
        for r in approx_df.collect()
    }
    assert exact, "planted families must produce true near-dup pairs"
    # precision: every approx pair is a true pair with the identical cosine
    assert set(approx) <= set(exact)
    for pair, cos in approx.items():
        assert exact[pair] == cos
    # recall floor (deterministic planes + deterministic data)
    recall = len(approx) / len(exact)
    assert recall >= 0.9, (recall, len(exact), len(approx))


def test_ivf_arrow_assignment_matches_jvm(spark):
    """ivf_topk(assign_backend='arrow') must return the same ranked top-k
    as the oracle-exact JVM path on the test corpus (cosines rounded to
    rank_digits on both paths; planted distances sit far from quantization
    boundaries)."""
    from pyspark.sql import functions as F

    from stock_etl_pipeline_spark.datasets import load_table
    from stock_etl_pipeline_spark.operators import similarity

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    kw = dict(k_clusters=8, iters=2, nprobe=2, k=10,
              id_col="vec_id", query_id_col="query_id")
    a = {
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rnk"])
        for r in similarity.ivf_topk(e, q, **kw).collect()
    }
    b = {
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rnk"])
        for r in similarity.ivf_topk(e, q, assign_backend="arrow", **kw).collect()
    }
    assert a == b and len(a) > 0


def test_kmeans_fused_matches_legacy_bit_exact(spark, monkeypatch):
    """The round-8 fused Lloyd path (one aggregate job per iteration) must
    reproduce the legacy multi-shuffle jvm loop BIT-exactly on the real
    corpus — same cids, same centroid doubles to the last ulp, same norms.
    The oracle replays the legacy arithmetic, so this equivalence is what
    keeps the three tier-0 kmeans queries driver-green."""
    from stock_etl_pipeline_spark.datasets import load_table
    from stock_etl_pipeline_spark.operators import similarity

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    v = similarity.with_micro_vectors(e.select("vec_id", "embedding"))

    def model(df):
        return sorted(
            (int(r["cid"]), [float(x) for x in r["c_dbl"]], float(r["cc"]))
            for r in df.collect()
        )

    monkeypatch.setenv("SPARK_GRAFT_KMEANS_FUSE", "0")
    legacy = model(similarity.kmeans_exact(v, k_clusters=8, iters=2))
    monkeypatch.setenv("SPARK_GRAFT_KMEANS_FUSE", "1")
    fused = model(similarity.kmeans_exact(v, k_clusters=8, iters=2))
    assert len(legacy) > 0
    assert fused == legacy  # bit-exact: == on floats, no tolerance


def test_kmeans_arrow_fold_matches_jvm_bit_exact(spark, monkeypatch):
    """Round 14: the Arrow iteration kernel with the jvm-order dot fold
    (_np_dot_jvm_order) is the DEFAULT oracle backend — it must reproduce
    BOTH jvm arms (fused single-aggregate and legacy multi-shuffle)
    BIT-exactly on the real corpus: same cids, same centroid doubles to
    the last ulp, same norms. This equivalence is what lets the
    shuffle-free kernel carry the three tier-0 kmeans queries."""
    from stock_etl_pipeline_spark.datasets import load_table
    from stock_etl_pipeline_spark.operators import similarity

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        e = load_table(spark, sf, "embeddings")
        v = similarity.with_micro_vectors(e.select("vec_id", "embedding"))

        def model(df):
            return sorted(
                (int(r["cid"]), [float(x) for x in r["c_dbl"]], float(r["cc"]))
                for r in df.collect()
            )

        arrow = model(similarity.kmeans_exact(v, k_clusters=8, iters=2))
        monkeypatch.setenv("SPARK_GRAFT_KMEANS_ARROW", "0")
        fused = model(similarity.kmeans_exact(v, k_clusters=8, iters=2))
        monkeypatch.setenv("SPARK_GRAFT_KMEANS_FUSE", "0")
        legacy = model(similarity.kmeans_exact(v, k_clusters=8, iters=2))
        monkeypatch.delenv("SPARK_GRAFT_KMEANS_ARROW")
        monkeypatch.delenv("SPARK_GRAFT_KMEANS_FUSE")
        assert len(arrow) > 0
        assert arrow == fused == legacy  # bit-exact: == on floats


def test_assign_arrow_fold_matches_jvm_bit_exact(spark, monkeypatch):
    """assign_to_centroids_arrow under the default fold dot mode must
    reproduce the jvm broadcast-join argmin BIT-exactly over the full
    corpus — same cid AND same quantized cdist per vector — while the
    gemm A/B arm stays available (and agrees here too; its caveat is
    last-ulp boundary coincidence, not expected divergence)."""
    from pyspark.sql import functions as F

    from stock_etl_pipeline_spark.datasets import load_table
    from stock_etl_pipeline_spark.operators import similarity

    e = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    v = similarity.with_micro_vectors(e.select("vec_id", "embedding"))
    cents = similarity.kmeans_exact(v, k_clusters=8, iters=2)

    jvm = similarity.assign_to_centroids(v, cents)
    vc = F.expr(similarity._DOT_D.format(a="v_dbl", b="c_dbl"))
    jdist = F.floor(
        (F.col("vv") + F.col("cc") - 2 * vc) * 1e6 + F.lit(0.5)
    ) / 1e6
    jvm_rows = {
        (int(r["vec_id"]), int(r["cid"]), float(r["cdist"]))
        for r in jvm.join(F.broadcast(cents), "cid")
        .withColumn("cdist", jdist)
        .select("vec_id", "cid", "cdist")
        .collect()
    }
    arrow_rows = {
        (int(r["vec_id"]), int(r["cid"]), float(r["cdist"]))
        for r in similarity.assign_to_centroids_arrow(
            v.select("vec_id", "v_dbl", "vv"), cents
        )
        .select("vec_id", "cid", "cdist")
        .collect()
    }
    assert len(jvm_rows) > 0
    assert arrow_rows == jvm_rows


def test_pq_fused_matches_legacy_chain(spark, monkeypatch):
    """The round-10 fused jvm PQ path (one aggregate job per Lloyd
    iteration, shuffle-free encode, driver-built ADC tables) must
    reproduce the legacy multi-materialize jvm chain BIT-exactly on the
    real corpus — same shortlists, same approx/exact cosines to the last
    ulp, same ranks. The oracle replays the legacy arithmetic, so this
    equivalence is what keeps embedding_ivf_pq driver-green with the
    fused path as the default."""
    from pyspark.sql import functions as F

    from stock_etl_pipeline_spark.datasets import load_table
    from stock_etl_pipeline_spark.operators import similarity

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < 10).withColumnRenamed("vec_id", "query_id")
    kw = dict(dim=64, k_clusters=8, iters=2, nprobe=2, n_subspaces=8,
              n_codes=16, pq_iters=2, k=10, shortlist_factor=3,
              id_col="vec_id", query_id_col="query_id")

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    monkeypatch.setenv("SPARK_GRAFT_PQ_FUSE", "0")
    legacy = rows(similarity.ivf_pq_topk(e, q, **kw))
    monkeypatch.setenv("SPARK_GRAFT_PQ_FUSE", "1")
    fused = rows(similarity.ivf_pq_topk(e, q, **kw))
    assert len(legacy) > 0
    assert fused == legacy  # bit-exact: == on floats, no tolerance


def test_ivf_pq_arrow_assignment_matches_jvm(spark):
    """ivf_pq_topk(assign_backend='arrow') must reproduce the JVM path's
    ranked output on the test corpus (same rounded scores, same ranks)."""
    from pyspark.sql import functions as F

    from stock_etl_pipeline_spark.datasets import load_table
    from stock_etl_pipeline_spark.operators import similarity

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    kw = dict(dim=64, k_clusters=8, iters=2, nprobe=2, n_subspaces=8,
              n_codes=16, pq_iters=1, k=10, shortlist_factor=3,
              id_col="vec_id", query_id_col="query_id")
    a = {
        (r["query_id"], r["neighbor_id"], r["approx_cosine"], r["cosine"], r["rnk"])
        for r in similarity.ivf_pq_topk(e, q, **kw).collect()
    }
    b = {
        (r["query_id"], r["neighbor_id"], r["approx_cosine"], r["cosine"], r["rnk"])
        for r in similarity.ivf_pq_topk(e, q, assign_backend="arrow", **kw).collect()
    }
    assert a == b and len(a) > 0


def test_hyperplane_arrow_signatures_match_jvm(spark):
    """The stacked Arrow int-GEMM bucket kernel must emit bit-identical
    bucket strings to the JVM exact-int fold on the real corpus — the
    integer sign contract makes them the same function, not merely close."""
    from stock_etl_pipeline_spark.datasets import load_table
    from stock_etl_pipeline_spark.operators import similarity

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    tables = [
        similarity.make_planes(dim=64, n_planes=5, seed=42 + 1000 * t)
        for t in range(3)
    ]
    arrow = {
        (r["vec_id"], r["_b0"], r["_b1"], r["_b2"])
        for r in similarity.hyperplane_signatures_arrow(
            e.select("vec_id", "embedding"), tables
        ).collect()
    }
    from pyspark.sql import functions as F

    jvm_sig = (
        e.select("vec_id", "embedding")
        .withColumn("_vint", F.expr(similarity._as_micro_int("embedding")))
        .select("vec_id", *similarity.hyperplane_signature_cols(tables))
    )
    jvm = {
        (r["vec_id"], r["_b0"], r["_b1"], r["_b2"]) for r in jvm_sig.collect()
    }
    assert arrow == jvm and len(arrow) > 0


def test_hyperplane_int_contract_python_reference(spark):
    """Direct pin of the integer sign contract against pure-python ints:
    bit j = [Σ floor(x·1e6 + 0.5) · round(p·1e6) >= 0]."""
    import math

    from stock_etl_pipeline_spark.operators import similarity

    vecs = [
        (0, [0.25, -0.125, 0.0009999, -0.0000004]),
        (1, [-0.5, 0.5, 0.4583735, -0.5252062]),
        (2, [0.0, 0.0, 0.0, 0.0]),
    ]
    planes = similarity.make_planes(dim=4, n_planes=6, seed=7)
    p_int = similarity.planes_to_int(planes)

    def ref_bucket(v):
        vi = [math.floor(x * 1e6 + 0.5) for x in v]
        return "".join(
            "1" if sum(a * b for a, b in zip(vi, p)) >= 0 else "0"
            for p in p_int
        )

    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    # float32 storage: the reference must quantize the FLOAT32-rounded
    # values, same as the engines see them
    import numpy as np

    # Index by vec_id, not collect order — collect order matching
    # createDataFrame input order is not a guaranteed contract.
    by_id = {vid: v for vid, v in vecs}
    stored = {
        r["vec_id"]: [float(np.float32(x)) for x in by_id[r["vec_id"]]]
        for r in df.collect()
    }
    want = {vid: ref_bucket(v) for vid, v in stored.items()}
    got_arrow = {
        r["vec_id"]: r["_b0"]
        for r in similarity.hyperplane_signatures_arrow(df, [planes]).collect()
    }
    got_jvm = {
        r["vec_id"]: r["bucket"]
        for r in similarity.hyperplane_signature(df, planes).collect()
    }
    assert got_arrow == want and got_jvm == want


def test_ann_queries_backend_invariant(spark, monkeypatch):
    """The three ANN queries return identical rows under either signature
    backend (SPARK_GRAFT_ANN_SIG knob) — the contract the default rests on."""
    reg = all_specs()  # multitable lives in the tests-only tier since r13
    for name in ("embedding_ann_lsh", "embedding_ann_multitable"):
        monkeypatch.setenv("SPARK_GRAFT_ANN_SIG", "arrow")
        a = sorted(map(repr, reg[name].fn(spark, "/root/testdata/sf0.001").collect()))
        monkeypatch.setenv("SPARK_GRAFT_ANN_SIG", "jvm")
        j = sorted(map(repr, reg[name].fn(spark, "/root/testdata/sf0.001").collect()))
        assert a == j and len(a) > 0, name


def test_int_cosine_scoring_python_reference(spark):
    """Pin the integer-ratio scoring cosine (with_int_vector / int_cosine)
    to pure-python ints: dot = Σ floor(x·1e6+0.5)·floor(y·1e6+0.5) exactly,
    cosine = double(dot) / (sqrt(double(vvi_a))·sqrt(double(vvi_b)))."""
    import math

    import numpy as np

    from pyspark.sql import functions as F

    from stock_etl_pipeline_spark.operators import similarity

    vecs = [
        (0, [0.25, -0.125, 0.0009999, -0.0000004]),
        (1, [-0.5, 0.5, 0.4583735, -0.5252062]),
        (2, [0.125, 0.25, -0.0625, 0.9999995]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    m = similarity.with_int_vector(df)
    a = m.select(
        F.col("vec_id").alias("ia"), F.col("v_int").alias("va"),
        F.col("vvi").alias("na"),
    )
    b = m.select(
        F.col("vec_id").alias("ib"), F.col("v_int").alias("vb"),
        F.col("vvi").alias("nb"),
    )
    got = {
        (r["ia"], r["ib"]): r["c"]
        for r in a.join(b, F.col("ia") < F.col("ib"))
        .select("ia", "ib", similarity.int_cosine("va", "na", "vb", "nb").alias("c"))
        .collect()
    }

    stored = {
        vid: [float(np.float32(x)) for x in v] for vid, v in vecs
    }

    def vi(v):
        return [math.floor(x * 1e6 + 0.5) for x in v]

    def ref(va, vb):
        d = sum(p * q for p, q in zip(vi(va), vi(vb)))
        na = sum(p * p for p in vi(va))
        nb = sum(q * q for q in vi(vb))
        return float(d) / (math.sqrt(float(na)) * math.sqrt(float(nb)))

    want = {
        (i, j): ref(stored[i], stored[j])
        for i in stored for j in stored if i < j
    }
    assert got == want  # bit-for-bit, no tolerance


def test_int_cosine_zero_vector_is_null(spark):
    """Zero vectors yield SQL NULL cosine in both twins (Spark's native
    double 0/0 is NaN while DuckDB's is NULL — the guard makes the
    contract explicit and engine-agnostic)."""
    import duckdb

    from pyspark.sql import functions as F

    from stock_etl_pipeline_spark.operators import similarity

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.5, 0.5])], "vec_id long, embedding array<float>"
    )
    m = similarity.with_int_vector(df)
    a = m.select(F.col("vec_id").alias("ia"), F.col("v_int").alias("va"), F.col("vvi").alias("na"))
    b = m.select(F.col("vec_id").alias("ib"), F.col("v_int").alias("vb"), F.col("vvi").alias("nb"))
    got = (
        a.join(b, F.col("ia") < F.col("ib"))
        .select(similarity.int_cosine("va", "na", "vb", "nb").alias("c"))
        .collect()
    )
    assert len(got) == 1 and got[0]["c"] is None

    vi, vvi = similarity.sql_with_int_vector("embedding")
    cos = similarity.sql_int_cosine("a.v_int", "a.vvi", "b.v_int", "b.vvi")
    r = duckdb.sql(
        f"""WITH e(vec_id, embedding) AS (VALUES (0, [0.0, 0.0]), (1, [0.5, 0.5])),
        m AS (SELECT vec_id, {vi} AS v_int, {vvi} AS vvi FROM e)
        SELECT {cos} AS c FROM m a JOIN m b ON a.vec_id < b.vec_id"""
    ).fetchall()
    assert r == [(None,)]


def test_int_contract_guard_raises_in_every_backend(spark):
    """Out-of-domain inputs (dim · max|v_int|² ≥ 2^53) must fail LOUDLY and
    symmetrically: the Arrow kernels always raised, but the JVM int64 fold
    used to silently stay exact and the DuckDB float64 twin used to
    silently round (ADVICE r7). All four plan-level guards now raise."""
    import duckdb
    import pytest

    from pyspark.sql import functions as F

    from stock_etl_pipeline_spark.operators import similarity

    # max|v_int| = 2e9 → dim·mx² = 2·4e18·2 ≫ 2^53
    bad = [(0, [2000.0, -2000.0]), (1, [0.5, 0.5])]
    df = spark.createDataFrame(bad, "vec_id long, embedding array<float>")

    with pytest.raises(Exception, match="exceeds 2\\^53"):
        similarity.with_int_vector(df).select("vvi").collect()

    vi, vvi = similarity.sql_with_int_vector("embedding")
    with pytest.raises(Exception, match="exceeds 2\\^53"):
        duckdb.sql(
            f"""WITH e(vec_id, embedding) AS (VALUES (0, [2000.0, -2000.0])),
            m AS (SELECT vec_id, {vi} AS v_int, {vvi} AS vvi FROM e)
            SELECT vvi FROM m"""
        ).fetchall()

    # Hyperplane sign path: need dim·max|v_int|·max|p_int| ≥ 2^53; plane
    # coefficients are ~1e6-scaled, so |v| ~ 2e4 (v_int ~ 2e10) clears the
    # bound for any gaussian pmax.
    planes = similarity.make_planes(dim=2, n_planes=4, seed=3)
    df_h = spark.createDataFrame(
        [(0, [20000.0, -20000.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="exceeds 2\\^53"):
        similarity.hyperplane_signature(df_h, planes).select("bucket").collect()

    with pytest.raises(Exception, match="exceeds 2\\^53"):
        duckdb.sql(
            "WITH e(embedding) AS (VALUES ([20000.0, -20000.0])) SELECT "
            + similarity.sql_hyperplane_bucket("embedding", planes)
            + " AS b FROM e"
        ).fetchall()

    # In-domain rows are untouched by the guards.
    ok = spark.createDataFrame(
        [(1, [0.5, 0.5])], "vec_id long, embedding array<float>"
    )
    assert similarity.with_int_vector(ok).select("vvi").collect()[0][0] == 500000000000
    assert (
        len(similarity.hyperplane_signature(ok, planes).select("bucket").collect())
        == 1
    )


def test_ann_sig_backend_tiers_by_total_bits(monkeypatch):
    """auto = arrow at/above ARROW_MIN_SIGN_BITS total sign bits, jvm below
    (the measured crossover); env and explicit override still win."""
    from stock_etl_pipeline_spark.operators import similarity as sim

    monkeypatch.delenv("SPARK_GRAFT_ANN_SIG", raising=False)
    assert sim._ann_sig_backend(None, sim.ARROW_MIN_SIGN_BITS) == "arrow"
    assert sim._ann_sig_backend(None, sim.ARROW_MIN_SIGN_BITS - 1) == "jvm"
    assert sim._ann_sig_backend("arrow", 1) == "arrow"
    monkeypatch.setenv("SPARK_GRAFT_ANN_SIG", "jvm")
    assert sim._ann_sig_backend(None, 40) == "jvm"


def test_local_assignment_matches_join(spark):
    """assign_to_centroids_local must reproduce the broadcast-join argmin
    BIT-exactly on the real corpus — same fold, same quantize, same
    (dist, cid) tiebreak — including the emitted distance."""
    from pyspark.sql import functions as F

    from stock_etl_pipeline_spark.datasets import load_table
    from stock_etl_pipeline_spark.operators import similarity

    e = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    cu = similarity.with_micro_vectors(e.select("vec_id", "embedding"))
    cents = similarity.kmeans_exact(cu, k_clusters=8, iters=2)

    joined = similarity.assign_to_centroids(cu, cents)
    vc = F.expr(similarity._DOT_D.format(a="v_dbl", b="c_dbl"))
    jd = joined.join(F.broadcast(cents), "cid").withColumn(
        "cdist",
        F.floor((F.col("vv") + F.col("cc") - 2 * vc) * 1e6 + F.lit(0.5)) / 1e6,
    )
    want = {
        (r["vec_id"], r["cid"], repr(r["cdist"])) for r in jd.collect()
    }
    local = similarity.assign_to_centroids_local(cu, cents, emit_dist=True)
    got = {
        (r["vec_id"], r["cid"], repr(r["cdist"])) for r in local.collect()
    }
    assert got == want and len(got) == 500


def test_label_prototypicality_partitioning_invariant(spark):
    """The exact-integer centroid makes proto_cosine and the tau verdict
    identical under any partitioning/fold order — the float-centroid
    failure mode this operator exists to avoid. Also pins: floor-mean
    centroid (not exact mean), n_label counts, and that every row of the
    input appears exactly once."""
    import random

    from stock_etl_pipeline_spark.operators.similarity import label_prototypicality

    rnd = random.Random(7)
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(8)], i % 3) for i in range(90)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )

    def run(d):
        return {
            r["vec_id"]: (r["n_label"], r["proto_cosine"], r["is_prototypical"])
            for r in label_prototypicality(d, dim=8, tau=0.3).collect()
        }

    base = run(df)
    assert len(base) == 90
    assert {v[0] for v in base.values()} == {30}
    assert any(v[2] for v in base.values()) and not all(v[2] for v in base.values())
    assert run(df.repartition(13)) == base
    assert run(df.coalesce(1)) == base


def test_semantic_tier0_arrow_assignment_arm_equality(spark, monkeypatch):
    """Round 14: tier-0 semantic_dedup's assignment runs the Arrow fold
    kernel (shuffle-free, emits cdist directly). The declared query's
    keeper is far_from_centroid, which consumes cdist — so the arm
    equality must hold on the FULL query output (vec_id, cid, group_id,
    keeper_id), not just cids."""
    from stock_etl_pipeline_spark.workload import load_all

    fn = load_all()["embedding_semantic_dedup"].fn
    arrow = sorted(tuple(r) for r in fn(spark, "/root/testdata/sf0.01").collect())
    monkeypatch.setenv("SPARK_GRAFT_SEM_T0_ASSIGN", "jvm")
    jvm = sorted(tuple(r) for r in fn(spark, "/root/testdata/sf0.01").collect())
    monkeypatch.delenv("SPARK_GRAFT_SEM_T0_ASSIGN")
    assert len(arrow) > 0
    assert arrow == jvm
