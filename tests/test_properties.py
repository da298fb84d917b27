"""Property-based tests (hypothesis): operator invariants that must hold for
ANY input, not just fixtures — upsert key algebra, as-of join vs. a
brute-force reference, keep-first dedup determinism, partitioning-invariant
exact sums, and portable-rounding equivalence.

max_examples is kept small: every example round-trips through a Spark job,
so these buy breadth per example, not example count.
"""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from stock_etl_pipeline_spark.functions import pround
from stock_etl_pipeline_spark.operators.asof import asof_join
from stock_etl_pipeline_spark.operators.merge import dedup_keep_first
from stock_etl_pipeline_spark.operators.upsert import merge_upsert

SETTINGS = settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)

keys = st.integers(min_value=0, max_value=9)
vals = st.integers(min_value=-1000, max_value=1000)
kv_rows = st.lists(st.tuples(keys, vals), max_size=15)


@SETTINGS
@given(target=kv_rows, source=kv_rows)
def test_merge_upsert_key_algebra(spark, target, source):
    t = spark.createDataFrame(target or [(99, 0)], "k long, v long")
    s = spark.createDataFrame(source or [(98, 0)], "k long, v long")
    out = merge_upsert(t, s, ["k"]).collect()
    t_keys = {k for k, _ in (target or [(99, 0)])}
    s_map = dict(source or [(98, 0)])  # later dup wins in dict — any is legal
    # result keys = target ∪ source keys
    assert {r["k"] for r in out} == t_keys | set(s_map)
    # every source key carries a source value (source-wins)
    src_rows = {r["k"]: r["v"] for r in out if r["k"] in s_map}
    src_legal = {k: {v for kk, v in (source or [(98, 0)]) if kk == k} for k in s_map}
    for k, v in src_rows.items():
        assert v in src_legal[k]
    # no duplicate keys when source is deduped and target unique per key
    if len(t_keys) == len(target or [(99, 0)]):
        assert len(out) == len({r["k"] for r in out})


@SETTINGS
@given(
    left=st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=12),
    right=st.lists(
        st.tuples(st.integers(min_value=0, max_value=60), vals), max_size=12, unique_by=lambda t: t[0]
    ),
)
def test_asof_matches_bruteforce(spark, left, right):
    base = dt.date(2024, 1, 1)
    ldf = spark.createDataFrame(
        [("K", base + dt.timedelta(days=d), i) for i, d in enumerate(left)],
        "k string, d date, idx long",
    )
    rdf = spark.createDataFrame(
        [("K", base + dt.timedelta(days=d), float(v)) for d, v in right] or [("X", base, 0.0)],
        "k string, d date, q double",
    )
    out = asof_join(ldf, rdf, on=["k"], ts="d", value_cols=["q"]).collect()
    rmap = sorted(((d, float(v)) for d, v in right), key=lambda t: t[0])

    def brute(day):
        best = None
        for d, v in rmap:
            if d <= day:
                best = v
        return best

    assert len(out) == len(left)
    for r in out:
        day = (r["d"] - base).days
        assert r["q_asof"] == brute(day), (day, rmap)


@SETTINGS
@given(rows=st.lists(st.tuples(keys, vals, vals), min_size=1, max_size=20))
def test_dedup_keep_first_deterministic(spark, rows):
    df = spark.createDataFrame(rows, "k long, tie long, payload long")
    out = dedup_keep_first(df, ["k"], tiebreak_cols=["tie", "payload"]).collect()
    # unique per key, and the kept row is the lexicographic minimum
    got = {r["k"]: (r["tie"], r["payload"]) for r in out}
    assert len(out) == len(got)
    for k, kept in got.items():
        assert kept == min((t, p) for kk, t, p in rows if kk == k)


@SETTINGS
@given(cents=st.lists(st.integers(min_value=-10**6, max_value=10**6), min_size=1, max_size=30))
def test_exact_sum_partitioning_invariant(spark, cents):
    rows = [(c / 100.0,) for c in cents]
    vals_a = (
        spark.createDataFrame(rows, "v double").repartition(1)
        .agg((F.sum(F.floor(F.col("v") * 100 + F.lit(0.5)).cast("long")) / 100.0).alias("s"))
        .collect()[0]["s"]
    )
    vals_b = (
        spark.createDataFrame(rows, "v double").repartition(7)
        .agg((F.sum(F.floor(F.col("v") * 100 + F.lit(0.5)).cast("long")) / 100.0).alias("s"))
        .collect()[0]["s"]
    )
    assert vals_a == vals_b == sum(cents) / 100.0


@SETTINGS
@given(
    xs=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=20,
    ),
    digits=st.integers(min_value=0, max_value=6),
)
def test_pround_matches_ieee_reference(spark, xs, digits):
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    out = [r["p"] for r in df.select(pround(F.col("x"), digits).alias("p")).collect()]
    scale = float(10**digits)
    want = [math.floor(x * scale + 0.5) / scale for x in xs]
    assert out == want


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=20,
    )
)
def test_near_dup_keepers_matches_union_find(spark, edges):
    """Min-label propagation (enough rounds for any 12-node graph) must
    agree with a driver-side union-find on the component-min labels."""
    from stock_etl_pipeline_spark.operators.dedup import near_dup_keepers

    pairs = [(min(a, b), max(a, b)) for a, b in edges]
    # union-find reference
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    want = {x: find(x) for x in parent}

    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["keeper_id"]
        for r in near_dup_keepers(df, rounds=12).collect()
    }
    assert got == want


@SETTINGS
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from(list("ab X\n.")),
            max_size=30,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_repetition_metrics_match_python_reference(spark, texts):
    """Duplicate word/bigram fractions vs a pure-Python reference — pins the
    indexed-lambda bigram construction (off-by-one in either engine's lambda
    index would shift every pair)."""
    from stock_etl_pipeline_spark.operators import text as textops

    def ref(t: str):
        ws = t.lower().split()
        bg = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        nd_w, nd_b = len(set(ws)), len(set(bg))
        return (
            nd_w,
            None if not ws else 1.0 - nd_w / len(ws),
            nd_b,
            None if not bg else 1.0 - nd_b / len(bg),
        )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).withColumn("ws", textops.word_array("text"))
    rep = textops.repetition_cols(F.col("ws"))
    got = {
        r["doc_id"]: (
            r["n_distinct_words"],
            r["word_rep_ratio"],
            r["n_distinct_bigrams"],
            r["bigram_rep_ratio"],
        )
        for r in df.select("doc_id", *[c.alias(k) for k, c in rep.items()]).collect()
    }
    for i, t in enumerate(texts):
        w_nd, w_ratio, b_nd, b_ratio = ref(t)
        g = got[i]
        assert g[0] == w_nd and g[2] == b_nd, (t, g)
        for want, have in ((w_ratio, g[1]), (b_ratio, g[3])):
            if want is None:
                assert have is None, (t, g)
            else:
                assert have is not None and abs(have - want) < 1e-9, (t, g)


# --- set-resident exact-Jaccard verify ≡ expansion verify -------------------
# Round 4 replaced the candidate × shingle expansion verify with an
# array_intersect over signature-resident 60-bit hash sets. Same exact-set
# semantics by construction (collision odds ~1e-15); this property pins the
# equivalence over random corpora: identical pair sets AND identical
# (n_a, n_b, inter, jaccard) values through both paths.

_words = st.sampled_from(
    "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
)
_doc_texts = st.lists(
    st.lists(_words, min_size=3, max_size=12).map(" ".join),
    min_size=2,
    max_size=8,
)


@SETTINGS
@given(texts=_doc_texts)
def test_set_verify_matches_expansion_verify(spark, texts):
    from stock_etl_pipeline_spark.operators import dedup

    d = spark.createDataFrame(
        list(enumerate(texts, 1)), "doc_id long, text string"
    )
    sh = dedup.word_shingles(d)
    sig = dedup.minhash_signature(
        sh, 12, with_count=True, with_hash_set=True
    )
    cand = dedup.lsh_candidate_pairs(dedup.lsh_band_keys(sig, 4, 3))
    via_sets = {
        (r["doc_a"], r["doc_b"]): (r["n_a"], r["n_b"], r["inter"], round(r["jaccard"], 9))
        for r in dedup.verified_jaccard_pairs_from_sets(cand, sig, 0.3).collect()
    }
    via_expansion = {
        (r["doc_a"], r["doc_b"]): (r["n_a"], r["n_b"], r["inter"], round(r["jaccard"], 9))
        for r in dedup.verified_jaccard_pairs(cand, sh, 0.3).collect()
    }
    assert via_sets == via_expansion


# --- duplicate_span_stats vs pure-Python reference --------------------------


def _py_span_stats(texts, n=4):
    """Reference: corpus-wide n-gram occurrence counts -> per-doc dup flags
    -> gaps-and-islands max run."""
    from collections import Counter

    grams = {}
    for doc_id, t in texts:
        ws = t.lower().split()
        grams[doc_id] = [
            " ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)
        ] if len(ws) >= n else []
    cnt = Counter(g for gs in grams.values() for g in gs)
    out = {}
    for doc_id, gs in grams.items():
        if not gs:
            continue
        flags = [cnt[g] >= 2 for g in gs]
        runs, cur, best = [], 0, 0
        for f in flags:
            cur = cur + 1 if f else 0
            best = max(best, cur)
        out[doc_id] = (len(gs), sum(flags), best)
    return out


@SETTINGS
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from("red blue green gold iron wood salt rain".split()),
            min_size=0,
            max_size=10,
        ).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
def test_duplicate_span_stats_matches_python_reference(spark, texts):
    from stock_etl_pipeline_spark.operators.dedup import duplicate_span_stats

    rows = list(enumerate(texts, 1))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["max_dup_run"])
        for r in duplicate_span_stats(d, n=4).collect()
    }
    assert got == _py_span_stats(rows, n=4)


# --- connected components ≡ union-find ---------------------------------------


def _uf_components(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@SETTINGS
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=24),
            st.integers(min_value=0, max_value=24),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_connected_components_matches_union_find(spark, pairs):
    """Large-star/small-star labels ≡ union-find min-id components on
    arbitrary small graphs (self-loops label themselves). BOTH paths —
    the round-9 hybrid local finish (default gate) and the pure
    distributed alternation loop (gate disabled) — must match the ground
    truth, and therefore each other."""
    import os

    from stock_etl_pipeline_spark.operators.dedup import connected_components

    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    want = _uf_components([(a, b) for a, b in pairs if a != b])
    for a, b in pairs:
        if a == b:
            want.setdefault(a, a)
    got_local = {
        r["doc_id"]: r["keeper_id"] for r in connected_components(df).collect()
    }
    assert got_local == want
    os.environ["SPARK_GRAFT_CC_LOCAL"] = "0"
    try:
        got_dist = {
            r["doc_id"]: r["keeper_id"]
            for r in connected_components(df).collect()
        }
    finally:
        del os.environ["SPARK_GRAFT_CC_LOCAL"]
    assert got_dist == want


@SETTINGS
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_union_find_min_labels_matches_reference(pairs):
    """The vectorized Shiloach–Vishkin min-hooking finisher (shared by the
    CC local finish and the fused SemDeDup grouping) ≡ plain union-find
    min-id labels, for arbitrary small graphs — pure numpy, no Spark."""
    import numpy as np

    from stock_etl_pipeline_spark.operators.dedup import _union_find_min_labels

    edges = [(a, b) for a, b in pairs if a != b]
    if not edges:
        return
    lo = np.array([a for a, _ in edges], dtype=np.int64)
    hi = np.array([b for _, b in edges], dtype=np.int64)
    ids, labels = _union_find_min_labels(lo, hi)
    got = dict(zip(ids.tolist(), labels.tolist()))
    want = _uf_components(edges)
    assert got == want


_unicode_texts = st.lists(
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",)
        ),
        max_size=60,
    ),
    min_size=1,
    max_size=8,
)


@SETTINGS
@given(texts=_unicode_texts)
def test_arrow_simhash_signatures_match_relational(spark, texts):
    """For ANY unicode corpus (including empty/whitespace-only docs), the
    Arrow batch kernels produce the bit-identical signature relation to the
    relational explode→vocab→packed-sum chain — both widths."""
    from stock_etl_pipeline_spark.operators import dedup

    d = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    for rel_fn, arr_fn in (
        (dedup.simhash_signatures, dedup.simhash_signatures_arrow),
        (dedup.simhash128_signatures, dedup.simhash128_signatures_arrow),
    ):
        rel = sorted(map(repr, rel_fn(d).collect()))
        arr = sorted(map(repr, arr_fn(d).collect()))
        assert arr == rel


@SETTINGS
@given(texts=_unicode_texts)
def test_arrow_minhash_signatures_match_relational(spark, texts):
    from stock_etl_pipeline_spark.operators import dedup

    d = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rel = sorted(
        map(
            repr,
            dedup.minhash_signature(
                dedup.word_shingles(d), 12, with_count=True, with_hash_set=True
            )
            .withColumn("hs", F.array_sort("hs"))
            .collect(),
        )
    )
    arr = sorted(
        map(
            repr,
            dedup.minhash_signature_arrow(
                d, 12, with_count=True, with_hash_set=True
            ).collect(),
        )
    )
    assert arr == rel


@SETTINGS
@given(texts=_doc_texts)
def test_b60_shingles_match_string_shingles(spark, texts):
    """word_shingles_b60 equals the 60-bit fold of word_shingles' distinct
    string relation (same per-doc sets, narrow keys)."""
    from pyspark.sql import functions as SF
    from stock_etl_pipeline_spark.operators import dedup

    d = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    via_strings = sorted(
        map(
            repr,
            dedup.word_shingles(d)
            .select(
                "doc_id",
                SF.expr(
                    "CAST(conv(substring(md5(shingle), 1, 15), 16, 10) AS BIGINT)"
                ).alias("b60"),
            )
            .distinct()
            .collect(),
        )
    )
    direct = sorted(map(repr, dedup.word_shingles_b60(d).collect()))
    assert direct == via_strings


# --- integer-cosine / integer-sign contracts (round 7) ----------------------
# The contracts claim bit-identity across engines for ANY vectors within the
# 2^53 guard — hypothesis gets to pick the vectors, including exact-boundary
# and degenerate shapes the concrete pins can't enumerate.

# plain float64 strategy; the array<float> schema + np.float32 in the
# reference apply the same storage rounding on both sides
_vec_f = st.lists(
    st.floats(
        min_value=-0.999, max_value=0.999, allow_nan=False, allow_infinity=False
    ),
    min_size=4,
    max_size=4,
)


@SETTINGS
@given(vecs=st.lists(_vec_f, min_size=2, max_size=6))
def test_int_cosine_matches_python_ints(spark, vecs):
    """int_cosine ≡ pure-python integer dot ratio, bit-for-bit, for any
    float32 vectors (zero vectors → SQL NULL on both sides)."""
    import numpy as np

    from stock_etl_pipeline_spark.operators import similarity

    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
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

    stored = {i: [float(np.float32(x)) for x in v] for i, v in rows}

    def vi(v):
        return [math.floor(x * 1e6 + 0.5) for x in v]

    def ref(va, vb):
        ia, ib = vi(va), vi(vb)
        na = sum(p * p for p in ia)
        nb = sum(q * q for q in ib)
        if na == 0 or nb == 0:
            return None
        return float(sum(p * q for p, q in zip(ia, ib))) / (
            math.sqrt(float(na)) * math.sqrt(float(nb))
        )

    want = {
        (i, j): ref(stored[i], stored[j])
        for i in stored
        for j in stored
        if i < j
    }
    assert got == want


@SETTINGS
@given(vecs=st.lists(_vec_f, min_size=1, max_size=6), seed=st.integers(0, 50))
def test_hyperplane_sign_contract_all_backends(spark, vecs, seed):
    """The integer sign contract holds bit-for-bit on every backend (Arrow
    stacked GEMM, JVM fold, pure-python ints) for any float32 vectors."""
    import numpy as np

    from stock_etl_pipeline_spark.operators import similarity

    planes = similarity.make_planes(dim=4, n_planes=3, seed=seed)
    p_int = similarity.planes_to_int(planes)
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def ref_bucket(v):
        vi = [math.floor(float(np.float32(x)) * 1e6 + 0.5) for x in v]
        return "".join(
            "1" if sum(a * b for a, b in zip(vi, p)) >= 0 else "0"
            for p in p_int
        )

    want = {i: ref_bucket(v) for i, v in rows}
    arrow = {
        r["vec_id"]: r["_b0"]
        for r in similarity.hyperplane_signatures_arrow(df, [planes]).collect()
    }
    jvm = {
        r["vec_id"]: r["bucket"]
        for r in similarity.hyperplane_signature(df, planes).collect()
    }
    assert arrow == want and jvm == want


# coarse grid (multiples of 0.25) so squared distances collide often — the
# adversarial surface for the pruned assignment is quantized-distance TIES,
# where the lowest-cid tiebreak must survive pruning
_grid = st.integers(min_value=-8, max_value=8).map(lambda i: i * 0.25)


@settings(max_examples=150, deadline=None)
@given(
    dim=st.integers(min_value=2, max_value=5),
    n_cent=st.integers(min_value=5, max_value=40),
    n_vec=st.integers(min_value=1, max_value=60),
    n_super=st.integers(min_value=2, max_value=6),
    data=st.data(),
)
def test_hier_assign_property_matches_flat(dim, n_cent, n_vec, n_super, data):
    """For ANY centroid/vector geometry — duplicate centroids, singleton
    super-cells, zero radii, heavy quantized-distance ties from the coarse
    grid — the triangle-inequality-pruned assignment returns the identical
    (quantized distance, position) as the flat kernel. Pure numpy: no Spark
    job per example, so examples are cheap."""
    import numpy as np

    from stock_etl_pipeline_spark.operators.similarity import (
        _assign_block,
        _hier_index,
    )

    C = np.asarray(
        data.draw(
            st.lists(
                st.lists(_grid, min_size=dim, max_size=dim),
                min_size=n_cent,
                max_size=n_cent,
            )
        ),
        dtype=np.float64,
    )
    V = np.asarray(
        data.draw(
            st.lists(
                st.lists(_grid, min_size=dim, max_size=dim),
                min_size=n_vec,
                max_size=n_vec,
            )
        ),
        dtype=np.float64,
    )
    if n_super >= n_cent:
        return  # _hier_index declines to split — nothing to compare
    cc = (C * C).sum(axis=1)
    vv = (V * V).sum(axis=1)
    hier = _hier_index(C, n_super=n_super)
    assert hier is not None
    q_flat, p_flat = _assign_block(V, vv, C, cc, None)
    q_hier, p_hier = _assign_block(V, vv, C, cc, hier)
    assert (p_flat == p_hier).all()
    assert (q_flat == q_hier).all()


@given(
    st.integers(min_value=1, max_value=11).flatmap(
        lambda n: st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=n),
                st.integers(min_value=0, max_value=n),
            ),
            max_size=24,
        ).map(lambda es: (n + 1, es))
    )
)
@settings(deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_fragment_edges_closure_matches_components(graph):
    """The streaming semantic-dedup fragment-edge argument, pinned on
    random graphs (pure numpy — no Spark): process nodes in id order,
    maintain the incremental min-label union-find exactly as the state
    kernel does, emit one edge per matched FRAGMENT per arrival; the
    offline _union_find_min_labels closure over those edges must equal
    the true connected components of the full pair graph — for ANY
    shape, not just the clique/chain/vee hand cases. (The single
    best-match edge provably fails this — the pinned vee case in
    tests/test_streaming.py.)"""
    import numpy as np

    from stock_etl_pipeline_spark.operators.dedup import (
        _union_find_min_labels,
    )

    n, edge_list = graph
    adj = [set() for _ in range(n)]
    for a, b in edge_list:
        if a != b and a < n and b < n:
            adj[a].add(b)
            adj[b].add(a)

    # ground truth: classic union-find over the full pair graph
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in range(n):
        for b in adj[a]:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    truth = {i: find(i) for i in range(n)}

    # the state kernel's incremental labeling + fragment-edge emission
    labels = {}
    ea, eb = [], []
    for i in range(n):
        matches = [j for j in range(i) if j in adj[i]]
        if matches:
            frags = sorted({labels[j] for j in matches})
            for f in frags:
                ea.append(i)
                eb.append(f)
            merged = min(frags + [i])
            for j in range(i):
                if labels[j] in frags:
                    labels[j] = merged
            labels[i] = merged
        else:
            labels[i] = i

    got = {i: i for i in range(n)}
    if ea:
        uids, ulabels = _union_find_min_labels(
            np.asarray(ea, dtype=np.int64), np.asarray(eb, dtype=np.int64)
        )
        for u, lab in zip(uids, ulabels):
            got[int(u)] = int(lab)
    assert got == truth


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=400),      # doc id pool (dups pruned)
            st.one_of(st.none(), st.integers(min_value=0, max_value=30)),
            st.one_of(st.none(), st.integers(min_value=0, max_value=20)),
        ),
        min_size=1,
        max_size=60,
    ),
    budget=st.integers(min_value=0, max_value=600),
    buckets=st.sampled_from([1, 2, 7, 64]),
)
def test_token_budget_matches_naive_cumsum(spark, rows, budget, buckets):
    """Property form of the sample_to_token_budget pin: for ANY corpus,
    budget, and bucket count (including buckets=1, the degenerate
    all-straddle case), the kept set equals the naive global ordered
    cumsum — zero-token docs, ties, bucket-boundary budgets, NULL counts
    (0 tokens) and NULL quality (sorts last) included (ADVICE r10)."""
    from stock_etl_pipeline_spark.operators.sampling import sample_to_token_budget

    seen = set()
    data = []
    for i, n, q in rows:
        if i in seen:
            continue
        seen.add(i)
        data.append((i, n, None if q is None else q / 20.0))
    df = spark.createDataFrame(
        data, "doc_id long, n_tokens long, quality_score double"
    )
    # pure-python naive cumsum with the documented NULL contract:
    # quality NULLS LAST (both engines' DESC default), counts COALESCE 0
    order = sorted(
        data,
        key=lambda r: (r[2] is None, -(r[2] or 0.0), r[0]),
    )
    want, cum = set(), 0
    for i, n, q in order:
        cum += n or 0
        if cum <= budget:
            want.add(i)
    got = {
        r["doc_id"]
        for r in sample_to_token_budget(df, budget, buckets=buckets).collect()
    }
    assert got == want
