"""Z-order clustered write (sinks.zorder_write): curve correctness vs a
Python reference, equi-depth bucketing behavior, row preservation, and the
capability the layout exists for — multi-column row-group pruning measured
from the parquet footers (sinks.scan_pruning_stats), zorder vs natural vs
single-column clustering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_etl_pipeline_spark import sinks
from stock_etl_pipeline_spark.datasets import load_table


def _z_ref(vals: list[int], bits: int) -> int:
    k = len(vals)
    z = 0
    for j, v in enumerate(vals):
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * k + (k - 1 - j))
    return z


def test_zvalue_matches_python_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 170, 255) for b in (0, 3, 128, 200, 255)]
    df = spark.createDataFrame(rows, "a int, b int")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.withColumn(
            "z", sinks.zvalue_expr([F.col("a"), F.col("b")], bits=8)
        ).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _z_ref([a, b], 8), (a, b)


def test_zvalue_three_dims_and_bit_budget(spark):
    df = spark.createDataFrame([(7, 1, 4)], "a int, b int, c int")
    (row,) = df.withColumn(
        "z", sinks.zvalue_expr([F.col("a"), F.col("b"), F.col("c")], bits=4)
    ).collect()
    assert row["z"] == _z_ref([7, 1, 4], 4)
    with pytest.raises(ValueError, match="62-bit"):
        sinks.zvalue_expr([F.col("a")] * 4, bits=16)


def test_equi_depth_buckets_monotone_and_null_first(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(100)] + [(None,)], "v double"
    )
    cuts = [25.0, 50.0, 75.0]
    out = df.withColumn("b", sinks.equi_depth_bucket_expr("v", cuts)).collect()
    by_v = {r["v"]: r["b"] for r in out}
    assert by_v[None] == 0
    assert by_v[0.0] == 0 and by_v[24.0] == 0
    assert by_v[25.0] == 1 and by_v[49.0] == 1
    assert by_v[50.0] == 2 and by_v[75.0] == 3 and by_v[99.0] == 3
    # monotone in the value
    vals = sorted((v, b) for v, b in by_v.items() if v is not None)
    assert all(b1 <= b2 for (_, b1), (_, b2) in zip(vals, vals[1:]))


def test_zorder_write_roundtrip_preserves_rows(spark, sf_small, tmp_path):
    ev = load_table(spark, sf_small, "events")
    path = str(tmp_path / "zorder_events")
    rep = sinks.zorder_write(ev, path, ["user_id", "value"], n_files=4)
    assert rep["rows_loaded"] == ev.count()
    assert set(rep["zorder"]) == {"user_id", "value"}
    back = spark.read.parquet(path)
    assert back.schema == ev.schema
    assert (
        back.exceptAll(ev).count() == 0 and ev.exceptAll(back).count() == 0
    )


def test_zorder_write_handles_nulls_and_constant_column(spark, tmp_path):
    df = spark.createDataFrame(
        [(i % 7 if i % 11 else None, 1.0) for i in range(500)],
        "a int, k double",
    )
    path = str(tmp_path / "zorder_nulls")
    rep = sinks.zorder_write(df, path, ["a", "k"], n_files=2)
    # constant column collapses to one cut set entry at most
    assert rep["zorder"]["k"] <= 1
    assert spark.read.parquet(path).count() == 500


def test_scan_pruning_stats_counts_known_layout(spark, tmp_path):
    # two files with disjoint known ranges -> a box over one range keeps
    # exactly that file's row group
    p = str(tmp_path / "known")
    spark.createDataFrame([(i,) for i in range(100)], "x int").coalesce(
        1
    ).write.parquet(p)
    spark.createDataFrame([(i,) for i in range(1000, 1100)], "x int").coalesce(
        1
    ).write.mode("append").parquet(p)
    st = sinks.scan_pruning_stats(p, {"x": (0, 50)})
    assert st["n_files"] == 2
    assert st["n_candidates"] == 1
    st_all = sinks.scan_pruning_stats(p, {"x": (0, 2000)})
    assert st_all["n_candidates"] == st_all["n_row_groups"]


def test_compact_parquet_with_zorder_restores_clustering(spark, sf_oracle, tmp_path):
    """Simulated append degradation: many small un-clustered appends, then
    one compacting rewrite with zorder_cols — file count drops AND the
    footers become prunable on both clustering columns."""
    ev = load_table(spark, sf_oracle, "events").select("user_id", "value")
    path = str(tmp_path / "accreted")
    for i in range(4):
        ev.filter(F.col("user_id") % 4 == i).repartition(8).write.mode(
            "append"
        ).parquet(path)
    before = sinks.scan_pruning_stats(path, {})
    assert before["n_files"] == 32
    rep = sinks.compact_parquet(
        spark, path, target_file_mb=0.02, zorder_cols=["user_id", "value"]
    )
    assert rep["rows_loaded"] == ev.count()
    after = sinks.scan_pruning_stats(path, {})
    assert 1 < after["n_files"] < before["n_files"]
    lo, hi = ev.approxQuantile("user_id", [0.4, 0.5], 0.01)
    frac = sinks.scan_pruning_stats(path, {"user_id": (lo, hi)})[
        "candidate_fraction"
    ]
    assert frac < 1.0
    back = spark.read.parquet(path)
    assert back.exceptAll(ev).count() == 0 and ev.exceptAll(back).count() == 0


def test_zorder_prunes_on_both_dims_where_natural_cannot(spark, sf_oracle, tmp_path):
    """The capability test: on events, user_id and value are uncorrelated
    with arrival order, so the natural layout's footers prune (almost)
    nothing for predicates on them; the z-ordered layout must prune BOTH a
    single-dim predicate on each clustering column AND their conjunction,
    and the single-column-sorted layout must beat zorder only on its own
    column (that is the trade zorder makes)."""
    ev = load_table(spark, sf_oracle, "events").select("user_id", "value", "ts")
    n_files = 32
    natural = str(tmp_path / "natural")
    ev.repartition(n_files).write.parquet(natural)
    zordered = str(tmp_path / "zordered")
    sinks.zorder_write(ev, zordered, ["user_id", "value"], n_files=n_files)
    one_col = str(tmp_path / "one_col")
    ev.repartitionByRange(n_files, "user_id").sortWithinPartitions(
        "user_id"
    ).write.parquet(one_col)

    # a 5%-of-mass slice per dimension (measured fractions at this geometry:
    # z_u 0.31, z_v 0.28, z_uv 0.094 — thresholds below carry ~2x margin for
    # range-boundary sampling variation)
    lo_u, hi_u = ev.approxQuantile("user_id", [0.45, 0.5], 0.001)
    lo_v, hi_v = ev.approxQuantile("value", [0.45, 0.5], 0.001)
    box_u = {"user_id": (lo_u, hi_u)}
    box_v = {"value": (lo_v, hi_v)}
    box_uv = {"user_id": (lo_u, hi_u), "value": (lo_v, hi_v)}

    nat_u = sinks.scan_pruning_stats(natural, box_u)["candidate_fraction"]
    z_u = sinks.scan_pruning_stats(zordered, box_u)["candidate_fraction"]
    z_v = sinks.scan_pruning_stats(zordered, box_v)["candidate_fraction"]
    z_uv = sinks.scan_pruning_stats(zordered, box_uv)["candidate_fraction"]
    col_u = sinks.scan_pruning_stats(one_col, box_u)["candidate_fraction"]
    col_v = sinks.scan_pruning_stats(one_col, box_v)["candidate_fraction"]

    assert nat_u > 0.9, "natural layout unexpectedly clustered on user_id"
    assert z_u <= 0.6
    assert z_v <= 0.6
    assert z_uv <= 0.25
    assert z_uv <= z_u and z_uv <= z_v
    assert col_u <= z_u  # dedicated sort wins its own column...
    assert col_v > 0.9  # ...and is blind on the other; zorder is not

    # pruning must not change answers: the filtered scan agrees across
    # layouts (the engine applies the same stats logic the audit models)
    expected = ev.filter(
        (F.col("user_id") >= lo_u)
        & (F.col("user_id") <= hi_u)
        & (F.col("value") >= lo_v)
        & (F.col("value") <= hi_v)
    ).count()
    got = (
        spark.read.parquet(zordered)
        .filter(
            (F.col("user_id") >= lo_u)
            & (F.col("user_id") <= hi_u)
            & (F.col("value") >= lo_v)
            & (F.col("value") <= hi_v)
        )
        .count()
    )
    assert got == expected


# --- IVF at rest: the inverted file as parquet layout ------------------------


def _ivf_fixtures(spark, sf_oracle):
    from stock_etl_pipeline_spark.operators import similarity

    corpus = load_table(spark, sf_oracle, "embeddings")
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity, corpus, queries


def test_ivf_probed_topk_bit_equal_to_ivf_topk(spark, sf_oracle, tmp_path):
    """The layout path must return the SAME rows as the in-memory ivf_topk
    at the same geometry — the layout changes what gets read, not the
    answer (both run the exact integer-ratio scoring contract and the same
    quantized assignment)."""
    similarity, corpus, queries = _ivf_fixtures(spark, sf_oracle)
    path = str(tmp_path / "ivf_layout")
    rep = similarity.ivf_clustered_write(
        corpus, path, k_clusters=8, iters=2, n_files=8
    )
    assert rep["rows_loaded"] == corpus.count()
    expected = similarity.ivf_topk(
        corpus, queries, k_clusters=8, iters=2, nprobe=2, k=10
    )
    got = similarity.ivf_probed_topk(spark, path, queries, nprobe=2, k=10)
    cols = ["query_id", "neighbor_id", "cosine", "rnk"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, expected.select(*cols).collect())
    )


def test_ivf_layout_prunes_and_pushes_cell_filter(spark, sf_oracle, tmp_path):
    similarity, corpus, queries = _ivf_fixtures(spark, sf_oracle)
    from stock_etl_pipeline_spark.plans import explain_formatted

    path = str(tmp_path / "ivf_layout2")
    similarity.ivf_clustered_write(corpus, path, k_clusters=8, iters=2, n_files=8)
    probed, q_cells = similarity.ivf_probed_read(spark, path, queries, nprobe=2)
    # the IN-list reaches the scan
    p = explain_formatted(probed)
    assert "PushedFilters" in p and "In(cell_id" in p
    # footer stats: one cell's row groups are a strict subset of the layout
    cells = [r["cid"] for r in q_cells.select("cid").distinct().collect()]
    st = sinks.scan_pruning_stats(path, {"cell_id": (cells[0], cells[0])})
    assert st["candidate_fraction"] < 0.5
    # the probed scan returns exactly the members of the probed cells
    full = spark.read.parquet(path)
    expected_n = full.filter(F.col("cell_id").isin(cells)).count()
    assert probed.count() == expected_n > 0


def test_ivf_layout_assignments_reproducible(spark, sf_oracle, tmp_path):
    """Stored cell ids equal a fresh assignment against the sidecar model
    (everything round-trips: float32 embeddings, double centroids)."""
    from stock_etl_pipeline_spark.operators.similarity import (
        assign_to_centroids,
        with_micro_vectors,
    )

    similarity, corpus, _ = _ivf_fixtures(spark, sf_oracle)
    path = str(tmp_path / "ivf_layout3")
    similarity.ivf_clustered_write(corpus, path, k_clusters=8, iters=2, n_files=4)
    back = spark.read.parquet(path)
    model = spark.read.parquet(path + "_model")
    fresh = assign_to_centroids(
        with_micro_vectors(back.drop("cell_id")), model, id_col="vec_id"
    ).select("vec_id", F.col("cid").alias("fresh_cid"))
    joined = back.join(fresh, "vec_id")
    assert joined.filter(F.col("cell_id") != F.col("fresh_cid")).count() == 0


def test_write_partitioned_with_zorder_cols(spark, tmp_path):
    import datetime as dt

    rows = [
        (dt.date(2024, 1, 1 + (i % 2)), i % 50, float((i * 37) % 100), f"s{i}")
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "date date, a int, b double, s string")
    path = str(tmp_path / "part_z")
    rep = sinks.write_partitioned(
        df, path, partition_col="date", zorder_cols=["a", "b"], mode="overwrite"
    )
    assert rep["rows_loaded"] == 400
    back = spark.read.parquet(path)
    assert back.count() == 400
    assert "__z" not in back.columns
    assert back.select("date").distinct().count() == 2


def test_ivf_append_equals_one_shot_write_under_same_model(spark, sf_oracle, tmp_path):
    """Increment ingest: write(A) -> append(B) must equal the one-shot
    write(A∪B) under the SAME frozen model — identical stored rows (cell
    assignment is a property of the model) and identical probed top-k."""
    similarity, corpus, queries = _ivf_fixtures(spark, sf_oracle)
    part_a = corpus.filter(F.col("vec_id") % 5 != 0)
    part_b = corpus.filter(F.col("vec_id") % 5 == 0)

    inc = str(tmp_path / "ivf_inc")
    similarity.ivf_clustered_write(part_a, inc, k_clusters=8, iters=2, n_files=4)
    rep = similarity.ivf_append(spark, inc, part_b, n_files=2)
    assert rep["rows_loaded"] == part_b.count()

    model = spark.read.parquet(inc + "_model")
    ref = str(tmp_path / "ivf_ref")
    similarity.ivf_clustered_write(
        corpus, ref, n_files=4, centroids=similarity._materialize_model(
            spark, model, ["cid", "c_dbl", "cc"]
        )
    )
    rows = lambda p: sorted(
        (r["vec_id"], r["cell_id"]) for r in spark.read.parquet(p).collect()
    )
    assert rows(inc) == rows(ref)

    cols = ["query_id", "neighbor_id", "cosine", "rnk"]
    got = similarity.ivf_probed_topk(spark, inc, queries, nprobe=2, k=10)
    exp = similarity.ivf_probed_topk(spark, ref, queries, nprobe=2, k=10)
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, exp.select(*cols).collect())
    )


def test_ivf_index_health_distortion_trigger(spark, tmp_path):
    """IVF model-drift health (round 11): on CLUSTERED data, a
    same-distribution append holds the quantization-distortion ratio near
    1 (no retrain), an append from an UNSEEN cluster multiplies mean
    squared distance to the frozen centroids and trips the 1.5x trigger,
    and a fresh write resets the baseline."""
    from stock_etl_pipeline_spark.operators import similarity

    def cluster(center, base_id, n=40):
        rows = []
        for i in range(n):
            vec = [
                c + ((i * 7 + d * 3) % 5 - 2) * 0.03
                for d, c in enumerate(center)
            ]
            rows.append((base_id + i, vec))
        return rows

    dim = 8
    c0 = [4.0] + [0.0] * (dim - 1)
    c1 = [0.0, 4.0] + [0.0] * (dim - 2)
    c2 = [0.0, 0.0, 4.0] + [0.0] * (dim - 3)  # unseen at build time
    schema = "vec_id long, embedding array<double>"
    train = spark.createDataFrame(cluster(c0, 0) + cluster(c1, 100), schema)
    same = spark.createDataFrame(
        cluster(c0, 1000, 20) + cluster(c1, 1100, 20), schema
    )
    shift = spark.createDataFrame(cluster(c2, 2000, 40), schema)

    path = str(tmp_path / "ivf_health")
    similarity.ivf_clustered_write(
        train, path, k_clusters=2, n_files=2, record_stats=True
    )
    h0 = similarity.ivf_index_health(spark, path)
    assert not h0["retrain_recommended"]  # baseline only, no appends yet

    similarity.ivf_append(spark, path, same, record_stats=True)
    h1 = similarity.ivf_index_health(spark, path)
    assert h1["stats_rows"] == 2 and not h1["retrain_recommended"]
    assert h1["ratio"] < 1.2, h1

    similarity.ivf_append(spark, path, shift, record_stats=True)
    h2 = similarity.ivf_index_health(spark, path)
    assert h2["ratio"] > 1.5 and h2["retrain_recommended"], h2

    # retrain (fresh Lloyd over everything) resets the baseline
    allv = train.unionByName(same).unionByName(shift)
    similarity.ivf_clustered_write(
        allv, path, k_clusters=3, n_files=2, record_stats=True
    )
    h3 = similarity.ivf_index_health(spark, path)
    assert h3["stats_rows"] == 1 and not h3["retrain_recommended"]

    # an index whose BUILD never recorded stats must not adopt an append
    # as its baseline (the first append may itself be drifted)
    path2 = str(tmp_path / "ivf_nobase")
    similarity.ivf_clustered_write(train, path2, k_clusters=2, n_files=2)
    similarity.ivf_append(spark, path2, shift, record_stats=True)
    similarity.ivf_append(spark, path2, shift.select(
        (shift.vec_id + 10000).alias("vec_id"), "embedding"
    ), record_stats=True)
    h4 = similarity.ivf_index_health(spark, path2)
    assert not h4["retrain_recommended"] and "no build baseline" in h4["reason"]
    assert h4["stats_rows"] == 2


def test_rank_expr_preserves_string_order(spark):
    """The 7-byte padded prefix projection must order exactly like Spark's
    string comparison — including short-vs-extension ('b' > 'ab'), empty
    strings, and multibyte UTF-8."""
    vals = ["", "a", "ab", "aba", "b", "s00", "s01", "s1", "zzzzzzzzz", "é", "日本"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = [
        (r["s"], r["rank"])
        for r in df.select("s", sinks._rank_expr(df, "s").alias("rank")).collect()
    ]
    by_s = dict(got)
    spark_order = [
        r["s"] for r in df.orderBy("s").collect()
    ]
    ranks = [by_s[s] for s in spark_order]
    assert ranks == sorted(ranks), list(zip(spark_order, ranks))


def test_zorder_write_on_string_column_prunes(spark, sf_oracle, tmp_path):
    """The reference clusters on symbol (a string): zorder over
    (string, numeric) must prune a string-range slice."""
    ev = load_table(spark, sf_oracle, "events").select(
        F.concat(F.lit("s"), F.lpad((F.col("user_id") % 150).cast("string"), 3, "0")).alias("sym"),
        "value",
    )
    path = str(tmp_path / "zorder_str")
    rep = sinks.zorder_write(ev, path, ["sym", "value"], n_files=32)
    assert rep["rows_loaded"] == ev.count()
    frac_s = sinks.scan_pruning_stats(path, {"sym": ("s050", "s059")})[
        "candidate_fraction"
    ]
    lo_v, hi_v = ev.approxQuantile("value", [0.45, 0.5], 0.001)
    frac_sv = sinks.scan_pruning_stats(
        path, {"sym": ("s050", "s059"), "value": (lo_v, hi_v)}
    )["candidate_fraction"]
    assert frac_s <= 0.6
    assert frac_sv <= frac_s
    back = spark.read.parquet(path)
    expected = ev.filter((F.col("sym") >= "s050") & (F.col("sym") <= "s059")).count()
    assert back.filter((F.col("sym") >= "s050") & (F.col("sym") <= "s059")).count() == expected
