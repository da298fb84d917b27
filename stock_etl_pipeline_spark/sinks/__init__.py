"""Sink connectors: the reference's load surface (SURVEY.md §2.2 K1-K11)
as DataFrame writers with warehouse-style layout control.

Layout doctrine (reference plugins/helpers/queries.py:16-17 — PARTITION BY
date CLUSTER BY symbol): partitioned parquet + ``sortWithinPartitions`` for
clustering. Partition pruning then serves every trailing-window date filter
in the query library for free, and the within-file symbol ordering gives
row-group min/max pruning on symbol predicates — the two levers that matter
for a 100 TB warehouse.

Write reports mirror the reference's load-result dicts
(``rows_loaded``/``destination`` — dags/utils/loaders.py:64-70).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WRITE_APPEND = "append"
WRITE_TRUNCATE = "overwrite"


def _report(df: DataFrame, destination: str, mode: str) -> dict:
    return {"rows_loaded": df.count(), "destination": destination, "mode": mode}


def upload_report(spark: SparkSession, path: str) -> dict:
    """Object-store upload metadata, mirroring the reference's GCS load result
    (size/md5/uri — /root/reference/dags/utils/loaders.py:293-307): per-file
    name + size + the store's checksum when the filesystem exposes one
    (HDFS/object stores do; local file:// returns None), plus totals.
    Driver-side listing only — no Spark job."""
    files = []
    total = 0
    for st in _list_files(spark, path):
        name = st.getPath().getName()
        if name.startswith("_"):  # _SUCCESS, _committed markers
            continue
        size = st.getLen()
        total += size
        files.append({"name": name, "size_bytes": size, "uri": st.getPath().toString()})
    return {
        "destination": path,
        "n_files": len(files),
        "total_bytes": total,
        "files": sorted(files, key=lambda f: f["name"]),
    }


def _swap_into_place(spark: SparkSession, staging: str, target: str) -> None:
    """Atomically-as-possible swap of a staged directory into place.

    delete(target) → rename(staging) has a window where a crash loses the
    table entirely. Instead: rename target to a ``__old`` sibling, rename
    staging into place, then delete ``__old`` — the data always exists under
    SOME path and every failure mode is recoverable by a rename (a leftover
    ``__old`` from a prior crash is cleared first). Readers can still observe
    a brief missing-path window between the two renames — full snapshot
    isolation is what ``sinks/acid.py`` provides (marker-committed immutable
    snapshots, no window at all); a lakehouse format (Delta/Iceberg) slots
    in at merge_write's gated backend when its jar is present.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path_cls = jvm.org.apache.hadoop.fs.Path
    fs = path_cls(target).getFileSystem(conf)
    old = path_cls(target.rstrip("/") + "__old")
    if fs.exists(old):
        fs.delete(old, True)
    if fs.exists(path_cls(target)):
        fs.rename(path_cls(target), old)
    fs.rename(path_cls(staging), path_cls(target))
    fs.delete(old, True)


def write_csv(df: DataFrame, path: str, mode: str = WRITE_TRUNCATE) -> dict:
    """K1: header CSV (the reference writes index-free CSV between stages;
    dates/timestamps are rendered ISO — P6 formatting at sink only)."""
    df.write.mode(mode).option("header", True).csv(path)
    return _report(df, path, mode)


def write_jsonl(df: DataFrame, path: str, mode: str = WRITE_TRUNCATE) -> dict:
    """K2: JSON-lines (Spark's native JSON sink is already ``orient=records,
    lines=True`` — reference plugins/custom_operators/api_gcs.py:92-93)."""
    df.write.mode(mode).json(path)
    return _report(df, path, mode)


def write_parquet(df: DataFrame, path: str, mode: str = WRITE_TRUNCATE) -> dict:
    """K3: plain parquet staging write."""
    df.write.mode(mode).parquet(path)
    return _report(df, path, mode)


def write_orc(df: DataFrame, path: str, mode: str = WRITE_TRUNCATE) -> dict:
    """K3b: ORC staging write (same report contract as the parquet sink)."""
    df.write.mode(mode).orc(path)
    return _report(df, path, mode)


def write_partitioned(
    df: DataFrame,
    path: str,
    *,
    partition_col: str = "date",
    cluster_col: str | None = "symbol",
    zorder_cols: Sequence[str] | None = None,
    mode: str = WRITE_APPEND,
) -> dict:
    """K4/K8: warehouse layout — date-partitioned, symbol-clustered.

    Works against any Hadoop-FS path (file://, s3a://, gs:// …): object-store
    writes are Spark-native, which subsumes the reference's separate GCS
    upload step (dags/utils/loaders.py:256-330).

    ``zorder_cols`` replaces the single-column clustering with the z-curve
    (partition coarse, z-order fine — the composition zorder_write's
    docstring promises): rows sort by (partition, z) so every file within a
    hive partition covers a small box of the clustering space. Curve cuts
    are computed once globally — per-partition cuts would re-rank per date
    for marginal gain at real partition counts.
    """
    out = df
    if zorder_cols is not None:
        zdf, _ = _with_zvalue(df, zorder_cols)
        out = zdf.sortWithinPartitions(partition_col, "__z").drop("__z")
    elif cluster_col is not None:
        out = out.sortWithinPartitions(cluster_col)
    out.write.mode(mode).partitionBy(partition_col).parquet(path)
    return _report(df, path, mode)


def merge_write(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    keys: Sequence[str],
    *,
    partition_col: str | None = "date",
) -> dict:
    """K7: MERGE upsert materialization onto a parquet warehouse path.

    Strategy: compute the merged rows for the partitions the source touches
    (operators/upsert.py — broadcast anti join + union), then rewrite ONLY
    those partitions via dynamic partition overwrite. Blast radius = touched
    partitions, not the table. When delta-spark is importable AND the target
    is already a Delta table, a transactional ``MERGE INTO`` runs instead
    (_delta_merge — the reference's atomic BigQuery MERGE,
    dags/utils/loaders.py:160-173); the plain-parquet path keeps the engine
    dependency-free everywhere else.
    """
    from ..operators.upsert import merge_upsert

    delta_report = _delta_merge(spark, target_path, source, keys)
    if delta_report is not None:
        return delta_report

    try:
        target = spark.read.parquet(target_path)
        exists = True
    except Exception:
        exists = False

    if not exists:
        if partition_col is not None:
            source.write.mode("overwrite").partitionBy(partition_col).parquet(target_path)
        else:
            source.write.mode("overwrite").parquet(target_path)
        return _report(source, target_path, "create")

    if partition_col is not None:
        # Restrict the rewrite to partitions present in the source batch.
        touched = [r[0] for r in source.select(partition_col).distinct().collect()]
        slice_ = target.filter(F.col(partition_col).isin(touched))
        merged = merge_upsert(slice_, source, keys)
        # Count BEFORE the overwrite: the merged plan reads the very files the
        # dynamic overwrite replaces, so a post-write count would re-scan
        # deleted parquet parts.
        n = merged.count()
        prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            merged.write.mode("overwrite").partitionBy(partition_col).parquet(target_path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
        return {"rows_loaded": n, "destination": target_path, "mode": "merge-dynamic"}

    # Full rewrite fallback (no partition column): Spark refuses to overwrite
    # a path it is reading, so stage to a sibling path then swap (see
    # _swap_into_place for the crash-safety dance).
    merged = merge_upsert(target, source, keys)
    tmp_path = target_path.rstrip("/") + "__staging"
    merged.write.mode("overwrite").parquet(tmp_path)
    _swap_into_place(spark, tmp_path, target_path)
    out = spark.read.parquet(target_path)
    return _report(out, target_path, "merge-full")


def _delta_merge(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    keys: Sequence[str],
) -> dict | None:
    """Transactional MERGE backend: runs iff delta-spark is on the classpath
    AND the target path is an existing Delta table; returns None otherwise so
    merge_write falls through to the plain-parquet rewrite. Semantics mirror
    the reference's MERGE (dags/utils/loaders.py:160-169): key-equality ON,
    matched → update all non-key columns, not-matched → insert."""
    try:
        from delta.tables import DeltaTable  # type: ignore
    except ImportError:
        return None  # not in this image; parquet path is canonical here
    try:
        if not DeltaTable.isDeltaTable(spark, target_path):
            return None
        target = DeltaTable.forPath(spark, target_path)
    except Exception:
        return None
    cond = " AND ".join(f"t.`{k}` = s.`{k}`" for k in keys)
    (
        target.alias("t")
        .merge(source.alias("s"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    out = _read_delta(spark, target_path)
    return {"rows_loaded": out.count(), "destination": target_path, "mode": "merge-delta"}


def _read_delta(spark: SparkSession, path: str) -> DataFrame:
    """Post-merge readback, split out as a seam so tests can exercise the
    whole MERGE INTO branch with a sys.modules-injected fake DeltaTable
    (the image carries no delta-spark jar — see tests/test_sources_sinks.py)."""
    return spark.read.format("delta").load(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: Sequence[str],
    n_buckets: int = 16,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = WRITE_TRUNCATE,
) -> dict:
    """K8 clustering, join-locality variant: a catalog table bucketed (and
    optionally sorted) by the join/agg key.

    Two tables bucketed the same way join with NO exchange on either side —
    at 100 TB that turns the recurring fact⋈fact shuffle into a local
    zip-per-bucket. The price is paid once at write (hash-distribute into
    n_buckets files per partition); pick ``n_buckets`` so a bucket of the
    LARGER table fits an executor core's working set.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return _report(df, table, mode)


def create_table_if_not_exists(
    spark: SparkSession,
    table: str,
    schema: T.StructType,
    *,
    partition_field: str | None = None,
    cluster_fields: Sequence[str] | None = None,
    n_buckets: int = 16,
    description: str | None = None,
) -> bool:
    """K11 (the reference's version is truncated mid-function —
    dags/utils/loaders.py:333-358, signature takes partition_field +
    cluster_fields): catalog-registered parquet table with optional
    partitioning and clustering. BigQuery clustering maps to bucketing here
    (CLUSTERED BY ... INTO n BUCKETS — co-located joins/aggs on the cluster
    key, the same physical win). Returns True if created, False if it
    existed."""
    if spark.catalog.tableExists(table):
        return False
    cols = ", ".join(
        f"{f.name} {f.dataType.simpleString()}{'' if f.nullable else ' NOT NULL'}"
        for f in schema.fields
    )
    partition = f" PARTITIONED BY ({partition_field})" if partition_field else ""
    cluster = (
        f" CLUSTERED BY ({', '.join(cluster_fields)}) INTO {n_buckets} BUCKETS"
        if cluster_fields
        else ""
    )
    comment = f" COMMENT '{description}'" if description else ""
    spark.sql(
        f"CREATE TABLE {table} ({cols}) USING PARQUET{comment}{partition}{cluster}"
    )
    return True


def create_or_replace_view(spark: SparkSession, name: str, df: DataFrame) -> None:
    """K9 (reference plugins/helpers/queries.py:22-34): register a derived
    relation as a view for the SQL surface."""
    df.createOrReplaceTempView(name)


def compact_parquet(
    spark: SparkSession,
    path: str,
    *,
    target_file_mb: float = 256,
    partition_col: str | None = None,
    zorder_cols: Sequence[str] | None = None,
) -> dict:
    """Small-file compaction: rewrite a parquet path into ~target-sized
    files. Incremental appends (streaming foreachBatch, daily MERGEs) accrete
    small files that tax the scan planner and object-store listing at 100 TB;
    periodic compaction restores scan efficiency. Stages to a sibling path
    then swaps via the recoverable rename dance (_swap_into_place) so the
    data always exists under some path.

    ``zorder_cols`` re-clusters on the Z-order curve while compacting (the
    natural pairing — appends degrade file sizes AND clustering together;
    one staged rewrite restores both; Delta's OPTIMIZE ... ZORDER BY shape).
    """
    df = spark.read.parquet(path)
    total_bytes = sum(
        f.getLen()
        for f in _list_files(spark, path)
        if f.getPath().getName().endswith(".parquet")
    )
    n_files = max(1, int(total_bytes / (target_file_mb * 1024 * 1024)) + 1)
    tmp_path = path.rstrip("/") + "__compacting"
    if zorder_cols is not None:
        zdf, _ = _with_zvalue(df, zorder_cols)
        writer = (
            zdf.repartitionByRange(n_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
    else:
        writer = df.repartition(n_files)
    if partition_col is not None:
        writer.write.mode("overwrite").partitionBy(partition_col).parquet(tmp_path)
    else:
        writer.write.mode("overwrite").parquet(tmp_path)
    # The staged write is an ACTION: it must fully materialize (reading the
    # old files) before the swap touches the target.
    _swap_into_place(spark, tmp_path, path)
    out = spark.read.parquet(path)
    return {"rows_loaded": out.count(), "destination": path, "mode": f"compact-{n_files}"}


def _list_files(spark: SparkSession, path: str):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path_cls = jvm.org.apache.hadoop.fs.Path
    fs = path_cls(path).getFileSystem(conf)
    it = fs.listFiles(path_cls(path), True)
    while it.hasNext():
        yield it.next()


# --- multi-dimensional clustering (Z-order) ----------------------------------
# write_partitioned's single-column clustering (sortWithinPartitions) gives
# row-group min/max pruning on ONE column; every other predicate column sees
# random value ranges per file and prunes nothing. The lakehouse answer
# (Delta Lake's OPTIMIZE ZORDER BY, public docs/implementation; Morton 1966)
# is a space-filling curve: rank-normalize each clustering column to a small
# integer, bit-interleave the ranks into one z-value, and range-write on it —
# every file then covers a small HYPERCUBE of the clustering space, so
# min/max footer stats are tight on EVERY clustering column at once and the
# engine's ordinary parquet filter pushdown skips row groups for predicates
# on any subset of them. At 100 TB this is the difference between scanning
# the whole table and scanning the few files whose box intersects the query.
#
# Scale shape: one approxQuantile pass per column (driver collects ≤ 2^bits
# boundaries — KBs), one narrow projection computing the z-value (bounded
# HOF fold + a bits×k-term interleave, pure JVM codegen), one range
# exchange. Nothing driver-sized depends on the row count.


def _rank_expr(df: DataFrame, col: str) -> F.Column:
    """Order-preserving DOUBLE projection of a clustering column.

    Numeric/timestamp/date columns cast directly. STRING columns (the
    reference clusters on ``symbol``) map through their 7-byte
    zero-padded UTF-8 prefix read as a big-endian integer: bytewise
    prefix order is exactly Spark's string comparison order (UTF8String
    compares bytewise), the zero-pad keeps short strings ordered before
    their extensions ('b' > 'ab' survives), and 56 bits fits a double
    exactly. Ties beyond 7 bytes collapse into one bucket — harmless for
    pruning (equi-depth cuts merge duplicates)."""
    dtype = dict(df.dtypes)[col]
    if dtype == "string":
        return F.expr(
            f"CAST(conv(hex(rpad(CAST(`{col}` AS BINARY), 7, X'00')), 16, 10)"
            " AS DOUBLE)"
        )
    return F.col(col).cast("double")


def equi_depth_bucket_expr(col, boundaries: Sequence[float]):
    """Bucket index of a rank expression (a Column, or a column name cast
    to DOUBLE) in the equi-depth histogram ``boundaries`` (sorted internal
    quantile cuts): the count of cuts ≤ the value, a bounded HOF fold over
    a literal array (JVM-side, no UDF). NULLs land in bucket 0 (they sort
    first in the curve, mirroring NULLS FIRST)."""
    v = F.col(col).cast("double") if isinstance(col, str) else col
    cuts = F.array(*[F.lit(float(b)) for b in boundaries])
    bucket = F.aggregate(
        cuts, F.lit(0), lambda acc, b: acc + F.when(v >= b, 1).otherwise(0)
    )
    return F.when(v.isNull(), F.lit(0)).otherwise(bucket)


def zvalue_expr(bucket_cols: Sequence, bits: int):
    """Morton interleave: bit i of bucket j lands at z-bit ``i*k + (k-1-j)``
    so same-significance bits of every dimension are adjacent — the property
    that makes contiguous z-ranges small hypercubes. ``bits×k`` shift-mask
    terms, all whole-stage-codegen arithmetic."""
    k = len(bucket_cols)
    if bits * k > 62:
        raise ValueError(f"bits*k = {bits * k} exceeds the 62-bit z budget")
    z = F.lit(0).cast("long")
    for j, b in enumerate(bucket_cols):
        bl = b.cast("long")
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(bl, i).bitwiseAND(F.lit(1)), i * k + (k - 1 - j)
            )
    return z


def _with_zvalue(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    relative_error: float = 0.001,
) -> tuple[DataFrame, dict[str, list[float]]]:
    """``df`` plus a ``__z`` Morton-code column over ``cols``; returns the
    per-column equi-depth cuts too (driver-resident, ≤ 2^bits floats each)."""
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    ranked = df.select(*[_rank_expr(df, c).alias(c) for c in cols])
    cuts: dict[str, list[float]] = {}
    for c, bs in zip(cols, ranked.approxQuantile(cols, probs, relative_error)):
        # collapse duplicate cuts (heavy hitters occupy one bucket, the fold
        # stays monotone); keep sorted order
        cuts[c] = sorted(set(bs))
    buckets = [equi_depth_bucket_expr(_rank_expr(df, c), cuts[c]) for c in cols]
    return df.withColumn("__z", zvalue_expr(buckets, bits)), cuts


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    *,
    bits: int = 8,
    n_files: int | None = None,
    mode: str = WRITE_TRUNCATE,
    relative_error: float = 0.001,
) -> dict:
    """Write ``df`` as parquet clustered on the Z-order curve over ``cols``.

    Equi-depth (quantile) rank normalization — not equi-width — so skewed
    columns still spread across the curve: 2^bits buckets per column from
    one ``approxQuantile`` pass (Greenwald–Khanna, driver holds only the
    cuts). ``repartitionByRange`` on the z-value gives each output file a
    contiguous z-range (a small box in clustering space);
    ``sortWithinPartitions`` tightens per-ROW-GROUP stats inside each file.
    Columns must be numeric/timestamp (rank-normalizable via CAST AS
    DOUBLE). Composable with hive partitioning the same way as the
    reference's PARTITION BY date CLUSTER BY symbol doctrine
    (plugins/helpers/queries.py:16-17): partition coarse, z-order fine —
    callers partition first and z-order within.

    Returns the usual write report plus the per-column cut counts.
    """
    out, cuts = _with_zvalue(df, cols, bits=bits, relative_error=relative_error)
    n = n_files if n_files is not None else df.rdd.getNumPartitions()
    (
        out.repartitionByRange(max(1, n), "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
    rep = _report(df, path, mode)
    rep["zorder"] = {c: len(cuts[c]) for c in cols}
    return rep


def scan_pruning_stats(path: str, box: dict[str, tuple]) -> dict:
    """Row-group pruning audit from parquet footers: how many row groups
    could a conjunctive box predicate (``{col: (lo, hi)}``) skip on this
    layout? Mirrors exactly what the scan's min/max filter pushdown does,
    but deterministically (no timing) — the measurement tool behind the
    zorder-vs-natural layout tables in SCALING.md. Footer-only: reads KBs
    per file regardless of data size. Missing stats count as candidates
    (conservative, like the engine)."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq

    files = sorted(
        _glob.glob(_os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    n_groups = 0
    n_candidates = 0
    for f in files:
        md = _pq.ParquetFile(f).metadata
        name_to_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for g in range(md.num_row_groups):
            n_groups += 1
            rg = md.row_group(g)
            keep = True
            for c, (lo, hi) in box.items():
                st = rg.column(name_to_idx[c]).statistics
                if st is None or not st.has_min_max:
                    continue
                if st.max < lo or st.min > hi:
                    keep = False
                    break
            if keep:
                n_candidates += 1
    return {
        "n_files": len(files),
        "n_row_groups": n_groups,
        "n_candidates": n_candidates,
        "candidate_fraction": (n_candidates / n_groups) if n_groups else 1.0,
    }
