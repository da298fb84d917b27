"""Object-store commit arm (VERDICT r12 item 1): the ACID protocol's
race/crash/churn claims re-verified under OBJECT-STORE SEMANTICS — no
atomic rename (per-object copy+delete), conditional-PUT marker claim,
claim-first publish with ``_meta.json`` as the final visibility PUT —
via sinks/objectstore.SimulatedObjectStore, which also counts every
request by class (paged LIST / HEAD / GET / PUT / COPY / DELETE) so the
protocol's metadata costs are measured in the store's native unit.

OS-process variants (real subprocess committers and a real kill between
claim and visibility PUT) live in test_acid_multiprocess.py.
"""

from __future__ import annotations

import os

import pytest

from stock_etl_pipeline_spark.sinks import acid
from stock_etl_pipeline_spark.sinks.objectstore import (
    SimulatedCrash,
    SimulatedObjectStore,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_objectstore_lifecycle_pinned_equal_to_hadoop(spark, tmp_path):
    """The full file-COW lifecycle — seed, touched-file merge, pure
    insert, schema evolution, compaction, vacuum, time travel — run
    twice from identical batches: once under the default Hadoop backend,
    once under simulated object-store semantics. Every read must be
    pinned equal; the object-store table must never publish via a
    directory rename (its copy counter moves only for single data-file
    moves)."""
    be = SimulatedObjectStore()
    ost = str(tmp_path / "os_tbl")
    ref = str(tmp_path / "fs_tbl")

    def both(source, **kw):
        r1 = acid.acid_merge_upsert(
            spark, ost, source, ["k"], file_cow=True, backend=be, **kw
        )
        r2 = acid.acid_merge_upsert(
            spark, ref, source, ["k"], file_cow=True, **kw
        )
        return r1, r2

    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "k long, v string"
    ).repartitionByRange(2, "k")
    both(base)
    up = spark.createDataFrame([(1, "V1")], "k long, v string")
    r1, _ = both(up)
    assert r1["files_rewritten"] == 1  # bounds pruning works identically
    ins = spark.createDataFrame([(100, "new")], "k long, v string")
    both(ins)
    ev = spark.createDataFrame([(2, "V2", 9.5)], "k long, v string, w double")
    both(ev, allow_new_columns=True)
    assert _rows(acid.acid_read(spark, ost, backend=be)) == _rows(
        acid.acid_read(spark, ref)
    )

    # time travel + history parity
    assert _rows(acid.acid_read(spark, ost, ordinal=2, backend=be)) == _rows(
        acid.acid_read(spark, ref, ordinal=2)
    )
    h1 = acid.acid_history(spark, ost, backend=be)
    h2 = acid.acid_history(spark, ref)
    assert [x["parent"] for x in h1] == [x["parent"] for x in h2]
    assert [x["rows"] for x in h1] == [x["rows"] for x in h2]

    # compact + vacuum under object-store semantics
    before = _rows(acid.acid_read(spark, ost, backend=be))
    acid.acid_compact(spark, ost, target_rows=1000, backend=be)
    vac = acid.acid_vacuum(spark, ost, keep=1, backend=be)
    assert vac["removed_data_files"] > 0
    assert _rows(acid.acid_read(spark, ost, backend=be)) == before

    # the protocol never directory-renamed: every copy the sim performed
    # was a single data-file stage→data/ move, whose count equals the
    # data files ever written (manifest news + compaction outputs)
    assert be.counts["copy"] > 0
    datadir_moves = be.counts["copy"]
    written = sum(
        h.get("files_new", 0) for h in acid.acid_history(spark, ost, backend=be)
    )
    assert datadir_moves >= written  # vacuumed commits' files also moved once


def test_objectstore_claim_first_crash_invisible_and_reclaimed(spark, tmp_path):
    """Claim-first publish, killed between the conditional-PUT claim and
    the _meta.json visibility PUT (the protocol's worst point on an
    object store): the partial snapshot is INVISIBLE to readers, blocks
    conditional commits (in-flight rule), and vacuum sweeps the residue
    + reclaims the ordinal; the next merge then proceeds on intact
    data."""
    be = SimulatedObjectStore()
    table = str(tmp_path / "os_crash")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    acid.acid_merge_upsert(spark, table, base, ["k"], file_cow=True, backend=be)

    # replay acid_commit's claim-first sequence and "die" before the meta
    # PUT: marker claimed, snapshot content written, NO _meta.json
    acid._claim_marker(table, 2, be)
    snap = acid._snap_dir(table, 2)
    be.write_json(snap + "/_manifest.json", {"files": {}, "schema": "{}",
                                             "keys": ["k"]})
    # (died here — no _meta.json)

    assert acid._current_ordinal(spark, table, be) == 1  # invisible
    assert _rows(acid.acid_read(spark, table, backend=be)) == [(1, "a"),
                                                               (2, "b")]
    with pytest.raises(FileNotFoundError):
        acid.acid_read(spark, table, ordinal=2, backend=be)
    up = spark.createDataFrame([(3, "c")], "k long, v string")
    with pytest.raises(acid.CommitConflict):
        acid.acid_merge_upsert(spark, table, up, ["k"], file_cow=True,
                               max_retries=0, backend=be)

    vac = acid.acid_vacuum(spark, table, keep=2, backend=be)
    assert vac["reclaimed_ordinals"] == [2]
    assert not be.exists(snap + "/_manifest.json")  # residue swept
    rep = acid.acid_merge_upsert(spark, table, up, ["k"], file_cow=True,
                                 backend=be)
    assert rep["ordinal"] == 2 and rep["parent"] == 1
    assert _rows(acid.acid_read(spark, table, backend=be)) == [
        (1, "a"), (2, "b"), (3, "c")
    ]


def test_objectstore_conflict_surfaces_before_any_write(spark, tmp_path):
    """Claim-first means a lost race costs NOTHING in data writes: with
    the target ordinal's marker already claimed, the conditional commit
    conflicts at the claim and the manifest/meta PUT counters do not
    move. (Contrast: the rename arm stages first and discards on loss.)"""
    be = SimulatedObjectStore()
    table = str(tmp_path / "os_conflict")
    acid.acid_commit(
        spark, table,
        spark.createDataFrame([(1, "a")], "k long, v string"),
        backend=be,
    )
    acid._claim_marker(table, 2, be)  # out-of-band racer holds ordinal 2

    puts_before = be.counts["put"]
    with pytest.raises(acid.CommitConflict):
        acid.acid_commit(
            spark, table,
            spark.createDataFrame([(9, "z")], "k long, v string"),
            expected_parent=1, backend=be,
        )
    assert be.counts["put"] == puts_before  # nothing was written


def test_objectstore_rename_is_honestly_nonatomic(tmp_path):
    """The harness itself must not cheat: a directory rename copies
    object-by-object and a crash mid-copy leaves a HALF-COPIED
    destination plus the intact source — exactly why the publish path
    never directory-renames on this backend."""
    be = SimulatedObjectStore()
    src = tmp_path / "src"
    src.mkdir()
    for i in range(4):
        (src / f"f{i}").write_text(str(i))
    be.fail_after_copies = 2
    with pytest.raises(SimulatedCrash):
        be.rename(str(src), str(tmp_path / "dst"))
    left = sorted(os.listdir(tmp_path / "dst"))
    assert 0 < len(left) < 4  # half-copied destination is visible
    assert sorted(os.listdir(src)) == ["f0", "f1", "f2", "f3"]  # src intact


def test_objectstore_marker_listing_cost_is_paged(spark, tmp_path):
    """Marker resolution is one LIST per commit; S3-class stores bill it
    in 1000-key pages. At >1000 accumulated markers every ordinal
    resolution pays 2 paged requests — the measured growth the
    vacuum cadence exists to bound (full curve: scripts/acid_lab.py
    --oslab, SCALING round 13)."""
    be = SimulatedObjectStore(page_size=10)  # scaled-down paging
    table = str(tmp_path / "os_pages")
    cdir = acid._commits_dir(table)
    be.mkdirs(cdir)
    for o in range(1, 26):
        be.atomic_create(f"{cdir}/{o:020d}")
    before = dict(be.counts)
    ords = acid._marker_ordinals(spark, table, be)
    assert len(ords) == 25
    assert be.counts["list_calls"] - before["list_calls"] == 1
    assert be.counts["list_requests"] - before["list_requests"] == 3  # ceil(25/10)


def test_objectstore_zombie_claimant_cannot_overwrite_successor(spark, tmp_path):
    """Zombie fencing (code-review r13): committer Z claims an ordinal and
    stalls mid-write (indistinguishable from a crash); vacuum — under its
    no-commit-in-flight contract — reclaims the marker and sweeps the
    residue; successor B re-claims the SAME ordinal and publishes. When Z
    resumes, its visibility PUT must ABORT (the marker no longer carries
    Z's uuid) and must not disturb B's published snapshot. The rename arm
    has the post-rename ownership readback for this; the claim-first arm
    gets the marker-uuid fence + if-absent meta PUT."""
    be = SimulatedObjectStore()
    table = str(tmp_path / "os_zombie")
    acid.acid_merge_upsert(
        spark, table,
        spark.createDataFrame([(1, "a")], "k long, v string"),
        ["k"], file_cow=True, backend=be,
    )

    # Z claims ordinal 2 (fenced with its uuid), writes content, stalls
    acid._claim_marker(table, 2, be, "zombie-uuid")
    snap2 = acid._snap_dir(table, 2)
    be.write_json(snap2 + "/_manifest.json",
                  {"files": {}, "schema": "{}", "keys": ["k"]})

    # vacuum presumes the claim crashed: reclaims marker 2, sweeps residue
    vac = acid.acid_vacuum(spark, table, keep=2, backend=be)
    assert vac["reclaimed_ordinals"] == [2]

    # successor B re-claims ordinal 2 and publishes
    rep = acid.acid_merge_upsert(
        spark, table,
        spark.createDataFrame([(2, "b")], "k long, v string"),
        ["k"], file_cow=True, backend=be,
    )
    assert rep["ordinal"] == 2
    b_uuid = acid.acid_snapshot_meta(spark, table, 2, be)["commit_uuid"]
    before = sorted(tuple(r)
                    for r in acid.acid_read(spark, table, backend=be).collect())

    # Z resumes: the fenced publish aborts — marker carries B's uuid now
    with pytest.raises(acid.CommitConflict, match="no longer ours"):
        acid._publish_meta_fenced(
            table, 2, be,
            {"ordinal": 2, "parent": 1, "operation": "merge",
             "rows": 0, "commit_uuid": "zombie-uuid"},
        )
    # B's snapshot is untouched, still owned by B
    assert acid.acid_snapshot_meta(spark, table, 2, be)["commit_uuid"] == b_uuid
    got = sorted(tuple(r)
                 for r in acid.acid_read(spark, table, backend=be).collect())
    assert got == before

    # second fence in isolation: even with a matching marker, the meta PUT
    # is if-absent — it can never overwrite a published visibility bit
    assert not be.atomic_create(snap2 + "/_meta.json", b"{}")


def test_objectstore_zombie_fenced_before_content_write(spark, tmp_path):
    """Pre-write zombie fence (code-review r13, second pass): the meta-PUT
    fence alone is too late — a zombie resuming at its CONTENT write
    (manifest PUT / parquet overwrite) would clobber the successor's
    published snapshot while the successor's _meta.json stayed visible,
    leaving ordinal N resolving B's meta over Z's file list. The shared
    _publish_claim_first must abort BEFORE invoking write_content when
    the marker no longer carries the zombie's uuid."""
    be = SimulatedObjectStore()
    table = str(tmp_path / "os_zombie_pre")
    acid.acid_merge_upsert(
        spark, table,
        spark.createDataFrame([(1, "a")], "k long, v string"),
        ["k"], file_cow=True, backend=be,
    )

    # Z claims ordinal 2, stalls BEFORE writing any content
    acid._claim_marker(table, 2, be, "zombie-uuid")

    # vacuum reclaims; successor B re-claims ordinal 2 and publishes
    assert acid.acid_vacuum(spark, table, keep=2,
                            backend=be)["reclaimed_ordinals"] == [2]
    rep = acid.acid_merge_upsert(
        spark, table,
        spark.createDataFrame([(2, "b")], "k long, v string"),
        ["k"], file_cow=True, backend=be,
    )
    assert rep["ordinal"] == 2
    snap2 = acid._snap_dir(table, 2)
    b_manifest = be.read_json(snap2 + "/_manifest.json")
    b_uuid = acid.acid_snapshot_meta(spark, table, 2, be)["commit_uuid"]

    # Z resumes at the content write: must abort without calling it
    calls = []

    def _z_content(snap):
        calls.append(snap)  # would be the destructive overwrite
        be.write_json(snap + "/_manifest.json", {"files": {}, "z": True})
        return {"ordinal": 2, "parent": 1, "operation": "merge",
                "rows": 0, "commit_uuid": "zombie-uuid"}

    with pytest.raises(acid.CommitConflict, match="must not write"):
        acid._publish_claim_first(table, 2, be, "zombie-uuid", _z_content)
    assert calls == []  # fence fired BEFORE the destructive write
    assert be.read_json(snap2 + "/_manifest.json") == b_manifest
    assert acid.acid_snapshot_meta(spark, table, 2, be)["commit_uuid"] == b_uuid
    got = sorted(tuple(r)
                 for r in acid.acid_read(spark, table, backend=be).collect())
    assert got == [(1, "a"), (2, "b")]
