"""Versioned-snapshot table tests (sources/snapshots.py): publish →
time travel → immutability → crash-safety of the publish point."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from fortymhz_spark.sources.snapshots import (
    read_snapshot,
    snapshot_versions,
    write_snapshot,
)


@pytest.fixture()
def table_dir(tmp_path):
    return str(tmp_path / "tbl")


def test_publish_and_time_travel(spark, table_dir):
    df1 = spark.range(10).withColumn("tag", F.lit("a"))
    df2 = spark.range(25).withColumn("tag", F.lit("b"))
    v1 = write_snapshot(df1, table_dir, note="first")
    v2 = write_snapshot(df2, table_dir)
    assert (v1, v2) == (1, 2)

    # current resolves to v2; pinned version time-travels to v1
    assert read_snapshot(spark, table_dir).count() == 25
    old = read_snapshot(spark, table_dir, version=1)
    assert old.count() == 10
    assert {r["tag"] for r in old.select("tag").distinct().collect()} == {"a"}

    meta = snapshot_versions(table_dir)
    assert [m["version"] for m in meta] == [1, 2]
    assert [m["rows"] for m in meta] == [10, 25]
    assert meta[0]["note"] == "first"


def test_old_versions_immutable_after_new_publish(spark, table_dir):
    write_snapshot(spark.range(5), table_dir)
    before = sorted(
        r["id"] for r in read_snapshot(spark, table_dir, version=1).collect()
    )
    write_snapshot(spark.range(100), table_dir, partition_by=None)
    after = sorted(
        r["id"] for r in read_snapshot(spark, table_dir, version=1).collect()
    )
    assert before == after == list(range(5))


def test_unpublished_version_is_invisible(spark, table_dir):
    """A data directory without its manifest entry (simulating a crash
    between data write and manifest swap) must be unreadable through
    the API and must not disturb the current version."""
    write_snapshot(spark.range(7), table_dir)
    # simulate a crashed writer: v=2 data exists, manifest unchanged
    spark.range(3).write.parquet(os.path.join(table_dir, "v=2"))
    assert read_snapshot(spark, table_dir).count() == 7
    with pytest.raises(ValueError, match="v=2 does not exist"):
        read_snapshot(spark, table_dir, version=2)
    # the next publish must SKIP the orphan (allocating v=3), not
    # collide with it and not absorb its rows
    v = write_snapshot(spark.range(9), table_dir)
    assert v == 3
    assert read_snapshot(spark, table_dir).count() == 9
    with pytest.raises(ValueError, match="v=2 does not exist"):
        read_snapshot(spark, table_dir, version=2)


def test_partitioned_snapshot_round_trip(spark, table_dir):
    df = spark.range(20).withColumn("part", (F.col("id") % 4).cast("int"))
    write_snapshot(df, table_dir, partition_by=["part"])
    got = read_snapshot(spark, table_dir)
    assert got.count() == 20
    assert dict(got.dtypes)["part"] == "int"
    meta = snapshot_versions(table_dir)
    assert meta[0]["partition_by"] == ["part"]


def test_read_missing_table_raises(spark, table_dir):
    with pytest.raises(ValueError, match="does not exist"):
        read_snapshot(spark, table_dir)


def test_manifest_is_valid_json_after_publish(spark, table_dir):
    write_snapshot(spark.range(3), table_dir)
    with open(os.path.join(table_dir, "_manifest.json")) as f:
        m = json.load(f)
    assert m["current"] == 1
    assert m["versions"]["1"]["rows"] == 3


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is not None, v) for v in t),
    )


def test_merge_snapshot_upsert_insert_delete(spark, table_dir):
    """One merge batch exercising all three MERGE arms — replace a
    matched key, insert an unmatched key, delete a marked key — plus
    the carry-over of untouched rows and of NULL-key target rows
    (which updates can never address)."""
    from fortymhz_spark.sources.snapshots import merge_snapshot

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (None, "nullkey")],
        "k int, val string",
    )
    v1 = write_snapshot(base, table_dir)
    updates = spark.createDataFrame(
        [(2, "B", False), (4, "d", False), (3, None, True)],
        "k int, val string, is_delete boolean",
    )
    v2 = merge_snapshot(
        spark, table_dir, updates, ["k"], delete_col="is_delete"
    )
    assert (v1, v2) == (1, 2)
    assert _rows(read_snapshot(spark, table_dir)) == [
        (None, "nullkey"),
        (1, "a"),
        (2, "B"),
        (4, "d"),
    ]
    # time travel: v1 byte-identical
    assert _rows(read_snapshot(spark, table_dir, version=1)) == _rows(base)


def test_merge_snapshot_idempotent_replay(spark, table_dir):
    """Replaying the SAME merge batch (a retried job) publishes a new
    version with IDENTICAL content — replace is absorbing, insert
    matches the now-present key, delete of an absent key is a no-op."""
    from fortymhz_spark.sources.snapshots import merge_snapshot

    write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, val string"),
        table_dir,
    )
    updates = spark.createDataFrame(
        [(2, "B", False), (4, "d", False), (1, None, True)],
        "k int, val string, is_delete boolean",
    )
    merge_snapshot(spark, table_dir, updates, ["k"], delete_col="is_delete")
    first = _rows(read_snapshot(spark, table_dir))
    merge_snapshot(spark, table_dir, updates, ["k"], delete_col="is_delete")
    assert _rows(read_snapshot(spark, table_dir)) == first == [
        (2, "B"),
        (4, "d"),
    ]
    assert [m["version"] for m in snapshot_versions(table_dir)] == [1, 2, 3]


def test_merge_snapshot_first_merge_bootstraps_v1(spark, table_dir):
    from fortymhz_spark.sources.snapshots import merge_snapshot

    updates = spark.createDataFrame(
        [(1, "a", False), (2, "x", True)], "k int, val string, is_delete boolean"
    )
    v = merge_snapshot(
        spark, table_dir, updates, ["k"], delete_col="is_delete"
    )
    assert v == 1
    assert _rows(read_snapshot(spark, table_dir)) == [(1, "a")]


def test_merge_snapshot_validates_updates(spark, table_dir):
    """Duplicate update keys, NULL update keys, schema drift, and an
    empty batch are all rejected with specific messages — each is a
    silent-corruption class if allowed through an equi-join."""
    from fortymhz_spark.sources.snapshots import merge_snapshot

    write_snapshot(
        spark.createDataFrame([(1, "a")], "k int, val string"), table_dir
    )
    dup = spark.createDataFrame(
        [(2, "x"), (2, "y")], "k int, val string"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_snapshot(spark, table_dir, dup, ["k"])
    nul = spark.createDataFrame([(None, "x")], "k int, val string")
    with pytest.raises(ValueError, match="NULL"):
        merge_snapshot(spark, table_dir, nul, ["k"])
    drift = spark.createDataFrame([(2, 9)], "k int, other int")
    with pytest.raises(ValueError, match="columns"):
        merge_snapshot(spark, table_dir, drift, ["k"])
    empty = spark.createDataFrame([], "k int, val string")
    with pytest.raises(ValueError, match="empty updates"):
        merge_snapshot(spark, table_dir, empty, ["k"])
    with pytest.raises(ValueError, match="key column"):
        merge_snapshot(spark, table_dir, dup, [])
    with pytest.raises(ValueError, match="absent"):
        merge_snapshot(spark, table_dir, dup, ["nope"])


def test_merge_snapshot_preserves_partition_layout(spark, table_dir):
    """A merge into a partitioned snapshot republishes with the SAME
    partition_by (layout is a table property, not a per-write whim),
    and the partition directories exist on disk for v2."""
    from fortymhz_spark.sources.snapshots import merge_snapshot

    base = spark.createDataFrame(
        [(1, "x", "p1"), (2, "y", "p2")], "k int, val string, part string"
    )
    write_snapshot(base, table_dir, partition_by=["part"])
    updates = spark.createDataFrame(
        [(2, "Y", "p2")], "k int, val string, part string"
    )
    v2 = merge_snapshot(spark, table_dir, updates, ["k"])
    meta = snapshot_versions(table_dir)[-1]
    assert meta["version"] == v2 and meta["partition_by"] == ["part"]
    assert os.path.isdir(os.path.join(table_dir, f"v={v2}", "part=p2"))
    got = _rows(read_snapshot(spark, table_dir).select("k", "val", "part"))
    assert got == [(1, "x", "p1"), (2, "Y", "p2")]


def test_snapshot_diff_tags_insert_update_delete(spark, table_dir):
    """CDC between versions: the diff of v1→v2 after a merge must tag
    exactly the merged batch — replaced keys as update (new values),
    new keys as insert, deleted keys as delete (old values) — and
    nothing else; null-safe compare means NULL→value edits count."""
    from fortymhz_spark.sources.snapshots import merge_snapshot, snapshot_diff

    base = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (9, "same")],
        "k int, val string",
    )
    write_snapshot(base, table_dir)
    updates = spark.createDataFrame(
        [(2, "B", False), (4, "d", False), (3, None, True), (9, "same", False)],
        "k int, val string, is_delete boolean",
    )
    merge_snapshot(spark, table_dir, updates, ["k"], delete_col="is_delete")

    diff = snapshot_diff(spark, table_dir, ["k"], v_from=1, v_to=2)
    got = {(r["k"], r["val"], r["_change"]) for r in diff.collect()}
    assert got == {
        (2, "B", "update"),    # NULL -> value counts as a change
        (4, "d", "insert"),
        (3, "c", "delete"),    # delete carries the OLD values
        # key 9 re-merged with identical values: NOT in the diff
    }
    # diff in the empty direction: v2 -> v2 is empty
    assert snapshot_diff(spark, table_dir, ["k"], v_from=2, v_to=2).count() == 0
    # and the reverse direction inverts insert/delete
    rev = {
        (r["k"], r["_change"])
        for r in snapshot_diff(spark, table_dir, ["k"], v_from=2, v_to=1).collect()
    }
    assert rev == {(2, "update"), (4, "delete"), (3, "insert")}


def test_snapshot_diff_validates(spark, table_dir):
    from fortymhz_spark.sources.snapshots import snapshot_diff

    write_snapshot(
        spark.createDataFrame([(1, "a")], "k int, val string"), table_dir
    )
    with pytest.raises(ValueError, match="key column"):
        snapshot_diff(spark, table_dir, [], v_from=1)
    with pytest.raises(ValueError, match="does not exist"):
        snapshot_diff(spark, table_dir, ["k"], v_from=7)


def test_compact_snapshot_preserves_content_and_reduces_files(
    spark, table_dir
):
    """OPTIMIZE: a fragmented table compacts to the requested file
    count with byte-identical content as a NEW version; the fragmented
    version stays time-travelable."""
    from fortymhz_spark.sources.snapshots import compact_snapshot

    frag = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "k int, val string"
    ).repartition(16)
    write_snapshot(frag, table_dir)
    n_files_v1 = len(read_snapshot(spark, table_dir).inputFiles())
    assert n_files_v1 >= 8

    v2 = compact_snapshot(spark, table_dir, target_files=2)
    assert v2 == 2
    compacted = read_snapshot(spark, table_dir)
    assert len(compacted.inputFiles()) <= 2
    assert _rows(compacted) == _rows(read_snapshot(spark, table_dir, version=1))
    # metadata: same row count recorded
    metas = {m["version"]: m for m in snapshot_versions(table_dir)}
    assert metas[2]["rows"] == metas[1]["rows"] == 100

    with pytest.raises(ValueError, match="no published version"):
        compact_snapshot(spark, str(table_dir) + "_missing")


def test_merge_snapshot_delete_everything_publishes_empty_version(
    spark, table_dir
):
    """A merge batch that deletes every target row must publish a
    readable EMPTY version (Spark 4 writes schema-bearing empty
    parquet) — and time travel back to the populated version works."""
    from fortymhz_spark.sources.snapshots import merge_snapshot

    write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, val string"),
        table_dir,
    )
    upd = spark.createDataFrame(
        [(1, None, True), (2, None, True)],
        "k int, val string, is_delete boolean",
    )
    v2 = merge_snapshot(spark, table_dir, upd, ["k"], delete_col="is_delete")
    assert v2 == 2
    assert read_snapshot(spark, table_dir).count() == 0
    assert read_snapshot(spark, table_dir, version=1).count() == 2
    # and a later merge re-populates from the empty state
    v3 = merge_snapshot(
        spark,
        table_dir,
        spark.createDataFrame([(5, "e")], "k int, val string"),
        ["k"],
    )
    assert v3 == 3
    assert _rows(read_snapshot(spark, table_dir)) == [(5, "e")]


def test_compact_snapshot_validates_target(spark, table_dir):
    from fortymhz_spark.sources.snapshots import compact_snapshot

    write_snapshot(spark.range(3), table_dir)
    with pytest.raises(ValueError, match="target_files"):
        compact_snapshot(spark, table_dir, target_files=0)


# ---------------------------------------------------------------------------
# VACUUM: retention-based version expiry + orphan GC
# ---------------------------------------------------------------------------


def test_vacuum_expires_old_versions_and_keeps_retention_window(
    spark, table_dir
):
    from fortymhz_spark.sources.snapshots import vacuum_snapshot

    for i in range(4):
        write_snapshot(
            spark.range(10 + i).withColumn("tag", F.lit(f"v{i+1}")),
            table_dir,
        )
    report = vacuum_snapshot(table_dir, keep_last=2)
    assert report["expired"] == [1, 2]
    assert report["kept"] == [3, 4]
    # kept versions still read (current AND time travel) …
    assert read_snapshot(spark, table_dir).count() == 13
    assert read_snapshot(spark, table_dir, version=3).count() == 12
    # … expired ones are unpublished AND their files are gone
    with pytest.raises(ValueError, match="v=1 does not exist"):
        read_snapshot(spark, table_dir, version=1)
    assert not os.path.exists(os.path.join(table_dir, "v=1"))
    assert not os.path.exists(os.path.join(table_dir, "v=2"))
    assert [m["version"] for m in snapshot_versions(table_dir)] == [3, 4]


def test_vacuum_collects_orphan_directories(spark, table_dir):
    from fortymhz_spark.sources.snapshots import vacuum_snapshot

    write_snapshot(spark.range(5), table_dir)
    # simulate a writer that died between data write and manifest swap
    orphan = os.path.join(table_dir, "v=9")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "w") as f:
        f.write("torn")
    report = vacuum_snapshot(table_dir, keep_last=1)
    assert report == {"expired": [], "orphans": [9], "staging": [], "kept": [1]}
    assert not os.path.exists(orphan)
    # the freed number is reusable: next write publishes normally
    v = write_snapshot(spark.range(6), table_dir)
    assert v == 2
    assert read_snapshot(spark, table_dir).count() == 6


def test_vacuum_min_age_and_dry_run_protect_versions(spark, table_dir):
    from fortymhz_spark.sources.snapshots import vacuum_snapshot

    for i in range(3):
        write_snapshot(spark.range(3 + i), table_dir)
    # freshly-created versions are inside the retention window …
    report = vacuum_snapshot(table_dir, keep_last=1, min_age_s=3600)
    assert report["expired"] == []
    assert read_snapshot(spark, table_dir, version=1).count() == 3
    # … and dry_run reports without deleting anything
    report = vacuum_snapshot(table_dir, keep_last=1, dry_run=True)
    assert report["expired"] == [1, 2]
    assert read_snapshot(spark, table_dir, version=1).count() == 3
    assert os.path.exists(os.path.join(table_dir, "v=1"))


def test_vacuum_never_removes_current_and_validates(spark, table_dir):
    from fortymhz_spark.sources.snapshots import vacuum_snapshot

    with pytest.raises(ValueError, match="keep_last"):
        vacuum_snapshot(table_dir, keep_last=0)
    write_snapshot(spark.range(4), table_dir)
    report = vacuum_snapshot(table_dir, keep_last=1)
    assert report == {"expired": [], "orphans": [], "staging": [], "kept": [1]}
    assert read_snapshot(spark, table_dir).count() == 4


# ---------------------------------------------------------------------------
# CDC pre-images + incremental view maintenance
# ---------------------------------------------------------------------------


def _diff_fixture(spark, table_dir):
    from fortymhz_spark.sources.snapshots import snapshot_diff

    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40)],
        "k long, grp string, val long",
    )
    # 1 unchanged; 2 updated in place; 3 MOVES group b→c; 4 deleted;
    # 5 inserted into a brand-new group
    v2 = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 25), (3, "c", 30), (5, "d", 50)],
        "k long, grp string, val long",
    )
    write_snapshot(v1, table_dir)
    write_snapshot(v2, table_dir)
    return snapshot_diff


def test_snapshot_diff_pre_images_emit_both_update_rows(spark, table_dir):
    snapshot_diff = _diff_fixture(spark, table_dir)
    rows = sorted(
        map(
            tuple,
            snapshot_diff(
                spark, table_dir, ["k"], v_from=1, v_to=2, pre_images=True
            ).collect(),
        )
    )
    assert rows == [
        (2, "a", 20, "update_preimage"),
        (2, "a", 25, "update_postimage"),
        (3, "b", 30, "update_preimage"),
        (3, "c", 30, "update_postimage"),
        (4, "b", 40, "delete"),
        (5, "d", 50, "insert"),
    ]


def test_incremental_agg_refresh_matches_direct_recompute(spark, table_dir):
    from fortymhz_spark.operators.incremental import incremental_agg_refresh
    from fortymhz_spark.sources.snapshots import snapshot_diff as sd

    _diff_fixture(spark, table_dir)
    agg_v1 = (
        read_snapshot(spark, table_dir, version=1)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("val").cast("long").alias("sum_val"),
        )
    )
    cdc = sd(spark, table_dir, ["k"], v_from=1, v_to=2, pre_images=True)
    got = sorted(
        map(
            tuple,
            incremental_agg_refresh(
                agg_v1, cdc, ["grp"], sum_cols={"sum_val": "val"}
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            read_snapshot(spark, table_dir, version=2)
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("val").cast("long").alias("sum_val"),
            )
            .collect(),
        )
    )
    # group 'b' died (move + delete), 'c' and 'd' were born — the
    # refreshed aggregate must equal a from-scratch v2 aggregate
    assert got == want
    assert {g for g, *_ in got} == {"a", "c", "d"}


def test_incremental_refresh_from_materialized_inputs_never_scans_base(
    spark, table_dir, tmp_path
):
    """The 'cost ∝ delta + groups, never ∝ table' claim, pinned
    STRUCTURALLY: with the v1 aggregate and the CDC delta materialized
    (the 100 TB serving shape — the delta comes from the merge's
    change feed, not a re-diff), the refresh plan's file sources must
    be ONLY those two parquet paths — zero references to the snapshot
    table's data directories.  Wall-clock soaks sit at the scan floor
    on page-cached columnar data (tools/scale_soak.py snapshot_ivm
    rows), so the plan is the evidence that scales."""
    from fortymhz_spark.operators.incremental import incremental_agg_refresh
    from fortymhz_spark.sources.snapshots import snapshot_diff as sd

    _diff_fixture(spark, table_dir)
    aggp, cdcp = str(tmp_path / "agg.parquet"), str(tmp_path / "cdc.parquet")
    read_snapshot(spark, table_dir, version=1).groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("val").cast("long").alias("sum_val"),
    ).write.parquet(aggp)
    sd(spark, table_dir, ["k"], v_from=1, v_to=2, pre_images=True).write.parquet(cdcp)
    refreshed = incremental_agg_refresh(
        spark.read.parquet(aggp),
        spark.read.parquet(cdcp),
        ["grp"],
        sum_cols={"sum_val": "val"},
    )
    plan = refreshed._jdf.queryExecution().executedPlan().toString()
    assert table_dir not in plan  # no base-table file source anywhere
    assert "v=1" not in plan and "v=2" not in plan
    # and it still computes the right answer from those inputs alone
    got = sorted(map(tuple, refreshed.collect()))
    want = sorted(
        map(
            tuple,
            read_snapshot(spark, table_dir, version=2)
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("val").cast("long").alias("sum_val"),
            )
            .collect(),
        )
    )
    assert got == want


def test_incremental_agg_refresh_rejects_postimage_only_cdc(
    spark, table_dir
):
    from fortymhz_spark.operators.incremental import incremental_agg_refresh
    from fortymhz_spark.sources.snapshots import snapshot_diff as sd

    _diff_fixture(spark, table_dir)
    agg_v1 = (
        read_snapshot(spark, table_dir, version=1)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    plain = sd(spark, table_dir, ["k"], v_from=1, v_to=2)  # no pre-images
    # the vocabulary guard is IN-PLAN (no second execution of the CDC
    # join), so the rejection surfaces when the refresh executes
    with pytest.raises(Exception, match="unsupported _change"):
        incremental_agg_refresh(agg_v1, plain, ["grp"]).collect()
    # NULL _change must hit the same guard, not be applied as a delete
    nulled = plain.withColumn(
        "_change",
        F.when(F.col("_change") == "insert", F.lit(None)).otherwise(
            F.col("_change")
        ),
    )
    with pytest.raises(Exception, match="unsupported _change"):
        incremental_agg_refresh(agg_v1, nulled, ["grp"]).collect()
    with pytest.raises(ValueError, match="group_cols"):
        incremental_agg_refresh(agg_v1, plain, [])
    with pytest.raises(ValueError, match="lacks columns"):
        incremental_agg_refresh(
            agg_v1, plain, ["grp"], sum_cols={"missing_out": "val"}
        )


def test_txn_mark_is_per_writer_and_survives_compact_and_vacuum(
    spark, table_dir
):
    from fortymhz_spark.sources.snapshots import (
        compact_snapshot,
        vacuum_snapshot,
    )
    from fortymhz_spark.streaming.sinks import _last_stream_batch

    write_snapshot(spark.range(5), table_dir, txn=("writerA", 5))
    # per-writer isolation: writer B sees no mark from writer A
    assert _last_stream_batch(table_dir, "writerA") == 5
    assert _last_stream_batch(table_dir, "writerB") == -1
    # the mark lives in the manifest proper, so maintenance that
    # rewrites/expires versions (compact + vacuum) cannot erase it
    compact_snapshot(spark, table_dir, target_files=1)
    vacuum_snapshot(table_dir, keep_last=1)
    assert _last_stream_batch(table_dir, "writerA") == 5


def test_vacuum_spares_young_orphans(spark, table_dir):
    from fortymhz_spark.sources.snapshots import vacuum_snapshot

    write_snapshot(spark.range(3), table_dir)
    # a just-created unpublished directory could be an IN-FLIGHT
    # writer between data write and manifest swap — with a retention
    # window it must be left alone, not GC'd as dead
    orphan = os.path.join(table_dir, "v=9")
    os.makedirs(orphan)
    report = vacuum_snapshot(table_dir, keep_last=1, min_age_s=3600)
    assert report["orphans"] == []
    assert os.path.exists(orphan)
    # outside the window it is dead and collected
    report = vacuum_snapshot(table_dir, keep_last=1, min_age_s=0)
    assert report["orphans"] == [9]
    assert not os.path.exists(orphan)


def test_write_snapshot_check_constraints(spark, table_dir):
    """CHECK constraints gate the publish: a violating batch is
    aborted (no version, no orphan data), a passing one publishes,
    and NULL check results pass per the SQL convention."""
    ok = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "k int, v int"
    )
    v = write_snapshot(
        ok,
        table_dir,
        checks={"v_positive": F.col("v") > 0, "k_not_null": F.col("k").isNotNull()},
    )
    assert v == 1  # NULL v passes v_positive (SQL CHECK convention)
    bad = spark.createDataFrame([(4, -5), (5, 50), (None, 6)], "k int, v int")
    with pytest.raises(ValueError, match=r"v_positive \(1 rows\)"):
        write_snapshot(
            bad,
            table_dir,
            checks={
                "v_positive": F.col("v") > 0,
                "k_not_null": F.col("k").isNotNull(),
            },
        )
    # aborted: no new version, and the failed data dir is gone
    assert [m["version"] for m in snapshot_versions(table_dir)] == [1]
    assert not os.path.exists(os.path.join(table_dir, "v=2"))
    # the failed attempt must not wedge allocation
    assert write_snapshot(spark.range(2), table_dir) == 2


def test_compact_snapshot_zorder_clusters_files(spark, table_dir):
    """OPTIMIZE ZORDER: the compacted version holds identical rows and
    its per-file ranges are tightened on BOTH z-columns — a box
    predicate touches fewer files than on the unclustered layout."""
    from fortymhz_spark.sources.snapshots import compact_snapshot

    n = 4096
    df = (
        spark.range(n)
        .withColumn("x", (F.col("id") * 2654435761 % n).cast("double") / n)
        .withColumn("y", (F.col("id") * 40503 % n).cast("double") / n)
    )
    # fragmented, randomly-clustered initial layout
    write_snapshot(df.repartition(16), table_dir)

    v2 = compact_snapshot(
        spark,
        table_dir,
        target_files=16,
        zorder_by=[("x", 0.0, 1.0), ("y", 0.0, 1.0)],
    )
    assert v2 == 2
    before = read_snapshot(spark, table_dir, version=1)
    after = read_snapshot(spark, table_dir, version=2)
    assert sorted(r["id"] for r in after.collect()) == sorted(
        r["id"] for r in before.collect()
    )

    def files_touched(frame):
        box = frame.filter(
            (F.col("x") >= 0.4) & (F.col("x") < 0.6)
            & (F.col("y") >= 0.4) & (F.col("y") < 0.6)
        )
        return len({
            os.path.dirname(r["f"]) + r["f"]
            for r in box.select(
                F.input_file_name().alias("f")
            ).distinct().collect()
        })

    # the box is ~4% of the data; the z-clustered layout must prune
    # meaningfully below the scan-everything 16 files
    assert files_touched(before) == 16
    assert files_touched(after) <= 8

    with pytest.raises(ValueError, match="absent from the table"):
        compact_snapshot(
            spark, table_dir, zorder_by=[("nope", 0.0, 1.0)]
        )


def test_merge_snapshot_schema_evolution(spark, table_dir):
    """allow_schema_evolution: the merged version carries the UNION of
    columns — carried-over rows NULL in new columns, upserts NULL in
    target-only columns; without the flag drift still raises."""
    from fortymhz_spark.sources.snapshots import merge_snapshot

    write_snapshot(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "k int, val string, old int"
        ),
        table_dir,
    )
    evolved = spark.createDataFrame(
        [(2, "B", 99), (3, "c", 42)], "k int, val string, score int"
    )
    with pytest.raises(ValueError, match="allow_schema_evolution"):
        merge_snapshot(spark, table_dir, evolved, ["k"])
    merge_snapshot(
        spark, table_dir, evolved, ["k"], allow_schema_evolution=True
    )
    got = {
        r["k"]: (r["val"], r["old"], r["score"])
        for r in read_snapshot(spark, table_dir).collect()
    }
    assert got == {
        1: ("a", 10, None),   # carried over, NULL in the new column
        2: ("B", None, 99),   # replaced, NULL in the target-only column
        3: ("c", None, 42),   # inserted
    }
    # time travel still shows the pre-evolution schema and content
    v1 = read_snapshot(spark, table_dir, version=1)
    assert sorted(v1.columns) == ["k", "old", "val"]
    assert v1.count() == 2


def test_concurrent_independent_publishes_both_survive(
    spark, table_dir, monkeypatch
):
    """Independent snapshot publishes are CAS-safe from any number of
    writers: a racer that loses its pre-allocated version number is
    reallocated under the publisher lock and BOTH versions survive —
    no error, no lost update.  Simulated by publishing a competing
    version between this writer's data write and its manifest commit."""
    from fortymhz_spark.sources import snapshots as snap

    write_snapshot(spark.range(3).withColumn("tag", F.lit("base")), table_dir)

    real_write_data = snap._write_data
    state = {"raced": False}

    def racing_write_data(df, data_dir, partition_by):
        real_write_data(df, data_dir, partition_by)
        if not state["raced"]:
            state["raced"] = True  # competitor publishes exactly once
            write_snapshot(
                spark.range(9).withColumn("tag", F.lit("racer")),
                table_dir,
            )

    monkeypatch.setattr(snap, "_write_data", racing_write_data)
    v = write_snapshot(
        spark.range(5).withColumn("tag", F.lit("slow")), table_dir
    )
    monkeypatch.setattr(snap, "_write_data", real_write_data)

    # the racer published v=2 while the slow writer's data sat in a
    # private staging dir; the slow writer's locked commit allocated
    # v=3 — every version survives, current = the LAST publish.
    assert v == 3
    assert [m["version"] for m in snapshot_versions(table_dir)] == [1, 2, 3]
    assert {r["tag"] for r in read_snapshot(spark, table_dir).collect()} == {
        "slow"
    }
    assert {
        r["tag"]
        for r in read_snapshot(spark, table_dir, version=2).collect()
    } == {"racer"}
    # no staging leftovers
    assert not [d for d in os.listdir(table_dir) if d.startswith(".staging-")]
    # allocation recovers: the next write publishes normally
    assert (
        write_snapshot(spark.range(4).withColumn("tag", F.lit("next")), table_dir)
        == 4
    )


def test_threaded_writers_all_publish(spark, table_dir):
    """Four genuinely concurrent threads publishing independent
    snapshots must ALL succeed with distinct versions (the flock
    publisher serializes the commit point)."""
    import threading

    write_snapshot(spark.range(1).withColumn("w", F.lit(-1)), table_dir)
    results: dict[int, int | Exception] = {}

    def publish(i: int) -> None:
        try:
            results[i] = write_snapshot(
                spark.range(2).withColumn("w", F.lit(i)), table_dir
            )
        except Exception as ex:  # pragma: no cover - failure detail
            results[i] = ex

    threads = [
        threading.Thread(target=publish, args=(i,)) for i in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(isinstance(v, int) for v in results.values()), results
    versions = sorted(results[i] for i in range(4))
    assert len(set(versions)) == 4
    published = [m["version"] for m in snapshot_versions(table_dir)]
    assert set(versions) <= set(published)
    # every thread's snapshot is readable and intact
    for i, v in results.items():
        got = {r["w"] for r in read_snapshot(spark, table_dir, version=v).collect()}
        assert got == {i}


def test_derived_write_race_vetoed_then_retries_cleanly(
    spark, table_dir, monkeypatch
):
    """merge_snapshot pins the base version it read: a competing
    publish mid-merge vetoes the commit with ConcurrentWriteError, and
    a plain retry lands BOTH writers' changes (optimistic
    concurrency — nothing lost on either side)."""
    from fortymhz_spark.sources import snapshots as snap
    from fortymhz_spark.sources.snapshots import merge_snapshot

    write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, val string"),
        table_dir,
    )

    real_write_data = snap._write_data
    state = {"raced": False}

    def racing_write_data(df, data_dir, partition_by):
        real_write_data(df, data_dir, partition_by)
        if not state["raced"]:
            state["raced"] = True
            # competitor replaces the table while our merge is in flight
            write_snapshot(
                spark.createDataFrame(
                    [(1, "a"), (2, "b"), (3, "c")], "id long, val string"
                ),
                table_dir,
            )

    updates = spark.createDataFrame([(2, "B!")], "id long, val string")
    monkeypatch.setattr(snap, "_write_data", racing_write_data)
    with pytest.raises(snap.ConcurrentWriteError, match="moved from base"):
        merge_snapshot(spark, table_dir, updates, ["id"])
    monkeypatch.setattr(snap, "_write_data", real_write_data)

    # the competitor's publish is intact; the failed merge left no
    # published version and the retry sees the NEW base (id=3 row
    # included) — both writers' changes land.
    merge_snapshot(spark, table_dir, updates, ["id"])
    got = {
        (r["id"], r["val"])
        for r in read_snapshot(spark, table_dir).collect()
    }
    assert got == {(1, "a"), (2, "B!"), (3, "c")}


def test_lockfree_rename_collision_reallocates(spark, table_dir, monkeypatch):
    """Lock-free publishers (object-store If-Match loops) have no
    mutual exclusion around the staging→v=N rename: a competitor may
    land v=N between our allocation listing and our rename.  The
    rename then fails EEXIST/ENOTEMPTY and write_snapshot must take
    the next number — not crash with an uncategorized OSError or
    touch the competitor's live data."""
    import os as _os

    from fortymhz_spark.sources import snapshots as snap

    write_snapshot(spark.range(5), table_dir)
    write_snapshot(spark.range(7), table_dir)
    # the competitor's just-renamed (not yet committed) v=3
    comp = os.path.join(table_dir, "v=3")
    os.makedirs(comp)
    with open(os.path.join(comp, "part-0.parquet"), "w") as f:
        f.write("competitor data")

    real_listdir = _os.listdir

    def stale_listdir(path):
        # the racer's rename lands AFTER our listing: hide it
        entries = real_listdir(path)
        if os.path.abspath(str(path)) == os.path.abspath(table_dir):
            entries = [e for e in entries if e != "v=3"]
        return entries

    monkeypatch.setattr(snap.os, "listdir", stale_listdir)
    v = write_snapshot(spark.range(9), table_dir)
    monkeypatch.undo()

    assert v == 4  # re-allocated past the collision
    # competitor's data untouched; our version is published and reads
    with open(os.path.join(comp, "part-0.parquet")) as f:
        assert f.read() == "competitor data"
    assert read_snapshot(spark, table_dir).count() == 9


def test_vacuum_report_separates_expired_from_orphans(spark, table_dir):
    """Retention-expired versions must appear ONLY in 'expired' (not
    double-classified as dead-writer 'orphans'), and a staging-only
    vacuum must not rewrite an unchanged manifest."""
    from fortymhz_spark.sources.snapshots import vacuum_snapshot

    for i in range(4):
        write_snapshot(spark.range(10 * (i + 1)), table_dir)
    report = vacuum_snapshot(table_dir, keep_last=2)
    assert report["expired"] == [1, 2]
    assert report["orphans"] == []

    manifest_path = os.path.join(table_dir, "_manifest.json")
    before = os.path.getmtime(manifest_path)
    dead = os.path.join(table_dir, ".staging-deadbeef")
    os.makedirs(dead)
    os.utime(dead, (0, 0))
    report2 = vacuum_snapshot(table_dir, keep_last=2)
    assert report2 == {
        "expired": [],
        "orphans": [],
        "staging": [".staging-deadbeef"],
        "kept": [3, 4],
    }
    assert not os.path.exists(dead)
    assert os.path.getmtime(manifest_path) == before
