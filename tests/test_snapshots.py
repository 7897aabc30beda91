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
