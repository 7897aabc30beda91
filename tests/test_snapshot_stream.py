"""Streaming FROM the snapshot table (sources/snapshot_stream.py):
version-number offsets, executor-parallel file reads, exactly-once
resume, and the honest failure modes (vacuumed history, partitioned
versions, schema drift)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fortymhz_spark.sources import snapshot_stream
from fortymhz_spark.sources.snapshots import (
    vacuum_snapshot,
    write_snapshot,
)


@pytest.fixture()
def table_dir(tmp_path):
    return str(tmp_path / "tbl")


def _run(spark, table_dir, out, ckpt, **options):
    snapshot_stream.register(spark)
    reader = spark.readStream.format("snapshot_table").option(
        "path", table_dir
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_versions_then_resume_exactly_once(spark, table_dir, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    write_snapshot(spark.range(5).withColumn("tag", F.lit("a")), table_dir)
    write_snapshot(spark.range(3).withColumn("tag", F.lit("b")), table_dir)

    _run(spark, table_dir, out, ckpt)
    assert spark.read.parquet(out).count() == 8

    # a new version published between runs arrives EXACTLY once …
    write_snapshot(spark.range(7).withColumn("tag", F.lit("c")), table_dir)
    _run(spark, table_dir, out, ckpt)
    got = {
        r["tag"]: r["n"]
        for r in spark.read.parquet(out)
        .groupBy("tag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == {"a": 5, "b": 3, "c": 7}
    # … and an idle re-run appends nothing
    _run(spark, table_dir, out, ckpt)
    assert spark.read.parquet(out).count() == 15


def test_stream_starting_version_skips_history(spark, table_dir, tmp_path):
    write_snapshot(spark.range(5).withColumn("tag", F.lit("a")), table_dir)
    write_snapshot(spark.range(3).withColumn("tag", F.lit("b")), table_dir)
    out, ckpt = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    _run(spark, table_dir, out, ckpt, startingVersion=2)
    rows = spark.read.parquet(out)
    assert rows.count() == 3
    assert {r["tag"] for r in rows.collect()} == {"b"}


def test_stream_from_vacuumed_history_raises(spark, table_dir, tmp_path):
    for i in range(3):
        write_snapshot(spark.range(2 + i), table_dir)
    vacuum_snapshot(table_dir, keep_last=1)  # v1, v2 expired
    out, ckpt = str(tmp_path / "out3"), str(tmp_path / "ckpt3")
    with pytest.raises(Exception, match="expired by vacuum_snapshot"):
        _run(spark, table_dir, out, ckpt)  # wants to begin at v1


def test_stream_rejects_partitioned_versions(spark, table_dir, tmp_path):
    df = spark.range(10).withColumn("p", (F.col("id") % 2).cast("int"))
    write_snapshot(df, table_dir, partition_by=["p"])
    out, ckpt = str(tmp_path / "out4"), str(tmp_path / "ckpt4")
    with pytest.raises(Exception, match="partitioned"):
        _run(spark, table_dir, out, ckpt)


def test_stream_schema_drift_raises_not_misaligns(spark, table_dir, tmp_path):
    write_snapshot(spark.range(4).withColumn("tag", F.lit("a")), table_dir)
    # v2 evolves the schema — the stream pins the CURRENT (v2) layout
    # and must refuse to read the older-schema v1 rather than
    # silently misalign columns
    write_snapshot(
        spark.range(4)
        .withColumn("tag", F.lit("b"))
        .withColumn("extra", F.lit(1)),
        table_dir,
    )
    out, ckpt = str(tmp_path / "out5"), str(tmp_path / "ckpt5")
    with pytest.raises(Exception, match="differs from the stream"):
        _run(spark, table_dir, out, ckpt)


def test_batch_format_reads_current_version(spark, table_dir):
    snapshot_stream.register(spark)
    write_snapshot(spark.range(5).withColumn("tag", F.lit("a")), table_dir)
    write_snapshot(spark.range(3).withColumn("tag", F.lit("b")), table_dir)
    cur = spark.read.format("snapshot_table").option("path", table_dir).load()
    assert cur.count() == 3
    assert {r["tag"] for r in cur.collect()} == {"b"}


def test_stream_skips_allocation_gaps(spark, table_dir, tmp_path):
    """A version number with no manifest entry that retention did NOT
    expire is an allocation gap (crashed writer's orphan, lost race) —
    the stream steps over it instead of wedging forever."""
    import os

    write_snapshot(spark.range(4).withColumn("tag", F.lit("a")), table_dir)
    # orphan v=2: data written, never published (writer died pre-swap)
    spark.range(99).withColumn("tag", F.lit("ghost")).write.parquet(
        os.path.join(table_dir, "v=2")
    )
    # allocation skips the orphan → publishes v=3
    assert (
        write_snapshot(spark.range(6).withColumn("tag", F.lit("b")), table_dir)
        == 3
    )
    out, ckpt = str(tmp_path / "out6"), str(tmp_path / "ckpt6")
    _run(spark, table_dir, out, ckpt)
    rows = spark.read.parquet(out)
    assert rows.count() == 10  # v1 + v3, the orphan contributes nothing
    assert {r["tag"] for r in rows.collect()} == {"a", "b"}


def test_stream_resumes_past_vacuumed_history(spark, table_dir, tmp_path):
    """A consumer whose OFFSET is already past the versions retention
    expired must restart cleanly — only streaming INTO expired history
    fails (test above), not resuming beyond it."""
    for i in range(3):
        write_snapshot(spark.range(2 + i).withColumn("tag", F.lit(f"v{i+1}")), table_dir)
    out, ckpt = str(tmp_path / "out7"), str(tmp_path / "ckpt7")
    _run(spark, table_dir, out, ckpt)  # consumes v1..v3; offset = 3
    assert spark.read.parquet(out).count() == 2 + 3 + 4
    vacuum_snapshot(table_dir, keep_last=1)  # expires v1, v2
    write_snapshot(spark.range(9).withColumn("tag", F.lit("v4")), table_dir)
    _run(spark, table_dir, out, ckpt)  # resume: only v4
    assert spark.read.parquet(out).count() == 2 + 3 + 4 + 9


def test_vacuum_between_offset_resolution_and_read_raises(spark, table_dir):
    """The vacuum-DURING-read race, pinned at the reader API level: a
    micro-batch whose end offset was resolved BEFORE a vacuum expired
    one of its unread versions must fail loudly at partition planning
    (the retention contract), never silently skip the expired data."""
    from fortymhz_spark.sources.snapshot_stream import SnapshotStreamReader

    for i in range(4):
        write_snapshot(
            spark.range(2 + i).withColumn("tag", F.lit(f"v{i+1}")), table_dir
        )
    reader = SnapshotStreamReader({"path": table_dir})
    start = reader.initialOffset()
    end = reader.latestOffset()  # pins v1..v4 for this batch
    assert end == {"version": 4}
    vacuum_snapshot(table_dir, keep_last=1)  # expires v1..v3 mid-batch
    with pytest.raises(ValueError, match="expired by vacuum_snapshot"):
        reader.partitions(start, end)
    # a batch spanning only surviving versions still plans fine
    assert reader.partitions({"version": 3}, end)


def test_reader_catches_up_while_writer_publishes(spark, table_dir):
    """Writer-concurrent-with-reader, deterministic interleave: a
    publish landing AFTER a batch's end offset was resolved does not
    perturb that batch, and the NEXT offset resolution picks it up —
    version offsets are monotonic and atomic with publication."""
    from fortymhz_spark.sources.snapshot_stream import SnapshotStreamReader

    write_snapshot(spark.range(5), table_dir)
    write_snapshot(spark.range(3), table_dir)
    reader = SnapshotStreamReader({"path": table_dir})
    start = reader.initialOffset()
    end1 = reader.latestOffset()
    assert end1 == {"version": 2}
    # writer publishes while the reader is mid-batch
    write_snapshot(spark.range(7), table_dir)
    parts1 = reader.partitions(start, end1)

    def rows_in(parts):
        return sum(
            sum(b.num_rows for b in reader.read(p)) for p in parts
        )

    assert rows_in(parts1) == 8  # the pinned batch: v1+v2 only
    end2 = reader.latestOffset()
    assert end2 == {"version": 3}
    assert rows_in(reader.partitions(end1, end2)) == 7  # exactly the new one
