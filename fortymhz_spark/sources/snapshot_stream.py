"""Stream FROM the versioned snapshot table (Python Data Source API).

The consumer half of the lakehouse loop: ``start_snapshot_sink``
streams INTO a snapshot table; this source lets a downstream pipeline
``readStream`` the table and receive each newly-published version as
a micro-batch — the Delta "streaming from an append-only table" shape,
built on the manifest:

- **Offsets are version numbers** (``{"version": N}``): monotonic,
  atomic with publication (the manifest swap), and exact under
  checkpoint replay because versions are immutable — re-reading
  v=K..v=M yields byte-identical rows at any time.
- **Version-number GAPS are tolerated**: the allocator legitimately
  leaves permanent holes (a crashed writer's orphan skipped at
  allocation, a ConcurrentWriteError loser).  A number with no
  manifest entry is SKIPPED unless the manifest's
  ``expired_versions`` record says retention removed it — then the
  stream fails loudly (the Delta behavior): set the sink's retention
  to outlive the slowest consumer, exactly like readers.
- **Reads are executor-parallel**: this is the FULL
  ``DataSourceStreamReader`` (not the driver-side simple variant) —
  ``partitions(start, end)`` emits one input partition per data FILE
  of the new versions, and ``read`` yields pyarrow RecordBatches on
  executors (arrow-native, no per-row Python conversion).  At 100 TB
  a version is thousands of files and the batch scan spreads like
  any parquet read.

Limitations (documented, enforced): versions written with
``partition_by`` are rejected (the partition columns live in
directory names, not the files; the batch API ``read_snapshot``
covers those), and the schema is pinned from the CURRENT version at
(re)start — a version whose stored schema differs raises with a
restart instruction rather than silently misaligning columns, so a
stream never crosses a schema-evolution boundary unnoticed.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from fortymhz_spark.sources.snapshots import _load_manifest


def _version_files(table_dir: str, version: int) -> list[str]:
    d = os.path.join(table_dir, f"v={version}")
    return sorted(
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


def _resolve_current(manifest: dict, table_dir: str) -> tuple[int, dict]:
    current = int(manifest["current"])
    meta = manifest["versions"].get(str(current))
    if meta is None:
        raise ValueError(
            f"snapshot source: {table_dir} has no published version"
        )
    if meta.get("partition_by"):
        raise ValueError(
            f"snapshot source: version {current} is partitioned by "
            f"{meta['partition_by']} — partition columns live in "
            "directory names, not data files; use unpartitioned "
            "versions for this source (read_snapshot covers the rest)"
        )
    return current, meta


def _fields_of(meta: dict) -> list[str]:
    return [f.name for f in StructType.fromJson(meta["schema"]).fields]


class _SnapFilePart(InputPartition):
    def __init__(self, path: str, fields: list[str]):
        self.path = path
        self.fields = fields


def _read_file(partition: _SnapFilePart):
    # arrow-native: yield RecordBatches straight through — no
    # to_pylist() second copy, no per-row Python tuples.
    import pyarrow.parquet as pq

    table = pq.read_table(partition.path, columns=partition.fields)
    yield from table.to_batches()


class SnapshotStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.table_dir = options.get("path", "")
        if not self.table_dir:
            raise ValueError(
                "snapshot stream requires .option('path', table_dir)"
            )
        self.start_version = int(options.get("startingversion", 1))
        self._fields: list[str] | None = None

    def _schema_fields(self) -> list[str]:
        # Pin to the CURRENT version at (re)start — the same schema
        # DataSource.schema() declared to Spark.  Versions read later
        # are checked against this pin in partitions().
        if self._fields is None:
            manifest = _load_manifest(self.table_dir)
            _, meta = _resolve_current(manifest, self.table_dir)
            self._fields = _fields_of(meta)
        return self._fields

    def initialOffset(self) -> dict:
        return {"version": self.start_version - 1}

    def latestOffset(self) -> dict:
        return {"version": int(_load_manifest(self.table_dir)["current"])}

    def partitions(self, start: dict, end: dict):
        manifest = _load_manifest(self.table_dir)
        expired = set(manifest.get("expired_versions", []))
        fields = self._schema_fields()
        parts: list[_SnapFilePart] = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            meta = manifest["versions"].get(str(v))
            if meta is None:
                if v in expired:
                    raise ValueError(
                        f"snapshot stream: version {v} of "
                        f"{self.table_dir} was expired by "
                        "vacuum_snapshot before this consumer read it "
                        "— retention must outlive the slowest consumer"
                    )
                continue  # allocation gap (orphan-skip / lost race)
            if meta.get("partition_by"):
                raise ValueError(
                    f"snapshot stream: version {v} is partitioned by "
                    f"{meta['partition_by']} — stream versions must be "
                    "written unpartitioned"
                )
            stored = _fields_of(meta)
            if stored != fields:
                raise ValueError(
                    f"snapshot stream: version {v} schema {stored} "
                    f"differs from the stream's pinned schema {fields} "
                    "— restart the stream from this version"
                )
            parts.extend(
                _SnapFilePart(p, fields)
                for p in _version_files(self.table_dir, v)
            )
        return parts

    def read(self, partition: _SnapFilePart):
        return _read_file(partition)

    def commit(self, end: dict) -> None:
        pass


class SnapshotBatchReader(DataSourceReader):
    """Batch twin: the CURRENT version, one input partition per file
    (``read_snapshot`` is the JVM-native way in; this exists so the
    format string works for both ``read`` and ``readStream``)."""

    def __init__(self, options):
        self.table_dir = options.get("path", "")
        if not self.table_dir:
            raise ValueError(
                "snapshot source requires .option('path', table_dir)"
            )

    def partitions(self):
        manifest = _load_manifest(self.table_dir)
        current, meta = _resolve_current(manifest, self.table_dir)
        fields = _fields_of(meta)
        return [
            _SnapFilePart(p, fields)
            for p in _version_files(self.table_dir, current)
        ]

    def read(self, partition: _SnapFilePart):
        return _read_file(partition)


class SnapshotTableDataSource(DataSource):
    """``spark.readStream.format("snapshot_table").option("path", d)``
    streams each newly-published version as a micro-batch;
    ``spark.read.format("snapshot_table")`` reads the current one.
    The declared schema is always the CURRENT version's (both paths),
    so batch and stream can never disagree with their readers."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_table"

    def schema(self):
        table_dir = self.options.get("path", "")
        manifest = _load_manifest(table_dir)
        _, meta = _resolve_current(manifest, table_dir)
        return StructType.fromJson(meta["schema"])

    def reader(self, schema) -> SnapshotBatchReader:
        return SnapshotBatchReader(self.options)

    def streamReader(self, schema) -> SnapshotStreamReader:
        return SnapshotStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the source with a session."""
    spark.dataSource.register(SnapshotTableDataSource)
