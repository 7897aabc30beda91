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
- **Reads are executor-parallel**: this is the FULL
  ``DataSourceStreamReader`` (not the driver-side simple variant) —
  ``partitions(start, end)`` emits one input partition per data FILE
  of the new versions, and ``read`` runs on executors via pyarrow.
  At 100 TB a version is thousands of files and the batch scan
  spreads like any parquet read.
- **Vacuum interacts honestly**: streaming from a version that
  retention already expired raises a clear error (the Delta
  behavior) — set the sink's retention to outlive the slowest
  consumer, exactly like readers.

Limitations (documented, enforced): versions written with
``partition_by`` are rejected (the partition columns live in
directory names, not the files; the batch API ``read_snapshot``
covers those), and the schema is pinned from the manifest of the
STARTING version — schema evolution mid-stream raises rather than
silently misaligning columns.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_MANIFEST = "_manifest.json"


def _load_manifest(table_dir: str) -> dict:
    path = os.path.join(table_dir, _MANIFEST)
    if not os.path.exists(path):
        return {"current": 0, "versions": {}}
    with open(path) as f:
        return json.load(f)


def _version_files(table_dir: str, version: int) -> list[str]:
    d = os.path.join(table_dir, f"v={version}")
    return sorted(
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


def _require_version(manifest: dict, table_dir: str, v: int) -> dict:
    meta = manifest["versions"].get(str(v))
    if meta is None:
        raise ValueError(
            f"snapshot stream: version {v} of {table_dir} is not "
            "published (expired by vacuum_snapshot, or never existed) "
            "— retention must outlive the slowest streaming consumer"
        )
    if meta.get("partition_by"):
        raise ValueError(
            f"snapshot stream: version {v} is partitioned by "
            f"{meta['partition_by']} — partition columns live in "
            "directory names, not data files; stream sources must be "
            "written unpartitioned (read_snapshot covers the rest)"
        )
    return meta


class _SnapFilePart(InputPartition):
    def __init__(self, path: str, fields: list[str]):
        self.path = path
        self.fields = fields


def _read_file(partition: _SnapFilePart) -> Iterator[tuple]:
    import pyarrow.parquet as pq

    table = pq.read_table(partition.path, columns=partition.fields)
    cols = [table.column(name) for name in partition.fields]
    for batch_cols in zip(*[c.to_pylist() for c in cols]) if cols else []:
        yield tuple(batch_cols)


class SnapshotStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.table_dir = options.get("path", "")
        if not self.table_dir:
            raise ValueError("snapshot stream requires .option('path', table_dir)")
        self.start_version = int(options.get("startingversion", 1))
        self._fields: list[str] | None = None

    def _schema_fields(self) -> list[str]:
        if self._fields is None:
            manifest = _load_manifest(self.table_dir)
            meta = _require_version(
                manifest, self.table_dir,
                max(self.start_version, 1)
                if manifest["versions"] else self.start_version,
            )
            st = StructType.fromJson(meta["schema"])
            self._fields = [f.name for f in st.fields]
        return self._fields

    def initialOffset(self) -> dict:
        return {"version": self.start_version - 1}

    def latestOffset(self) -> dict:
        return {"version": int(_load_manifest(self.table_dir)["current"])}

    def partitions(self, start: dict, end: dict):
        manifest = _load_manifest(self.table_dir)
        fields = self._schema_fields()
        parts: list[_SnapFilePart] = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            meta = _require_version(manifest, self.table_dir, v)
            stored = [
                f.name
                for f in StructType.fromJson(meta["schema"]).fields
            ]
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

    def read(self, partition: _SnapFilePart) -> Iterator[tuple]:
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
            raise ValueError("snapshot source requires .option('path', table_dir)")

    def partitions(self):
        manifest = _load_manifest(self.table_dir)
        current = int(manifest["current"])
        if current == 0:
            return []
        meta = _require_version(manifest, self.table_dir, current)
        fields = [f.name for f in StructType.fromJson(meta["schema"]).fields]
        return [
            _SnapFilePart(p, fields)
            for p in _version_files(self.table_dir, current)
        ]

    def read(self, partition: _SnapFilePart) -> Iterator[tuple]:
        return _read_file(partition)


class SnapshotTableDataSource(DataSource):
    """``spark.readStream.format("snapshot_table").option("path", d)``
    streams each newly-published version as a micro-batch;
    ``spark.read.format("snapshot_table")`` reads the current one."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_table"

    def schema(self):
        table_dir = self.options.get("path", "")
        manifest = _load_manifest(table_dir)
        current = int(manifest["current"])
        start = int(self.options.get("startingversion", max(current, 1)))
        meta = _require_version(
            manifest, table_dir, start if str(start) in manifest["versions"] else current
        )
        return StructType.fromJson(meta["schema"])

    def reader(self, schema) -> SnapshotBatchReader:
        return SnapshotBatchReader(self.options)

    def streamReader(self, schema) -> SnapshotStreamReader:
        return SnapshotStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the source with a session."""
    spark.dataSource.register(SnapshotTableDataSource)
