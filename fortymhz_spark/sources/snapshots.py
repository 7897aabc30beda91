"""Versioned parquet snapshots with manifest-swap atomicity.

A minimal lake-table layer for training-data reproducibility — the
capability a 100 TB curation pipeline needs from its sink that plain
``df.write.parquet`` cannot give: *which exact rows did run N train
on?*  Plain parquet directories are mutable in place (an overwrite
deletes files while readers may be mid-scan) and carry no lineage.

Layout::

    table_dir/
      v=1/part-*.parquet      # immutable once published
      v=2/part-*.parquet
      _manifest.json          # {"current": 2, "versions": {...}}

Write protocol: data lands in a NEW ``v=N`` directory (never touching
published files), then the manifest is replaced via write-to-temp +
``os.replace`` — atomic on POSIX, so a concurrent reader sees either
the old manifest or the new one, never a torn file.  On object stores
without atomic rename the same role is played by a conditional PUT of
the manifest key; the data-files-are-immutable property is what makes
the single-small-file swap sufficient either way (the Delta/Iceberg
core idea, reduced to its minimum).

Readers resolve the version through the manifest (or pin an explicit
``version=`` for time travel), so a half-written ``v=N`` directory is
invisible until its manifest entry lands.  Snapshots are immutable:
retrain-on-v3 months later reads byte-identical input.

This is deliberately NOT a transaction log: there is one writer
(the pipeline driver), no concurrent-commit arbitration, and no
row-level merge — `streaming/sinks.py::start_partition_upsert_sink`
covers the incremental-merge shape.  Scale: the manifest is O(versions)
bytes and the listing never globs data files, so resolution cost is
independent of table size.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_manifest.json"


def _manifest_path(table_dir: str) -> str:
    return os.path.join(table_dir, _MANIFEST)


def _load_manifest(table_dir: str) -> dict[str, Any]:
    path = _manifest_path(table_dir)
    if not os.path.exists(path):
        return {"current": 0, "versions": {}}
    with open(path) as f:
        return json.load(f)


def write_snapshot(
    df: DataFrame,
    table_dir: str,
    *,
    partition_by: list[str] | None = None,
    note: str = "",
) -> int:
    """Publish ``df`` as the next version of ``table_dir`` and return
    the new version number.  The data write happens entirely inside an
    unpublished ``v=N`` directory; publication is the atomic manifest
    swap at the end — a reader racing this call resolves either the
    previous version or the complete new one.
    """
    os.makedirs(table_dir, exist_ok=True)
    manifest = _load_manifest(table_dir)
    # Version allocation skips ORPHAN directories (a writer that died
    # between data write and manifest swap leaves v=N data with no
    # manifest entry): next = 1 + max(published, any v=* on disk).
    # Without this, mode("error") on the stale directory would wedge
    # the table forever; with it, the orphan stays invisible (readers
    # resolve through the manifest only) and is GC-able at leisure.
    on_disk = [
        int(d[2:])
        for d in os.listdir(table_dir)
        if d.startswith("v=") and d[2:].isdigit()
    ]
    version = max([int(manifest["current"]), *on_disk], default=0) + 1
    data_dir = os.path.join(table_dir, f"v={version}")
    writer = df.write.mode("error")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(data_dir)

    # Row count from the files just written (one footer-level count
    # scan), not from re-executing ``df``'s plan — re-execution could
    # be expensive and, for non-deterministic plans, wrong.
    n_rows = df.sparkSession.read.parquet(data_dir).count()
    manifest["versions"][str(version)] = {
        "created_unix": time.time(),
        "rows": n_rows,
        "schema": df.schema.jsonValue(),
        "partition_by": list(partition_by or []),
        "note": note,
    }
    manifest["current"] = version

    fd, tmp = tempfile.mkstemp(dir=table_dir, prefix="._manifest-")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, _manifest_path(table_dir))  # the publish point
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return version


def read_snapshot(
    spark: SparkSession, table_dir: str, *, version: int | None = None
) -> DataFrame:
    """Read the current (or a pinned ``version=`` — time travel)
    snapshot.  Resolution goes through the manifest only; unpublished
    ``v=N`` directories are never visible."""
    manifest = _load_manifest(table_dir)
    if version is None:
        version = int(manifest["current"])
    if version < 1 or str(version) not in manifest["versions"]:
        raise ValueError(
            f"snapshot v={version} does not exist in {table_dir} "
            f"(published: {sorted(map(int, manifest['versions'])) or 'none'})"
        )
    return spark.read.parquet(os.path.join(table_dir, f"v={version}"))


def snapshot_versions(table_dir: str) -> list[dict[str, Any]]:
    """Published version metadata, oldest first: version, rows,
    created_unix, note — the audit trail for "what did run N read"."""
    manifest = _load_manifest(table_dir)
    out = []
    for v in sorted(map(int, manifest["versions"])):
        meta = dict(manifest["versions"][str(v)])
        meta["version"] = v
        meta.pop("schema", None)
        out.append(meta)
    return out
