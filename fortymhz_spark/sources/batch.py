"""Batch readers with declared schemas.

Maps reference operators S10 (CSV fixture load,
``/root/reference/code/test/simulate_stream.py:7``) and S14 (driver
parquet fixtures).  Everything reads through ``spark.read`` so Catalyst
gets vectorized scans, predicate pushdown, and column pruning for free —
the reference materializes full rows as Python dicts
(``core.py:113-116``), which is exactly what we avoid.
"""

from __future__ import annotations

import os
import uuid
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fortymhz_spark.schemas import DT_HIT, TABLE_NAMES
from fortymhz_spark.session import tune_session

DEFAULT_HITS_CSV = "/root/reference/code/test/test_data.csv"

# Per-session memo of fixture *plan handles* (round-13 optimization,
# guide §1/§7.3: schema inference is a driver-side footer-read job, ~120-220 ms
# per spark.read.parquet call; a bench rep makes ~150 such calls, all over the
# same ten immutable fixtures).  The value memoized is the lazily-evaluated
# DataFrame — a logical plan, NOT data and NOT results: every action against it
# still scans the parquet files.  Keyed by the owning SparkSession (weakly, so
# stopped sessions drop out) and by (realpath, file mtime), so a rewritten
# fixture path invalidates its entry.
_TABLE_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver fixture table from ``{sf_dir}/{name}.parquet``.

    ``events.ts`` normalizes to a session-zoned (UTC) TIMESTAMP whatever
    the file stores — driver fixture generations have used both:

    - TIMESTAMP(NANOS): no Spark type; read as int64 nanoseconds
      (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to µs
      with integer division (DuckDB and pyarrow truncate the same way,
      so engines agree; float division would round-to-nearest and flip
      window boundaries).
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): reads as
      TIMESTAMP_NTZ; cast to TIMESTAMP re-interprets the wall-clock
      value in the session zone (UTC — set by tune_session), which is
      value-preserving and matches DuckDB's naive-timestamp reading.

    Both conversions are pure column expressions — fully distributed,
    no driver round-trip — so they hold at any scale.
    """
    path = os.path.realpath(os.path.join(sf_dir, f"{name}.parquet"))
    try:
        key = (path, os.stat(path).st_mtime_ns)
    except OSError:
        key = (path, None)
    memo = _TABLE_MEMO.setdefault(spark, {})
    cached = memo.get(key)
    if cached is not None:
        return cached
    tune_session(spark)
    df = spark.read.parquet(path)
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    memo[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every driver fixture table present under ``sf_dir``."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register each fixture table as a temp view for ``spark.sql``."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(f"{prefix}{name}")


def read_hits_csv(spark: SparkSession, path: str = DEFAULT_HITS_CSV) -> DataFrame:
    """Read a DT-hit CSV fixture with the declared 6-column schema.

    Replaces the reference's ``pd.read_csv`` + pandas type inference
    (``simulate_stream.py:7``) with a schema-declared distributed scan.
    """
    return spark.read.csv(path, header=True, schema=DT_HIT)


def read_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: str,
    *,
    fmt: str = "csv",
    quarantine_dir: str | None = None,
    header: bool = False,
    options: dict[str, str] | None = None,
):
    """Read dirty CSV/JSON with a QUARANTINE channel: rows that parse
    return as ``(valid_df, corrupt_df)`` — the valid frame carries the
    declared schema, the corrupt frame the raw offending text — and
    ``quarantine_dir`` (optional) persists the rejects for triage.

    At 100 TB real inputs ALWAYS contain malformed rows; the three
    stock behaviors are all wrong for a pipeline (FAILFAST kills the
    job on row one, DROPMALFORMED silently loses data, plain
    PERMISSIVE NULL-poisons columns with no audit trail).  This uses
    PERMISSIVE + ``columnNameOfCorruptRecord`` so the split is one
    predicate on the corrupt column — same scan, no second parse —
    and the reject write is a plain parquet append.

    Each call writes its rejects under a fresh ``run_id=<uuid>``
    subdirectory of ``quarantine_dir`` and the returned ``corrupt_df``
    reads ONLY that subdirectory — so repeated triage runs against the
    same quarantine root never fold prior runs' rows (or a re-run's
    duplicate append) back into this run's audit counts.  The root
    stays cumulative by design: read the all-runs history with
    ``spark.read.option("recursiveFileLookup", "true")
    .parquet(quarantine_dir)`` — the plain root read works on a pure
    ``run_id=`` layout but SILENTLY DROPS any flat files a pre-run_id
    deployment left at the root (Spark's partition discovery keeps
    only the partition-directory side of a mixed layout); the
    recursive form reads both layouts.

    Caveat (Spark semantics): a query whose ONLY referenced column is
    the corrupt record is disallowed on raw files
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), so the
    corrupt frame carries the raw text AND the partially-parsed data
    columns — which is what triage wants anyway (a CSV row that
    failed on column 7 still shows columns 1-6)."""
    if fmt not in ("csv", "json"):
        raise ValueError(f"fmt must be 'csv' or 'json', got {fmt!r}")
    corrupt_col = "_corrupt_record"
    full_schema = f"{schema}, {corrupt_col} STRING"
    reader = (
        spark.read.format(fmt)
        .schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    if fmt == "csv":
        reader = reader.option("header", str(header).lower())
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    raw = reader.load(path)
    valid = raw.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    data_cols = [c for c in raw.columns if c != corrupt_col]
    corrupt = raw.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_record"), *data_cols
    )
    if quarantine_dir is not None:
        run_dir = os.path.join(quarantine_dir, f"run_id={uuid.uuid4().hex}")
        corrupt.write.mode("error").parquet(run_dir)
        corrupt = spark.read.parquet(run_dir)
    return valid, corrupt
