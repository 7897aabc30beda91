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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fortymhz_spark.schemas import DT_HIT, TABLE_NAMES
from fortymhz_spark.session import tune_session

DEFAULT_HITS_CSV = "/root/reference/code/test/test_data.csv"


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
    tune_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
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
