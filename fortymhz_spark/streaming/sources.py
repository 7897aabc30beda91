"""Streaming sources.

Maps reference operators S1–S9 (the hand-rolled partition-parallel
Kafka reader, ``/root/reference/code/dask_kafka/core.py:6-132``) onto
the built-in Kafka source, plus Kafka-less replay sources (file, rate)
for CI and for environments without a broker (S15).

KNOWN VERIFICATION GAP (explicit waiver): the live Kafka path has
never been executed in this environment — there is no broker, no
spark-sql-kafka connector jar, and no Kafka client library in the
sandbox (verified by filesystem/module search), and nothing may be
installed.  ``kafka_stream``/``kafka_batch`` are thin option-wrappers
over Spark's built-in Kafka source (offset planning, consumer pooling,
and exactly-once bookkeeping are the connector's, not ours), so the
residual risk is wiring, not logic; the wiring is covered by
(a) tests/test_kafka_integration.py — a real produce→read→assert round
trip that auto-skips without a broker and runs unmodified wherever
``KAFKA_BOOTSTRAP_SERVERS`` points at one, and (b) the file-twin
equivalence tests (tests/test_streaming.py), which drive the SAME
downstream DataFrames through the file source micro-batch-for-
micro-batch.

Everything returns a *decoded, typed* streaming DataFrame — the
reference hands its callers raw lists of dicts
(``core.py:113-116``); here decode is ``from_json`` with a declared
schema, executed JVM-side inside the scan stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from fortymhz_spark.schemas import BX_PER_ORBIT, DT_HIT
from fortymhz_spark.session import tune_session

KAFKA_HELP = (
    "The Kafka source needs the spark-sql-kafka-0-10 connector on the "
    "classpath (spark-submit --packages org.apache.spark:spark-sql-kafka-"
    "0-10_2.13:<spark-version>) and a reachable broker. This environment "
    "has neither; use file_stream()/rate_hits_stream() for local runs."
)


def kafka_stream(
    spark: SparkSession,
    topic: str,
    bootstrap_servers: str,
    schema: StructType = DT_HIT,
    *,
    batch_size: int | None = 10_000,
    starting_offsets: str = "earliest",
    min_partitions: int | None = None,
) -> DataFrame:
    """Streaming Kafka reader: one decoded row per JSON message.

    Replaces the reference's entire engine (``KafkaReader.read_batch`` +
    ``_read_partition``, ``core.py:27-122``):

    - per-partition offset-range planning → built into the source
      (the reference computes ``(low+committed, high)`` tuples by hand,
      ``core.py:41-56``, with an arithmetic bug SURVEY.md §4.3.1);
    - ``batch_size`` cap per partition per micro-batch
      (``core.py:12,111``) → ``maxOffsetsPerTrigger`` (whole-batch cap;
      the planner distributes it across partitions in proportion to lag);
    - progress tracking via Kafka commits (at-most-once,
      ``core.py:119-122``) → the checkpoint offset WAL on the started
      query (exactly-once with idempotent sinks);
    - consumer caching per worker (``core.py:93-104``) → the executor
      consumer pool (``spark.kafka.consumer.cache.*``).

    ``min_partitions`` oversplits hot Kafka partitions — one Kafka
    partition is otherwise one Spark task, which caps scan parallelism
    at the topic's partition count exactly as the reference's
    one-future-per-partition fan-out did (``core.py:66-70``).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if batch_size is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(batch_size))
    if min_partitions is not None:
        reader = reader.option("minPartitions", str(min_partitions))
    try:
        raw = reader.load()
    except Exception as exc:  # connector jar absent → actionable message
        raise RuntimeError(KAFKA_HELP) from exc
    return decode_json_value(raw, schema)


def kafka_batch(
    spark: SparkSession,
    topic: str,
    bootstrap_servers: str,
    schema: StructType = DT_HIT,
    *,
    starting_offsets: str = "earliest",
    ending_offsets: str = "latest",
) -> DataFrame:
    """Bounded snapshot read of a topic (the reference's "call
    ``read_batch()`` once" usage, ``test_reader.ipynb`` cell-2)."""
    try:
        raw = (
            spark.read.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .option("endingOffsets", ending_offsets)
            .load()
        )
    except Exception as exc:
        raise RuntimeError(KAFKA_HELP) from exc
    return decode_json_value(raw, schema)


def decode_json_value(raw: DataFrame, schema: StructType) -> DataFrame:
    """value:binary JSON → typed columns (reference's ``json.loads`` per
    message, ``core.py:116``, as a vectorized JVM expression)."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("r")
    ).select("r.*")


def file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    *,
    max_files_per_trigger: int | None = None,
    header: bool = True,
) -> DataFrame:
    """File-based streaming source — the broker-less replay path.

    Streaming over a directory of parquet/csv/json files gives the same
    micro-batch semantics as Kafka (new files = new offsets) with no
    external service; this is how streaming logic is tested here
    (tests/test_streaming.py) and how a 100 TB backfill replays history
    through the *same* query graph that serves the live stream.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if fmt == "csv":
        reader = reader.option("header", str(header).lower())
    return reader.format(fmt).load(path)


def hits_file_stream(
    spark: SparkSession, path: str, fmt: str = "csv"
) -> DataFrame:
    """Stream DT hit records from files (fixture replay, S15)."""
    tune_session(spark)
    return file_stream(spark, path, DT_HIT, fmt=fmt)


def rate_hits_stream(
    spark: SparkSession, rows_per_second: int = 10_000
) -> DataFrame:
    """Synthetic DT-hit stream from the ``rate`` source.

    Deterministic function of the rate source's ``value`` counter, so
    tests get reproducible streams without a broker — the role the
    reference's ``simulate_stream.py`` CSV replay plays, minus Kafka.
    Field ranges mirror the fixture (SURVEY.md §1.2): ~6 hits/orbit,
    BX spread over the orbit, TDC fine time 1–30.
    """
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
    v = F.col("value")
    return raw.select(
        F.lit(2).cast("short").alias("HEAD"),
        (v % 2).cast("short").alias("FPGA"),
        (v * 37 % 128 + 1).cast("int").alias("TDC_CHANNEL"),
        (F.lit(2_252_000_000) + (v / 6).cast("long")).alias("ORBIT_CNT"),
        (v * 101 % BX_PER_ORBIT).cast("int").alias("BX_COUNTER"),
        (v * 7 % 30 + 1).cast("int").alias("TDC_MEAS"),
    )
