"""SparkSession factory with scale-oriented defaults.

The reference engine hand-schedules one read task per Kafka partition
(``/root/reference/code/dask_kafka/core.py:66-70``); Spark's planner
does that for us.  What we own here is the configuration posture:
AQE on (runtime coalescing + skew-join handling), Arrow on (fast
pandas/UDF boundary), UTC session timezone (deterministic event-time
semantics), and shuffle partitioning sized for the local harness while
remaining overridable for a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied even when the session is created by an
# external harness (the driver owns the session in verify runs).
_RUNTIME_CONFS: dict[str, str] = {
    # Some driver fixture generations store events.ts as parquet
    # TIMESTAMP(NANOS), which Spark has no native type for; read as
    # int64 nanos and let the events loader convert (sources/batch.py —
    # which also handles the MICROS/NTZ form newer fixtures use).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime shuffle coalescing, skew-join splitting, dynamic
    # broadcast selection — essential at 100 TB where static plans
    # misjudge partition sizes.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session.

    Safe to call on a session we did not create; every conf here is a
    runtime conf (not a static SparkConf), so this works from inside
    driver-harness callbacks.
    """
    for key, value in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # A locked-down session may refuse some confs; queries are
            # written to degrade gracefully (only nanosAsLong is load-
            # bearing, and it has been runtime-settable since 3.2).
            pass
    return spark


def get_session(
    app_name: str = "fortymhz-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when unset so the
    same entry points serve the test harness and a real cluster (where
    spark-submit supplies the master).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    elif "SPARK_MASTER" not in os.environ and not os.environ.get("SPARK_CONNECT_MODE"):
        builder = builder.master(f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
    builder = (
        builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for key, value in _RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    return tune_session(builder.getOrCreate())
