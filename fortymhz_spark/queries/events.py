"""Event-stream analytics over the ``events`` table.

These are the batch expressions of the streaming surface
(fortymhz_spark/streaming/): Structured Streaming's unified semantics
mean the same window / sessionization logic runs over ``readStream``
unchanged; the batch forms here are what the duckdb oracle can check.

Window starts are emitted as epoch seconds (BIGINT) — timezone-proof
across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fortymhz_spark.functions.exact import davg, dsum, money
from fortymhz_spark.operators.asof import asof_join
from fortymhz_spark.queries.registry import Registry
from fortymhz_spark.sources.batch import load_table

reg = Registry()
QUERIES = reg.queries
ORACLE = reg.oracle


# ---------------------------------------------------------------------------
# tumbling window — hourly counts/revenue by event type
# ---------------------------------------------------------------------------
@reg.query(
    "q_events_hourly_by_type",
    oracle="""
    SELECT
      (epoch_us(ts) // 3600000000) * 3600 AS window_start,
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_events_hourly_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(money("value"), "total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# sliding window — 1 h window, 30 min slide (each event lands in 2 windows)
# ---------------------------------------------------------------------------
@reg.query(
    "q_events_sliding_1h_30m",
    oracle="""
    WITH slid AS (
      SELECT
        unnest([
          (epoch_us(ts) // 1800000000) * 1800,
          (epoch_us(ts) // 1800000000) * 1800 - 1800
        ]) AS window_start,
        value
      FROM events
    )
    SELECT window_start, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM slid
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_events_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(money("value"), "total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "n_events",
            "total_value",
        )
        .orderBy("window_start")
    )


# ---------------------------------------------------------------------------
# session windows — 30 min inactivity gap per user (batch formulation)
# ---------------------------------------------------------------------------
@reg.query(
    "q_events_sessionize",
    oracle="""
    WITH marked AS (
      SELECT
        user_id,
        event_id,
        ts,
        value,
        CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
               OR LAG(ts) OVER w IS NULL
             THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT *,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_id
      FROM marked
    )
    SELECT
      user_id,
      session_id,
      epoch_us(MIN(ts)) AS session_start,
      epoch_us(MAX(ts)) AS session_end,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
                > 1800 * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    sessions = marked.withColumn("session_id", F.sum("is_new").over(w_cum))
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.unix_micros(F.min("ts")).alias("session_start"),
            F.unix_micros(F.max("ts")).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            dsum(money("value"), "session_value"),
        )
        .orderBy("user_id", "session_id")
    )


# ---------------------------------------------------------------------------
# JSON property extraction (the reference's wire format is JSON — S12)
# ---------------------------------------------------------------------------
@reg.query(
    "q_events_json_props",
    oracle="""
    SELECT
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
           AS BIGINT) AS sum_k,
      MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# stream-static enrichment join — events ⋈ customer dimension
# ---------------------------------------------------------------------------
@reg.query(
    "q_events_user_enrichment",
    oracle="""
    SELECT
      c_mktsegment,
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS seg_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_events_user_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    return (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(money("value"), "seg_value"),
        )
        .orderBy("c_mktsegment", "event_type")
    )


# ---------------------------------------------------------------------------
# as-of join — each event gets the user's most recent prior order
# ---------------------------------------------------------------------------
@reg.query(
    "q_events_asof_last_order",
    oracle="""
    SELECT event_id, user_id, o_orderkey, o_totalprice
    FROM (
      SELECT
        e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
        ROW_NUMBER() OVER (PARTITION BY e.event_id
                           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e
      LEFT JOIN orders o
        ON o.o_custkey = e.user_id
       AND o.o_orderdate <= e.ts
       AND o.o_orderdate > e.ts - INTERVAL 3650 DAY
    ) WHERE rn = 1
    ORDER BY event_id
    """,
)
def q_events_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via the sort-merge sweep (operators/asof.py): one
    shuffle on the key, one partition-local sort, no pair
    materialization — safe for keys with arbitrarily long histories.
    ``tolerance`` is a semantic lookback filter (match must be within
    10 years), which the oracle's range predicate mirrors; it no longer
    changes the plan's scale shape."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    return (
        asof_join(
            ev,
            orders,
            left_on="user_id",
            right_on="o_custkey",
            left_ts="ts",
            right_ts="o_orderdate",
            tie_breakers=["o_orderkey"],
            tolerance="3650 days",
        )
        .select("event_id", "user_id", "o_orderkey", "o_totalprice")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# keep-latest dedup — streaming upsert semantics in batch form
# ---------------------------------------------------------------------------
@reg.query(
    "q_events_latest_per_user",
    oracle="""
    SELECT user_id, event_id, event_type,
           epoch_us(ts) AS ts_epoch
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    ORDER BY user_id
    """,
)
def q_events_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_micros(F.col("ts")).alias("ts_epoch"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# per-type value distribution (exact + percentile surface over stream data)
# ---------------------------------------------------------------------------
@reg.query(
    "q_events_value_stats",
    oracle="""
    SELECT
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_value,
      MIN(value) AS min_value,
      MAX(value) AS max_value,
      quantile_cont(value, 0.5) AS p50_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_events_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            davg(money("value"), "avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.expr("percentile(value, 0.5)").alias("p50_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# applyInPandas — grouped custom aggregation (the UDAF surface)
# ---------------------------------------------------------------------------
@reg.query(
    "q_events_grouped_pandas_stats",
    oracle="""
    SELECT
      event_type,
      COUNT(*) AS n,
      CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_c_sum,
      CAST(MIN(value) AS DOUBLE) AS value_min,
      CAST(MAX(value) AS DOUBLE) AS value_max
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_events_grouped_pandas_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom per-group aggregation in ``applyInPandas`` — the UDAF
    extension point (SURVEY.md §2.8): each group arrives as one Arrow-
    backed pandas frame.  Kept oracle-exact the same way as the scalar
    pandas UDF query: doubles go to fixed point (floor·100) *inside*
    the kernel before summation, and min/max are order-independent.

    Scale note: one group = one task's memory; this is for moderate
    per-group cardinality or pre-reduced inputs.  Unbounded groups
    belong in built-in aggregates or a two-stage partial reduce.
    """
    import numpy as np
    import pandas as pd

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].to_numpy()
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n": [len(v)],
                "value_c_sum": [int(np.floor(v * 100.0).sum())],
                "value_min": [float(v.min())],
                "value_max": [float(v.max())],
            }
        )

    events = load_table(spark, sf_dir, "events")
    out_schema = (
        "event_type string, n long, value_c_sum long, "
        "value_min double, value_max double"
    )
    return (
        events.select("event_type", "value")
        .groupBy("event_type")
        .applyInPandas(stats, schema=out_schema)
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# view→purchase attribution (batch twin of the stream-stream join)
# ---------------------------------------------------------------------------
@reg.query(
    "q_events_view_to_purchase",
    oracle="""
    SELECT
      v.user_id,
      v.event_id AS view_id,
      p.event_id AS purchase_id,
      epoch_us(v.ts) // 1000000 AS view_ts,
      epoch_us(p.ts) // 1000000 AS purchase_ts,
      CAST(p.value AS DOUBLE) AS purchase_value
    FROM events v
    JOIN events p
      ON v.user_id = p.user_id
     AND p.event_type = 'purchase'
     AND v.event_type = 'view'
     AND epoch_us(p.ts) > epoch_us(v.ts)
     AND epoch_us(p.ts) <= epoch_us(v.ts) + 3600000000
    ORDER BY view_id, purchase_id
    """,
)
def q_events_view_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of streaming/queries.py::streaming_view_to_purchase —
    Structured Streaming's unified semantics mean the same join
    expression runs over two live streams with watermark-bounded state
    (tested in tests/test_streaming.py); the bounded form here is what
    the DuckDB oracle can check."""
    from fortymhz_spark.streaming.queries import streaming_view_to_purchase

    ev = load_table(spark, sf_dir, "events")
    out = streaming_view_to_purchase(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    return out.orderBy("view_id", "purchase_id")


# ---------------------------------------------------------------------------
# ingestion dedup — at-least-once delivery produces duplicates; this is
# the batch twin of streaming/queries.py::streaming_dedup_events
# (dropDuplicatesWithinWatermark on the stream).  events has unique
# event_ids, so duplicates are injected deterministically (every 13th
# event re-delivered) — the dedup must restore the original row set.
# ---------------------------------------------------------------------------
@reg.query(
    "q_events_dedup_ingest",
    oracle="""
    WITH delivered AS (
      SELECT * FROM events
      UNION ALL
      SELECT * FROM events WHERE event_id % 13 = 0
    )
    SELECT DISTINCT
      event_id,
      user_id,
      event_type,
      epoch_us(ts) AS ts_epoch
    FROM delivered
    ORDER BY event_id
    """,
)
def q_events_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ingestion dedup over an at-least-once delivery (simulated
    by re-delivering every 13th event).  The streaming form bounds its
    key state with a watermark (dropDuplicatesWithinWatermark); the
    batch twin is plain dropDuplicates — same rows, different state
    lifecycle."""
    from fortymhz_spark.streaming.queries import streaming_dedup_events

    ev = load_table(spark, sf_dir, "events")
    delivered = ev.unionAll(ev.filter(F.col("event_id") % 13 == 0))
    return streaming_dedup_events(delivered).orderBy("event_id")


# ---------------------------------------------------------------------------
# cogroup (two-sided grouped pandas) — align events with orders per key
# ---------------------------------------------------------------------------
@reg.query(
    "q_cogroup_user_orders",
    oracle="""
    WITH e AS (SELECT user_id AS k, COUNT(*) AS n_events FROM events GROUP BY 1),
    o AS (SELECT o_custkey AS k, COUNT(*) AS n_orders FROM orders GROUP BY 1)
    SELECT COALESCE(e.k, o.k) AS user_id,
           COALESCE(n_events, 0) AS n_events,
           COALESCE(n_orders, 0) AS n_orders
    FROM e FULL OUTER JOIN o ON e.k = o.k
    ORDER BY user_id
    """,
)
def q_cogroup_user_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key alignment of the event stream with the orders table via
    ``cogroup(...).applyInPandas`` — the two-sided grouped-UDF surface
    (each side's rows for one key arrive as separate pandas frames;
    keys present on only one side get an empty frame, giving FULL
    OUTER semantics).  Integer counts keep it oracle-exact against a
    FULL OUTER JOIN of two aggregates.  Scale shape: both sides
    hash-partition on the key once; pandas sees one key at a time, so
    memory is bounded by the largest single key, not the table."""
    import pandas as pd

    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")

    def align(key, evts: pd.DataFrame, ords: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [len(evts)],
                "n_orders": [len(ords)],
            }
        )

    out = (
        events.select(F.col("user_id").alias("k"))
        .groupBy("k")
        .cogroup(orders.select(F.col("o_custkey").alias("k")).groupBy("k"))
        .applyInPandas(align, "user_id long, n_events long, n_orders long")
    )
    return out.orderBy("user_id")
