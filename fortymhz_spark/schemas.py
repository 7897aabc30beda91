"""Declared schemas for every source the engine reads.

The reference never declares a schema — it lets pandas infer one on
produce (``/root/reference/code/test/simulate_stream.py:7``) and trusts
``json.loads`` on consume (``core.py:116``).  Schema inference is
unavailable (and unsafe) in Structured Streaming, and at 100 TB an
inference pass over the data is a full extra scan — so every source
here gets an explicit StructType.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# DT hit record — the reference's single wire format.
# One Kafka message = one JSON object = one row of these six integer
# fields (fixture header: /root/reference/code/test/test_data.csv:1).
# ---------------------------------------------------------------------------
DT_HIT = StructType(
    [
        StructField("HEAD", ShortType(), False),  # data-word tag; 2 = physical hit
        StructField("FPGA", ShortType(), False),  # readout-board id
        StructField("TDC_CHANNEL", IntegerType(), False),  # wire id within FPGA
        StructField("ORBIT_CNT", LongType(), False),  # LHC orbit counter (64-bit)
        StructField("BX_COUNTER", IntegerType(), False),  # bunch crossing in orbit
        StructField("TDC_MEAS", IntegerType(), False),  # fine time, 1/30 BX units
    ]
)

# LHC timing constants used to synthesize an event-time column:
# one orbit = 3564 bunch crossings, one crossing = 25 ns, TDC fine time
# counts 1/30ths of a crossing.  (Public CMS DT scouting knowledge; the
# reference stores the raw counters and never derives absolute time.)
BX_PER_ORBIT = 3564
SECONDS_PER_BX = 25e-9
TDC_COUNTS_PER_BX = 30

# ---------------------------------------------------------------------------
# Driver synthetic tables (TESTDATA.md / FIXTURES.md §B) — TPC-H-ish
# star schema + events stream + LLM-pipeline tables.
# ---------------------------------------------------------------------------
REGION = StructType(
    [
        StructField("r_regionkey", IntegerType(), False),
        StructField("r_name", StringType(), False),
    ]
)

NATION = StructType(
    [
        StructField("n_nationkey", IntegerType(), False),
        StructField("n_name", StringType(), False),
        StructField("n_regionkey", IntegerType(), False),
    ]
)

CUSTOMER = StructType(
    [
        StructField("c_custkey", LongType(), False),
        StructField("c_name", StringType(), False),
        StructField("c_nationkey", IntegerType(), False),
        StructField("c_acctbal", DoubleType(), False),
        StructField("c_mktsegment", StringType(), False),
    ]
)

SUPPLIER = StructType(
    [
        StructField("s_suppkey", LongType(), False),
        StructField("s_name", StringType(), False),
        StructField("s_nationkey", IntegerType(), False),
        StructField("s_acctbal", DoubleType(), False),
    ]
)

PART = StructType(
    [
        StructField("p_partkey", LongType(), False),
        StructField("p_name", StringType(), False),
        StructField("p_brand", StringType(), False),
        StructField("p_type", StringType(), False),
        StructField("p_size", IntegerType(), False),
        StructField("p_retailprice", DoubleType(), False),
    ]
)

ORDERS = StructType(
    [
        StructField("o_orderkey", LongType(), False),
        StructField("o_custkey", LongType(), False),
        StructField("o_orderstatus", StringType(), False),
        StructField("o_totalprice", DoubleType(), False),
        StructField("o_orderdate", TimestampType(), False),
        StructField("o_orderpriority", StringType(), False),
    ]
)

LINEITEM = StructType(
    [
        StructField("l_orderkey", LongType(), False),
        StructField("l_partkey", LongType(), False),
        StructField("l_suppkey", LongType(), False),
        StructField("l_linenumber", IntegerType(), False),
        StructField("l_quantity", DoubleType(), False),
        StructField("l_extendedprice", DoubleType(), False),
        StructField("l_discount", DoubleType(), False),
        StructField("l_tax", DoubleType(), False),
        StructField("l_returnflag", StringType(), False),
        StructField("l_linestatus", StringType(), False),
        StructField("l_shipdate", TimestampType(), False),
    ]
)

EVENTS = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("ts", TimestampType(), False),  # stored as parquet ns; loader converts
        StructField("user_id", LongType(), False),
        StructField("event_type", StringType(), False),
        StructField("value", DoubleType(), False),
        StructField("props", StringType(), False),  # JSON object string
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("source", StringType(), False),
        StructField("n_chars", LongType(), False),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
        StructField("label", IntegerType(), False),
    ]
)

TABLE_SCHEMAS: dict[str, StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

TABLE_NAMES = tuple(TABLE_SCHEMAS)

# Multimodal asset table (north-star; no driver fixture — synthesized in
# tests).  Media payloads are opaque binary + typed metadata; decode /
# feature-extraction runs as Arrow-batched pandas UDFs (operators/multimodal.py).
from pyspark.sql.types import BinaryType, MapType  # noqa: E402

MEDIA_ASSET = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),  # opaque encoded bytes
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)
