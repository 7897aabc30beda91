"""Structured Streaming surface: sources, sinks, queries, state.

The reference's whole engine is a hand-rolled micro-batch Kafka reader
(``/root/reference/code/dask_kafka/core.py``).  Here that surface is
Structured Streaming: the planner computes per-partition offset ranges,
the checkpoint WAL replaces Kafka committed offsets (exactly-once
instead of the reference's at-most-once, see SURVEY.md §4.3), and the
same DataFrame expressions run over batch and stream inputs unchanged.
"""

from fortymhz_spark.streaming.sources import (
    file_stream,
    hits_file_stream,
    kafka_stream,
    rate_hits_stream,
)
from fortymhz_spark.streaming.sinks import (
    run_to_memory,
    start_kafka_sink,
    start_parquet_sink,
    write_batch_to_kafka,
)
from fortymhz_spark.streaming.queries import (
    streaming_channel_occupancy,
    streaming_hourly_by_type,
    streaming_sessionize,
)
from fortymhz_spark.streaming.state import assemble_orbits

__all__ = [
    "file_stream",
    "hits_file_stream",
    "kafka_stream",
    "rate_hits_stream",
    "run_to_memory",
    "start_kafka_sink",
    "start_parquet_sink",
    "write_batch_to_kafka",
    "streaming_channel_occupancy",
    "streaming_hourly_by_type",
    "streaming_sessionize",
    "assemble_orbits",
]
