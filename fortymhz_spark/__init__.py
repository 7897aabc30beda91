"""fortymhz_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the FortyMHz reference (partition-parallel Kafka ingestion of 40 MHz
detector-hit streams, micro-batch semantics, JSON decode, distributed
DataFrame analysis — see ``/root/reference/code/dask_kafka/core.py``),
re-expressed Spark-first:

- DataFrame/SQL everywhere; Catalyst plans, Tungsten executes.
- Structured Streaming for unbounded sources (Kafka, rate, files)
  with checkpoint-backed exactly-once (the reference's commit-first
  protocol at ``core.py:119-122`` is at-most-once; we do not copy it).
- LLM-data-pipeline operators (dedup, similarity search, multimodal
  columns, text analysis) designed for 100 TB scale.
"""

__version__ = "0.1.0"

from fortymhz_spark.session import get_session, tune_session

__all__ = ["get_session", "tune_session", "__version__"]
