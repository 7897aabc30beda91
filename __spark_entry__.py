"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``fortymhz_spark``; this module is the thin
adapter the harness imports.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fortymhz_spark.queries import all_oracles, all_queries
from fortymhz_spark.session import tune_session

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: q1 pricing summary over sf0.001.

    Scan → pushed-down filter → partial+final hash aggregate → sort,
    with exact decimal arithmetic — the canonical shape every other
    relational query here builds on.
    """
    tune_session(spark)
    from fortymhz_spark.queries.tpch import q1_pricing_summary

    return q1_pricing_summary(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirrors (same column names, engine-
    portable value semantics).  Keys missing here are rows-only checks
    (non-SQL-expressible ops: LSH, streaming state, etc.)."""
    return all_oracles()
