"""Query registry.

Each query module contributes ``(spark, sf_dir) -> DataFrame`` callables
plus (where SQL-expressible) a DuckDB oracle string with IDENTICAL
output column names and engine-portable value semantics (see
functions/exact.py for why aggregates go through DECIMAL).

``all_queries()`` / ``all_oracles()`` are what ``__spark_entry__``
exposes to the driver harness.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    from fortymhz_spark.queries import events, llm, media, tpch, tpch_deep, dt

    out: dict[str, QueryFn] = {}
    for mod in (tpch, tpch_deep, events, llm, dt, media):
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    from fortymhz_spark.queries import events, llm, media, tpch, tpch_deep, dt

    out: dict[str, str] = {}
    for mod in (tpch, tpch_deep, events, llm, dt, media):
        out.update(mod.ORACLE)
    return out
