"""Tiny decorator registry binding a query callable to its oracle SQL.

Oracle-style rules (the driver hash-compares VALUES, not just rows, so
representational drift between DuckDB and Spark is a failure):

- Column names must be IDENTICAL between the Spark plan and the oracle
  (the comparator sorts columns by name before hashing).
- **The HUGEINT trap**: DuckDB widens ``SUM`` over any integer type —
  including window SUMs — to HUGEINT (INT128), which hashes differently
  from Spark's BIGINT even when every value matches.  ALWAYS wrap
  integer SUM outputs in ``CAST(... AS BIGINT)``.  ``COUNT`` is BIGINT
  on both engines and needs no cast; MIN/MAX preserve their input type.
- Double aggregation is order-sensitive: sum through DECIMAL on both
  sides (see functions/exact.py) or floor to scaled BIGINT first.
- Timestamps: compare via ``epoch_us(ts)`` (DuckDB) vs
  ``unix_micros(ts)`` (Spark) — both BIGINT.
- No array/struct/map columns in driver-graded output: the driver's
  canonicalizer sorts rows with pandas, which cannot sort list cells.
  Emit scalar columns (element_at / named fields) instead.
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


class Registry:
    def __init__(self) -> None:
        self.queries: dict[str, QueryFn] = {}
        self.oracle: dict[str, str] = {}

    def query(self, name: str, oracle: str | None = None):
        """Register ``fn`` under ``name``; ``oracle=None`` marks a query
        the driver checks rows-only (non-SQL-expressible semantics)."""

        def deco(fn: QueryFn) -> QueryFn:
            self.queries[name] = fn
            if oracle is not None:
                self.oracle[name] = textwrap.dedent(oracle).strip()
            return fn

        return deco
