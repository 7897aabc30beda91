"""Tiny decorator registry binding a query callable to its oracle SQL."""

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
