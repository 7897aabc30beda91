"""Exact (order-independent) aggregation arithmetic.

Summing IEEE doubles is not associative, so a distributed SUM over
doubles is nondeterministic in the last ulps — it varies run-to-run
with partitioning, and engine-to-engine.  At 100 TB this breaks both
reproducibility and differential testing against an oracle.

The fix: monetary/quantity columns in the fixtures carry at most two
decimal digits, so we aggregate them as fixed-point DECIMALs (exact,
associative, overflow-checked) and cast the final scalar back to
double.  Precisions are sized so products never exceed DECIMAL(38,_)
in either Spark or the DuckDB oracle:

    money  = DECIMAL(12,2)   (values < 1e10)
    factor = DECIMAL(4,2)    (1±discount/tax, values in [0, 2))
    money * factor           -> DECIMAL(17,4)   exact
    money * factor * factor  -> DECIMAL(22,6)   exact
    SUM(...)                 -> +10 integer digits, still < 38
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(12,2)"
FACTOR = "decimal(4,2)"


def dec(col: Column | str, typ: str = MONEY) -> Column:
    """Cast a column to an exact fixed-point type."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def money(col: Column | str) -> Column:
    return dec(col, MONEY)


def factor(col: Column | str) -> Column:
    return dec(col, FACTOR)


def dsum(col: Column, alias: str) -> Column:
    """Exact decimal SUM surfaced as a double (engine-portable value)."""
    return F.sum(col).cast("double").alias(alias)


def davg(col: Column, alias: str) -> Column:
    """Exact-numerator average: SUM(decimal)::double / COUNT(*).

    Both engines perform one double division on identical operands, so
    the result is bitwise identical — unlike AVG over doubles.
    """
    return (F.sum(col).cast("double") / F.count(F.lit(1))).alias(alias)
