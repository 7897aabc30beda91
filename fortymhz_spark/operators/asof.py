"""As-of (temporal point-in-time) join.

Spark has no built-in AS OF join; this expresses it as an equi-join on
the key plus a time-bound predicate, then a per-left-row argmax via
window ``row_number`` — all shuffle-on-key operations Catalyst plans as
ordinary hash joins + window, so AQE skew handling and partial
aggregation apply unchanged at scale.

Complexity note: the intermediate join materializes every (left, right)
pair that satisfies ``right_ts <= left_ts`` for a key.  For keys with
long right-side histories, pass ``tolerance`` to bound the lookback
window (e.g. "30 days"); the added range predicate keeps the join
output linear-ish and is the standard trick for 100 TB scale.
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    *,
    tie_breakers: list[str] | None = None,
    tolerance: str | None = None,
    how: str = "left",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[right_on] == left[left_on]`` and ``right[right_ts] <= left[left_ts]``.

    ``tie_breakers``: right-side columns ordered descending after
    ``right_ts`` to make ties deterministic (pass a unique key).
    ``tolerance``: SQL interval string bounding the lookback
    (``right_ts > left_ts - tolerance``).  Passing ``None`` is allowed
    (full-history as-of) but warns: without the range lower bound the
    intermediate join materializes every historical right row per left
    row per key, which is quadratic-ish for long histories — the
    100 TB-unsafe shape.
    ``how``: 'left' keeps unmatched left rows; 'inner' drops them.
    """
    if tolerance is None:
        warnings.warn(
            "asof_join without `tolerance` materializes each key's FULL "
            "right-side history per left row before the per-row argmax; "
            "pass a lookback interval (e.g. tolerance='30 days') to keep "
            "the join output bounded at scale",
            stacklevel=2,
        )
    lid = "__asof_left_id__"
    lefted = left.withColumn(lid, F.monotonically_increasing_id())
    cond: Column = (lefted[left_on] == right[right_on]) & (
        right[right_ts] <= lefted[left_ts]
    )
    if tolerance is not None:
        cond = cond & (
            right[right_ts] > lefted[left_ts] - F.expr(f"INTERVAL {tolerance}")
        )
    joined = lefted.join(right, cond, how)
    # Frame-qualified refs: plain names would be ambiguous whenever left
    # and right share a timestamp/tie-breaker column name.
    order = [right[right_ts].desc()] + [
        right[c].desc() for c in (tie_breakers or [])
    ]
    w = Window.partitionBy(lid).orderBy(*order)
    return (
        joined.withColumn("__asof_rn__", F.row_number().over(w))
        .filter(F.col("__asof_rn__") == 1)
        .drop("__asof_rn__", lid)
    )
