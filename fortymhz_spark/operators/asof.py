"""As-of (temporal point-in-time) join.

Spark has no built-in AS OF join; this implements it as a SORT-MERGE
SWEEP: union the two sides into one keyed stream, sort each key
partition by time (right rows before left rows at equal timestamps,
matching ``right_ts <= left_ts``), and carry the latest right-side row
forward with ``last(..., ignorenulls=True)`` over a running window.
Each left row then reads its as-of match straight from the carried
value.

Scale shape: ONE shuffle on the key and one partition-local sort —
cost O((|L|+|R|) log partition) regardless of history length.  The
old formulation (equi-join with a time predicate, then per-left-row
argmax) materialized every historical right row per left row per key,
which was quadratic-ish for long histories and needed a ``tolerance``
lookback bound to stay safe; the sweep never materializes pairs, so
``tolerance`` is now purely a SEMANTIC filter (match must be recent
enough), not a performance requirement, and the old foot-gun warning
is gone.

Correctness corners handled by the sort itself: left rows with a null
timestamp or null key sort before any right row of their partition (or
share it with no right rows at all), so they match nothing — exactly
the SQL three-valued-logic outcome of the old join predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_KEY = "__asof_key__"
_TS = "__asof_ts__"
_SIDE = "__asof_side__"
_RPAY = "__asof_right__"
_LPAY = "__asof_left__"


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
    (``right_ts > left_ts - tolerance``).  Optional: since the
    sort-merge sweep never materializes pairs, an unbounded as-of is
    just as scale-safe as a bounded one.
    ``how``: 'left' keeps unmatched left rows; 'inner' drops them.

    Output schema: all ``left`` columns then all ``right`` columns, as
    a join would produce (right side null-filled when unmatched).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    ties = list(tie_breakers or [])
    tb_names = [f"__asof_tb{i}__" for i in range(len(ties))]

    # Struct fields get positional internal names so duplicate column
    # names across the two sides can't collide inside the union frame;
    # they are aliased back to the originals on unpack.
    rstruct = F.struct(
        *[F.col(c).alias(f"_{i}") for i, c in enumerate(right.columns)]
    )
    lstruct = F.struct(
        *[F.col(c).alias(f"_{i}") for i, c in enumerate(left.columns)]
    )
    # Right rows with a null key or null timestamp can never satisfy
    # the as-of predicate (SQL null comparison) — drop them before the
    # shuffle instead of carrying them through the sort.
    r_side = (
        right.filter(F.col(right_on).isNotNull() & F.col(right_ts).isNotNull())
        .select(
            F.col(right_on).alias(_KEY),
            F.col(right_ts).alias(_TS),
            F.lit(0).alias(_SIDE),
            *[F.col(c).alias(n) for c, n in zip(ties, tb_names)],
            rstruct.alias(_RPAY),
            F.lit(None).alias(_LPAY),
        )
    )
    l_side = left.select(
        F.col(left_on).alias(_KEY),
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        *[F.lit(None).alias(n) for n in tb_names],
        F.lit(None).alias(_RPAY),
        lstruct.alias(_LPAY),
    )
    # Union coerces per-position (date ∪ timestamp → timestamp, typed
    # null ∪ struct → struct), matching the implicit casts the old join
    # predicate applied.
    merged = r_side.unionByName(l_side)

    # Sort order encodes the predicate: at equal timestamps right rows
    # (side 0) precede left rows (side 1) — `<=` — and right rows sort
    # ascending on the tie-breakers so the one a descending argmax
    # would pick arrives LAST and wins `last()`.
    w = (
        Window.partitionBy(_KEY)
        .orderBy(
            F.col(_TS).asc(),
            F.col(_SIDE).asc(),
            *[F.col(n).asc() for n in tb_names],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = merged.withColumn(
        _RPAY, F.last(_RPAY, ignorenulls=True).over(w)
    ).filter(F.col(_SIDE) == 1)

    if tolerance is not None:
        # The carried match is the LATEST right row ≤ left_ts; if even
        # it falls outside the lookback, no right row is inside it, so
        # nulling exactly reproduces the bounded-join result.
        ts_idx = right.columns.index(right_ts)
        in_window = F.col(_RPAY)[f"_{ts_idx}"] > F.col(_TS) - F.expr(
            f"INTERVAL {tolerance}"
        )
        swept = swept.withColumn(
            _RPAY, F.when(in_window, F.col(_RPAY))
        )
    if how == "inner":
        swept = swept.filter(F.col(_RPAY).isNotNull())
    return swept.select(
        *[
            F.col(_LPAY)[f"_{i}"].alias(c)
            for i, c in enumerate(left.columns)
        ],
        *[
            F.col(_RPAY)[f"_{i}"].alias(c)
            for i, c in enumerate(right.columns)
        ],
    )
