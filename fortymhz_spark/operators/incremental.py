"""Incremental view maintenance: refresh a materialized aggregate
from a CDC delta instead of recomputing it.

The lakehouse pattern that makes 100 TB aggregates maintainable: a
downstream table holding ``groupBy(keys).agg(count, sums)`` over
snapshot vN is brought to vM by applying ONLY the change rows between
the versions (``sources/snapshots.py::snapshot_diff`` with
``pre_images=True``) — cost ∝ |delta| + |groups|, never ∝ |table|.
Count and sum are the self-maintainable aggregate class (each delta
row contributes a signed increment); avg derives from them; min/max
are NOT self-maintainable under deletes (a deleted max needs a
rescan of its group) and are deliberately out of scope here — at
scale you recompute just the touched groups for those, which this
module's delta also identifies.

Sign convention (the classic incremental-view algebra):
``insert``/``update_postimage`` rows count +1, ``delete``/
``update_preimage`` rows count −1.  An update that MOVES a row
between groups therefore subtracts from the old group and adds to
the new one — the case plain 'update' rows (new values only) cannot
express, which is why the pre-image contract exists.

Plan shape: one groupBy(keys) over the delta (map-side combine), one
full-outer join against the materialized aggregate on the group keys
(both sides are groups-sized — AQE broadcasts the smaller), zero
passes over the base table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["incremental_agg_refresh"]

_PLUS = ("insert", "update_postimage")
_MINUS = ("delete", "update_preimage")


def incremental_agg_refresh(
    materialized: DataFrame,
    cdc: DataFrame,
    group_cols: list[str],
    *,
    count_col: str = "n_rows",
    sum_cols: dict[str, str] | None = None,
    change_col: str = "_change",
) -> DataFrame:
    """Apply a pre-image CDC delta to a materialized count/sum
    aggregate and return the refreshed aggregate.

    ``materialized`` must carry ``group_cols`` + ``count_col`` (+ the
    ``sum_cols`` OUTPUT columns); ``cdc`` must carry ``group_cols`` +
    the ``sum_cols`` SOURCE columns + ``change_col`` with the
    ``snapshot_diff(pre_images=True)`` vocabulary.  Groups whose
    refreshed count reaches zero are dropped (they no longer exist in
    the base table); groups born in the delta appear.  Plain
    ``'update'`` rows — and NULL/foreign ``_change`` values — are
    rejected IN-PLAN (``raise_error`` at execution): they carry only
    post-image values, so applying them silently corrupts sums (see
    module docstring)."""
    if not group_cols:
        raise ValueError("incremental_agg_refresh needs group_cols")
    sum_cols = dict(sum_cols or {})
    missing = [
        c
        for c in (*group_cols, count_col, *sum_cols)
        if c not in materialized.columns
    ]
    if missing:
        raise ValueError(
            f"materialized aggregate lacks columns {missing} "
            f"(has {sorted(materialized.columns)})"
        )
    # The vocabulary guard is IN-PLAN (raise_error on any row that is
    # neither a plus nor a minus arm, including NULL): a plain
    # 'update' row (no pre-image) cannot be applied correctly, and a
    # driver-side pre-check would execute the whole CDC plan a second
    # time — snapshot_diff's full-outer join is the refresh's dominant
    # cost, and Spark does not CSE across actions.
    sign = (
        F.when(F.col(change_col).isin(*_PLUS), F.lit(1).cast("long"))
        .when(F.col(change_col).isin(*_MINUS), F.lit(-1).cast("long"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "incremental_agg_refresh: unsupported "
                        f"{change_col} value '"
                    ),
                    F.coalesce(F.col(change_col), F.lit("NULL")),
                    F.lit(
                        "' — produce the delta with "
                        "snapshot_diff(pre_images=True)"
                    ),
                )
            ).cast("long")
        )
    )
    delta = cdc.groupBy(*group_cols).agg(
        F.sum(sign).alias("__dn__"),
        *[
            F.sum(sign * F.col(src).cast("long")).alias(f"__d_{out}__")
            for out, src in sum_cols.items()
        ],
    )
    m = materialized.alias("m")
    d = delta.alias("d")
    cond = None
    for k in group_cols:
        c = F.col(f"m.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = c if cond is None else (cond & c)
    zl = F.lit(0).cast("long")
    new_count = F.coalesce(F.col(count_col), zl) + F.coalesce(
        F.col("__dn__"), zl
    )
    out = (
        m.join(d, cond, "full_outer")
        .select(
            *[
                F.coalesce(F.col(f"m.{k}"), F.col(f"d.{k}")).alias(k)
                for k in group_cols
            ],
            new_count.alias(count_col),
            *[
                (
                    F.coalesce(F.col(out_c).cast("long"), zl)
                    + F.coalesce(F.col(f"__d_{out_c}__"), zl)
                ).alias(out_c)
                for out_c in sum_cols
            ],
        )
        .filter(F.col(count_col) != 0)
    )
    return out
