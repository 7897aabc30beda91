"""ANALYZE-style table profiling: one pass, one row per column.

The statistics a warehouse keeps per column (null count, distinct
count, min/max) drive join reordering and partition sizing; at 100 TB
you cannot afford one scan per column, so the profile is ONE aggregate
over the table computing every column's stats side by side, then an
unpivot of the 1-row result — driver-side cost is columns × a few
scalars.

Honest cost note: "one scan" is not "a few scalars of work" — N
EXACT ``countDistinct`` aggregates over different columns make
Catalyst rewrite through an ``Expand`` that replicates every input
row N+1 times into the partial aggregation (RewriteDistinctAggregates
needs one grouping per distinct column), so the pass processes
(columns+1)× the row count even though the table is read once.  At
open-vocabulary 100 TB scale swap ``countDistinct`` for
``approx_count_distinct`` — the HLL++ sketch folds all columns in the
same partial-agg pass with NO Expand and constant memory; the exact
form here is what a differential oracle can verify cell-for-cell.

Values are stringified for the cross-column schema (min/max of a
bigint and a varchar must share one output column); the cast uses
Spark's canonical string forms, which DuckDB mirrors for integers and
strings — the profiled fixture columns — so the oracle comparison
stays cell-for-cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value) for
    each requested column (default: all), computed in one scan.

    ``approx=False`` (default): ``n_distinct`` is exact (null
    excluded, the SQL convention) — see the module docstring for the
    Expand cost this implies.  ``approx=True`` swaps in
    ``approx_count_distinct`` (HLL++ at relative standard deviation
    ``rsd``): every column's sketch folds in the SAME partial-agg pass
    with NO Expand and constant memory per column — the 100 TB form.
    The sketch hash is fixed and its merge is commutative, so the
    estimate is deterministic on any partitioning; graded via
    error-band booleans against the exact twin
    (queries: q_profile_orders_approx), plan asserted Expand-free
    (tests/test_properties.py).
    """
    cols = list(columns) if columns is not None else list(df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    if not cols:
        raise ValueError("profile_table needs at least one column")
    # Round-13: the partial-agg pass (and the exact form's Expand,
    # which multiplies rows × columns BEFORE any exchange) runs on the
    # scan's partitioning — ONE task for a single-file table; no-op at
    # scale (partitioning.spread_scan).
    from fortymhz_spark.operators.partitioning import spread_scan

    df = spread_scan(df)
    ndv = (
        (lambda c: F.approx_count_distinct(c, rsd))
        if approx
        else F.countDistinct
    )
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for i, c in enumerate(cols):
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{i}__"),
            ndv(F.col(c)).alias(f"__ndv_{i}__"),
            F.min(F.col(c)).cast("string").alias(f"__min_{i}__"),
            F.max(F.col(c)).cast("string").alias(f"__max_{i}__"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n__").alias("n_rows"),
                F.col(f"__nulls_{i}__").alias("n_nulls"),
                F.col(f"__ndv_{i}__").alias("n_distinct"),
                F.col(f"__min_{i}__").alias("min_value"),
                F.col(f"__max_{i}__").alias("max_value"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return (
        one.select(F.explode(per_col).alias("p"))
        .select("p.*")
        .orderBy("column")
    )


def quality_yield_curve(
    df: DataFrame,
    score,
    thresholds: list[int],
    *,
    text_col: str = "text",
) -> DataFrame:
    """Filter-threshold YIELD CURVE in one scan: for every candidate
    threshold, how many documents and how many tokens survive
    ``score >= threshold`` — the sweep that actually tunes a quality
    filter ("which cutoff keeps ~2 T tokens?").  At 100 TB you cannot
    afford one scan per candidate cutoff; this computes ALL of them as
    side-by-side conditional aggregates in ONE pass (map-side
    combined, a single 1-row partial), then unpivots the 1-row result
    into ``(threshold, n_docs_kept, n_tokens_kept)`` — driver cost is
    |thresholds| scalars.

    ``score`` is any integer Column expression (e.g.
    ``text.hashed_linear_score`` — the exact-BIGINT logit, so the
    curve is engine-portable and oracle-checkable cell for cell).
    NULL text counts 0 tokens; a NULL score survives no threshold
    (SQL comparison semantics).  Monotone by construction:
    ``n_docs_kept``/``n_tokens_kept`` are non-increasing in the
    threshold — a pinned invariant a broken conditional aggregate
    cannot fake."""
    from fortymhz_spark.operators.partitioning import spread_scan
    from fortymhz_spark.operators.text import token_count

    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    if len(set(thresholds)) != len(thresholds):
        raise ValueError(f"duplicate thresholds: {sorted(thresholds)}")
    # Round-13: the per-doc tokenize+hash fold feeding every
    # conditional sum runs on the scan's partitioning — spread first
    # (no-op at scale, see partitioning.spread_scan).
    df = spread_scan(df)
    # Bind the (O(len(text)) fold) score and token count ONCE in their
    # own projection — every threshold's pair of conditional sums then
    # reads the bound columns; referencing the raw expressions from
    # 2×|thresholds| aggregates would embed the tokenize+hash fold
    # that many times per row (the hashed_linear_score CollapseProject
    # discipline).
    s = F.col(score) if isinstance(score, str) else score
    ntok = token_count(F.coalesce(F.col(text_col), F.lit("")))
    scored = df.select(s.alias("__score__"), ntok.alias("__ntok__"))
    aggs = []
    for i, t in enumerate(thresholds):
        keep = F.col("__score__") >= F.lit(int(t))
        aggs.append(
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias(f"__d{i}__")
        )
        aggs.append(
            F.sum(F.when(keep, F.col("__ntok__")).otherwise(0))
            .cast("long")
            .alias(f"__t{i}__")
        )
    one = scored.agg(*aggs)
    # unpivot by exploding ONE literal-indexed struct array over the
    # 1-row aggregate — a union of per-threshold selects would copy
    # the aggregate subtree |thresholds| times into the plan and
    # re-execute it per branch, breaking the one-scan claim
    pairs = F.array(
        *[
            F.struct(
                F.lit(int(t)).cast("long").alias("threshold"),
                F.coalesce(F.col(f"__d{i}__"), F.lit(0)).alias(
                    "n_docs_kept"
                ),
                F.coalesce(F.col(f"__t{i}__"), F.lit(0)).alias(
                    "n_tokens_kept"
                ),
            )
            for i, t in enumerate(thresholds)
        ]
    )
    return one.select(F.explode(pairs).alias("r")).select(
        "r.threshold", "r.n_docs_kept", "r.n_tokens_kept"
    )
