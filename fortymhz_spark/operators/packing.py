"""Sequence packing — batching documents into fixed token budgets.

Training pipelines concatenate documents into fixed-size context
windows ("packing") to avoid padding waste.  The exact bin-packing
problem is NP-hard and inherently sequential, so the scalable form is
the one production pipelines use: deterministic concat-then-split
WITHIN a shard — documents are laid out in a stable order per shard,
token counts are cumulatively summed, and a document lands in pack
``floor(tokens_before_it / budget)``.

Scale shape: one window aggregation partitioned by the shard column —
shards pack in parallel, the per-shard cumsum is the only sequential
dependency (and it is exactly the dependency the semantics require).
No Python, no collect; at 100 TB with file-sized shards each window
partition is bounded by shard size, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    df: DataFrame,
    *,
    token_col: Column | str,
    shard_col: str,
    order_col: str,
    budget: int = 512,
) -> DataFrame:
    """Assign each row a ``pack_id`` (BIGINT, dense within shard) such
    that consecutive rows (in ``order_col`` order within ``shard_col``)
    share a pack until their cumulative token count crosses ``budget``.

    A document that straddles a boundary belongs to the pack where it
    STARTS (its tail is the split part) — the concat-then-split rule.
    Adds ``n_tok``, ``tokens_before`` (within-pack start offset) and
    ``pack_id`` columns.  The division is done in doubles
    (exact for counts < 2^53) so the same expression is portable to any
    oracle engine without integer-division semantics drift.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_cum = df.withColumn("n_tok", tok.cast("long")).withColumn(
        "_cum", F.sum("n_tok").over(w)
    )
    start = F.col("_cum") - F.col("n_tok")
    return (
        with_cum.withColumn(
            "pack_id", F.floor(start / F.lit(float(budget))).cast("long")
        )
        .withColumn(
            "tokens_before", (start - F.col("pack_id") * budget).cast("long")
        )
        .drop("_cum")
    )
