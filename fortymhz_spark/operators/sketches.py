"""Bounded-memory frequency sketches.

The exact term-frequency path (explode → groupBy) shuffles every
distinct term; fine for natural-language vocabularies, quadratic pain
for open vocabularies (URLs, n-grams, user ids) at 100 TB.  The
classic fix is a mergeable heavy-hitters summary: per-partition
Misra-Gries with k counters, whose per-partition undercount is at most
(partition tokens)/k, summed at merge — so any term with global
frequency above (total tokens)/k is guaranteed to survive with a
positive lower bound.

Why ``mapInPandas`` and not a column expression: Misra-Gries is a
sequential fold with data-dependent evictions over the whole
partition — exactly the "genuinely can't express it relationally"
case.  One Arrow pass per partition, state is k counters, and the
output (≤ k rows per partition) is what shuffles — never the terms
themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_terms(
    df: DataFrame,
    *,
    text_col: str = "text",
    k: int | None = 20,
    counters: int = 200,
) -> DataFrame:
    """Top-``k`` terms by Misra-Gries lower-bound count.

    Returns (term, est_count) with est_count ≤ true count and every
    term whose true frequency exceeds total_tokens/``counters``
    guaranteed present before the top-k cut (tested against the exact
    counts in tests/test_properties.py).  ``k=None`` returns the FULL
    merged candidate set (up to counters × partitions rows) — the form
    a containment check must join against, since the guarantee covers
    candidates and a top-k cut ranks by UNDERcounted estimates (a true
    heavy hitter can sit below the cut).  Tokenization matches
    ``operators/text.py::tokens`` (single-space split, empties
    dropped, lowercased).
    """
    if (k is not None and k < 1) or counters < 1:
        raise ValueError(f"need k >= 1 (or None) and counters >= 1, got {k=} {counters=}")
    out_schema = "term string, cnt long"

    def summarize(batches):
        import pandas as pd

        counts: dict[str, int] = {}
        for pdf in batches:
            for t in pdf[text_col]:
                if t is None:
                    continue
                for tok in t.lower().split(" "):
                    if not tok:
                        continue
                    if tok in counts:
                        counts[tok] += 1
                    elif len(counts) < counters:
                        counts[tok] = 1
                    else:
                        # decrement-all: evict zeros (Misra-Gries step)
                        dead = []
                        for key in counts:
                            counts[key] -= 1
                            if counts[key] == 0:
                                dead.append(key)
                        for key in dead:
                            del counts[key]
        if counts:
            yield pd.DataFrame(
                {"term": list(counts), "cnt": list(counts.values())}
            )

    local = df.select(text_col).mapInPandas(summarize, out_schema)
    merged = (
        local.groupBy("term")
        .agg(F.sum("cnt").cast("long").alias("est_count"))
        .orderBy(F.desc("est_count"), F.asc("term"))
    )
    return merged if k is None else merged.limit(k)
