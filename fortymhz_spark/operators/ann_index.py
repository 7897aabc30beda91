"""Persisted ANN indexes: train once, serve many.

Every ``pq_knn`` / ``ivf_knn`` / ``ivfpq_knn`` call re-collects a
training sample and re-trains centroids/codebooks in-process — fine
for a one-shot audit, wrong at 100 TB where an index is built once,
versioned, and served by thousands of query jobs.  This module
persists the trained state — coarse centroids, PQ codebooks, and the
sizing params — as a versioned snapshot table
(:mod:`fortymhz_spark.sources.snapshots`), inheriting its atomic CAS
publish, time travel, and concurrent-writer safety for free: an index
rebuild publishes ``v=N+1`` while running queries keep reading the
version they resolved, and a query can pin ``version=`` for exact
reproducibility.

Index state is deliberately TINY relative to the corpus it serves —
``n_coarse × dim + n_sub × n_cells × d_sub`` floats (the same
driver-side footprint the in-process fit already collects), so the
snapshot write/read costs milliseconds and the serving path loads it
with one bounded collect.  The CODES are not persisted: they are a
map-only projection of the corpus through codebook literals, fused
into the corpus scan by the serving query (persisting them would be a
materialized-view decision orthogonal to the index artifact — at
100 TB you'd write them as a column via the snapshot table's MERGE).

One artifact, three access paths: the composed ivfpq index serves
``ivf_knn(index=...)`` (coarse half), ``pq_knn(index=...)``
(codebook half), and ``ivfpq_knn(index=...)`` (both) — each
byte-identical to the in-process fit of the same sizing
(tests/test_ann_recall.py).

Layout: one row per centroid/codeword —
``(component: 'coarse'|'book', s: subquantizer or -1, idx, vec)`` —
with the sizing params JSON in the snapshot ``note`` so a reader can
validate compatibility before touching data.

Reference parity note: the reference engine
(/root/reference/code/dask_kafka/core.py) has no vector-index
surface; this is part of the beyond-reference LLM-pipeline layer
(SURVEY.md §2.9), following the FAISS train/add/search lifecycle
split re-expressed as lakehouse artifacts.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from fortymhz_spark.operators.similarity import (
    _auto_cells,
    _centroids,
    _pq_train,
)
from fortymhz_spark.sources.snapshots import (
    read_snapshot,
    resolve_artifact,
    write_snapshot,
)

_INDEX_SCHEMA = "component string, s int, idx int, vec array<double>"


@dataclass(frozen=True)
class AnnIndex:
    """Driver-side trained ANN state, loaded from (or about to be
    written to) a snapshot table.  ``coarse`` is ``n_coarse × dim``;
    ``books`` is ``n_sub × n_cells × d_sub`` (the exact shapes
    ``ivfpq_knn`` trains in-process, so serving from an index is
    bit-identical to serving from a fresh fit of the same corpus)."""

    kind: str
    coarse: list
    books: list
    dim: int
    n_sub: int
    n_cells: int
    d_sub: int
    version: int = 0

    @property
    def n_coarse(self) -> int:
        return len(self.coarse)


def build_ann_index(
    corpus: DataFrame,
    table_dir: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_coarse: int | None = None,
    n_sub: int = 8,
    n_cells: int = 16,
    train_rounds: int = 8,
    train_sample: int = 512,
    dim: int | None = None,
) -> int:
    """Train an IVFPQ index from ``corpus`` and publish it as the next
    version of the snapshot table at ``table_dir``; returns the
    version number.  Training is EXACTLY ``ivfpq_knn``'s fit path —
    lowest-id coarse seeds (:func:`_centroids`), bounded-sample Lloyd
    codebooks (:func:`_pq_train`), ``n_coarse=None`` → ⌈√N⌉
    (:func:`_auto_cells`) — so a query served from this artifact
    returns byte-identical rows to one that re-fit in-process
    (deterministic fits; pinned by q_emb_ann_ivfpq_persisted).

    Cost: the same two bounded collects the in-process fit pays, one
    tiny parquet write, one atomic manifest commit.  Query-time knobs
    (``nprobe``/``rerank``/``k``) are NOT index state — they resolve
    per query against the serving corpus."""
    spark = corpus.sparkSession
    n_coarse = _auto_cells(corpus, n_coarse)
    coarse = _centroids(corpus, id_col, vec_col, n_coarse)
    d_sub, books = _pq_train(
        corpus, id_col, vec_col, n_sub, n_cells, train_rounds,
        train_sample, dim,
    )
    rows = [
        ("coarse", -1, i, [float(x) for x in c])
        for i, c in enumerate(coarse)
    ] + [
        ("book", s, c, [float(x) for x in books[s][c]])
        for s in range(n_sub)
        for c in range(n_cells)
    ]
    params = {
        "kind": "ivfpq",
        "dim": d_sub * n_sub,
        "n_coarse": len(coarse),
        "n_sub": n_sub,
        "n_cells": n_cells,
        "d_sub": d_sub,
        "train_rounds": train_rounds,
        "train_sample": train_sample,
    }
    df = spark.createDataFrame(rows, _INDEX_SCHEMA)
    return write_snapshot(
        df,
        table_dir,
        note="ann_index " + json.dumps(params, sort_keys=True),
    )


def load_ann_index(
    spark: SparkSession, table_dir: str, *, version: int | None = None
) -> AnnIndex:
    """Load a persisted index (current version, or a pinned
    ``version=`` for time travel) into driver-side literals ready for
    ``ivfpq_knn(index=...)``.  One bounded collect of
    ``n_coarse + n_sub·n_cells`` rows; params come from the snapshot
    note, and the row inventory is validated against them so a
    corrupted or truncated artifact fails loudly here, not as a wrong
    ADC deep in a serving query."""
    version, params = resolve_artifact(
        table_dir, "ann_index ", version=version
    )
    rows = read_snapshot(spark, table_dir, version=version).collect()
    coarse_rows = sorted(
        ((r["idx"], r["vec"]) for r in rows if r["component"] == "coarse")
    )
    book_rows = [
        (r["s"], r["idx"], r["vec"]) for r in rows if r["component"] == "book"
    ]
    coarse = [list(v) for _, v in coarse_rows]
    n_sub, n_cells = int(params["n_sub"]), int(params["n_cells"])
    books: list = [[None] * n_cells for _ in range(n_sub)]
    for s, c, v in book_rows:
        books[s][c] = list(v)
    if len(coarse) != int(params["n_coarse"]) or any(
        cell is None for book in books for cell in book
    ):
        raise ValueError(
            f"ann_index v={version} at {table_dir} is incomplete: "
            f"{len(coarse)}/{params['n_coarse']} coarse rows, "
            f"{sum(c is not None for b in books for c in b)}/"
            f"{n_sub * n_cells} codewords"
        )
    return AnnIndex(
        kind=str(params["kind"]),
        coarse=coarse,
        books=books,
        dim=int(params["dim"]),
        n_sub=n_sub,
        n_cells=n_cells,
        d_sub=int(params["d_sub"]),
        version=version,
    )
