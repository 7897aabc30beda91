"""PCA / dimensionality-reduction tests (operators/projection.py).

The fit must be DETERMINISTIC at any partition count (integer moment
partials — the module's core discipline), numerically faithful to the
textbook covariance PCA, and the two apply paths (JVM expression vs
Arrow GEMM) must agree."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fortymhz_spark.operators.projection import (
    apply_projection,
    fit_pca,
    pca_audit,
)
from fortymhz_spark.sources.batch import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings")


def test_fit_matches_numpy_and_is_orthonormal(spark, emb):
    m = fit_pca(emb, 8)
    C = np.asarray(m.components)
    assert np.abs(C @ C.T - np.eye(8)).max() < 1e-9
    X = np.asarray(
        [r["embedding"] for r in emb.select("embedding").collect()],
        dtype=np.float64,
    )
    Xc = X - X.mean(0)
    w = np.linalg.eigvalsh(Xc.T @ Xc / len(X))[::-1]
    # 16-bit quantization bounds the moment perturbation well below 1e-5
    assert np.abs(np.asarray(m.explained) - w[:8]).max() < 1e-5
    assert abs(m.total_var - w.sum()) < 1e-5
    # PCA beats the uniform k/dim variance share unless the spectrum
    # is exactly flat
    assert m.variance_captured > m.k / m.dim


def test_fit_is_partition_invariant_bit_for_bit(spark, emb):
    """Float partial sums would make the components depend on the
    partitioning; the integer-moment design makes the whole model —
    mean, components, eigenvalues — EXACTLY equal at hostile
    partition counts."""
    a = fit_pca(emb, 8)
    b = fit_pca(emb.repartition(13), 8)
    assert a == b


def test_fit_merge_level_is_bit_identical_and_bounds_the_collect(
    spark, emb
):
    """The two-level reduce (merge_fanin) caps the driver collect at
    merge_fanin rows regardless of input partitioning, and — because
    the integer statistic is associative — the model must be BIT
    identical across: direct reduce (fanin disabled), merge forced at
    fanin 1 (everything through one merge task), fanin 3 (a real
    multi-task merge tree), and an adversarial 64-partition scan of a
    60-row frame (most partials empty)."""
    direct = fit_pca(emb, 8, merge_fanin=None)
    assert fit_pca(emb.repartition(7), 8, merge_fanin=1) == direct
    assert fit_pca(emb.repartition(11), 8, merge_fanin=3) == direct
    assert fit_pca(emb.repartition(64), 8, merge_fanin=4) == direct
    # below-threshold scans skip the extra level entirely (the
    # fixture-scale single-stage plan): same model either way
    assert fit_pca(emb.coalesce(2), 8, merge_fanin=64) == direct


def test_projection_paths_agree_and_expr_is_jvm_side(spark, emb):
    m = fit_pca(emb, 8)
    expr = {
        r["vec_id"]: r["projected"]
        for r in apply_projection(emb, m).select(
            "vec_id", "projected").collect()
    }
    arrow = {
        r["vec_id"]: r["projected"]
        for r in apply_projection(emb, m, method="arrow").select(
            "vec_id", "projected").collect()
    }
    assert set(expr) == set(arrow)
    # the contract is equality up to IEEE summation order (the expr
    # fold is strict left-to-right; BLAS GEMM may block/FMA) — assert
    # a summation-order-sized tolerance, not bitwise equality
    for k in expr:
        assert max(
            abs(x - y) for x, y in zip(expr[k], arrow[k])
        ) < 1e-12
    plan = (
        apply_projection(emb, m)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # map-only
    with pytest.raises(ValueError, match="method must be"):
        apply_projection(emb, m, method="gemm")


def test_projection_paths_agree_on_null_vectors(spark, emb):
    """Both apply paths must map a NULL vector to k NULLs — the rows
    fit_pca skips must not crash the Arrow twin or diverge from the
    expr form."""
    m = fit_pca(emb, 4)
    with_null = emb.select(
        "vec_id",
        F.when(F.col("vec_id") % 50 == 0, F.lit(None)).otherwise(
            F.col("embedding")
        ).alias("embedding"),
    )
    for method in ("expr", "arrow"):
        rows = apply_projection(with_null, m, method=method).select(
            "vec_id", "projected"
        ).collect()
        nulls = [r for r in rows if r["vec_id"] % 50 == 0]
        assert nulls and all(
            r["projected"] is None or list(r["projected"]) == [None] * 4
            for r in nulls
        ), method


def test_truncated_model_equals_refit(spark, emb):
    m8 = fit_pca(emb, 8)
    assert m8.truncated(2) == fit_pca(emb, 2)
    assert m8.truncated(8) == m8
    with pytest.raises(ValueError, match="outside"):
        m8.truncated(9)


def test_fit_rejects_non_finite_coordinates(spark, emb):
    """A NaN coordinate must raise loudly — quantized it would become
    INT64_MIN and silently poison the covariance."""
    poisoned = emb.select(
        "vec_id",
        F.when(
            F.col("vec_id") == 7,
            F.array(
                F.lit(float("nan")),
                *[F.lit(0.0)] * 63,
            ),
        ).otherwise(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("embedding"),
    )
    with pytest.raises(Exception, match="[Nn]on-finite"):
        fit_pca(poisoned, 4)


def test_reconstruction_error_is_monotone_in_k(spark, emb):
    errs = {}
    for k in (2, 8, 16):
        errs[k] = pca_audit(emb, fit_pca(emb, k)).first()["mean_recon_err"]
    assert errs[16] < errs[8] < errs[2]
    assert errs[2] >= 0.0


def test_fit_validation_and_null_handling(spark, emb):
    with pytest.raises(ValueError, match="k must be"):
        fit_pca(emb, 0)
    with pytest.raises(ValueError, match="exceeds dim"):
        fit_pca(emb, 65)
    # NULL vectors are skipped, not crashed on
    with_null = emb.select(
        "vec_id",
        F.when(F.col("vec_id") == 0, F.lit(None)).otherwise(
            F.col("embedding")
        ).alias("embedding"),
    )
    m = fit_pca(with_null, 4)
    full = fit_pca(emb.filter(F.col("vec_id") != 0), 4)
    assert m == full
    # ragged dims raise loudly
    ragged = emb.select(
        "vec_id", F.slice("embedding", 1, 32).alias("embedding")
    ).limit(10).union(emb.select("vec_id", "embedding").limit(10))
    with pytest.raises(Exception, match="ragged"):
        fit_pca(ragged, 4, dim=32)


def test_pca_recovers_planted_principal_direction(spark):
    """A synthetic anisotropic cloud: variance 100× larger along one
    planted axis — the first component must align with it (|cos| >
    0.99) and capture the dominant variance share."""
    rows = []
    d = 16
    for i in range(400):
        # deterministic pseudo-noise, ±1-ish, plus the planted axis
        base = [((i * 37 + j * 101) % 97 - 48) / 97.0 for j in range(d)]
        t = ((i * 53) % 199 - 99) / 10.0  # spread ~[-9.9, 9.9]
        vec = [base[j] + (t if j == 3 else 0.0) for j in range(d)]
        rows.append((i, vec))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    m = fit_pca(df, 2, dim=d)
    c0 = np.asarray(m.components[0])
    assert abs(c0[3]) > 0.99
    assert m.explained[0] / m.total_var > 0.8


def test_projection_composes_with_ann_family(spark, emb, tmp_path):
    """The pipeline the operator exists for: project to k dims at
    ingest, then run the ANN lifecycle over the PROJECTED column —
    index build, codes at rest, serving — all on `projected` as the
    vector column.  Serving from codes must stay byte-identical to
    the in-plan twin on the projected space."""
    from fortymhz_spark.operators.ann_index import (
        build_ann_codes,
        build_ann_index,
        load_ann_codes,
        load_ann_index,
    )
    from fortymhz_spark.operators.similarity import ivfpq_knn

    m = fit_pca(emb, 16)
    proj = apply_projection(emb, m).select("vec_id", "projected")
    proj = proj.localCheckpoint()  # the ingest-materialized form
    queries = proj.orderBy("vec_id").limit(5)
    idx_dir, codes_dir = str(tmp_path / "idx"), str(tmp_path / "codes")
    build_ann_index(
        proj, idx_dir, vec_col="projected", n_coarse=8, n_sub=8,
        n_cells=16,
    )
    idx = load_ann_index(spark, idx_dir)
    assert idx.dim == 16 and idx.d_sub == 2
    build_ann_codes(
        proj, codes_dir, idx, vec_col="projected", corpus_version=1
    )
    codes = load_ann_codes(spark, codes_dir, idx, corpus_version=1)
    key = lambda r: tuple(r)
    served = ivfpq_knn(
        proj, queries, vec_col="projected", k=5, nprobe=4, rerank=8,
        index=idx, codes=codes,
    ).collect()
    inplan = ivfpq_knn(
        proj, queries, vec_col="projected", k=5, nprobe=4, rerank=8,
        index=idx,
    ).collect()
    assert len(served) == 25
    assert sorted(map(key, served)) == sorted(map(key, inplan))


def test_persisted_moments_extend_and_retract_are_exact(
    spark, emb, tmp_path
):
    """The moments lifecycle: init on a slice, EXTEND with the rest →
    refit byte-identical to a from-scratch fit on the union; RETRACT
    the extension → byte-identical to a fit that never saw it.  Exact
    integers make both directions possible; time travel pins any
    intermediate state."""
    from fortymhz_spark.operators.projection import (
        extend_pca_moments,
        fit_pca_from_moments,
        init_pca_moments,
        retract_pca_moments,
    )

    old = emb.filter(F.col("vec_id") % 4 != 0)
    batch = emb.filter(F.col("vec_id") % 4 == 0)
    td = str(tmp_path / "moments")
    assert init_pca_moments(old, td) == 1
    assert extend_pca_moments(batch, td) == 2
    m_inc = fit_pca_from_moments(spark, td, 8)
    assert m_inc == fit_pca(emb, 8)
    # time travel: the pre-extend version still fits the old corpus
    assert fit_pca_from_moments(spark, td, 8, version=1) == fit_pca(old, 8)
    # decremental: retract the batch → back to the old corpus's model
    assert retract_pca_moments(batch, td) == 3
    assert fit_pca_from_moments(spark, td, 8) == fit_pca(old, 8)
    # over-retraction is refused (n >= 1 floor)
    with pytest.raises(ValueError, match="retracting"):
        retract_pca_moments(emb, td)
    with pytest.raises(ValueError, match="outside"):
        fit_pca_from_moments(spark, td, 0)


def test_moments_empty_delta_is_a_versionless_noop(spark, emb, tmp_path):
    """A dedup pass that admitted/dropped ZERO rows hands the batch
    maintenance an empty (or all-NULL) delta: extend/retract must
    return the current version unchanged — not raise 'no non-NULL
    embeddings to fit on' (the streaming twin already treats it as a
    zero delta; the batch paths must match)."""
    from fortymhz_spark.operators.projection import (
        extend_pca_moments,
        fit_pca_from_moments,
        init_pca_moments,
        retract_pca_moments,
    )

    td = str(tmp_path / "moments")
    assert init_pca_moments(emb, td) == 1
    before = fit_pca_from_moments(spark, td, 4)
    empty = emb.filter(F.lit(False))
    all_null = emb.select(
        "vec_id", F.lit(None).cast("array<float>").alias("embedding")
    ).limit(3)
    assert extend_pca_moments(empty, td) == 1
    assert retract_pca_moments(empty, td) == 1
    assert extend_pca_moments(all_null, td) == 1
    assert retract_pca_moments(all_null, td) == 1
    assert fit_pca_from_moments(spark, td, 4) == before


def test_moments_derived_writes_are_cas_pinned(spark, emb, tmp_path):
    """extend/retract (and the streaming sink) are read-modify-write:
    their publish must be CAS-pinned to the base version they read, so
    a competing writer's publish vetoes with ConcurrentWriteError
    instead of silently losing its update (the derived-write contract
    every read-modify-write in the repo follows)."""
    from fortymhz_spark.operators.projection import (
        _load_moments,
        _publish_moments,
        extend_pca_moments,
        init_pca_moments,
    )
    from fortymhz_spark.sources.snapshots import ConcurrentWriteError

    td = str(tmp_path / "moments")
    init_pca_moments(emb.filter(F.col("vec_id") % 2 == 0), td)
    # a stale writer loads v=1 …
    v, params, n, s, ss = _load_moments(spark, td, version=1)
    # … a competitor publishes v=2 meanwhile …
    extend_pca_moments(emb.filter(F.col("vec_id") % 2 == 1), td)
    # … and the stale writer's pinned publish must VETO, not clobber
    with pytest.raises(ConcurrentWriteError):
        _publish_moments(
            spark, td, params, n, s, ss, expected_current=v
        )
