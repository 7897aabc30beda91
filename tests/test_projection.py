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


def test_projection_paths_agree_and_expr_is_jvm_side(spark, emb):
    m = fit_pca(emb, 8)
    key = lambda r: (r["vec_id"], tuple(r["projected"]))
    expr_rows = sorted(
        map(key, apply_projection(emb, m).select(
            "vec_id", "projected").collect())
    )
    arrow_rows = sorted(
        map(key, apply_projection(emb, m, method="arrow").select(
            "vec_id", "projected").collect())
    )
    assert expr_rows == arrow_rows
    plan = (
        apply_projection(emb, m)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # map-only
    with pytest.raises(ValueError, match="method must be"):
        apply_projection(emb, m, method="gemm")


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
