"""Vector math over ``array<float>`` embedding columns — JVM-side only.

Everything here compiles to Catalyst higher-order functions
(``zip_with`` + ``aggregate``), so the hot loop runs inside whole-stage
codegen with zero Python/Arrow boundary.  For 64-dim embeddings this is
the right default; a pandas-UDF/BLAS path only wins for very wide
vectors with large candidate sets (operators/similarity.py provides it).

Determinism note: ``aggregate`` is a sequential left fold in array
order, so double accumulation is order-fixed and reproducible — the
same value on every run, partitioning, and (for differential testing)
in any engine that folds left.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _colified(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Left-fold dot product in double precision."""
    a, b = _colified(a), _colified(b)
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    a = _colified(a)
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL-safe on zero-norm vectors (returns NULL)."""
    a, b = _colified(a), _colified(b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom)
