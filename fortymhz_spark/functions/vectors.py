"""Vector math over ``array<float>`` embedding columns — JVM-side only.

Everything here compiles to Catalyst higher-order functions
(``zip_with`` + ``aggregate``), so the hot loop runs inside whole-stage
codegen with zero Python/Arrow boundary.  For 64-dim embeddings this is
the right default; a pandas-UDF/BLAS path only wins for very wide
vectors with large candidate sets
(``operators/similarity.py::brute_force_knn_arrow`` provides it).

Determinism note: ``aggregate`` is a sequential left fold in array
order, so double accumulation is order-fixed and reproducible — the
same value on every run, partitioning, and (for differential testing)
in any engine that folds left.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _colified(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def array_lit_d(vals) -> Column:
    """``array<double>`` literal via ONE ``F.expr`` parse.

    ``F.lit(list)`` costs one py4j round trip per element (~1 ms each —
    a 1024-weight table is ~1 s of pure driver time, rebuilt per call).
    ``repr(float)`` round-trips IEEE-754 exactly and Spark's double
    parse is Java ``Double.parseDouble``, so the literal is
    value-identical; constant folding collapses both forms to the same
    ``Literal`` node.  Non-finite values fall back to ``F.lit``."""
    fv = [float(x) for x in vals]
    if all(math.isfinite(x) for x in fv):
        return F.expr("array(" + ", ".join(repr(x) + "D" for x in fv) + ")")
    return F.lit(fv)


def array_lit_l(vals) -> Column:
    """``array<bigint>`` literal via ONE ``F.expr`` parse — the integer
    twin of :func:`array_lit_d` (``F.lit(int)`` maps to LongType, as
    does the ``L`` suffix, so element types match the old form)."""
    return F.expr("array(" + ", ".join(f"{int(x)}L" for x in vals) + ")")


def _dot_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, "
        "(x, y) -> cast(x as double) * cast(y as double)), 0.0D, "
        "(acc, v) -> acc + v)"
    )


def _l2_sql(a: str) -> str:
    return (
        f"sqrt(aggregate(transform({a}, "
        "x -> cast(x as double) * cast(x as double)), 0.0D, "
        "(acc, v) -> acc + v))"
    )


# Round-13 optimization (guide §1.2 step 2 / §7.3): the Column-API form
# of these folds costs ~10-30 py4j round-trips per call; the hot ANN
# callers (operators/similarity.py) build thousands of them per query.
# When both inputs are PLAIN COLUMN NAMES the identical expression tree
# is built with one ``F.expr`` parse.  Column-object inputs keep the
# original Column construction: rendering an arbitrary Column to SQL
# text is not sound (arithmetic renders prefix-style ``*(a, 2)``, and
# lambda variables from an enclosing higher-order function do not
# re-bind through a parse — measured, not hypothetical), and the
# Column-passing call sites (projection/PCA, one query literal) are
# construction-cold anyway.


def _dot_col(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def _l2_col(a: Column) -> Column:
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Left-fold dot product in double precision."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_dot_sql(f"`{a}`", f"`{b}`"))
    return _dot_col(_colified(a), _colified(b))


def l2_norm(a: Column | str) -> Column:
    if isinstance(a, str):
        return F.expr(_l2_sql(f"`{a}`"))
    return _l2_col(_colified(a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL-safe on zero-norm vectors (returns NULL).

    The dot and norm folds are LET-BOUND once via a one-element
    transform scope (round-13, guide §1.2 step 2): higher-order
    functions evaluate interpreted (no codegen subexpression
    elimination), and the naive ``WHEN denom > 0 THEN dot / denom``
    form re-evaluates both norm folds in the branch — 5 folds per row
    instead of 3 for the same value.  Arithmetic (fold order, cast
    points, the ``na·nb`` product, the division) is unchanged, so the
    result is bit-identical — the DuckDB differential over the cosine
    queries pins that."""
    if isinstance(a, str) and isinstance(b, str):
        sa, sb = f"`{a}`", f"`{b}`"
        return F.expr(
            "element_at(transform(array(named_struct("
            f"'d', {_dot_sql(sa, sb)}, "
            f"'n', {_l2_sql(sa)} * {_l2_sql(sb)})), "
            "s -> CASE WHEN s.n > 0 THEN s.d / s.n END), 1)"
        )
    a, b = _colified(a), _colified(b)
    bound = F.struct(
        _dot_col(a, b).alias("d"), (_l2_col(a) * _l2_col(b)).alias("n")
    )
    return F.element_at(
        F.transform(
            F.array(bound),
            lambda s: F.when(s["n"] > 0, s["d"] / s["n"]),
        ),
        1,
    )


def int8_quant_sq_err_e15(vec: Column | str) -> Column:
    """Total squared reconstruction error of symmetric int8 (max-abs)
    quantization, scaled by 1e15 and floored per element to BIGINT.

    The storage-compression audit step of an embedding pipeline: each
    component is quantized to ``floor(x·127/max_abs + 0.5)`` and
    dequantized back; the per-element error is integerized BEFORE the
    cross-element sum, so the total is an associative integer sum —
    bit-identical on any partitioning and in any oracle engine (a
    double sum of the raw errors would be order-sensitive).  All
    arithmetic is +,-,*,/,floor on doubles — no libm — so the
    pre-floor doubles are IEEE-identical across engines.  Zero vectors
    quantize to error 0.  Both the double-cast array and the max-abs
    scalar are let-bound (see operators/text.py::shingle_set) so each
    is evaluated once per row.
    """
    v = _colified(vec)
    xd_expr = F.transform(v, lambda x: x.cast("double"))

    def with_xd(xd: Column) -> Column:
        m_expr = F.aggregate(xd, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))

        def with_m(m: Column) -> Column:
            def elem_err(x: Column) -> Column:
                deq = F.floor(x * 127.0 / m + 0.5) * m / 127.0
                return F.floor((x - deq) * (x - deq) * 1e15)

            return F.when(
                m > 0,
                F.aggregate(
                    xd, F.lit(0).cast("long"), lambda acc, x: acc + elem_err(x)
                ),
            ).otherwise(F.lit(0).cast("long"))

        return F.element_at(F.transform(F.array(m_expr), with_m), 1)

    return F.element_at(F.transform(F.array(xd_expr), with_xd), 1)
