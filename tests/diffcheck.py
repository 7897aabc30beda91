"""Local mirror of the driver's duckdb-oracle differential check.

Runs a Spark query and its oracle SQL side by side, sorts columns by
name and rows by value, and compares cell-for-cell.  Stricter than the
driver's hash in one way: it reports the first differing cell instead
of a bare mismatch.
"""

from __future__ import annotations

import math
import os

import duckdb
from pyspark.sql import DataFrame


def make_oracle_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def _normalize(rows: list[tuple], cols: list[str]):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def keyify(v):
        if v is None:
            return (0, "")
        if isinstance(v, float):
            return (1, repr(v))
        return (1, str(v))

    data = [tuple(r[i] for i in order) for r in rows]
    data.sort(key=lambda r: tuple(keyify(v) for v in r))
    return [cols[i] for i in order], data


def _dtype_traps(df: DataFrame, rel) -> list[str]:
    """The driver's value-hash distinguishes pandas dtypes, so catch
    the known representational traps at test time: DuckDB HUGEINT /
    DECIMAL outputs (render as python objects / float128-ish, hash
    differently from Spark's BIGINT/DOUBLE even when values match) and
    array/struct cells (crash the driver's canonicalizer).  int32 vs
    int64 and date vs datetime are driver-tolerated (verified r1→r2).
    """
    problems = []
    duck_types = {c: str(t).upper() for c, t in zip(rel.columns, rel.types)}
    for field in df.schema:
        spark_t = field.dataType.simpleString()
        if spark_t.startswith(("array", "struct", "map")):
            problems.append(f"col {field.name}: spark type {spark_t} "
                            "(driver canonicalizer cannot sort it)")
        duck_t = duck_types.get(field.name)
        if duck_t is None:
            continue
        if duck_t == "HUGEINT" or duck_t.startswith("DECIMAL"):
            problems.append(
                f"col {field.name}: oracle returns {duck_t} vs spark {spark_t} "
                "(driver hash mismatch — CAST the oracle output)"
            )
        if duck_t.startswith(("STRUCT", "MAP")) or duck_t.endswith("[]"):
            problems.append(f"col {field.name}: oracle type {duck_t} "
                            "(driver canonicalizer cannot sort it)")
    return problems


def compare(df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    spark_rows = [tuple(r) for r in df.collect()]
    spark_cols = df.columns
    rel = con.sql(sql)
    problems.extend(_dtype_traps(df, rel))
    duck_cols = list(rel.columns)
    duck_rows = [tuple(r) for r in rel.fetchall()]

    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}")

    cols, s_norm = _normalize(spark_rows, spark_cols)
    _, d_norm = _normalize(duck_rows, duck_cols)
    for i, (sr, dr) in enumerate(zip(s_norm, d_norm)):
        for c, (sv, dv) in enumerate(zip(sr, dr)):
            same = sv == dv
            if not same and isinstance(sv, float) and isinstance(dv, float):
                same = (math.isnan(sv) and math.isnan(dv)) or sv == dv
            if not same:
                problems.append(
                    f"row {i} col {cols[c]}: spark={sv!r} duck={dv!r}"
                )
                if len(problems) > 5:
                    return problems
    return problems
