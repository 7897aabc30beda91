"""Differential test: every declared query must match its DuckDB oracle
cell-for-cell at sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from fortymhz_spark.queries import all_oracles, all_queries
from tests.conftest import SF_SMALL
from tests.diffcheck import compare, make_oracle_conn

_QUERIES = all_queries()
_ORACLES = all_oracles()


@pytest.fixture(scope="module")
def oracle_con():
    con = make_oracle_conn(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(spark, oracle_con, name):
    df = _QUERIES[name](spark, SF_SMALL)
    problems = compare(df, oracle_con, _ORACLES[name])
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = _QUERIES[name](spark, SF_SMALL)
    assert df.count() >= 0
