from __future__ import annotations

import pytest

from fortymhz_spark.session import get_session

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_session("fortymhz-tests", master="local[8]", shuffle_partitions=8)
    # Round-14 suite-wall optimization: AQE adds one driver round trip
    # (query-stage materialization + re-optimization) per exchange,
    # which at sf0.001 test scale is pure fixed overhead — measured
    # 2.2-3.3 s/query with AQE on vs 1.1-1.6 s/query off over an
    # 8-query representative sweep, i.e. roughly half the suite's
    # wall.  Results are partition/plan-shape independent by the
    # repo's own discipline (asserted by test_partition_independence),
    # and AQE's runtime behaviors (skew split, coalescing) keep their
    # dedicated tests, which set spark.sql.adaptive.enabled
    # themselves.  The PRODUCT posture is unchanged: session.py still
    # ships AQE on, and bench.py/driver runs use it.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL
