"""Registration-order policy tests.

The driver's correctness gate grades exactly the first 50 registered
queries, so ordering IS evidence policy (see queries/__init__.py).
These tests pin it: every north-star family (LLM dedup/ANN/text, DT
domain, media, events) and every GATE_PRIORITY TPC-H shape must sit in
the first 50 slots, and every gate query that can have an oracle has
one.  A new query registered carelessly would silently push a graded
query past the window — that's what this catches.
"""

from __future__ import annotations

from fortymhz_spark.queries import GATE_PRIORITY, all_oracles, all_queries

GATE_SIZE = 50

NORTHSTAR_PREFIXES = ("q_docs_", "q_emb_", "q_dt_", "q_media_", "q_events_")

# rows-only by design.  Round 3 converted every other former member to
# an oracle-checkable form (recall bounds, error-band booleans, lane
# checksums, portable-hash simhash, neighbor-identity kNN, containment
# heavy-hitters); only the genuinely iterative algorithm remains —
# k-means centroids depend on a driver-side Lloyd loop no single SQL
# statement reproduces.
EXPECTED_ROWS_ONLY = {
    "q_vec_kmeans",
}


def test_gate_holds_every_northstar_query():
    names = list(all_queries())
    gate = set(names[:GATE_SIZE])
    northstar = {n for n in names if n.startswith(NORTHSTAR_PREFIXES)}
    assert northstar <= gate, sorted(northstar - gate)


def test_gate_holds_every_priority_shape():
    gate = set(list(all_queries())[:GATE_SIZE])
    assert set(GATE_PRIORITY) <= gate, sorted(set(GATE_PRIORITY) - gate)


def test_gate_queries_have_oracles_unless_rows_only():
    gate = list(all_queries())[:GATE_SIZE]
    oracles = all_oracles()
    missing = [n for n in gate if n not in oracles and n not in EXPECTED_ROWS_ONLY]
    assert not missing, missing


def test_oracle_output_types_are_hashable():
    """The HUGEINT trap (registry docstring): DuckDB widens integer SUMs
    to INT128, which renders as float64 in pandas and breaks the
    driver's value hash even when every cell matches; array outputs
    crash its canonicalizer outright.  Execute every oracle's type plan
    and assert no output column is HUGEINT / DECIMAL / nested."""
    import sys

    sys.path.insert(0, "tests")
    from diffcheck import make_oracle_conn

    con = make_oracle_conn("/root/testdata/sf0.001")
    bad: list[str] = []
    for name, sql in all_oracles().items():
        rel = con.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ)
            if (
                "HUGEINT" in t
                or "DECIMAL" in t
                or t.endswith("[]")
                or "STRUCT" in t
                or "MAP" in t
            ):
                bad.append(f"{name}.{col}: {t}")
    assert not bad, bad
