"""Custom Python data source: synthetic DT-hit generator (``dthits``).

The reference's only data feed is a CSV replayed through Kafka by hand
(``/root/reference/code/test/simulate_stream.py``).  Here the generator
is a first-class Spark source via the Python Data Source API
(pyspark.sql.datasource, Spark 4): ``spark.read.format("dthits")`` for
bounded reads and ``spark.readStream.format("dthits")`` for an
unbounded orbit stream — the "custom source" the north star asks for,
usable anywhere a built-in source is.

Generation is *pure integer arithmetic* on (orbit, hit-index) — no RNG
— so the emitted rows are reproducible at any partitioning AND
mirrorable in SQL: the DuckDB oracle reproduces the source exactly with
``generate_series`` (queries/dt.py::q_dt_custom_source_occupancy).
Scale: one InputPartition per orbit range → scan parallelism scales
with ``numPartitions``, not generator state; each partition generates
independently (no driver bottleneck, no shared state).

Row formula (HEAD always 2; ranges mirror the fixture, SURVEY.md §1.2):

    n_hits(o)      = o % 5 + 2                  (2..6 hits per orbit)
    FPGA(o,h)      = (o + h) % 2
    TDC_CHANNEL    = (7·o + 13·h) % 128 + 1
    BX_COUNTER     = (101·o + 59·h) % 3564
    TDC_MEAS       = (3·o + 11·h) % 30 + 1
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

DT_HITS_DDL = (
    "HEAD smallint, FPGA smallint, TDC_CHANNEL int, "
    "ORBIT_CNT bigint, BX_COUNTER int, TDC_MEAS int"
)

ORBIT_EPOCH = 2_252_000_000  # fixture-realistic orbit counter base


def hits_for_orbit(o: int) -> Iterator[tuple]:
    """All hit rows of relative orbit ``o`` (pure function)."""
    for h in range(o % 5 + 2):
        yield (
            2,
            (o + h) % 2,
            (7 * o + 13 * h) % 128 + 1,
            ORBIT_EPOCH + o,
            (101 * o + 59 * h) % 3564,
            (3 * o + 11 * h) % 30 + 1,
        )


class _OrbitRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class DTHitsBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_orbits = int(options.get("norbits", 100))
        self.num_partitions = int(options.get("numpartitions", 8))

    def partitions(self):
        per = max(1, -(-self.n_orbits // self.num_partitions))
        return [
            _OrbitRange(lo, min(lo + per, self.n_orbits))
            for lo in range(0, self.n_orbits, per)
        ]

    def read(self, partition: _OrbitRange) -> Iterator[tuple]:
        for o in range(partition.start, partition.end):
            yield from hits_for_orbit(o)


class DTHitsStreamReader(SimpleDataSourceStreamReader):
    """Unbounded orbit stream: each micro-batch advances the orbit
    cursor by ``orbitsPerBatch`` (the reference's ``batch_size`` knob,
    ``core.py:12``, as a source option).  Offsets are plain orbit
    counters, so checkpoint restart resumes exactly."""

    def __init__(self, options):
        self.orbits_per_batch = int(options.get("orbitsperbatch", 10))
        self.max_orbits = int(options.get("norbits", 1_000_000_000))

    def initialOffset(self) -> dict:
        return {"orbit": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = start["orbit"]
        hi = min(lo + self.orbits_per_batch, self.max_orbits)
        # a materialized list, not a generator: the runner pickles the
        # iterator into its prefetch cache (bounded by orbits_per_batch)
        rows = [r for o in range(lo, hi) for r in hits_for_orbit(o)]
        return iter(rows), {"orbit": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # deterministic generation → exact replay for recovery
        for o in range(start["orbit"], end["orbit"]):
            yield from hits_for_orbit(o)


class DTHitsDataSource(DataSource):
    """``spark.read.format("dthits").option("nOrbits", 500)`` /
    ``spark.readStream.format("dthits").option("orbitsPerBatch", 50)``."""

    @classmethod
    def name(cls) -> str:
        return "dthits"

    def schema(self) -> str:
        return DT_HITS_DDL

    def reader(self, schema) -> DTHitsBatchReader:
        return DTHitsBatchReader(self.options)

    def simpleStreamReader(self, schema) -> DTHitsStreamReader:
        return DTHitsStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the source with a session."""
    spark.dataSource.register(DTHitsDataSource)
