"""Physical-layout operators: bucketing, salted aggregation, layout
writers — the techniques that remove or tame shuffles at 100 TB.

None of this exists in the reference (its one layout decision is
round-robin Kafka partitions carrying no semantics,
``/root/reference/code/test/simulate_stream.py:16-20``); these are the
TARGET-scale tools (SURVEY.md §7 Phase 5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# bucketed tables — co-located joins with zero join-time shuffle
# ---------------------------------------------------------------------------


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    *,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by key.

    Two fact tables bucketed identically join with NO exchange on
    either side (asserted in tests/test_partitioning.py): at 100 TB
    this converts every recurring fact-fact join on the bucket key
    from a full 2-sided shuffle into a local zip of bucket files —
    the single biggest recurring-cost lever in a star/snowflake
    pipeline.  Choose ``num_buckets`` ≈ data-size / target-task-size
    (and keep it stable across tables that join together).
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


# ---------------------------------------------------------------------------
# salted aggregation — skewed-key groupBy without a hot reducer
# ---------------------------------------------------------------------------

_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
_FIRST = {
    "sum": F.sum,
    "count": lambda c: F.count(F.lit(1)) if c == "*" else F.count(c),
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str | Column]],
    *,
    salt: int = 16,
) -> DataFrame:
    """Two-stage aggregation with an explicit salt: ``groupBy(keys +
    salt)`` partial, then ``groupBy(keys)`` merge.

    ``aggs`` maps output name → (fn, col) with fn ∈ sum/count/min/max
    (the algebraic aggregates, which decompose into partial+merge).

    Spark already plans map-side partial aggregation; what salting
    adds is splitting ONE pathological key across ``salt`` reducers in
    the first shuffle, so a key holding 30% of all rows costs ~30%/salt
    per task instead of one straggler task.  Use when a groupBy key is
    known skewed (AQE fixes skewed *joins*, not skewed aggregations —
    partial agg usually absorbs skew, but not for high-cardinality
    per-group state like collect_list/distinct-style work).
    """
    salted = df.withColumn(
        "__salt__", F.pmod(F.monotonically_increasing_id(), F.lit(salt))
    )
    partial = salted.groupBy(*keys, "__salt__").agg(
        *[
            _FIRST[fn](col).alias(f"__p_{name}__")
            for name, (fn, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGE[fn](f"__p_{name}__").alias(name)
            for name, (fn, col) in aggs.items()
        ]
    )


# ---------------------------------------------------------------------------
# layout writers — partition pruning for time/tenant-sliced reads
# ---------------------------------------------------------------------------


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    *,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Write parquet hive-partitioned by low-cardinality columns so
    predicate-matching reads touch only matching directories
    (partition pruning — the scan never lists the rest).  Pair with
    ``sortWithinPartitions`` upstream for min/max page-skipping within
    files."""
    writer = df.write.mode(mode).partitionBy(*partition_cols)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


# ---------------------------------------------------------------------------
# Z-order clustering — multi-column data skipping for the write side
# ---------------------------------------------------------------------------


def zorder_key(
    cols: list[tuple[Column | str, float, float]], *, bits: int = 16
) -> Column:
    """Morton (Z-order) key over ``cols``: each column is normalized
    into ``[0, 2^bits)`` using its declared ``(col, lo, hi)`` bounds
    and the bit planes are interleaved — rows close in EVERY dimension
    get close keys, so sorting/range-partitioning the write by this
    key clusters multi-dimensional neighborhoods into the same files
    and row groups.

    Why it matters at 100 TB: parquet min/max skipping works per
    column, but a single-column sort only tightens ONE column's
    per-file ranges — a predicate on the other columns still scans
    everything.  Z-ordering tightens every declared column's file
    ranges simultaneously (the Delta/Iceberg OPTIMIZE ZORDER idea),
    so a 2-D box predicate prunes to ~the box's fraction of files
    instead of a full stripe (asserted as a file-count ratio in
    tests/test_partitioning.py).

    Pure integer column arithmetic (floor-normalize, clamp, then
    bit-test via shift-and-mask with LITERAL shift amounts — a python
    loop over ``bits x len(cols)`` cheap terms), deterministic and
    engine-portable.  Bounds are declared, not discovered: a layout
    key must not depend on a full data scan, and out-of-range values
    clamp to the edge bins (they cluster at the boundary instead of
    corrupting the interleave).  Total key width ``bits * len(cols)``
    must fit a BIGINT (≤ 62 used here).  NULL and NaN values map to
    bin 0 (the low edge) rather than erroring or silently clamping
    high — layout keys must be total functions of the row.
    """
    if not cols:
        raise ValueError("zorder_key needs at least one (col, lo, hi)")
    if bits * len(cols) > 62:
        raise ValueError(
            f"bits={bits} x {len(cols)} cols exceeds a BIGINT key"
        )
    n = len(cols)
    planes = []
    for i, (c, lo, hi) in enumerate(cols):
        if not hi > lo:
            raise ValueError(f"bounds must satisfy hi > lo, got ({lo}, {hi})")
        col = F.col(c) if isinstance(c, str) else c
        cold = col.cast("double")
        # Clamp on the DOUBLE side, before the long cast: ±Infinity or
        # a huge finite value (1e300) would otherwise overflow the
        # BIGINT cast and die under ANSI mode — the key must be a
        # total function of the row.  greatest/least on doubles are
        # safe for ±inf (they compare fine), and the clamped range
        # [0, 2^bits - 1] always fits a long.
        scaled = F.floor(
            F.greatest(
                F.lit(0.0),
                F.least(
                    F.lit(float((1 << bits) - 1)),
                    (cold - F.lit(float(lo)))
                    / F.lit(float(hi - lo))
                    * F.lit(float(1 << bits)),
                ),
            )
        ).cast("long")
        # greatest/least skip NULLs, so a NULL value would silently
        # clamp HIGH to the max bin, and NaN poisons comparisons —
        # route both to bin 0 explicitly (they cluster at the low
        # edge, same contract as out-of-range lows).
        cell = F.when(
            cold.isNull() | F.isnan(cold), F.lit(0).cast("long")
        ).otherwise(scaled)
        planes.append((i, cell))
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, cell in planes:
            bit = F.shiftright(cell, b).bitwiseAND(F.lit(1))
            key = key + bit * F.lit(1 << (b * n + i)).cast("long")
    return key


# ---------------------------------------------------------------------------
# scan-spread — parallelize CPU-heavy map phases over under-split scans
# ---------------------------------------------------------------------------


def spread_scan(df: DataFrame) -> DataFrame:
    """Ensure a scan parallelizes before CPU-heavy per-row work.

    A small corpus in one parquet file (or one row group — Spark cannot
    split below row-group granularity, so ``maxPartitionBytes``/
    ``minPartitionNum`` cannot help) is ONE input partition, which
    serializes all per-row map work — tokenization, shingling, hashing,
    exact-decimal aggregation — onto a single core while the rest of
    the cluster idles.  At 100 TB the input is naturally thousands of
    splits and this is a NO-OP (the guard below); the round-robin
    repartition only fires when the scan has fewer partitions than the
    cluster has slots, and it shuffles the raw input bytes once —
    cheap next to the map work it parallelizes, by construction only
    applied where that work dominates.

    ``df.rdd.getNumPartitions()`` is the ACTUAL scan partition count.
    ``inputFiles()`` is not a usable proxy in either direction: many
    small files bin-pack into few scan partitions (openCostInBytes),
    and one large file splits into many — both misjudge the spread.
    The plan→RDD conversion is driver-side planning only (ms, no job).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
