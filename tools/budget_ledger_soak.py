#!/usr/bin/env python
"""ST11 budget-ledger soak: the mark-anchored compaction claim,
measured (the round-8 verdict's scale-killer finding).

Two measurements:

1. STRUCTURAL — run the same N-batch budget-ingest stream with
   compaction ON (ledger_compact_after=8) and OFF (threshold above N):
   report the final ledger row count (the per-trigger collect's input)
   and the two wall times.  With compaction the steady state is one
   absolute row per (writer, group) plus a bounded per-batch tail;
   without it, one row per batch forever.

2. THE TERM COMPACTION REMOVES, at year scale — a long-lived stream's
   per-trigger admit path reads the WHOLE ledger (one year at
   1 batch/min ≈ 0.5 M rows × groups).  Local streams can't run for a
   year, so time the admit-path reconstruction directly: a synthetic
   committed history of B batches × G groups as (a) per-batch
   increment rows (the pre-compaction shape) vs (b) its compacted
   G-row absolute form — same totals, same snapshot read + collect +
   sum the sink's body performs per trigger.

Run:  python tools/budget_ledger_soak.py [--batches 24] [--year-rows 500000]
Prints a markdown table.
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_stream(spark, root: str, n_batches: int, compact_after: int) -> dict:
    """One availableNow budget-ingest run over n_batches single-doc
    files; returns wall time and final ledger row count."""
    from pyspark.sql import functions as F  # noqa: F401

    from fortymhz_spark.sources.snapshots import read_snapshot
    from fortymhz_spark.streaming.sinks import start_budget_ingest_sink

    os.makedirs(root, exist_ok=True)
    src = os.path.join(root, "incoming")
    os.makedirs(src)
    schema = "doc_id long, source string, text string"
    for i in range(n_batches):
        staging = os.path.join(root, f"stage{i}")
        spark.createDataFrame(
            [(i, "A", f"w{i}a w{i}b")], schema
        ).coalesce(1).write.json(staging)
        part = glob.glob(staging + "/part-*.json")[0]
        # mtime ordering does not matter here: any batch split admits
        # the same docs (every doc fits the budget)
        shutil.copy(part, os.path.join(src, f"{i:05d}.json"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    t0 = time.perf_counter()
    q = start_budget_ingest_sink(
        stream,
        os.path.join(root, "corpus"),
        os.path.join(root, "ledger"),
        os.path.join(root, "ckpt"),
        10 * n_batches,
        ledger_compact_after=compact_after,
        available_now=True,
    )
    q.awaitTermination(1800)
    wall = time.perf_counter() - t0
    rows = read_snapshot(spark, os.path.join(root, "ledger")).collect()
    return {"wall_s": wall, "ledger_rows": len(rows)}


def time_admit_read(spark, table_dir: str, reps: int = 3) -> float:
    """The sink body's per-trigger ledger term: snapshot read +
    collect + the pre-batch totals fold.  min-of-reps seconds."""
    from fortymhz_spark.sources.snapshots import read_snapshot

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        totals: dict[str, int] = {}
        for r in read_snapshot(spark, table_dir).collect():
            if r["app"] == "w" and int(r["batch_id"]) == 10**9:
                continue  # the replay-exclusion branch, kept honest
            totals[r["group"]] = totals.get(r["group"], 0) + int(
                r["tokens_added"]
            )
        best = min(best, time.perf_counter() - t0)
    return best


def build_year_ledgers(spark, root: str, n_rows: int, groups: int):
    """(uncompacted_dir, compacted_dir): the same committed history as
    per-batch increments vs its absolute per-group form."""
    from pyspark.sql import functions as F

    from fortymhz_spark.sources.snapshots import write_snapshot

    raw = os.path.join(root, "year_raw")
    compact = os.path.join(root, "year_compact")
    n_batches = n_rows // groups
    inc = spark.range(n_rows).select(
        F.lit("w").alias("app"),
        F.concat(F.lit("g"), (F.col("id") % groups).cast("string")).alias(
            "group"
        ),
        (F.col("id") / groups).cast("long").alias("batch_id"),
        F.lit(2).cast("long").alias("tokens_added"),
    )
    write_snapshot(inc, raw, note=f"year ledger: {n_batches} batches")
    write_snapshot(
        inc.groupBy("app", "group")
        .agg(F.sum("tokens_added").alias("tokens_added"))
        .select("app", "group", F.lit(-1).alias("batch_id"), "tokens_added"),
        compact,
        note="year ledger, compacted",
    )
    return raw, compact


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--year-rows", type=int, default=500_000)
    ap.add_argument("--groups", type=int, default=8)
    args = ap.parse_args()

    from fortymhz_spark.session import get_session

    spark = get_session("fmhz-ledger-soak", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="fmhz_ledger_soak_")

    on = run_stream(
        spark, os.path.join(root, "on"), args.batches, compact_after=8
    )
    off = run_stream(
        spark, os.path.join(root, "off"), args.batches,
        compact_after=10**9,
    )
    raw, compact = build_year_ledgers(
        spark, root, args.year_rows, args.groups
    )
    t_raw = time_admit_read(spark, raw)
    t_compact = time_admit_read(spark, compact)

    print("| measurement | compaction ON | compaction OFF |")
    print("|---|---|---|")
    print(
        f"| {args.batches}-batch stream wall | {on['wall_s']:.1f} s "
        f"| {off['wall_s']:.1f} s |"
    )
    print(
        f"| final ledger rows (per-trigger collect input) "
        f"| {on['ledger_rows']} | {off['ledger_rows']} |"
    )
    print(
        f"| per-trigger admit read at year scale "
        f"({args.year_rows} committed increment rows × {args.groups} "
        f"groups) | {t_compact * 1000:.0f} ms ({args.groups} rows) "
        f"| {t_raw * 1000:.0f} ms ({args.year_rows} rows) |"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
