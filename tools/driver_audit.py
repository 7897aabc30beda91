#!/usr/bin/env python
"""Driver-gate rehearsal: run EVERY registered oracle-backed query at
sf0.01 (the driver's correctness scale) through the differential
checker, dtype traps armed, exactly as `CORRECTNESS_r{N}.json` will.

The regular test suite runs the same comparison at sf0.001 for speed;
this tool is the pre-round rehearsal at the real gate scale (value
overflow/precision behavior can be SF-dependent).

Run:  python tools/driver_audit.py [sf_dir]
Exit status 1 if any query fails.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    from diffcheck import compare, make_oracle_conn

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .appName("driver-audit")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    con = make_oracle_conn(sf_dir)
    failed = []
    gate = list(qs)[:50]
    for i, name in enumerate(qs):
        tag = "GATE" if name in gate else "post"
        if name not in osql:
            try:
                n = qs[name](spark, sf_dir).count()
                print(f"[{tag}] {name}: rows-only, {n} rows")
            except Exception as ex:
                failed.append(name)
                print(f"[{tag}] {name}: ERROR {type(ex).__name__}: {str(ex)[:120]}")
            continue
        try:
            problems = compare(qs[name](spark, sf_dir), con, osql[name])
        except Exception as ex:
            problems = [f"ERROR {type(ex).__name__}: {str(ex)[:120]}"]
        if problems:
            failed.append(name)
            print(f"[{tag}] {name}: FAIL {problems[:3]}")
        else:
            print(f"[{tag}] {name}: ok")
    print(f"\n{len(qs) - len(failed)}/{len(qs)} green at {sf_dir}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
