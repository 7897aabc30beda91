"""Physical-layout operator tests: bucketed co-located joins (no
exchange), salted aggregation equivalence, partitioned-write pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fortymhz_spark.operators.partitioning import (
    salted_agg,
    write_bucketed,
    write_partitioned,
)
from fortymhz_spark.sources.batch import load_table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    write_bucketed(
        li.select("l_orderkey", "l_extendedprice"),
        "b_li", ["l_orderkey"], 8, path=str(tmp_path / "b_li"),
    )
    write_bucketed(
        orders.select("o_orderkey", "o_totalprice"),
        "b_orders", ["o_orderkey"], 8, path=str(tmp_path / "b_orders"),
    )
    try:
        a = spark.table("b_li")
        b = spark.table("b_orders")
        joined = a.join(b, a.l_orderkey == b.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: neither side shuffles for the join
        assert "Exchange hashpartitioning" not in plan
        # and the result is the same as the plain (shuffling) join
        assert joined.count() == li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_li")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_salted_agg_equals_plain(spark):
    li = load_table(spark, SF, "lineitem")
    got = salted_agg(
        li,
        ["l_returnflag"],
        {
            "n": ("count", "*"),
            "qty_min": ("min", "l_quantity"),
            "qty_max": ("max", "l_quantity"),
            "qty_sum": ("sum", F.col("l_quantity").cast("decimal(12,2)")),
        },
        salt=8,
    )
    want = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_quantity").alias("qty_min"),
        F.max("l_quantity").alias("qty_max"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("qty_sum"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_partitioned_write_prunes(spark, tmp_path):
    li = load_table(spark, SF, "lineitem")
    out = str(tmp_path / "byflag")
    write_partitioned(li, out, ["l_returnflag"])
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    pruned = back.filter(F.col("l_returnflag") == "R")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the flag predicate must be a partition filter, not a data filter
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan.replace("\n", " ") or (
        "PartitionFilters" in plan and "l_returnflag" in plan.split("PartitionFilters")[1][:200]
    )
    assert pruned.count() == li.filter(F.col("l_returnflag") == "R").count()
