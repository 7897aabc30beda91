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


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """A 100 TB lake accretes files written under different schema
    versions; `mergeSchema` must union them (old files read the new
    column as NULL) and column pruning must still reach the scan."""
    v1 = spark.createDataFrame([(1, "a")], "id long, payload string")
    v2 = spark.createDataFrame(
        [(2, "b", 0.5)], "id long, payload string, score double"
    )
    v1.write.parquet(str(tmp_path / "d"), mode="append")
    v2.write.parquet(str(tmp_path / "d"), mode="append")
    merged = spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "d"))
    assert sorted(merged.columns) == ["id", "payload", "score"]
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 0.5
    # pruned single-column projection still prunes under merged schema
    plan = merged.select("id")._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "payload" not in scan.split("ReadSchema")[-1]


def test_format_round_trips(spark, tmp_path):
    """Format breadth for the batch IO layer: the same relation must
    survive parquet, ORC, JSON, CSV, and XML round trips (CSV/JSON/XML
    with explicit schema on read — schema inference at 100 TB is a
    full extra pass).  XML is the Spark-4 built-in source; Avro's
    external module jar is NOT deployed in this environment (verified:
    `Failed to find data source: avro`), the same class of gap as the
    Kafka connector jar — documented, not worked around."""
    df = spark.createDataFrame(
        [(1, "a b", 0.5, True), (2, "", -1.25, False), (3, None, 0.0, True)],
        "id long, txt string, score double, flag boolean",
    )
    want = sorted(map(tuple, df.collect()))
    schema = df.schema
    for fmt in ("parquet", "orc", "json", "csv", "xml"):
        path = str(tmp_path / fmt)
        w = df.write.format(fmt).mode("overwrite")
        if fmt == "csv":
            w = w.option("header", "true").option("nullValue", "\\N")
        if fmt == "xml":
            w = w.option("rootTag", "rows").option("rowTag", "row")
        w.save(path)
        r = spark.read.format(fmt).schema(schema)
        if fmt == "csv":
            r = r.option("header", "true").option("nullValue", "\\N")
        if fmt == "xml":
            r = r.option("rowTag", "row")
        got = sorted(map(tuple, r.load(path).collect()))
        assert got == want, f"{fmt} round trip drifted"


def test_binaryfile_source_feeds_multimodal_plumbing(spark, tmp_path):
    """Raw media files land as files on object storage; Spark's
    ``binaryFile`` source reads them as (path, content) binary rows
    that map 1:1 onto the MEDIA_ASSET schema and flow through the
    Arrow decode kernel — the multimodal ingest path end-to-end."""
    from pyspark.sql.window import Window

    from fortymhz_spark.operators.multimodal import decode_features

    d = tmp_path / "assets"
    d.mkdir()
    payloads = {f"a{i}.img": bytes([i] * (10 + i)) for i in range(4)}
    for name, blob in payloads.items():
        (d / name).write_bytes(blob)

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.img")
        .load(str(d))
    )
    assert sorted(raw.columns) == ["content", "length", "modificationTime", "path"]
    assets = raw.select(
        F.row_number().over(Window.orderBy("path")).cast("long").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.col("content").alias("payload"),
        F.create_map(F.lit("src"), F.col("path")).alias("meta"),
    )
    feats = decode_features(assets, fake=True).collect()
    assert len(feats) == len(payloads)
    # payload bytes survived the source intact (length drives the fake
    # feature vector deterministically)
    lengths = sorted(len(b) for b in payloads.values())
    got_lengths = sorted(r["n_bytes"] for r in feats)
    assert got_lengths == lengths


def test_observation_metrics_ride_the_write_pass(spark, tmp_path):
    """`df.observe` collects pipeline health metrics DURING the job —
    at 100 TB a separate counting pass doubles the read bill, so
    curation metrics (rows kept, null payloads, token totals) must
    ride the same action that writes the output."""
    from pyspark.sql import Observation

    from fortymhz_spark.operators.text import token_count
    from fortymhz_spark.sources.batch import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    obs = Observation("curation")
    kept = docs.filter(token_count("text") >= 5).observe(
        obs,
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(token_count("text")).alias("tokens_out"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)).alias("null_texts"),
    )
    kept.write.mode("overwrite").parquet(str(tmp_path / "out"))  # ONE action
    m = obs.get
    back = spark.read.parquet(str(tmp_path / "out"))
    assert m["n_kept"] == back.count()
    assert m["null_texts"] == 0
    assert m["tokens_out"] == back.select(
        F.sum(token_count("text"))
    ).collect()[0][0]


def test_shuffle_hash_hint_skips_the_sort(spark):
    """Join-strategy control: with broadcast off, Spark defaults a
    medium join to sort-merge; `hint("shuffle_hash")` keeps the
    exchange but drops both sorts — the right call when one side fits
    a partition in memory and the sort would dominate (e.g. joining a
    doc table to its near-dup pairs).  Results must be identical."""
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        smj = li.join(orders, li.l_orderkey == orders.o_orderkey)
        shj = li.join(
            orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey
        )
        smj_plan = smj._jdf.queryExecution().executedPlan().toString()
        shj_plan = shj._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in smj_plan
        assert "ShuffledHashJoin" in shj_plan and "SortMergeJoin" not in shj_plan
        assert smj.count() == shj.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def test_dynamic_partition_pruning_on_fact_dim_join(spark, tmp_path):
    """Dynamic partition pruning (DPP): when a hive-partitioned fact
    joins a dim filtered by a NON-partition predicate, the dim-side
    result must prune the fact's partition listing at RUNTIME — the
    100 TB star-join pattern where the date/region filter lives on the
    dimension and a static pruner sees nothing to push.  The scan must
    carry a `dynamicpruning` partition filter, and the result must
    equal the semantically-identical unpartitioned join."""
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    out = str(tmp_path / "fact_byflag")
    write_partitioned(li, out, ["l_returnflag"])
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [("A", "accepted"), ("N", "none"), ("R", "returned")],
        "flag string, label string",
    ).filter(F.col("label") == "returned")
    joined = fact.join(dim, fact.l_returnflag == dim.flag)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    want = li.filter(F.col("l_returnflag") == "R").count()
    assert joined.count() == want


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew-join handling: a sort-merge join with one hot key must
    come out of adaptive execution with the skewed partition SPLIT
    (`skew=true` on the join node) instead of one straggler task —
    the runtime half of the salting story (operators/partitioning.py
    handles aggregation skew; AQE handles join skew).  Results must be
    unaffected."""
    confs = {
        # the session fixture disables AQE for suite speed; this test
        # is ABOUT adaptive execution, so turn it on locally
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 60000).select(
            F.when(F.col("id") < 50000, 0)
            .otherwise((F.col("id") % 100) + 1)
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 101).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        joined = left.join(right, "k")
        # collect() drives THIS DataFrame's own query execution — the
        # adaptive plan only shows its final (skew-split) form after
        # the very plan we inspect has actually run.
        assert len(joined.collect()) == 60000  # every left row matches once
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_zorder_key_matches_python_reference(spark):
    """Bit-exact pin of the Morton interleave against a pure-Python
    reference, including boundary clamping of out-of-range values."""
    from fortymhz_spark.operators.partitioning import zorder_key

    rows = [(0.0, 0.0), (1.0, 1.0), (0.5, 0.25), (-3.0, 9.9), (0.999, 0.001)]
    df = spark.createDataFrame(rows, "x double, y double")
    got = [
        r["z"]
        for r in df.select(
            zorder_key([("x", 0.0, 1.0), ("y", 0.0, 1.0)], bits=8).alias("z")
        ).collect()
    ]

    def ref(x, y, bits=8):
        def cell(v, lo, hi):
            s = int(((v - lo) / (hi - lo)) * (1 << bits))
            return max(0, min((1 << bits) - 1, s))
        cx, cy = cell(x, 0.0, 1.0), cell(y, 0.0, 1.0)
        out = 0
        for b in range(bits):
            out |= ((cx >> b) & 1) << (2 * b)
            out |= ((cy >> b) & 1) << (2 * b + 1)
        return out

    assert got == [ref(x, y) for x, y in rows]

    import pytest as _pytest

    from fortymhz_spark.operators.partitioning import zorder_key as zk

    with _pytest.raises(ValueError, match="BIGINT"):
        zk([("x", 0, 1)] * 4, bits=16)
    with _pytest.raises(ValueError, match="hi > lo"):
        zk([("x", 1.0, 1.0)])


def test_zorder_layout_balances_pruning_across_dimensions(spark, tmp_path):
    """What Z-ordering actually buys (and what a single-column sort
    cannot): BALANCED file pruning.  A layout range-partitioned by x
    is optimal for x-predicates but a y-only predicate touches EVERY
    file; the Z-ordered layout confines both dimensions at once, so
    the WORST case over {x-band, y-band} predicates touches a small
    fraction of files.  File membership is observed directly via
    input_file_name()."""
    from fortymhz_spark.operators.partitioning import zorder_key

    n_files = 16
    df = spark.range(0, 20000).select(
        ((F.col("id") * 2654435761) % 10007).alias("h"),
    ).select(
        ((F.col("h") % 100).cast("double") / 100).alias("x"),
        (((F.col("h") / 100).cast("long") % 100).cast("double") / 100).alias(
            "y"
        ),
    )
    z = zorder_key([("x", 0.0, 1.0), ("y", 0.0, 1.0)], bits=8)

    zdir, xdir = str(tmp_path / "zorder"), str(tmp_path / "xsort")
    # DETERMINISTIC range binning via explicit bucket directories —
    # repartitionByRange samples its boundaries with a seed derived
    # from the global RDD-id counter, so its file layout (and this
    # test's pruning counts) drifted with unrelated tests added
    # earlier in the suite; exact arithmetic buckets pin the layout.
    # bits=8 × 2 dims → zkey ∈ [0, 2^16); one bucket = one z-range.
    zbucket = F.floor(F.col("zkey") * n_files / (1 << 16)).cast("int")
    xbucket = F.least(
        F.floor(F.col("x") * n_files).cast("int"), F.lit(n_files - 1)
    )
    df.withColumn("zkey", z).withColumn(
        "b", zbucket
    ).drop("zkey").coalesce(1).write.partitionBy("b").parquet(zdir)
    df.withColumn("b", xbucket).coalesce(1).write.partitionBy(
        "b"
    ).parquet(xdir)

    # [0.25, 0.5) is aligned to the top two bit planes of each
    # dimension (cells 64..127: high bits exactly (0, 1)), the layout
    # a curator would pick knowing the key geometry; an unaligned band
    # straddling 0.5 still prunes, just less sharply (measured 10/16).
    x_band = (F.col("x") >= 0.25) & (F.col("x") < 0.5)
    y_band = (F.col("y") >= 0.25) & (F.col("y") < 0.5)

    def files_touched(path, pred):
        return (
            spark.read.parquet(path)
            .filter(pred)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    # x-sort: perfect on x, useless on y (all 16 files contain the band)
    assert files_touched(xdir, x_band) <= 6
    assert files_touched(xdir, y_band) == n_files
    # z-order: BOTH bands confined — strictly better worst case than
    # the single-column sort's all-files y scan, and well under half
    # the file set for bit-aligned bands
    z_worst = max(
        files_touched(zdir, x_band), files_touched(zdir, y_band)
    )
    assert z_worst <= n_files // 2, z_worst
    assert z_worst < n_files
    # and both layouts agree on the data itself
    assert (
        spark.read.parquet(zdir).filter(x_band & y_band).count()
        == spark.read.parquet(xdir).filter(x_band & y_band).count()
    )


def test_zorder_key_monotonic_per_dimension(spark):
    """Morton keys are not globally monotonic, but along EACH
    dimension with the others held fixed they must be — that is what
    makes per-file min/max ranges tighten for every declared column.
    Property-checked over a full grid."""
    from fortymhz_spark.operators.partitioning import zorder_key

    grid = [
        (x / 16.0, y / 16.0) for x in range(16) for y in range(16)
    ]
    df = spark.createDataFrame(grid, "x double, y double")
    rows = df.select(
        "x",
        "y",
        zorder_key([("x", 0.0, 1.0), ("y", 0.0, 1.0)], bits=4).alias("z"),
    ).collect()
    by_y: dict = {}
    by_x: dict = {}
    for r in rows:
        by_y.setdefault(r["y"], []).append((r["x"], r["z"]))
        by_x.setdefault(r["x"], []).append((r["y"], r["z"]))
    for fixed, pairs in list(by_y.items()) + list(by_x.items()):
        keys = [z for _, z in sorted(pairs)]
        assert keys == sorted(keys), f"non-monotonic at fixed={fixed}"


def test_zorder_key_null_and_nan_map_to_bin_zero(spark):
    """NULL and NaN inputs must land in bin 0 — greatest/least skip
    NULLs (which used to clamp HIGH to the max bin) and a NaN reaching
    the long cast errors under ANSI mode.  A layout key is a total
    function of the row."""
    from fortymhz_spark.operators.partitioning import zorder_key

    df = spark.createDataFrame(
        [(None, 0.0), (float("nan"), 0.0), (0.0, 0.0)],
        "x double, y double",
    )
    got = [
        r["z"]
        for r in df.select(
            zorder_key([("x", 0.0, 1.0), ("y", 0.0, 1.0)], bits=8).alias("z")
        ).collect()
    ]
    # all three rows: x-cell 0, y-cell 0 -> key 0
    assert got == [0, 0, 0]
