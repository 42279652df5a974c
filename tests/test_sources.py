from __future__ import annotations

import os

import pytest

from big_data_toolkit_spark.sources import readers, writers

# Citigroup / Goldman boxes from a7/RegionEventCount.scala:44-58
BOXES = {
    "citigroup": (-74.012083, -74.009867, 40.720053, 40.7217236),
    "goldman": (-74.0144185, -74.013777, 40.7138745, 40.7152275),
}


def _write(tmp_path, name, lines):
    p = str(tmp_path / name)
    with open(p, "w") as f:
        f.write("\n".join(lines))
    return p


def test_read_text_lines(spark, tmp_path):
    p = _write(tmp_path, "corpus.txt", ["a b c", "", "d e"])
    df = readers.read_text_lines(spark, p)
    rows = df.collect()
    assert [r["text"] for r in rows] == ["a b c", "", "d e"]
    assert len({r["line_id"] for r in rows}) == 3


def test_read_tpch_tbl(spark, tmp_path):
    p = _write(
        tmp_path,
        "lineitem.tbl",
        [
            "1|10|100|1|17.0|1000.5|0.04|0.02|N|O|1998-08-23",
            "2|20|200|1|36.0|2000.5|0.10|0.05|R|F|1995-01-02",
            "garbage line",
        ],
    )
    df = readers.read_tpch_tbl(spark, p, "lineitem")
    rows = df.collect()
    assert len(rows) == 2  # malformed row dropped
    assert rows[0]["l_orderkey"] == 1 and rows[0]["l_shipdate"] == "1998-08-23"
    with pytest.raises(KeyError):
        readers.read_tpch_tbl(spark, p, "nope")


def test_read_spam_instances(spark, tmp_path):
    p = _write(
        tmp_path,
        "spam.txt",
        [
            "clueweb09-en0000-00-00000 spam 387908 697162 426572",
            "clueweb09-en0000-00-00001 ham 12345 697162",
            "",
            "badline notalabel 1 2",
        ],
    )
    df = readers.read_spam_instances(spark, p)
    rows = {r["docid"]: r for r in df.collect()}
    assert len(rows) == 2
    assert rows["clueweb09-en0000-00-00000"]["features"] == [387908, 697162, 426572]
    assert rows["clueweb09-en0000-00-00001"]["label"] == "ham"


def test_read_adjacency_list(spark, tmp_path):
    p = _write(tmp_path, "graph.txt", ["1 2 3", "2 3", "3", "4 1"])
    df = readers.read_adjacency_list(spark, p)
    rows = {r["id"]: r["neighbors"] for r in df.collect()}
    assert rows == {1: [2, 3], 2: [3], 3: [], 4: [1]}  # node 3 dangles


def test_read_model_text(spark, tmp_path):
    p = _write(tmp_path, "model.txt", ["(387908,0.5)", "(697162,-0.25)", "junk"])
    df = readers.read_model_text(spark, p)
    rows = {r["feature"]: r["weight"] for r in df.collect()}
    assert rows == {387908: 0.5, 697162: -0.25}


def test_read_taxi_events_and_geo_filter(spark, tmp_path):
    inside_citi = "-74.0101,40.7210"
    inside_gold = "-74.0140,40.7145"
    outside = "-74.5,40.5"
    p = _write(
        tmp_path,
        "taxi.csv",
        [
            f"green,a,b,c,d,e,f,g,{inside_citi},x,y",      # green: lon/lat @ 9/10
            f"yellow,a,b,c,d,e,f,g,h,i,{inside_gold}",      # yellow: @ 11/12
            f"yellow,a,b,c,d,e,f,g,h,i,{outside}",
        ],
    )
    df = readers.read_taxi_events(spark, p)
    rows = df.collect()
    assert len(rows) == 3
    labeled = readers.geo_box_filter(df, BOXES)
    got = {(r["taxi_type"], r["region"]) for r in labeled.collect()}
    assert got == {("green", "citigroup"), ("yellow", "goldman")}


def test_geo_filter_boundary_inclusivity(spark):
    # point exactly on the citigroup box edge: excluded strict, included inclusive
    df = spark.createDataFrame(
        [("t", -74.012083, 40.720053)], ["taxi_type", "lon", "lat"]
    )
    assert readers.geo_box_filter(df, BOXES, inclusive=False).count() == 0
    assert readers.geo_box_filter(df, BOXES, inclusive=True).count() == 1


def test_write_table_overwrite_and_sorted_bucketed(spark, tmp_path):
    df = spark.range(100).selectExpr("id", "id % 7 AS k")
    p = str(tmp_path / "out")
    writers.write_table(df, p)
    writers.write_table(df, p)  # S14: second write must overwrite, not fail
    assert spark.read.parquet(p).count() == 100
    p2 = str(tmp_path / "sorted")
    writers.write_sorted_bucketed(df, p2, "id", n_files=4)
    back = spark.read.parquet(p2)
    assert back.count() == 100
    from big_data_toolkit_spark.plans.scale import explain_str

    plan = explain_str(back.where("id = 42"))
    assert "PushedFilters" in plan


def test_write_partitioned_prunes_directories(spark, tmp_path):
    """A filter on the partition column must become PartitionFilters
    (directory pruning), and the pruned scan must read only the matching
    partition's files."""
    from big_data_toolkit_spark.plans.scale import explain_str

    df = spark.range(1000).selectExpr(
        "id", "CAST(id % 10 AS INT) AS day", "id * 2 AS v"
    )
    p = str(tmp_path / "parts")
    writers.write_partitioned(df, p, ["day"])

    back = spark.read.parquet(p)
    pruned = back.where("day = 3")
    plan = explain_str(pruned)
    assert "PartitionFilters" in plan
    assert "day" in plan.split("PartitionFilters")[1][:200]
    assert pruned.count() == 100
    # Non-partition predicate must still push down to parquet as usual.
    plan2 = explain_str(back.where("v = 42"))
    assert "PushedFilters" in plan2


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """Join a day-partitioned fact to a filtered dimension: Catalyst must
    plan dynamic partition pruning (the dim filter's day set prunes fact
    directories at runtime) — at 100 TB this is what keeps a
    star-schema join from scanning every partition."""
    fact = spark.range(2000).selectExpr(
        "id", "CAST(id % 20 AS INT) AS day", "id * 3 AS v"
    )
    p = str(tmp_path / "fact")
    writers.write_partitioned(fact, p, ["day"])

    dim = spark.range(20).selectExpr(
        "CAST(id AS INT) AS day", "CASE WHEN id < 2 THEN 'keep' ELSE 'drop' END AS tag"
    )
    out = (
        spark.read.parquet(p)
        .join(dim.where("tag = 'keep'"), "day")
        .selectExpr("sum(v) AS s")
    )
    from big_data_toolkit_spark.plans.scale import explain_str

    plan = explain_str(out)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    expected = sum(i * 3 for i in range(2000) if i % 20 < 2)
    assert out.collect()[0]["s"] == expected


def test_zorder_key_interleaves_bits(spark):
    from pyspark.sql import functions as F

    from big_data_toolkit_spark.sources.writers import zorder_key

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)], "a long, b long"
    )
    got = [
        r["z"]
        for r in df.select(
            zorder_key(F.col("a"), F.col("b")).alias("z")
        ).collect()
    ]

    def morton(a, b, bits=16):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got == [morton(a, b) for a, b in [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)]]


def test_zorder_layout_improves_2d_box_locality(spark, tmp_path):
    """A 2-d box query's matching rows concentrate in FEWER files under
    Z-order than under a one-dimensional (user-sorted) layout."""
    from pyspark.sql import functions as F

    from big_data_toolkit_spark.catalog import load_table
    from big_data_toolkit_spark.sources.writers import (
        write_sorted_bucketed,
        write_zordered,
    )
    from tests.conftest import SF_ORACLE

    events = load_table(spark, SF_ORACLE, "events").select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("epoch"),
    )
    lo_u, hi_u = 10, 40
    lo_t, hi_t = (
        events.agg(
            F.percentile_approx("epoch", 0.4), F.percentile_approx("epoch", 0.6)
        ).first()
    )
    one_d = str(tmp_path / "one_d")
    z_d = str(tmp_path / "zord")
    # normalize epoch to its low 16 bits' range so both dims interleave
    norm = events.withColumn(
        "epoch16", ((F.col("epoch") - F.lit(lo_t)) / 1000).cast("long") + 32768
    )
    write_sorted_bucketed(norm, one_d, "user_id", n_files=16)
    write_zordered(norm, z_d, "user_id", "epoch16", n_files=16)

    def files_touched(path):
        df = spark.read.parquet(path).where(
            F.col("user_id").between(lo_u, hi_u)
            & F.col("epoch").between(lo_t, hi_t)
        )
        return df.select(
            F.input_file_name().alias("f")
        ).distinct().count(), df.count()

    nf_1d, n1 = files_touched(one_d)
    nf_z, n2 = files_touched(z_d)
    assert n1 == n2 and n1 > 0  # same result set either way
    assert nf_z <= nf_1d  # z-order never worse for the 2-d box


def test_bucketed_tables_join_without_exchange(spark):
    """write_bucketed_table: two tables bucketed on the same key with the
    same bucket count must sort-merge-join with ZERO shuffle Exchange and
    ZERO per-task Sort — the planner proves co-partitioning from the
    catalog bucket spec. This is the recurring-join shuffle killer the
    plain path-based writers can't provide."""
    from pyspark.sql import functions as F

    from big_data_toolkit_spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        writers.write_bucketed_table(orders, "bkt_orders", "o_orderkey", 4)
        writers.write_bucketed_table(li, "bkt_lineitem", "l_orderkey", 4)
        j = spark.table("bkt_lineitem").join(
            spark.table("bkt_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, f"bucketed join still shuffles: {plan}"
        assert "Bucketed: true" in plan, plan
        # (per-task Sorts remain: Spark only exploits sortBy ordering under
        # spark.sql.legacy.bucketedTableScan.outputOrdering — they are
        # bucket-sized in-memory runs, not shuffles)
        # and the join is CORRECT: row count equals the plain join
        expected = li.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).count()
        assert j.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
