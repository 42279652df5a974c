from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_toolkit_spark.operators import pagerank as pr
from big_data_toolkit_spark.operators import spam, text_analytics
from big_data_toolkit_spark.plans import scale
from tests.conftest import SF_ORACLE, SF_SMOKE


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share one key — the aggregation-skew shape
    return spark.range(20000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 'hot' ELSE concat('k', id % 50) END AS k",
        "id AS v",
    )


def test_salted_count_equals_plain(spark, skewed):
    plain = {r["k"]: r["cnt"] for r in
             skewed.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    salted = {r["k"]: r["cnt"] for r in scale.salted_count(skewed, "k").collect()}
    assert salted == plain


def test_salted_sum_equals_plain(spark, skewed):
    plain = {r["k"]: r["s"] for r in
             skewed.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted = {r["k"]: r["sum_v"] for r in scale.salted_sum(skewed, "k", "v").collect()}
    assert salted == plain


def test_salted_join_equals_plain(spark, skewed):
    right = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"R{i}") for i in range(50)], ["k", "tag"]
    )
    plain = skewed.join(right, "k").count()
    salted = scale.salted_join_skewed_left(skewed, right, "k").count()
    assert salted == plain


def test_stratified_sample_plans_window_group_limit(spark):
    """The rank filter must push down as WindowGroupLimit so a source
    owning most of the corpus is top-k-pruned map-side, never fully
    sorted in one partition."""
    from big_data_toolkit_spark.operators import curation

    df = curation.stratified_sample(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_source_mix_plans_window_group_limit(spark):
    """source_mix's literal max-quota pre-filter makes the hot-source sort
    rank-limited too (the exact per-source quota filters afterwards)."""
    from big_data_toolkit_spark.operators import curation

    df = curation.source_mix(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_partition_graph_modes(spark):
    edges = pr.derive_graph(spark, SF_SMOKE)
    assert pr.partition_graph(edges, 4, "hash").rdd.getNumPartitions() == 4
    assert pr.partition_graph(edges, 4, "range").rdd.getNumPartitions() <= 4
    with pytest.raises(ValueError):
        pr.partition_graph(edges, 4, "zigzag")


def test_shuffled_order_deterministic_per_seed(spark):
    df = spark.range(1000)
    a = [r["id"] for r in spam.shuffled_order(df, seed=1).collect()]
    b = [r["id"] for r in spam.shuffled_order(df, seed=1).collect()]
    c = [r["id"] for r in spam.shuffled_order(df, seed=2).collect()]
    assert a == b
    assert a != c
    assert sorted(a) == list(range(1000))


def test_shuffled_order_partition_count_independent(spark):
    """The seeded shuffle must not depend on the physical partitioning —
    rand(seed) would (Spark seeds it per partition); the row-hash order
    is identical on 1, 13, or 1000 partitions."""
    df = spark.range(500).selectExpr("id", "id % 7 AS grp")
    orders = [
        [r["id"] for r in spam.shuffled_order(df.repartition(n), seed=3).collect()]
        for n in (1, 13, 32)
    ]
    assert orders[0] == orders[1] == orders[2]


def test_stripes_format_matches_pairs(spark):
    pairs = text_analytics.bigram_relative_frequency(spark, SF_ORACLE).collect()
    stripes = {
        r["a"]: r["stripe"]
        for r in text_analytics.bigram_relative_frequency_stripes(
            spark, SF_ORACLE
        ).collect()
    }
    for row in pairs:
        assert stripes[row["a"]][row["b"]] == pytest.approx(row["rel_freq"])
    # stripe-local marginal sums to 1 (A6 semantics)
    for stripe in stripes.values():
        assert sum(stripe.values()) == pytest.approx(1.0, abs=1e-9)


def test_runtime_bloom_filter_prunes_shuffle_join(spark, tmp_path):
    """When the dim side is too big to broadcast (the 100 TB posture),
    Catalyst injects a runtime bloom filter: the selective dim side builds
    bloom_filter_agg and the fact side gains a might_contain filter, so
    non-matching fact rows drop before the join shuffle. The 10 GB
    application-side gate is lowered to observe the plan at test scale."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.range(50000).selectExpr(
            "id", "id % 1000 AS k", "id * 2 AS v"
        ).write.mode("overwrite").parquet(str(tmp_path / "fact"))
        spark.range(1000).selectExpr(
            "id AS k", "CASE WHEN id < 10 THEN 'x' ELSE 'y' END AS tag"
        ).write.mode("overwrite").parquet(str(tmp_path / "dim"))

        fact = spark.read.parquet(str(tmp_path / "fact"))
        dim = spark.read.parquet(str(tmp_path / "dim")).where("tag = 'x'")
        out = fact.join(dim, "k")
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
        assert out.count() == 500  # 10 dim keys × 50 fact rows each
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.mark.parametrize("name", sorted(scale.QUERIES))
def test_scale_query_oracle_match(spark, name):
    from tests.oracle_utils import compare

    compare(scale.QUERIES[name](spark, SF_ORACLE), scale.ORACLE_SQL[name], SF_ORACLE)


def test_two_phase_distinct_equals_plain(spark, skewed):
    plain = {
        r["k"]: r["d"]
        for r in skewed.groupBy("k").agg(F.countDistinct("v").alias("d")).collect()
    }
    two = {
        r["k"]: r["distinct_v"]
        for r in scale.two_phase_distinct(skewed, "k", "v").collect()
    }
    assert two == plain


def test_skewed_join_enrich_equals_plain_join(spark):
    from big_data_toolkit_spark.catalog import load_table

    events = load_table(spark, SF_ORACLE, "events")
    type_cnt = events.groupBy("event_type").agg(F.count("*").alias("type_cnt"))
    plain = sorted(
        tuple(r)
        for r in events.select("event_id", "event_type")
        .join(type_cnt, "event_type")
        .select("event_id", "event_type", "type_cnt")
        .collect()
    )
    salted = sorted(
        tuple(r) for r in scale.skewed_join_enrich(spark, SF_ORACLE).collect()
    )
    assert salted == plain


def test_bucketized_join_skips_both_shuffles(spark, tmp_path):
    """THE bucketing payoff at 100 TB: two tables written via
    scale.bucketize on the same key/bucket count join WITHOUT either side
    shuffling — the plan carries no ShuffleExchange, Spark reads the
    pre-bucketed layout on both sides. Broadcast is disabled for the
    assertion so the shuffle-free-ness comes from bucketing, not from the
    small-table escape hatch; results equal the plain join."""
    left = spark.range(5000).selectExpr("id AS k", "id * 2 AS lv")
    right = spark.range(4000).selectExpr("id AS k", "id * 3 AS rv")
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        scale.bucketize(left, str(tmp_path / "lt"), "bkt_left", "k", 8)
        scale.bucketize(right, str(tmp_path / "rt"), "bkt_right", "k", 8)
        lt = spark.table("bkt_left")
        rt = spark.table("bkt_right")
        joined = lt.join(rt, "k")
        plan = scale.explain_str(joined)
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan
        got = {(r["k"], r["lv"], r["rv"]) for r in joined.collect()}
        want = {
            (r["k"], r["lv"], r["rv"])
            for r in left.join(right, "k").collect()
        }
        assert got == want and len(got) == 4000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_aqe_splits_skewed_join_partitions(spark):
    """THE AQE skew story the session builder enables: a join whose left
    side concentrates ~all rows on one key gets its oversized shuffle
    partition SPLIT at runtime (OptimizeSkewedJoin) instead of one reducer
    dragging the stage. Thresholds are scoped down so the local fixture
    trips the same machinery a 100 TB hot key would; the final adaptive
    plan must mark the sort-merge join skew=true and row counts must be
    unchanged."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        left = spark.range(200_000).selectExpr(
            "CASE WHEN id % 100 < 99 THEN 0 ELSE id END AS k",
            "id AS lv",
        )
        right = spark.range(64).selectExpr("id AS k", "id * 7 AS rv")
        joined = left.join(right, "k")
        # Execute THIS DataFrame's own queryExecution (count() would build
        # a different plan and leave this one isFinalPlan=false).
        n = len(joined.collect())
        # left: 99 of every 100 ids map to k=0 (matches right's k=0 row);
        # the rest keep k=id >= 99, all above right's 0..63 key range.
        assert n == 200_000 // 100 * 99
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
