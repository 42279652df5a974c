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
