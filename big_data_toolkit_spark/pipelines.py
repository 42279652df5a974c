"""End-to-end pipelines over the reference's raw input formats.

A user of devp12345/big-data-toolkit runs ``hadoop jar``/``spark-submit``
programs over raw text inputs. These functions are those programs' drop-in
equivalents: same input formats (via ``sources.readers``), same semantics
(via the operator library), one DataFrame plan instead of multi-job
file-handoff pipelines (SURVEY §3 entry points 1–2).

Text-corpus analytics take a generic ``(line_id, text)`` DataFrame, so the
same code serves raw text files (``read_text_lines``) and the TESTDATA
``documents`` table.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_toolkit_spark.functions.text import (
    adjacent_pairs,
    unordered_cooccurrence_pairs,
    tokenize,
)
from big_data_toolkit_spark.sources.readers import (
    read_adjacency_list,
    read_model_text,
    read_spam_instances,
    read_text_lines,
    read_tpch_tbl,
)

# ---------------------------------------------------------------------------
# a0/a2/a1: text-corpus analytics from raw lines
# ---------------------------------------------------------------------------


def word_count_text(spark: SparkSession, corpus_path: str) -> DataFrame:
    """a0 WordCountSimple over a raw text file: (word, cnt)."""
    lines = read_text_lines(spark, corpus_path)
    return (
        lines.select(F.explode(tokenize("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def perfect_x_text(spark: SparkSession, corpus_path: str, pivot: str = "perfect") -> DataFrame:
    """a0 PerfectX over a raw text file (the literal 'perfect' pivot)."""
    lines = read_text_lines(spark, corpus_path).select(
        tokenize("text").alias("tokens")
    )
    return (
        lines.select(F.explode(adjacent_pairs(F.col("tokens"))).alias("p"))
        .where(F.col("p.a") == pivot)
        .groupBy(F.col("p.b").alias("word"))
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > 1)
    )


def bigram_relative_frequency_text(spark: SparkSession, corpus_path: str) -> DataFrame:
    """a2 ComputeBigramRelativeFrequency over raw lines: (a, b, cnt, rel_freq)."""
    lines = read_text_lines(spark, corpus_path).select(
        tokenize("text").alias("tokens")
    )
    pair_counts = (
        lines.select(F.explode(adjacent_pairs(F.col("tokens"))).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("cnt"))
    )
    marginal = Window.partitionBy("a")
    return pair_counts.select(
        "a", "b", "cnt",
        (F.col("cnt") / F.sum("cnt").over(marginal)).alias("rel_freq"),
    )


def pmi_text(
    spark: SparkSession, corpus_path: str, threshold: int = 10, cap: int = 40
) -> DataFrame:
    """a1/a2 PairsPMI over raw lines (first-``cap`` distinct tokens/line).

    One plan replaces the reference's two MapReduce jobs + HDFS side-file
    handoff (``a1/PairsPMI.java:264-339``).
    """
    toks = read_text_lines(spark, corpus_path).select(
        "line_id", F.array_distinct(F.slice(tokenize("text"), 1, cap)).alias("words")
    )
    toks.cache()
    half = (
        toks.select(
            F.explode(unordered_cooccurrence_pairs(F.col("words"))).alias("p")
        )
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("pair_cnt"))
        .where(F.col("pair_cnt") >= threshold)
    )
    # symmetric statistic: only a<b went through the shuffle; mirror the
    # thresholded aggregate to recover the ordered-pair output form
    pair_counts = half.unionByName(
        half.select(F.col("b").alias("a"), F.col("a").alias("b"), "pair_cnt")
    )
    word_counts = (
        toks.select(F.explode("words").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("w_cnt"))
    )
    n_lines = toks.agg(F.count("*").alias("n_lines"))
    wc_a = word_counts.select(F.col("w").alias("a"), F.col("w_cnt").alias("cnt_a"))
    wc_b = word_counts.select(F.col("w").alias("b"), F.col("w_cnt").alias("cnt_b"))
    return (
        # no hint: AQE broadcasts the small test-scale vocabulary and falls
        # back to shuffle join when the vocabulary is huge (100 TB corpora)
        pair_counts.join(wc_a, "a")
        .join(wc_b, "b")
        .crossJoin(F.broadcast(n_lines))
        .select(
            "a", "b", "pair_cnt",
            F.round(
                F.log10(
                    F.col("pair_cnt") * F.col("n_lines")
                    / (F.col("cnt_a") * F.col("cnt_b"))
                ), 6,
            ).alias("pmi"),
        )
    )


# ---------------------------------------------------------------------------
# a6 text mode: TPC-H queries over pipe-delimited .tbl files
# ---------------------------------------------------------------------------


def q1_from_tbl(spark: SparkSession, lineitem_tbl: str, ship_date: str) -> DataFrame:
    """a6 Q1 ``--text`` mode: count lineitems with l_shipdate == date string.

    The reference compares dates as strings (``a6/Q1.scala:51``); the .tbl
    schema keeps l_shipdate as STRING so semantics match exactly.
    """
    li = read_tpch_tbl(spark, lineitem_tbl, "lineitem")
    return li.where(F.col("l_shipdate") == ship_date).agg(
        F.count("*").alias("cnt")
    )


def q2_from_tbl(
    spark: SparkSession, lineitem_tbl: str, orders_tbl: str, ship_date: str, top_n: int = 20
) -> DataFrame:
    """a6 Q2 ``--text`` mode: (clerk, orderkey) for shipped orders, first n."""
    li = read_tpch_tbl(spark, lineitem_tbl, "lineitem")
    orders = read_tpch_tbl(spark, orders_tbl, "orders")
    shipped = (
        li.where(F.col("l_shipdate") == ship_date).select("l_orderkey").distinct()
    )
    return (
        shipped.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_clerk", "o_orderkey")
        .orderBy("o_orderkey")
        .limit(top_n)
    )


# ---------------------------------------------------------------------------
# a5: spam classifier over raw instance/model files
# ---------------------------------------------------------------------------


def apply_spam_classifier(
    spark: SparkSession, instances_path: str, model_path: str
) -> DataFrame:
    """a5 ApplySpamClassifier: score instances with a ``(feature,weight)``
    model file: (docid, label, spamminess, prediction).

    The reference ``collectAsMap``s the model into a closure
    (``a5/ApplySpamClassifier.scala:48-58``); the engine broadcast-joins it —
    same physics, no driver round-trip, works for models larger than driver
    memory (falls back to shuffle join automatically).
    """
    instances = read_spam_instances(spark, instances_path)
    weights = read_model_text(spark, model_path)
    scored = (
        instances.select("docid", "label", F.explode("features").alias("feature"))
        .join(F.broadcast(weights), "feature", "left")
        .groupBy("docid", "label")
        .agg(F.coalesce(F.sum("weight"), F.lit(0.0)).alias("spamminess"))
    )
    return scored.select(
        "docid",
        "label",
        F.round("spamminess", 6).alias("spamminess"),
        F.when(F.col("spamminess") > 0, F.lit("spam"))
        .otherwise(F.lit("ham"))
        .alias("prediction"),
    )


def apply_ensemble_spam_classifier(
    spark: SparkSession,
    instances_path: str,
    model_paths: list[str],
    method: str = "average",
) -> DataFrame:
    """a5 ApplyEnsembleSpamClassifier: combine N model files by score average
    or majority vote (``a5/ApplyEnsembleSpamClassifier.scala:61-98``)."""
    if method not in ("average", "vote"):
        raise ValueError(f"method must be 'average' or 'vote', got {method!r}")
    instances = read_spam_instances(spark, instances_path)
    feats = instances.select("docid", "label", F.explode("features").alias("feature"))
    out = instances.select("docid", "label")
    for i, path in enumerate(model_paths):
        weights = read_model_text(spark, path)
        score_i = (
            feats.join(F.broadcast(weights), "feature", "left")
            .groupBy("docid")
            .agg(F.coalesce(F.sum("weight"), F.lit(0.0)).alias(f"score_{i}"))
        )
        out = out.join(score_i, "docid")
    n = len(model_paths)
    if method == "average":
        combined = sum(F.col(f"score_{i}") for i in range(n)) / n
    else:
        combined = sum(
            F.when(F.col(f"score_{i}") > 0, 1).otherwise(-1) for i in range(n)
        ).cast("double")
    return out.select(
        "docid",
        "label",
        F.round(combined, 6).alias("score"),
        F.when(combined > 0, F.lit("spam")).otherwise(F.lit("ham")).alias("prediction"),
    )


# ---------------------------------------------------------------------------
# a4: personalized PageRank from adjacency-list text
# ---------------------------------------------------------------------------


def pagerank_from_adjacency(
    spark: SparkSession,
    graph_path: str,
    sources: tuple[int, ...],
    alpha: float = 0.15,
    iters: int = 10,
    top_k: int = 20,
) -> DataFrame:
    """a4 pipeline: BuildRecords → RunPPR → FindMaxPageRankNodes, one call.

    Nodes listed with no neighbors are dangling; edges to node ids that have
    no adjacency line of their own still rank (they exist as targets), which
    matches the engine node-universe definition (src ∪ dst); the reference's
    vanishing-mass case (edges to truly absent records) cannot arise because
    every referenced node becomes part of the universe.
    """
    from big_data_toolkit_spark.operators.pagerank import personalized_pagerank

    adj = read_adjacency_list(spark, graph_path)
    edges = adj.select(
        F.col("id").alias("src"), F.explode_outer("neighbors").alias("dst")
    )
    # explode_outer keeps dangling nodes as (src, NULL): they must exist in
    # the node universe without contributing edges.
    nodes_from_dangling = edges.where(F.col("dst").isNull()).select("src")
    real_edges = edges.where(F.col("dst").isNotNull())
    # personalized_pagerank derives its node universe from the edge list; a
    # fully isolated dangling node (no in- or out-edges) is invisible to it
    # and only ever holds its teleport share — union those in post-hoc.
    ranks = personalized_pagerank(
        spark, real_edges, sources=sources, alpha=alpha, iters=iters
    )
    missing = nodes_from_dangling.join(
        ranks.select(F.col("node").alias("src")), "src", "left_anti"
    ).select(F.col("src").alias("node"))
    if missing.count() > 0:
        extra = missing.select(
            "node",
            F.when(
                F.col("node").isin(list(sources)), F.lit(alpha / len(sources))
            ).otherwise(F.lit(0.0)).alias("rank"),
        )
        ranks = ranks.union(extra)
    return (
        ranks.select("node", F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), "node")
        .limit(top_k)
    )
