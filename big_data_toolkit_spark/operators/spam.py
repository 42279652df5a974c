"""Spam-classifier surface: scoring, ensembles, sequential SGD training
(reference a5, re-expressed Spark-first).

Reference shapes replaced:

* Scoring (``a5/ApplySpamClassifier.scala:42-75``): spamminess = Σ weights of
  the document's features, label by sign. The reference ``collectAsMap``s the
  model and probes it in a closure; the engine expresses scoring as
  explode(features) ⋈ broadcast(weights) → sum — pure JVM-side plan, no UDF.
  For the oracle-checked variant the "model" is integer document frequencies
  (exactly the U2 structure — feature lookup + additive score — with
  cross-engine-exact integer arithmetic).
* Ensemble (``a5/ApplyEnsembleSpamClassifier.scala:61-98``): three models
  trained on disjoint splits; average score and majority vote as column
  expressions over the three score columns.
* Online SGD training (``a5/TrainSpamClassifier.scala:49-87``): inherently
  sequential — the reference forces one reducer via ``groupByKey(1)`` and
  folds docs in order, w[f] += (y − σ(Σw[f]))·0.002. The engine makes the
  same trade explicit: sort by doc_id, coalesce to ONE partition, run the
  loop in a single Arrow-batched ``mapInPandas`` pass. This is the one
  operator that cannot scale out by construction (documented order
  dependence); scoring with the trained model is fully distributed.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_toolkit_spark.catalog import load_table
from big_data_toolkit_spark.functions.text import DUCKDB_TOKENS, tokenize

LEARN_RATE = 0.002  # a5/TrainSpamClassifier.scala:55
N_SPLITS = 3  # ensemble arity, a5/ApplyEnsembleSpamClassifier.scala:61-63


def _doc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, features ARRAY<STRING>) with distinct tokens as
    the feature set (stands in for the reference's int feature ids)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.array_distinct(tokenize("text")).alias("features")
    )


def df_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer 'model': feature → document frequency (used as its weight)."""
    return (
        _doc_features(spark, sf_dir)
        .select(F.explode("features").alias("feature"))
        .groupBy("feature")
        .agg(F.count("*").alias("weight"))
    )


def spam_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every doc with the df-weight model; label above global mean.

    (doc_id, score, label) — score is an exact integer sum, the label
    threshold is the corpus mean score (computed in-plan, broadcast).
    """
    # ONE tokenize pass: the model branch (groupBy feature) and the scoring
    # branch (join + groupBy doc_id) consume the same exploded features but
    # share no exchange (different keys), so un-materialized they each
    # re-ran the corpus scan + tokenize (r13 optimization round; measured
    # 1.10 → 0.69 s median same-session, outputs equal).
    exploded = (
        _doc_features(spark, sf_dir)
        .select("doc_id", F.explode("features").alias("feature"))
        .localCheckpoint()
    )
    weights = exploded.groupBy("feature").agg(F.count("*").alias("weight"))
    scores = (
        exploded.join(F.broadcast(weights), "feature")
        .groupBy("doc_id")
        .agg(F.sum("weight").alias("score"))
    )
    mean = scores.agg(F.avg("score").alias("mean_score"))
    return scores.crossJoin(F.broadcast(mean)).select(
        "doc_id",
        "score",
        F.when(F.col("score") > F.col("mean_score"), F.lit("spam"))
        .otherwise(F.lit("ham"))
        .alias("label"),
    )


def spam_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three split-trained models, combined by sum and majority vote.

    Splits are ``doc_id % 3`` (disjoint, deterministic — the engine analogue
    of the reference's three model part-files). Each model_k = df over its
    split; every doc is scored under all three and combined:
    score_sum = Σ_k score_k, vote = majority of per-model (score_k > split
    mean_k). All-integer per-model scores keep the oracle exact.
    """
    # Single-pass formulation: one shuffle builds ALL split models at once
    # (groupBy(split, feature)), one shuffle scores every doc under every
    # model (groupBy(doc_id, split)), one pivot widens the K scores — 3
    # exchanges total, vs K separate model pipelines (3 groupBys + a K-way
    # doc_id join ≈ 3K exchanges). Per-split means travel by broadcast.
    # The exploded features are checkpointed for the same two-consumer
    # reason as spam_score (model branch + scoring branch, no shared
    # exchange): 1.31 → 1.10 s median same-session.
    feats = _doc_features(spark, sf_dir)
    exploded = feats.select(
        "doc_id", F.explode("features").alias("feature")
    ).localCheckpoint()

    weights = (
        exploded.withColumn(
            "split", (F.col("doc_id") % N_SPLITS).cast("int")
        )
        .groupBy("split", "feature")
        .agg(F.count("*").alias("weight"))
    )
    scores = (
        exploded.join(F.broadcast(weights), "feature")
        .groupBy("doc_id", "split")
        .agg(F.sum("weight").alias("score"))
    )
    means = scores.groupBy("split").agg(F.avg("score").alias("mean"))
    voted = scores.join(F.broadcast(means), "split").select(
        "doc_id",
        "split",
        "score",
        (F.col("score") > F.col("mean")).cast("int").alias("vote"),
    )
    wide = (
        voted.groupBy("doc_id")
        .pivot("split", list(range(N_SPLITS)))
        .agg(F.first("score").alias("score"), F.first("vote").alias("vote"))
    )
    # A doc absent from some split's scoring (no shared features) is dropped,
    # matching the original K-way inner join on doc_id.
    present_all = [F.col(f"{k}_score").isNotNull() for k in range(N_SPLITS)]
    keep = present_all[0]
    for c in present_all[1:]:
        keep = keep & c
    vote_sum = sum(F.col(f"{k}_vote") for k in range(N_SPLITS))
    score_sum = sum(F.col(f"{k}_score") for k in range(N_SPLITS))
    return wide.where(keep).select(
        "doc_id",
        score_sum.alias("score_sum"),
        F.when(vote_sum * 2 > N_SPLITS, F.lit("spam"))
        .otherwise(F.lit("ham"))
        .alias("vote_label"),
    )


def shuffled_order(df: DataFrame, seed: int = 42) -> DataFrame:
    """O4 (``a5/TrainSpamClassifier.scala:44-46``): seeded random shuffle of
    training order, partition-count-independent.

    ``orderBy(rand(seed))`` would NOT be stable: Spark seeds ``rand`` per
    partition, so the order changes with the input partitioning. Ordering by
    a seeded row hash is deterministic for a given (seed, row content) on 1
    or 1000 executors — the engine analogue of the reference's
    tag-with-random + sortByKey + strip dance.
    """
    return df.orderBy(
        F.xxhash64(F.lit(seed), *[F.col(c) for c in df.columns]), *df.columns
    )


# ---------------------------------------------------------------------------
# Sequential online SGD (rows-only check: order-dependent, non-SQL)
# ---------------------------------------------------------------------------


def sgd_train(
    spark: SparkSession, sf_dir: str, learn_rate: float = LEARN_RATE
) -> DataFrame:
    """Train logistic-regression weights sequentially; returns (feature, weight).

    Deterministic replica of ``a5/TrainSpamClassifier.scala:49-87``: docs in
    doc_id order, one partition, online update per doc. Target label:
    y = 1 if lang == 'en' else 0 (the corpus' stand-in for spam/ham).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("lang") == "en").cast("int").alias("y"),
        F.array_distinct(tokenize("text")).alias("features"),
    )
    one_part = docs.orderBy("doc_id").coalesce(1)

    def train(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w: dict[str, float] = {}
        for pdf in batches:  # batches arrive in partition order
            for _, row in pdf.iterrows():
                score = sum(w.get(f, 0.0) for f in row["features"])
                prob = 1.0 / (1.0 + math.exp(-score))
                delta = (row["y"] - prob) * learn_rate
                for f in row["features"]:
                    w[f] = w.get(f, 0.0) + delta
        yield pd.DataFrame(
            {"feature": list(w.keys()), "weight": list(w.values())}
        )

    return one_part.mapInPandas(train, schema="feature string, weight double")


def sgd_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed scoring with the sequentially-trained model (U2 path).

    (doc_id, spamminess, label): spamminess = Σ trained weights of the doc's
    features; label = 'spam' iff spamminess > 0
    (``a5/ApplySpamClassifier.scala:60-75``).
    """
    weights = sgd_train(spark, sf_dir)
    feats = _doc_features(spark, sf_dir)
    return (
        feats.select("doc_id", F.explode("features").alias("feature"))
        .join(F.broadcast(weights), "feature", "left")
        .groupBy("doc_id")
        .agg(
            F.round(F.coalesce(F.sum("weight"), F.lit(0.0)), 6).alias("spamminess")
        )
        .select(
            "doc_id",
            "spamminess",
            F.when(F.col("spamminess") > 0, F.lit("spam"))
            .otherwise(F.lit("ham"))
            .alias("label"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------

_FEATS = f"list_distinct({DUCKDB_TOKENS.format(col='text')})"

GD_ITERS = 5
GD_TICK = 1e-9  # weight/residual quantization (integer ticks)
GD_LR = LEARN_RATE


def batch_gd_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(feature, w_ticks): full-batch gradient-descent logistic regression —
    the DISTRIBUTED twin of ``sgd_train``, and the scale-correct one.

    The reference's online SGD (``a5/TrainSpamClassifier.scala:49-87``)
    is order-dependent and single-reducer by construction; batch GD
    computes each iteration's gradient over ALL docs as ordinary
    aggregates, so every step is shuffle-parallel and the result is
    partitioning-independent. Determinism across engines comes from
    running the numerics in INTEGER TICKS (1e-9): per-doc scores are
    exact BIGINT sums of weight ticks; the only floats are the sigmoid
    (evaluated on the same double both engines see) whose residual is
    immediately re-quantized ``floor(r·1e9 + 0.5)``; per-feature
    gradients are exact BIGINT sums of those ticks; and the lr step
    re-quantizes the same way. Five iterations; per-iteration cost is
    two feature-keyed aggregates + two vocabulary-sized joins, each
    ``localCheckpoint``-ed (the weight table is vocab-sized — tiny
    relative to the corpus at any scale).
    """
    feats = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            (F.col("lang") == "en").cast("int").alias("y"),
            F.explode(F.array_distinct(tokenize("text"))).alias("feature"),
        )
        .localCheckpoint()
    )
    w = (
        feats.select("feature")
        .distinct()
        .withColumn("w_ticks", F.lit(0).cast("long"))
        .localCheckpoint()
    )
    inv_tick = 1.0 / GD_TICK
    for _it in range(GD_ITERS):
        scores = (
            feats.join(w, "feature", "left")
            .groupBy("doc_id", "y")
            .agg(F.coalesce(F.sum("w_ticks"), F.lit(0)).alias("st"))
        )
        resid = scores.select(
            "doc_id",
            F.floor(
                (
                    F.col("y")
                    - F.lit(1.0)
                    / (F.lit(1.0) + F.exp(-(F.col("st") * F.lit(GD_TICK))))
                )
                * F.lit(inv_tick)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("rt"),
        )
        grad = (
            feats.join(resid, "doc_id")
            .groupBy("feature")
            .agg(F.sum("rt").alias("gt"))
        )
        w = grad.join(w, "feature", "left").select(
            "feature",
            (
                F.coalesce(F.col("w_ticks"), F.lit(0))
                + F.floor(F.col("gt") * F.lit(GD_LR) + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("w_ticks"),
        )
        # Materialize the vocab-sized weight table EVERY iteration (r14,
        # ADVICE r13): unlike the closure/LPA label tables — referenced
        # once per round — a lazy ``w`` is referenced TWICE by the next
        # iteration (the scores join and the grad-update join), and the
        # captured plan shows the duplicated corpus-sized gradient
        # subtree with NO static ReusedExchange (10 RDD scan operators in
        # the 2-step chain vs 4 for one step); avoiding the double execution
        # relied on runtime reuse this repo's own dedup notes call
        # unreliable across differently-shaped branches. The two
        # cadences measured a wash at sf0.1 (train 2.244 vs 2.236 s,
        # score 2.484 vs 2.349 — 5-trial medians), so the per-iteration
        # checkpoint is kept: the extra action is vocab-sized-cheap and
        # the at-scale risk (a corpus-sized gradient step running twice)
        # is gone by construction. Values are exact integer ticks, so
        # the cadence changes nothing downstream either way.
        w = w.localCheckpoint()
    return w


def batch_gd_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score_ticks, label): distributed scoring with the batch-GD
    model — the fully-oracle-checked train→score pair the sequential SGD
    path can't provide (its rows-only status is inherent; this twin's
    integer ticks survive the cross-engine hash). Same U2 plan shape as
    ``sgd_score``: explode ⋈ weights ⋈ sum; the model join is left to
    AQE (vocab-sized side)."""
    w = batch_gd_train(spark, sf_dir)
    feats = _doc_features(spark, sf_dir)
    return (
        feats.select("doc_id", F.explode("features").alias("feature"))
        .join(w, "feature", "left")
        .groupBy("doc_id")
        .agg(F.coalesce(F.sum("w_ticks"), F.lit(0)).alias("score_ticks"))
        .select(
            "doc_id",
            "score_ticks",
            F.when(F.col("score_ticks") > 0, F.lit("spam"))
            .otherwise(F.lit("ham"))
            .alias("label"),
        )
    )


def _batch_gd_oracle_sql(iters: int = GD_ITERS) -> str:
    """The GD loop unrolled as MATERIALIZED CTEs (each round references the
    previous weight table twice — inline expansion would be exponential,
    the kcore lesson)."""
    feats = (
        "SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y, "
        f"unnest(list_distinct({DUCKDB_TOKENS.format(col='text')})) AS feature "
        "FROM documents"
    )
    sql = f"""
    WITH feats AS MATERIALIZED ({feats}),
    w0 AS MATERIALIZED (
      SELECT DISTINCT feature, CAST(0 AS BIGINT) AS w_ticks FROM feats
    )"""
    for i in range(1, iters + 1):
        sql += f""",
    s{i} AS MATERIALIZED (
      SELECT f.doc_id, f.y,
             CAST(coalesce(sum(w.w_ticks), 0) AS BIGINT) AS st
      FROM feats f LEFT JOIN w{i - 1} w USING (feature)
      GROUP BY f.doc_id, f.y
    ),
    r{i} AS MATERIALIZED (
      SELECT doc_id,
             CAST(floor((y - 1.0 / (1.0 + exp(-(st * {GD_TICK}))))
                        * {1.0 / GD_TICK} + 0.5) AS BIGINT) AS rt
      FROM s{i}
    ),
    g{i} AS MATERIALIZED (
      SELECT f.feature, CAST(sum(r.rt) AS BIGINT) AS gt
      FROM feats f JOIN r{i} r USING (doc_id)
      GROUP BY f.feature
    ),
    w{i} AS MATERIALIZED (
      SELECT g.feature,
             CAST(coalesce(w.w_ticks, 0)
                  + CAST(floor(g.gt * {GD_LR} + 0.5) AS BIGINT) AS BIGINT)
               AS w_ticks
      FROM g{i} g LEFT JOIN w{i - 1} w USING (feature)
    )"""
    sql += f"""
    SELECT feature, w_ticks FROM w{iters}"""
    return sql


def _batch_gd_score_oracle_sql() -> str:
    train = _batch_gd_oracle_sql()
    # reuse the unrolled training CTE chain; score from its final table
    head, final = train.rsplit("SELECT feature, w_ticks FROM", 1)
    return f"""{head}
    SELECT f.doc_id,
           CAST(coalesce(sum(w.w_ticks), 0) AS BIGINT) AS score_ticks,
           CASE WHEN coalesce(sum(w.w_ticks), 0) > 0
                THEN 'spam' ELSE 'ham' END AS label
    FROM feats f LEFT JOIN {final.strip()} w USING (feature)
    GROUP BY f.doc_id"""


ORACLE_SQL: dict[str, str] = {
    "batch_gd_train": _batch_gd_oracle_sql(),
    "batch_gd_score": _batch_gd_score_oracle_sql(),
    "spam_score": f"""
        WITH feats AS (SELECT doc_id, unnest({_FEATS}) AS feature FROM documents),
        weights AS (SELECT feature, count(*) AS weight FROM feats GROUP BY feature),
        scores AS (
          -- CAST: DuckDB widens sum(BIGINT) to HUGEINT; Spark keeps bigint.
          SELECT f.doc_id, CAST(sum(w.weight) AS BIGINT) AS score
          FROM feats f JOIN weights w USING (feature)
          GROUP BY f.doc_id
        ),
        m AS (SELECT avg(score) AS mean_score FROM scores)
        SELECT doc_id, score,
               CASE WHEN score > m.mean_score THEN 'spam' ELSE 'ham' END AS label
        FROM scores CROSS JOIN m
    """,
    "spam_ensemble": f"""
        WITH feats AS (SELECT doc_id, unnest({_FEATS}) AS feature FROM documents),
        s0 AS (SELECT f.doc_id, CAST(sum(w.weight) AS BIGINT) AS score FROM feats f JOIN
               (SELECT feature, count(*) AS weight FROM feats WHERE doc_id % 3 = 0
                GROUP BY feature) w USING (feature) GROUP BY f.doc_id),
        s1 AS (SELECT f.doc_id, CAST(sum(w.weight) AS BIGINT) AS score FROM feats f JOIN
               (SELECT feature, count(*) AS weight FROM feats WHERE doc_id % 3 = 1
                GROUP BY feature) w USING (feature) GROUP BY f.doc_id),
        s2 AS (SELECT f.doc_id, CAST(sum(w.weight) AS BIGINT) AS score FROM feats f JOIN
               (SELECT feature, count(*) AS weight FROM feats WHERE doc_id % 3 = 2
                GROUP BY feature) w USING (feature) GROUP BY f.doc_id),
        m0 AS (SELECT avg(score) AS m FROM s0),
        m1 AS (SELECT avg(score) AS m FROM s1),
        m2 AS (SELECT avg(score) AS m FROM s2)
        SELECT s0.doc_id,
               CAST(s0.score + s1.score + s2.score AS BIGINT) AS score_sum,
               CASE WHEN (CASE WHEN s0.score > m0.m THEN 1 ELSE 0 END +
                          CASE WHEN s1.score > m1.m THEN 1 ELSE 0 END +
                          CASE WHEN s2.score > m2.m THEN 1 ELSE 0 END) * 2 > 3
                    THEN 'spam' ELSE 'ham' END AS vote_label
        FROM s0 JOIN s1 USING (doc_id) JOIN s2 USING (doc_id)
        CROSS JOIN m0 CROSS JOIN m1 CROSS JOIN m2
    """,
    # sgd_train / sgd_score: order-dependent sequential training — rows-only
    # (SURVEY §7 risk list: non-oracle-checkable by design).
}

QUERIES = {
    "spam_score": spam_score,
    "spam_ensemble": spam_ensemble,
    "sgd_train": sgd_train,
    "sgd_score": sgd_score,
    "batch_gd_train": batch_gd_train,
    "batch_gd_score": batch_gd_score,
}
