from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from big_data_toolkit_spark.operators import spam
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(spam.ORACLE_SQL))
def test_oracle_match(spark, name):
    df = spam.QUERIES[name](spark, SF_ORACLE)
    compare(df, spam.ORACLE_SQL[name], SF_ORACLE)


def test_sgd_train_deterministic(spark):
    w1 = {r["feature"]: r["weight"] for r in spam.sgd_train(spark, SF_SMOKE).collect()}
    w2 = {r["feature"]: r["weight"] for r in spam.sgd_train(spark, SF_SMOKE).collect()}
    assert w1 == w2  # bit-identical across runs (fixed order, one partition)
    assert len(w1) > 10


def test_sgd_train_matches_reference_python_loop(spark):
    """Engine training == straight Python replica of a5/TrainSpamClassifier."""
    import duckdb

    rows = duckdb.sql(
        "SELECT doc_id, lang, text FROM "
        f"'{SF_SMOKE}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    import re

    w: dict[str, float] = {}
    for _doc_id, lang, text in rows:
        feats = list(dict.fromkeys([t for t in re.split("[^a-z]+", text.lower()) if t]))
        score = sum(w.get(f, 0.0) for f in feats)
        prob = 1.0 / (1.0 + math.exp(-score))
        delta = ((1 if lang == "en" else 0) - prob) * spam.LEARN_RATE
        for f in feats:
            w[f] = w.get(f, 0.0) + delta

    got = {r["feature"]: r["weight"] for r in spam.sgd_train(spark, SF_SMOKE).collect()}
    assert got.keys() == w.keys()
    # EXACT equality, not approx: both folds visit docs in doc_id order and
    # features in first-occurrence order, so every float op sequence is
    # identical — any drift means the update rule changed, which is the one
    # thing the DuckDB oracle can never catch for order-dependent training.
    mismatch = {f: (got[f], w[f]) for f in w if got[f] != w[f]}
    assert not mismatch, f"weight drift (first 5): {dict(list(mismatch.items())[:5])}"


def test_sgd_train_matches_independent_numpy_fold(spark):
    """Second INDEPENDENT implementation check for the rows-only sgd_train
    (r5 verdict item 6): a NumPy fold with a different data layout
    (vocab-indexed weight vector vs dict) and a different update-application
    order (reversed feature order via np.add.at).

    Expected BIT-equal, not approx, because the two legitimate degrees of
    freedom cannot change any float bit: (a) the score accumulation order
    is part of the operator's definition (features in first-occurrence
    order, sequential scalar adds) and is preserved here; (b) per-feature
    weight updates within one doc are independent accumulators (each
    feature appears once after array_distinct), so applying them in
    reverse order touches disjoint cells. Agreement between two folds that
    share no code is the strongest check available for order-dependent
    training no SQL oracle can express."""
    import re

    import duckdb
    import numpy as np

    rows = duckdb.sql(
        "SELECT doc_id, lang, text FROM "
        f"'{SF_SMOKE}/documents.parquet' ORDER BY doc_id"
    ).fetchall()

    vocab: dict[str, int] = {}
    docs = []
    for _doc_id, lang, text in rows:
        feats = list(dict.fromkeys(t for t in re.split("[^a-z]+", text.lower()) if t))
        idx = np.array(
            [vocab.setdefault(f, len(vocab)) for f in feats], dtype=np.int64
        )
        docs.append((1.0 if lang == "en" else 0.0, idx))

    w = np.zeros(len(vocab), dtype=np.float64)
    for y, idx in docs:
        score = 0.0
        for i in idx:  # sequential fold — the operator's defined order
            score += w[i]
        prob = 1.0 / (1.0 + math.exp(-score))
        delta = (y - prob) * spam.LEARN_RATE
        np.add.at(w, idx[::-1], delta)  # reversed order: disjoint cells

    got = {r["feature"]: r["weight"] for r in spam.sgd_train(spark, SF_SMOKE).collect()}
    assert got.keys() == vocab.keys()
    mismatch = {f: (got[f], w[i]) for f, i in vocab.items() if got[f] != w[i]}
    assert not mismatch, f"weight drift (first 5): {dict(list(mismatch.items())[:5])}"


def test_sgd_score_labels_present(spark):
    out = spam.sgd_score(spark, SF_SMOKE)
    assert out.count() > 0
    labels = {r["label"] for r in out.select("label").distinct().collect()}
    assert labels <= {"spam", "ham"}


def test_batch_gd_matches_python_replica_exactly(spark):
    """The distributed GD must equal a straight-Python fold of the same
    quantized algorithm EXACTLY (integer ticks — no tolerance), proving
    partitioning-independence of every step."""
    import math

    from tests.conftest import SF_ORACLE

    from big_data_toolkit_spark.catalog import load_table
    from big_data_toolkit_spark.functions.text import tokenize as _tok
    from pyspark.sql import functions as F

    docs = (
        load_table(spark, SF_ORACLE, "documents")
        .select(
            "doc_id",
            (F.col("lang") == "en").cast("int").alias("y"),
            F.array_distinct(_tok("text")).alias("features"),
        )
        .collect()
    )
    w: dict[str, int] = {
        f: 0 for r in docs for f in r["features"]
    }
    inv = 1.0 / spam.GD_TICK
    for _ in range(spam.GD_ITERS):
        grad: dict[str, int] = {f: 0 for f in w}
        for r in docs:
            st = sum(w[f] for f in r["features"])
            rt = math.floor(
                (r["y"] - 1.0 / (1.0 + math.exp(-(st * spam.GD_TICK)))) * inv
                + 0.5
            )
            for f in r["features"]:
                grad[f] += rt
        for f in w:
            w[f] += math.floor(grad[f] * spam.GD_LR + 0.5)
    got = {
        r["feature"]: r["w_ticks"]
        for r in spam.batch_gd_train(spark, SF_ORACLE).collect()
    }
    assert got == w


def test_batch_gd_learns_separation(spark):
    """Trained weights must separate en from non-en docs: mean score of
    y=1 docs strictly above mean score of y=0 docs."""
    from tests.conftest import SF_ORACLE

    from big_data_toolkit_spark.catalog import load_table
    from big_data_toolkit_spark.functions.text import tokenize as _tok
    from pyspark.sql import functions as F

    w = spam.batch_gd_train(spark, SF_ORACLE)
    docs = load_table(spark, SF_ORACLE, "documents").select(
        "doc_id",
        (F.col("lang") == "en").cast("int").alias("y"),
        F.explode(F.array_distinct(_tok("text"))).alias("feature"),
    )
    scored = (
        docs.join(w, "feature")
        .groupBy("doc_id", "y")
        .agg(F.sum("w_ticks").alias("st"))
        .groupBy("y")
        .agg(F.avg("st").alias("mean_score"))
        .collect()
    )
    means = {r["y"]: r["mean_score"] for r in scored}
    assert means[1] > means[0], means
