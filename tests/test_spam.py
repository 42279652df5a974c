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


def test_sgd_score_labels_present(spark):
    out = spam.sgd_score(spark, SF_SMOKE)
    assert out.count() > 0
    labels = {r["label"] for r in out.select("label").distinct().collect()}
    assert labels <= {"spam", "ham"}
