from __future__ import annotations

import pytest

from big_data_toolkit_spark.operators import quality
from tests.conftest import SF_ORACLE
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(quality.QUERIES))
def test_oracle_match(spark, name):
    df = quality.QUERIES[name](spark, SF_ORACLE)
    compare(df, quality.ORACLE_SQL[name], SF_ORACLE)


def test_map_only_no_shuffle(spark):
    """Row-wise curation ops must not shuffle: single stage, no Exchange."""
    for fn in (quality.lang_id, quality.quality_score, quality.token_count,
               quality.fingerprint, quality.repetition_score):
        plan = fn(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"{fn.__name__} shuffles"
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_quality_score_bounds(spark):
    rows = quality.quality_score(spark, SF_ORACLE).collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in rows)


def test_empty_text_edge_case(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(1, ""), (2, "..!?"), (3, "the the the")],
                               ["doc_id", "text"])
    df.createOrReplaceTempView("documents")
    # exercise the expressions directly on degenerate docs via temp table
    from big_data_toolkit_spark.functions.text import tokenize

    toks = df.select(tokenize("text").alias("t")).collect()
    assert [r["t"] for r in toks] == [[], [], ["the", "the", "the"]]


def test_text_clean_semantics(spark):
    rows = quality.text_clean(spark, SF_ORACLE).collect()
    assert any(r["n_removed"] > 0 for r in rows)  # stopwords exist in corpus
    for r in rows[:200]:
        toks = [t for t in r["clean_text"].split(" ") if t]
        assert not set(toks) & set(quality.STOPWORDS)
        assert "  " not in r["clean_text"]


def test_pii_redaction_semantics(spark):
    rows = quality.pii_redaction(spark, SF_ORACLE).collect()
    for r in rows[:200]:
        # the deterministic augmentation plants exactly one of each
        assert (r["n_email"], r["n_ip"], r["n_phone"]) == (1, 1, 1)
        red = r["redacted_text"]
        assert "<EMAIL>" in red and "<IP>" in red and "<PHONE>" in red
        assert "@" not in red
        assert "555-" not in red.replace("<PHONE>", "")


def test_clean_and_redact_are_map_only(spark):
    for fn in (quality.text_clean, quality.pii_redaction):
        plan = fn(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"{fn.__name__} shuffles"
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_redaction_is_idempotent(spark):
    """Redacting an already-redacted corpus is a no-op: the replacement
    markers contain nothing the PII patterns can re-match (guards against
    pattern/marker combinations that would oscillate across passes)."""
    first = quality.pii_redaction(spark, SF_ORACLE).select(
        "doc_id", "redacted_text"
    )
    first.createOrReplaceTempView("redacted_once")
    import pyspark.sql.functions as F

    again = first.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.col("redacted_text"), quality.PII_EMAIL, "<EMAIL>"
                ),
                quality.PII_IP,
                "<IP>",
            ),
            quality.PII_PHONE,
            "<PHONE>",
        ).alias("redacted_text"),
    )
    diff = first.exceptAll(again)
    assert diff.isEmpty()


def test_dsir_target_scores_higher(spark):
    """Docs FROM the target source must average a higher importance weight
    than the rest of the corpus — they are the distribution being matched."""
    import pyspark.sql.functions as F

    from big_data_toolkit_spark.catalog import load_table

    scores = quality.dsir_weights(spark, SF_ORACLE)
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "source")
    joined = scores.join(docs, "doc_id")
    means = {
        r["is_target"]: r["m"]
        for r in joined.groupBy(
            (F.col("source") == quality.DSIR_TARGET_SOURCE).alias("is_target")
        )
        .agg(F.avg("dsir_score").alias("m"))
        .collect()
    }
    assert means[True] > means[False]


def test_bigram_logprob_no_window_no_udf(spark):
    """Bigram formation is in-row (adjacent_pairs) and everything stays
    JVM-side: no Window operator, no Python eval in the plan."""
    plan = (
        quality.bigram_logprob(spark, SF_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_vocab_coverage_bounds(spark):
    """OOV rates in [0,1); counts reconcile: n_oov <= n_tokens and summing
    sources' token counts equals the corpus token count."""
    rows = quality.vocab_coverage(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert 0.0 <= r["oov_rate"] < 1.0
    total = sum(r["n_tokens"] for r in rows)
    corpus = (
        quality.token_count(spark, SF_ORACLE)
        .agg({"letter_tokens": "sum"})
        .collect()[0][0]
    )
    assert total == corpus
