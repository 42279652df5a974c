from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_toolkit_spark.functions.text import (
    adjacent_pairs,
    ordered_cooccurrence_pairs,
    tokenize,
)
from big_data_toolkit_spark.operators import text_analytics as ta
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(ta.QUERIES))
def test_oracle_match(spark, name):
    df = ta.QUERIES[name](spark, SF_ORACLE)
    compare(df, ta.ORACLE_SQL[name], SF_ORACLE)


def test_tokenizer_pinned_semantics(spark):
    df = spark.createDataFrame(
        [("A Perfect-Day!! 123 foo_bar",), ("",), ("...",)], ["text"]
    )
    rows = df.select(tokenize("text").alias("t")).collect()
    assert rows[0]["t"] == ["a", "perfect", "day", "foo", "bar"]
    assert rows[1]["t"] == []
    assert rows[2]["t"] == []


def test_adjacent_pairs_edges(spark):
    df = spark.createDataFrame([(["a", "b", "c"],), (["solo"],), ([],)], ["tokens"])
    rows = df.select(adjacent_pairs(F.col("tokens")).alias("p")).collect()
    assert [(x["a"], x["b"]) for x in rows[0]["p"]] == [("a", "b"), ("b", "c")]
    # single-token and empty lines produce no pairs (reference skips them,
    # a2/ComputeBigramRelativeFrequencyPairs.scala:64-70)
    assert rows[1]["p"] == []
    assert rows[2]["p"] == []


def test_cooccurrence_pairs(spark):
    df = spark.createDataFrame([(["x", "y", "z"],)], ["tokens"])
    pairs = df.select(
        F.explode(ordered_cooccurrence_pairs(F.col("tokens"))).alias("p")
    ).collect()
    got = {(r["p"]["a"], r["p"]["b"]) for r in pairs}
    assert got == {("x", "y"), ("x", "z"), ("y", "x"), ("y", "z"), ("z", "x"), ("z", "y")}


def test_pmi_threshold_applied(spark):
    df = ta.pmi_pairs(spark, SF_ORACLE)
    assert df.where(F.col("pair_cnt") < ta.PMI_THRESHOLD).count() == 0


def test_pmi_unigram_joins_unhinted(spark):
    """The unigram-count joins must carry NO user broadcast hint: the
    vocabulary is corpus-derived (heavy-tailed at 100 TB), so the strategy
    is AQE's call. Only the one-row n_lines crossJoin may be hinted."""
    df = ta.pmi_pairs(spark, SF_ORACLE)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    # the single permitted hint is the 1-row n_lines frame
    assert logical.count("JoinHint") <= 1 and logical.count("BROADCAST") <= 1, (
        logical
    )


def test_keyword_extraction_shape_and_prune(spark):
    """Exactly <=3 keywords per doc, ranks 1..k dense from 1, and the
    row_number cut plans as WindowGroupLimit (map-side 3-row prune per doc
    before the doc_id exchange)."""
    df = ta.keyword_extraction(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    rows = df.collect()
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["rank"])
    assert by_doc
    for ranks in by_doc.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= ta.KEYWORDS_PER_DOC
