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


def test_pmi_stripes_is_long_form_repacked(spark):
    """Stripes and pairs are two FORMATS of one PMI computation (the
    reference's StripesPMI vs PairsPMI): the map column must carry exactly
    the long-form rows, keyed by left word, b-sorted, with (pmi, cnt)
    values — and every left word with >=1 surviving pair gets a stripe."""
    pairs = ta.pmi_pairs(spark, SF_ORACLE).collect()
    stripes = ta.pmi_stripes(spark, SF_ORACLE).collect()
    want: dict[str, dict[str, tuple[float, int]]] = {}
    for r in pairs:
        want.setdefault(r["a"], {})[r["b"]] = (r["pmi"], r["pair_cnt"])
    got = {
        r["a"]: {b: (v["pmi"], v["cnt"]) for b, v in r["stripe"].items()}
        for r in stripes
    }
    assert got == want
    # entry order inside each stripe is the b-sorted pack order — checked
    # engine-side via map_entries (collect()'s Python dict does not
    # preserve Spark's map entry order)
    orders = (
        ta.pmi_stripes(spark, SF_ORACLE)
        .select(F.transform(F.map_entries("stripe"), lambda e: e["key"]).alias("ks"))
        .collect()
    )
    for r in orders:
        assert r["ks"] == sorted(r["ks"])


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


def _py_bpe_merge(syms, x, y):
    """Reference greedy left-to-right merge (the classic merge_word scan)."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
            out.append(x + y)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def test_bpe_merge_fold_matches_reference_scan(spark):
    """The Catalyst fold must equal the classic merge scan on adversarial
    sequences — especially overlapping x==y runs ('aaa', 'aaaa')."""
    import itertools

    cases = ["".join(p) for n in range(0, 6) for p in itertools.product("ab", repeat=n)]
    df = spark.createDataFrame(
        [(i, list(w)) for i, w in enumerate(cases)], "id long, syms array<string>"
    )
    for x, y in (("a", "a"), ("a", "b"), ("b", "a")):
        got = {
            r["id"]: list(r["m"])
            for r in df.select(
                "id", F.expr(ta._bpe_merge_expr(x, y)).alias("m")
            ).collect()
        }
        for i, w in enumerate(cases):
            assert got[i] == _py_bpe_merge(list(w), x, y), (w, x, y)


def test_bpe_merges_counts_non_increasing(spark):
    """Merge-rule counts are non-increasing (a new pair's occurrences are a
    subset of a pre-merge pair's) and every rule is over distinct symbols
    learned deterministically."""
    rows = ta.bpe_merges(spark, SF_SMOKE).collect()
    assert len(rows) == ta.BPE_MERGES
    assert [r["step"] for r in rows] == list(range(1, ta.BPE_MERGES + 1))
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r["pair_count"] > 0 for r in rows)
    # determinism: a second run learns the identical table
    again = ta.bpe_merges(spark, SF_SMOKE).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_bpe_vocab_reconciles_with_corpus(spark):
    """Total subword-token mass is conserved: Σ token·cnt characters ==
    total tokenized corpus characters (merges never drop symbols)."""
    rows = ta.bpe_vocab(spark, SF_SMOKE).collect()
    assert rows
    total_chars = sum(len(r["token"]) * r["cnt"] for r in rows)
    want = (
        ta._doc_tokens(spark, SF_SMOKE)
        .select(F.explode("tokens").alias("w"))
        .agg(F.sum(F.length("w")))
        .first()[0]
    )
    assert total_chars == want
    # merged tokens exist (the rules actually applied)
    assert any(len(r["token"]) > 1 for r in rows)


def test_bpe_oracle_matches_on_xyxy_corpus(spark, tmp_path):
    """Regression (round-7 review): the oracle's greedy parity window must
    not under-merge xyxy-patterned words (x != y) — 'abab' merges to
    ['ab','ab'], never ['ab','a','b']. Build a corpus whose TOP pair is
    (a,b) with 'abab' present and compare engines end-to-end."""
    import os

    import duckdb

    from big_data_toolkit_spark.catalog import TABLES

    sf = str(tmp_path)
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{SF_SMOKE}/{t}.parquet", f"{sf}/{t}.parquet")
    duckdb.sql(
        "COPY (SELECT * FROM (VALUES "
        "(0, 'abab abab papa', 'en', 'src0', 14), "
        "(1, 'ab ab ab mama', 'en', 'src0', 13), "
        "(2, 'aaab abab abba', 'en', 'src0', 14)"
        ") t(doc_id, text, lang, source, n_chars)) "
        f"TO '{sf}/documents.parquet' (FORMAT PARQUET)"
    )
    compare(ta.bpe_merges(spark, sf), ta.ORACLE_SQL["bpe_merges"], sf, strict=True)
    compare(ta.bpe_vocab(spark, sf), ta.ORACLE_SQL["bpe_vocab"], sf, strict=True)


def test_cms_estimates_bound_the_truth(spark):
    """Count-Min can only over-count: exact <= est <= exact + (e/width)·N
    for every probed word (the standard CMS guarantee, here deterministic)."""
    import math

    rows = ta.heavy_hitters_cms(spark, SF_SMOKE).collect()
    assert len(rows) == ta.CMS_TOP_K
    n_tokens = (
        ta._doc_tokens(spark, SF_SMOKE)
        .select(F.explode("tokens"))
        .count()
    )
    eps = math.e / ta.CMS_WIDTH
    for r in rows:
        assert r["est_cnt"] >= r["exact_cnt"], r
        assert r["est_cnt"] <= r["exact_cnt"] + eps * n_tokens, r
