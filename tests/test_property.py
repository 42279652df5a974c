"""Hypothesis property tests for the cross-engine scalar kernels.

Every oracle comparison in the suite bottoms out in a handful of pinned
expressions — the md5→32-bit hash bridge, the rolling-hash fold, in-array
pair generation. These fuzz those kernels against independent replicas
(DuckDB for the hash bridge, pure Python for the folds) on adversarial
generated input, where the seeded-random fuzz in test_tokenizer_parity
covers only the tokenizer.
"""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_toolkit_spark.functions.text import adjacent_pairs, tokenize
from big_data_toolkit_spark.operators.curation import _H32_SQL, _hash32
from big_data_toolkit_spark.operators.quality import ROLLING_MOD, ROLLING_MULT

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_SETTINGS
@given(ids=st.lists(st.integers(min_value=0, max_value=2**62), max_size=30))
def test_hash32_bridge_parity(spark, ids):
    """Spark's conv(substr(md5)) == DuckDB's ('0x'||substr(md5))::BIGINT —
    the primitive under sampling, MinHash, and shard packing."""
    df = spark.createDataFrame([(i,) for i in ids], "v long")
    got = {
        r["v"]: r["h"]
        for r in df.select("v", _hash32(F.col("v")).alias("h")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v BIGINT)")
    if ids:
        con.executemany("INSERT INTO t VALUES (?)", [(i,) for i in ids])
    want = dict(
        con.sql(f"SELECT v, {_H32_SQL.format(col='v')} FROM t").fetchall()
    )
    con.close()
    assert got == want


@_SETTINGS
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=1, max_codepoint=127),
            max_size=60,
        ),
        max_size=20,
    )
)
def test_rolling_hash_matches_python_fold(spark, texts):
    """The in-row F.aggregate rolling hash == the obvious Python loop."""
    rolling = F.expr(
        "aggregate(filter(split(text, ''), c -> c <> ''), 0L, "
        f"(acc, c) -> (acc * {ROLLING_MULT} + ascii(c)) % {ROLLING_MOD})"
    )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {r["i"]: r["h"] for r in df.select("i", rolling.alias("h")).collect()}
    for i, t in enumerate(texts):
        acc = 0
        for c in t:
            acc = (acc * ROLLING_MULT + ord(c)) % ROLLING_MOD
        assert got[i] == acc, f"divergence on {t!r}"


@_SETTINGS
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=1000),
            max_size=60,
        ),
        max_size=20,
    )
)
def test_adjacent_pairs_matches_python_zip(spark, texts):
    """In-array bigram formation == zip(tokens, tokens[1:]) over the same
    pinned tokenization."""
    import re

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r["i"]: [(p["a"], p["b"]) for p in r["p"]]
        for r in df.withColumn("toks", tokenize("text"))
        .select("i", adjacent_pairs(F.col("toks")).alias("p"))
        .collect()
    }
    for i, t in enumerate(texts):
        toks = [w for w in re.split("[^a-zA-Z]+", t.lower()) if w != ""]
        assert got[i] == list(zip(toks, toks[1:])), f"divergence on {t!r}"
