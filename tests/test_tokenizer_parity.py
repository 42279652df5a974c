"""Cross-engine tokenizer parity fuzz: the pinned Spark tokenizer and the
DUCKDB_TOKENS oracle fragment must agree on arbitrary input — if they ever
diverge, every text-operator oracle comparison silently rests on luck."""

from __future__ import annotations

import random
import string

import duckdb

from big_data_toolkit_spark.functions.text import DUCKDB_TOKENS, tokenize

ALPHABET = (
    string.ascii_letters + string.digits + " .,!?-_'\"\t/\\()[]{}@#$%^&*"
    + "éüñçåßПривет你好🙂"
)


def _random_strings(n: int, seed: int = 42) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        length = rng.randint(0, 80)
        out.append("".join(rng.choice(ALPHABET) for _ in range(length)))
    out.extend(["", " ", "a", "A-b_C 3d", "...", "ALLCAPS lower MiXeD"])
    return out


def test_tokenize_matches_duckdb_on_fuzzed_input(spark):
    samples = _random_strings(300)
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], ["i", "text"])
    spark_rows = {
        r["i"]: r["t"] for r in df.select("i", tokenize("text").alias("t")).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(samples)))
    duck_rows = dict(
        con.sql(
            f"SELECT i, {DUCKDB_TOKENS.format(col='text')} FROM t"
        ).fetchall()
    )
    con.close()

    assert spark_rows.keys() == duck_rows.keys()
    for i in spark_rows:
        assert spark_rows[i] == duck_rows[i], f"divergence on {samples[i]!r}"
