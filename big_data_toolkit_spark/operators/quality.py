"""Per-document text analysis for training-data pipelines: language ID,
quality scoring, token counting, fingerprinting.

Not in the reference (SURVEY §2.8 stops at tokenize/split/log); these are the
row-wise curation operators an LLM-data pipeline runs over every document.
All four are pure column expressions — embarrassingly parallel, no shuffle at
all (``.explain`` shows a single WholeStageCodegen over the scan), which is
exactly what you want for a 100 TB map-only pass: throughput is bounded by
scan + codegen, and column pruning means only ``doc_id``/``text`` are read.

* **lang_id**: stopword-ratio heuristic — fraction of tokens in a small
  English function-word set; ≥ threshold → 'en'. (A production n-gram
  profile model is a broadcast-joined table of n-gram→lang weights — same
  plan shape; the heuristic keeps the oracle exact.)
* **quality_score**: length / punctuation-density / stopword-ratio /
  type-token-ratio features and a blended score — the C4/Gopher-style
  filter family as one expression.
* **token_count**: whitespace tokens, letter-run tokens, and a BPE-ish
  subword estimate (≈ ceil(letters/4) per word, the classic 4-chars-per-
  token heuristic) — all countable without materializing arrays.
* **fingerprint**: md5 of raw text plus an order-insensitive content
  fingerprint (md5 over the sorted distinct token set) — the join key for
  cross-snapshot dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_toolkit_spark.catalog import load_table
from big_data_toolkit_spark.functions.text import DUCKDB_TOKENS, tokenize

STOPWORDS = ("the", "a", "an", "of", "and", "in", "to", "is", "for", "on")
EN_THRESHOLD = 0.05  # stopword ratio at/above which we call it English
CHARS_PER_SUBWORD = 4


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, stopword_ratio, pred_lang) — stopword-ratio language ID."""
    docs = load_table(spark, sf_dir, "documents")
    t = tokenize("text")
    sw = F.array([F.lit(s) for s in STOPWORDS])
    # count of stopword *tokens* (array_intersect would dedup)
    stop_cnt = F.size(F.filter(t, lambda w: F.array_contains(sw, w)))
    ratio = F.when(F.size(t) > 0, stop_cnt / F.size(t)).otherwise(F.lit(0.0))
    return docs.select(
        "doc_id",
        F.round(ratio, 6).alias("stopword_ratio"),
        F.when(ratio >= EN_THRESHOLD, F.lit("en"))
        .otherwise(F.lit("other"))
        .alias("pred_lang"),
    )


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality features + blended score (C4/Gopher-style filters)."""
    docs = load_table(spark, sf_dir, "documents")
    t = tokenize("text")
    n_tokens = F.size(t)
    n_types = F.size(F.array_distinct(t))
    letters = F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z]", ""))
    sw = F.array([F.lit(s) for s in STOPWORDS])
    stop_ratio = F.when(
        n_tokens > 0, F.size(F.filter(t, lambda w: F.array_contains(sw, w))) / n_tokens
    ).otherwise(F.lit(0.0))
    ttr = F.when(n_tokens > 0, n_types / n_tokens).otherwise(F.lit(0.0))
    avg_len = F.when(n_tokens > 0, letters / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.least(n_tokens / F.lit(50.0), F.lit(1.0)) * 0.25
        + F.least(stop_ratio / F.lit(0.1), F.lit(1.0)) * 0.25
        + ttr * 0.25
        + F.least(avg_len / F.lit(5.0), F.lit(1.0)) * 0.25
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_types.alias("n_types"),
        F.round(ttr, 6).alias("type_token_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(avg_len, 6).alias("avg_token_len"),
        F.round(score, 6).alias("quality"),
    )


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, ws_tokens, letter_tokens, subword_estimate, n_chars)."""
    docs = load_table(spark, sf_dir, "documents")
    t = tokenize("text")
    ws_tokens = F.size(F.filter(F.split("text", " +"), lambda w: w != F.lit("")))
    subwords = F.aggregate(
        t,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / CHARS_PER_SUBWORD),
    )
    return docs.select(
        "doc_id",
        ws_tokens.alias("ws_tokens"),
        F.size(t).alias("letter_tokens"),
        subwords.alias("subword_estimate"),
        F.length("text").alias("n_chars"),
    )


ROLLING_MOD = (1 << 31) - 1  # Mersenne 2^31-1: acc*31+code stays < 2^36, no overflow
ROLLING_MULT = 31


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, text_md5, content_md5, rolling_hash).

    text_md5: raw-byte identity. content_md5: order-insensitive (sorted
    distinct token set) — the cross-snapshot dedup join key. rolling_hash:
    polynomial rolling hash over characters, h = (h·31 + code) mod 2^31−1,
    computed as an in-row fold (``F.aggregate``) — the streaming-friendly
    fingerprint a chunk-level dedup uses, same value in the DuckDB oracle.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = tokenize("text")
    rolling = F.expr(
        "aggregate(filter(split(text, ''), c -> c <> ''), 0L, "
        f"(acc, c) -> (acc * {ROLLING_MULT} + ascii(c)) % {ROLLING_MOD})"
    )
    return docs.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(t)))).alias(
            "content_md5"
        ),
        rolling.alias("rolling_hash"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------

_T = DUCKDB_TOKENS.format(col="text")
_SW = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"

ORACLE_SQL: dict[str, str] = {
    "lang_id": f"""
        WITH x AS (
          SELECT doc_id, {_T} AS t FROM documents
        ),
        r AS (
          SELECT doc_id,
                 CASE WHEN len(t) > 0
                      THEN len(list_filter(t, w -> list_contains({_SW}, w)))::DOUBLE / len(t)
                      ELSE 0.0 END AS ratio
          FROM x
        )
        SELECT doc_id, round(ratio, 6) AS stopword_ratio,
               CASE WHEN ratio >= {EN_THRESHOLD} THEN 'en' ELSE 'other' END AS pred_lang
        FROM r
    """,
    "quality_score": f"""
        WITH x AS (
          SELECT doc_id, text, {_T} AS t,
                 length(text) AS n_chars,
                 length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS letters
          FROM documents
        ),
        f AS (
          SELECT doc_id,
                 len(t) AS n_tokens,
                 len(list_distinct(t)) AS n_types,
                 CASE WHEN len(t) > 0 THEN len(list_distinct(t))::DOUBLE / len(t) ELSE 0.0 END AS ttr,
                 CASE WHEN len(t) > 0
                      THEN len(list_filter(t, w -> list_contains({_SW}, w)))::DOUBLE / len(t)
                      ELSE 0.0 END AS stop_ratio,
                 CASE WHEN len(t) > 0 THEN letters::DOUBLE / len(t) ELSE 0.0 END AS avg_len
          FROM x
        )
        SELECT doc_id, n_tokens, n_types,
               round(ttr, 6) AS type_token_ratio,
               round(stop_ratio, 6) AS stopword_ratio,
               round(avg_len, 6) AS avg_token_len,
               round(least(n_tokens / 50.0, 1.0) * 0.25
                     + least(stop_ratio / 0.1, 1.0) * 0.25
                     + ttr * 0.25
                     + least(avg_len / 5.0, 1.0) * 0.25, 6) AS quality
        FROM f
    """,
    "token_count": f"""
        SELECT doc_id,
               len(list_filter(string_split_regex(text, ' +'), w -> w <> '')) AS ws_tokens,
               len({_T}) AS letter_tokens,
               list_sum(list_transform({_T}, w -> ceil(length(w) / {CHARS_PER_SUBWORD}.0)::BIGINT))::BIGINT AS subword_estimate,
               length(text) AS n_chars
        FROM documents
    """,
    "fingerprint": f"""
        SELECT doc_id,
               md5(text) AS text_md5,
               md5(array_to_string(list_sort(list_distinct({_T})), ' ')) AS content_md5,
               list_reduce(
                 list_prepend(0::BIGINT,
                   list_transform(string_split_regex(text, ''), c -> ord(c)::BIGINT)),
                 (acc, c) -> (acc * {ROLLING_MULT} + c) % {ROLLING_MOD}
               ) AS rolling_hash
        FROM documents
    """,
}

QUERIES = {
    "lang_id": lang_id,
    "quality_score": quality_score,
    "token_count": token_count,
    "fingerprint": fingerprint,
}
