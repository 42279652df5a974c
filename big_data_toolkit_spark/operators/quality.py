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
from big_data_toolkit_spark.functions.text import (
    DUCKDB_TOKENS,
    adjacent_pairs,
    tokenize,
)

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


def quality_expressions() -> dict[str, F.Column]:
    """The quality feature/score Columns over a ``text`` column — THE single
    definition, shared by ``quality_score`` and the streaming curation gate
    (``streaming/curation.py``) so batch and stream cannot drift."""
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
    return {
        "n_tokens": n_tokens,
        "n_types": n_types,
        "stop_ratio": stop_ratio,
        "ttr": ttr,
        "avg_len": avg_len,
        "score": score,
        "cleaned_tokens": F.filter(t, lambda w: ~F.array_contains(sw, w)),
    }


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality features + blended score (C4/Gopher-style filters)."""
    docs = load_table(spark, sf_dir, "documents")
    e = quality_expressions()
    return docs.select(
        "doc_id",
        e["n_tokens"].alias("n_tokens"),
        e["n_types"].alias("n_types"),
        F.round(e["ttr"], 6).alias("type_token_ratio"),
        F.round(e["stop_ratio"], 6).alias("stopword_ratio"),
        F.round(e["avg_len"], 6).alias("avg_token_len"),
        F.round(e["score"], 6).alias("quality"),
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


def repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bigrams, n_distinct_bigrams, dup_bigram_ratio).

    Gopher-style within-document repetition filter: the fraction of adjacent
    bigram instances that are repeats of an earlier bigram in the same doc.
    Pure in-row array expressions — map-only, no shuffle; integer counts and
    a single final division keep the oracle comparison exact.
    """
    docs = load_table(spark, sf_dir, "documents")
    bigrams = F.expr(
        "CASE WHEN size(t) < 2 THEN array() "
        "ELSE transform(sequence(0, size(t) - 2), "
        "i -> concat_ws(' ', t[i], t[i+1])) END"
    )
    n = F.size("bg")
    d = F.size(F.array_distinct("bg"))
    return (
        docs.select("doc_id", tokenize("text").alias("t"))
        .select("doc_id", bigrams.alias("bg"))
        .select(
            "doc_id",
            n.alias("n_bigrams"),
            d.alias("n_distinct_bigrams"),
            F.when(n > 0, F.round((n - d) / n, 6))
            .otherwise(F.lit(0.0))
            .alias("dup_bigram_ratio"),
        )
    )


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, mean_logprob) — corpus-unigram perplexity proxy.

    Fit and score in one plan: token → corpus count (one aggregation), the
    corpus total as an in-plan one-row broadcast (the A8 pattern —
    no driver-side collect), then every token instance joins its count and
    each doc averages log10 p(token). The per-doc sum folds over the SORTED
    logp list (``sort_array`` / ``list_sort``), so float addition order is
    pinned and both engines produce bit-identical means regardless of
    partitioning. Docs whose token list is empty have no instances and are
    absent — same in the oracle.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokenize("text")).alias("token"))
    cnts = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    total = cnts.agg(F.sum("cnt").alias("total"))
    lp = (
        toks.join(cnts, "token")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id", (F.log10("cnt") - F.log10("total")).alias("logp")
        )
    )
    per_doc = lp.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sort_array(F.collect_list("logp")).alias("lps"),
    )
    fold = F.expr("aggregate(lps, 0D, (acc, v) -> acc + v)")
    return per_doc.select(
        "doc_id",
        "n_tokens",
        F.round(fold / F.col("n_tokens"), 6).alias("mean_logprob"),
    )


BIGRAM_LAMBDA = 0.5  # interpolation weight; 0.5 is exactly representable


def bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bigrams, mean_logprob) — interpolated-bigram LM fluency
    score, the order-sensitive upgrade of ``unigram_logprob``.

    Jelinek-Mercer interpolation: p(b|a) = λ·c(a,b)/c(a) + (1−λ)·c(b)/N
    with λ = {BIGRAM_LAMBDA} (exactly representable, so the interpolation
    itself cannot drift cross-engine), fit on the whole corpus and scored
    in the same plan. A doc's score is its mean log10 p over bigram
    instances — word-salad shuffles of fluent text keep their unigram
    score but crater here, which is what makes the bigram model worth its
    extra dictionary. Docs with fewer than two tokens have no bigrams and
    are absent, as in the oracle.

    Scale: bigram formation is in-row (``adjacent_pairs`` — no
    window/lead shuffle); the model is two dictionary aggregations (bigram
    + unigram counts, both partial-aggregated); scoring joins each
    instance through those dictionaries with the corpus total as a one-row
    broadcast; the per-doc sum folds over the SORTED logp list (pinned
    float order).
    """
    docs = load_table(spark, sf_dir, "documents")
    # Stage the tokenized corpus ONCE (r14, the spam-family §2.4/§5
    # shape): the bigram spine, the bigram dictionary, and the THREE
    # unigram-dictionary references all re-derived (scan + regex
    # tokenize) from the raw text — the captured plan embedded FIVE
    # distinct parquet scan chains; map-only branches have no exchange to reuse.
    # One checkpoint of the (doc_id, tokens) frame turns every reference
    # into an RDD scan; at 100 TB this is the same "stage the exploded
    # frame" call the spam family makes, and a real pipeline would stage
    # its tokenized corpus at exactly this boundary.
    toks = docs.select("doc_id", tokenize("text").alias("t")).localCheckpoint()
    bg = (
        toks.where(F.size("t") >= 2)
        .select("doc_id", F.explode(adjacent_pairs("t")).alias("p"))
        .select("doc_id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )
    cu = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cu"))
    )
    cb = bg.groupBy("a", "b").agg(F.count("*").alias("cb"))
    total = cu.agg(F.sum("cu").alias("n"))
    logp = F.log10(
        F.lit(BIGRAM_LAMBDA) * (F.col("cb") / F.col("ca"))
        + F.lit(1.0 - BIGRAM_LAMBDA) * (F.col("cub") / F.col("n"))
    )
    per_doc = (
        bg.join(cb, ["a", "b"])
        .join(cu.select(F.col("w").alias("a"), F.col("cu").alias("ca")), "a")
        .join(cu.select(F.col("w").alias("b"), F.col("cu").alias("cub")), "b")
        .crossJoin(F.broadcast(total))
        .select("doc_id", logp.alias("logp"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sort_array(F.collect_list("logp")).alias("lps"),
        )
    )
    fold = F.expr("aggregate(lps, 0D, (acc, v) -> acc + v)")
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        F.round(fold / F.col("n_bigrams"), 6).alias("mean_logprob"),
    )


DSIR_TARGET_SOURCE = "src0"  # the high-quality "target domain" stand-in


def dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, dsir_score) — importance weights for data
    selection, DSIR-style (Xie et al. 2023: Data Selection via Importance
    Resampling).

    Per-token log importance ratio between a unigram model fit on the
    TARGET domain (here the ``{DSIR_TARGET_SOURCE}`` source, the
    high-quality-corpus stand-in) and one fit on the whole corpus, add-one
    smoothed over the shared vocabulary; a doc's weight is its mean ratio:

        dsir(d) = (1/|d|) Σ_w ln( p_target(w) / p_corpus(w) )

    Docs scoring high look like the target domain — resampling by these
    weights is the DSIR recipe for tilting a 100 TB crawl toward quality.
    Fit and score in one plan (the ``unigram_logprob`` pattern): ONE
    aggregation computes both models' counts (the target count is a
    conditional sum riding the same shuffle), totals are a one-row in-plan
    broadcast, each token instance joins its ratio through the vocab-sized
    dictionary, and the per-doc sum folds over the SORTED ratio list so
    float addition order is pinned cross-engine. All count arithmetic is
    exact integers; the two divisions and one ``ln`` are written with
    identical expression trees in both engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.explode(tokenize("text")).alias("token")
    )
    cnts = toks.groupBy("token").agg(
        F.count("*").alias("cc"),
        F.sum(
            F.when(F.col("source") == DSIR_TARGET_SOURCE, 1).otherwise(0)
        ).alias("ct"),
    )
    totals = cnts.agg(
        F.sum("cc").alias("nc"), F.sum("ct").alias("nt"), F.count("*").alias("v")
    )
    lw = F.log(
        ((F.col("ct") + F.lit(1)) / (F.col("nt") + F.col("v")))
        / ((F.col("cc") + F.lit(1)) / (F.col("nc") + F.col("v")))
    )
    per_doc = (
        toks.join(cnts, "token")
        .crossJoin(F.broadcast(totals))
        .select("doc_id", lw.alias("lw"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sort_array(F.collect_list("lw")).alias("ws"),
        )
    )
    fold = F.expr("aggregate(ws, 0D, (acc, v) -> acc + v)")
    return per_doc.select(
        "doc_id",
        "n_tokens",
        # + 0.0 normalizes IEEE negative zero: a mean log-ratio that rounds
        # to -0.0 on one engine and +0.0 on the other serializes as '-0' vs
        # '0' and hash-fails despite equal values (caught by the r8 sf0.1
        # sweep; all other values are bit-unchanged by adding +0.0).
        (F.round(fold / F.col("n_tokens"), 6) + F.lit(0.0)).alias("dsir_score"),
    )


BENCHMARK_MOD = 50  # doc_id % 50 == 0 → the stand-in held-out benchmark set


def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, overlap_cnt) — n-gram decontamination against a benchmark set.

    The training-data hygiene pass: flag corpus documents sharing any
    3-token shingle with a held-out benchmark (stand-in: doc_id %
    ``BENCHMARK_MOD`` == 0 — deterministic, so the oracle reproduces it; a
    real run swaps in the benchmark table). The benchmark's distinct-shingle
    side is benchmark-sized (small by construction), so AQE broadcasts it
    and the check is a map-only scan of the corpus shingles at 100 TB — no
    self-join, no shuffle of corpus text.
    """
    from big_data_toolkit_spark.operators.dedup import _shingles

    sh = _shingles(spark, sf_dir)
    bench_sh = (
        sh.where(F.col("doc_id") % BENCHMARK_MOD == 0).select("shingle").distinct()
    )
    return (
        sh.where(F.col("doc_id") % BENCHMARK_MOD != 0)
        .join(bench_sh, "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("overlap_cnt"))
    )


QUANTILE_P = 0.75  # keep the top quartile


def quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, quality): docs at/above the corpus P75 quality threshold.

    Quantile-threshold curation: the cut is computed by EXACT linear-
    interpolation percentile (sort-based; both engines apply
    a + (b-a)·f to the same sorted values, so the threshold is
    bit-identical — verified for int and rounded-double columns) and
    broadcast as a one-row frame. At 100 TB swap ``percentile`` for
    ``approx_percentile`` and the plan is unchanged — only the aggregate
    differs; the exact form keeps the oracle comparison strict.
    """
    q = quality_score(spark, sf_dir).select("doc_id", "quality")
    thr = q.agg(F.expr(f"percentile(quality, {QUANTILE_P}D)").alias("thr"))
    return (
        q.crossJoin(F.broadcast(thr))
        .where(F.col("quality") >= F.col("thr"))
        .select("doc_id", "quality")
    )


def corpus_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_langs, total_tokens, total_chars, min_chars,
    max_chars): per-source corpus report.

    The pipeline dashboard aggregate: one shuffle on the low-cardinality
    source key, partial-aggregated map-side. Integer sums and min/max only
    — no float accumulation — so results are exact at any partitioning.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "source",
            "lang",
            "n_chars",
            F.size(tokenize("text")).cast("long").alias("n_tokens"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


def text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, clean_text, n_removed): stopword removal + whitespace
    normalization — the C4-style cleaning pass that rewrites text instead of
    just scoring it.

    Pure in-row array expressions (tokenize → filter → rejoin), map-only at
    any corpus size; ``n_removed`` records how many tokens the cleaning
    dropped so downstream token budgets can be adjusted without re-scanning.
    """
    docs = load_table(spark, sf_dir, "documents")
    e = quality_expressions()
    kept = e["cleaned_tokens"]
    return docs.select(
        "doc_id",
        F.concat_ws(" ", kept).alias("clean_text"),
        (e["n_tokens"] - F.size(kept)).cast("long").alias("n_removed"),
    )


# PII patterns kept to syntax with IDENTICAL semantics in Java regex (Spark)
# and RE2 (DuckDB): character classes, +, {n}, escaped dots — no lookaround,
# no backreferences.
PII_EMAIL = r"[a-z0-9]+@[a-z]+\.[a-z]+"
PII_IP = r"\d+\.\d+\.\d+\.\d+"
PII_PHONE = r"555-\d{4}"


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_email, n_ip, n_phone, redacted_text): PII scrubbing — the
    compliance pass every shipped training corpus needs.

    The synthetic corpus carries no PII, so each document is first augmented
    with a DETERMINISTIC doc_id-derived suffix (an email, an IPv4, a phone
    number) that both engines synthesize identically — the redaction then
    has real work to do and the oracle checks counts AND the rewritten
    text. Counting (``regexp_count``) and redaction (chained
    ``regexp_replace``) are single-pass column expressions — map-only at
    100 TB, no UDF. A production run drops the augmentation and extends the
    pattern table; the plan shape is unchanged.
    """
    docs = load_table(spark, sf_dir, "documents")
    aug = F.concat_ws(
        "",
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        (F.col("doc_id") % 100).cast("string"),
        F.lit(" call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    a = docs.select("doc_id", aug.alias("aug"))
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("aug"), PII_EMAIL, "<EMAIL>"),
            PII_IP,
            "<IP>",
        ),
        PII_PHONE,
        "<PHONE>",
    )
    return a.select(
        "doc_id",
        F.regexp_count(F.col("aug"), F.lit(PII_EMAIL)).cast("long").alias("n_email"),
        F.regexp_count(F.col("aug"), F.lit(PII_IP)).cast("long").alias("n_ip"),
        F.regexp_count(F.col("aug"), F.lit(PII_PHONE)).cast("long").alias("n_phone"),
        red.alias("redacted_text"),
    )


VOCAB_SIZE = 20


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_tokens, n_oov, oov_rate): out-of-vocabulary rate per source
    against the corpus's own top-``VOCAB_SIZE`` vocabulary.

    The vocabulary-fit check run before committing to a tokenizer: build
    the frequency-ranked vocab (ties lexical), then measure what fraction
    of each source's token stream falls outside it. The vocab ranking is a
    ``row_number`` over the GLOBAL term-count aggregate — vocabulary-sized,
    thousands of rows at any corpus scale, so the single-partition window
    is fine (the ``customer_spend_quartiles`` precedent); membership is a
    broadcast LEFT join from the exploded stream; the per-source rollup is
    one low-cardinality aggregate. Counts are exact ints; ``oov_rate`` is
    the single terminal division.
    """
    from pyspark.sql import Window

    toks = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.explode(tokenize("text")).alias("term"))
    )
    vocab = (
        toks.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("term"))),
        )
        .where(F.col("rk") <= VOCAB_SIZE)
        .select("term", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "term", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            "source",
            "n_tokens",
            "n_oov",
            F.round(
                F.col("n_oov").cast("double") / F.col("n_tokens"), 6
            ).alias("oov_rate"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------

_T = DUCKDB_TOKENS.format(col="text")
_SW = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"

# The quality-feature subquery and blended-score expression — ONE SQL
# definition mirroring quality_expressions(), composed by the
# quality_score oracle here and by consumers in other modules
# (dedup.dedup_keep_best orders survivors by it), so the score formula
# cannot drift between oracles.
QUALITY_FEATURES_SQL = f"""
          SELECT doc_id,
                 len(t) AS n_tokens,
                 len(list_distinct(t)) AS n_types,
                 CASE WHEN len(t) > 0 THEN len(list_distinct(t))::DOUBLE / len(t) ELSE 0.0 END AS ttr,
                 CASE WHEN len(t) > 0
                      THEN len(list_filter(t, w -> list_contains({_SW}, w)))::DOUBLE / len(t)
                      ELSE 0.0 END AS stop_ratio,
                 CASE WHEN len(t) > 0 THEN letters::DOUBLE / len(t) ELSE 0.0 END AS avg_len
          FROM (
            SELECT doc_id, text, {_T} AS t,
                   length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS letters
            FROM documents
          )"""

QUALITY_SCORE_EXPR_SQL = (
    "least(n_tokens / 50.0, 1.0) * 0.25"
    " + least(stop_ratio / 0.1, 1.0) * 0.25"
    " + ttr * 0.25"
    " + least(avg_len / 5.0, 1.0) * 0.25"
)

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
        WITH f AS ({QUALITY_FEATURES_SQL}
        )
        SELECT doc_id, n_tokens, n_types,
               round(ttr, 6) AS type_token_ratio,
               round(stop_ratio, 6) AS stopword_ratio,
               round(avg_len, 6) AS avg_token_len,
               round({QUALITY_SCORE_EXPR_SQL}, 6) AS quality
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
    "repetition_score": f"""
        WITH x AS (
          SELECT doc_id,
                 CASE WHEN len(t) < 2 THEN []
                      ELSE [t[i] || ' ' || t[i+1]
                            for i in range(1, len(t))]
                 END AS bg
          FROM (SELECT doc_id, {_T} AS t FROM documents)
        )
        SELECT doc_id,
               len(bg) AS n_bigrams,
               len(list_distinct(bg)) AS n_distinct_bigrams,
               CASE WHEN len(bg) > 0
                    THEN round((len(bg) - len(list_distinct(bg)))::DOUBLE / len(bg), 6)
                    ELSE 0.0 END AS dup_bigram_ratio
        FROM x
    """,
    "bigram_logprob": f"""
        WITH toks AS (SELECT doc_id, {_T} AS t FROM documents),
        cu AS (
          SELECT w, count(*) AS cu
          FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
        ),
        tot AS (SELECT sum(cu) AS n FROM cu),
        bgf AS (
          SELECT doc_id, e.a AS a, e.b AS b
          FROM (
            SELECT doc_id,
                   unnest([{{'a': t[i - 1], 'b': t[i]}}
                           for i in range(2, len(t) + 1)]) AS e
            FROM toks WHERE len(t) >= 2
          )
        ),
        cb AS (SELECT a, b, count(*) AS cb FROM bgf GROUP BY a, b),
        lp AS (
          SELECT g.doc_id,
                 log10({BIGRAM_LAMBDA} * (c.cb / ca.cu)
                       + {1.0 - BIGRAM_LAMBDA} * (cbu.cu / tot.n)) AS logp
          FROM bgf g
          JOIN cb c USING (a, b)
          JOIN cu ca ON ca.w = g.a
          JOIN cu cbu ON cbu.w = g.b, tot
        ),
        per AS (
          SELECT doc_id, count(*) AS n_bigrams, list_sort(list(logp)) AS lps
          FROM lp GROUP BY doc_id
        )
        SELECT doc_id, n_bigrams,
               round(list_sum(lps) / n_bigrams, 6) AS mean_logprob
        FROM per
    """,
    "dsir_weights": f"""
        WITH toks AS (
          SELECT doc_id, source, unnest({_T}) AS token FROM documents
        ),
        cnts AS (
          SELECT token, count(*) AS cc,
                 sum(CASE WHEN source = '{DSIR_TARGET_SOURCE}'
                          THEN 1 ELSE 0 END) AS ct
          FROM toks GROUP BY token
        ),
        tot AS (
          SELECT sum(cc) AS nc, sum(ct) AS nt, count(*) AS v FROM cnts
        ),
        lw AS (
          SELECT t.doc_id,
                 ln(((c.ct + 1) / (tot.nt + tot.v))
                    / ((c.cc + 1) / (tot.nc + tot.v))) AS lw
          FROM toks t JOIN cnts c USING (token), tot
        ),
        per AS (
          SELECT doc_id, count(*) AS n_tokens,
                 list_sort(list(lw)) AS ws
          FROM lw GROUP BY doc_id
        )
        SELECT doc_id, n_tokens,
               round(list_sum(ws) / n_tokens, 6) + 0.0 AS dsir_score
        FROM per
    """,
    "unigram_logprob": f"""
        WITH toks AS (
          SELECT doc_id, unnest({_T}) AS token FROM documents
        ),
        cnts AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
        tot AS (SELECT sum(cnt) AS total FROM cnts),
        lp AS (
          SELECT t.doc_id, log10(c.cnt) - log10(tot.total) AS logp
          FROM toks t JOIN cnts c USING (token), tot
        ),
        per AS (
          SELECT doc_id, count(*) AS n_tokens,
                 list_sort(list(logp)) AS lps
          FROM lp GROUP BY doc_id
        )
        SELECT doc_id, n_tokens,
               round(list_sum(lps) / n_tokens, 6) AS mean_logprob
        FROM per
    """,
    "benchmark_contamination": f"""
        WITH sh AS (
          SELECT doc_id,
                 unnest(list_distinct([t[i-1] || ' ' || t[i] || ' ' || t[i+1]
                                       for i in range(2, len(t))])) AS shingle
          FROM (SELECT doc_id, {_T} AS t FROM documents)
          WHERE len(t) >= 3
        )
        SELECT s.doc_id, count(*) AS overlap_cnt
        FROM sh s
        JOIN (SELECT DISTINCT shingle FROM sh
              WHERE doc_id % {BENCHMARK_MOD} = 0) b
          USING (shingle)
        WHERE s.doc_id % {BENCHMARK_MOD} <> 0
        GROUP BY s.doc_id
    """,
}

_QUALITY_EXPR = """
          SELECT doc_id,
                 round(least(len(t) / 50.0, 1.0) * 0.25
                       + least((CASE WHEN len(t) > 0
                                     THEN len(list_filter(t, w -> list_contains({sw}, w)))::DOUBLE / len(t)
                                     ELSE 0.0 END) / 0.1, 1.0) * 0.25
                       + (CASE WHEN len(t) > 0 THEN len(list_distinct(t))::DOUBLE / len(t) ELSE 0.0 END) * 0.25
                       + least((CASE WHEN len(t) > 0 THEN letters::DOUBLE / len(t) ELSE 0.0 END) / 5.0, 1.0) * 0.25,
                       6) AS quality
          FROM (SELECT doc_id, {t} AS t,
                       length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS letters
                FROM documents)
"""

ORACLE_SQL["quality_quantile_filter"] = f"""
    WITH q AS ({_QUALITY_EXPR.format(sw=_SW, t=_T)}),
    thr AS (SELECT quantile_cont(quality, {QUANTILE_P}) AS thr FROM q)
    SELECT doc_id, quality FROM q, thr WHERE quality >= thr.thr
"""

ORACLE_SQL["corpus_stats_by_source"] = f"""
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT lang) AS n_langs,
           sum(len({_T}))::BIGINT AS total_tokens,
           sum(n_chars)::BIGINT AS total_chars,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars
    FROM documents
    GROUP BY source
"""

ORACLE_SQL["text_clean"] = f"""
    WITH k AS (
      SELECT doc_id, t, list_filter(t, w -> NOT list_contains({_SW}, w)) AS kept
      FROM (SELECT doc_id, {_T} AS t FROM documents)
    )
    SELECT doc_id,
           array_to_string(kept, ' ') AS clean_text,
           (len(t) - len(kept))::BIGINT AS n_removed
    FROM k
"""

ORACLE_SQL["pii_redaction"] = f"""
    WITH a AS (
      SELECT doc_id,
             text || ' contact user' || doc_id::VARCHAR
                  || '@example.com from 10.' || (doc_id % 256)::VARCHAR
                  || '.0.' || (doc_id % 100)::VARCHAR
                  || ' call 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
               AS aug
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(aug, '{PII_EMAIL}'))::BIGINT AS n_email,
           len(regexp_extract_all(aug, '{PII_IP}'))::BIGINT AS n_ip,
           len(regexp_extract_all(aug, '{PII_PHONE}'))::BIGINT AS n_phone,
           regexp_replace(
             regexp_replace(
               regexp_replace(aug, '{PII_EMAIL}', '<EMAIL>', 'g'),
               '{PII_IP}', '<IP>', 'g'),
             '{PII_PHONE}', '<PHONE>', 'g') AS redacted_text
    FROM a
"""

ORACLE_SQL["vocab_coverage"] = f"""
    WITH toks AS (
      SELECT source, unnest({_T}) AS term FROM documents
    ),
    vocab AS (
      SELECT term FROM (
        SELECT term, row_number() OVER (ORDER BY count(*) DESC, term) AS rk
        FROM toks GROUP BY term
      ) WHERE rk <= {VOCAB_SIZE}
    )
    SELECT t.source,
           count(*) AS n_tokens,
           CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           round(CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON t.term = v.term
    GROUP BY t.source
"""

QUERIES = {
    "lang_id": lang_id,
    "quality_score": quality_score,
    "token_count": token_count,
    "fingerprint": fingerprint,
    "repetition_score": repetition_score,
    "unigram_logprob": unigram_logprob,
    "dsir_weights": dsir_weights,
    "bigram_logprob": bigram_logprob,
    "benchmark_contamination": benchmark_contamination,
    "quality_quantile_filter": quality_quantile_filter,
    "corpus_stats_by_source": corpus_stats_by_source,
    "text_clean": text_clean,
    "pii_redaction": pii_redaction,
    "vocab_coverage": vocab_coverage,
}
