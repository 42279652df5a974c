"""Text analytics: word count, pattern-following counts, bigram relative
frequency, PMI (reference a0 / a2 / a1, re-expressed Spark-first).

Reference shapes replaced:

* Word count (``a0/WordCountSimple.java:52-85``): mapper emit (w,1) +
  combiner/reducer sum → ``explode(tokens) → groupBy(word).count()``.
  Catalyst plans partial+final HashAggregate — the combiner is automatic.
* PerfectX (``a0/PerfectX.java:62-95``): "token following the word X",
  count > 1 suppression → in-array adjacent pairs + filter + HAVING.
* Bigram relative frequency pairs/stripes
  (``a2/ComputeBigramRelativeFrequencyPairs.scala:61-110``, ``…Stripes``):
  the reference's special ``(a,*)`` marginal key and one-reducer-per-left-word
  partitioner collapse into a window sum over the pair counts. Pairs and
  stripes are two *formats* of the same computation; the engine emits the
  long (pairs) form, from which ``map_from_entries`` can build stripes.
* PMI pairs/stripes (``a2/PairsPMI.scala:60-108``, ``a1/PairsPMI.java``):
  2-job pipeline with a reducer-side side-file join becomes one plan:
  pair counts ⋈ unigram line-counts (twice) ⋈ total-line-count, then
  ``log10``. The side-file re-read (``a1/PairsPMI.java:130-174``) is just a
  broadcast join here.

Scale: pair/bigram generation is in-row (no self-join shuffle); the only
shuffles are the groupBy aggregations on (a,b) pair keys — high cardinality,
well distributed, partial-aggregated map-side. The 40-token distinct cap
bounds per-row pair fan-out at 40·39. Unigram counts are tiny relative to
pair counts and broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_toolkit_spark.catalog import load_table, local_table
from big_data_toolkit_spark.functions.text import (
    DUCKDB_TOKENS,
    adjacent_pairs,
    tokenize,
    unordered_cooccurrence_pairs,
)

# Engine test-bench parameters.
PIVOT_WORD = "table"  # reference uses "perfect" (a0/PerfectX); TESTDATA corpus has no "perfect"
PMI_THRESHOLD = 10
PMI_TOKEN_CAP = 40


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", tokenize("text").alias("tokens"))


def word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token → global count over documents.text (a0 WordCountSimple)."""
    return (
        _doc_tokens(spark, sf_dir)
        .select(F.explode("tokens").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def next_word_after(
    spark: SparkSession, sf_dir: str, pivot: str = PIVOT_WORD
) -> DataFrame:
    """Count of each token appearing immediately after ``pivot``; keep >1.

    a0 PerfectX semantics (``a0/PerfectX.java:62-95``) with the pivot word
    parameterized. Pair formation is in-array (no shuffle before the agg).
    """
    toks = _doc_tokens(spark, sf_dir)
    return (
        toks.select(F.explode(adjacent_pairs(F.col("tokens"))).alias("p"))
        .where(F.col("p.a") == F.lit(pivot))
        .groupBy(F.col("p.b").alias("word"))
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > 1)
    )


def bigram_relative_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(a, b, cnt, rel_freq) where rel_freq = count(a,b) / count(a, *).

    a2 ComputeBigramRelativeFrequency{Pairs,Stripes}. The marginal is a
    window sum over the aggregated pair counts — the aggregation shuffle
    already co-located each left word's pairs, so the window adds no extra
    shuffle (partitioning on (a,b) is a superset... Catalyst reuses the
    exchange when partitioned by 'a'; see test_plans for the check).
    """
    toks = _doc_tokens(spark, sf_dir)
    pair_counts = (
        toks.select(F.explode(adjacent_pairs(F.col("tokens"))).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("cnt"))
    )
    from pyspark.sql import Window

    marginal = Window.partitionBy("a")
    return pair_counts.select(
        "a",
        "b",
        "cnt",
        (F.col("cnt") / F.sum("cnt").over(marginal)).alias("rel_freq"),
    )


def pmi_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: int = PMI_THRESHOLD,
    cap: int = PMI_TOKEN_CAP,
) -> DataFrame:
    """PMI over word co-occurrence in documents (a1/a2 PairsPMI).

    Semantics (pinned, see SURVEY §7 risk list): per line take the first
    ``cap`` tokens, dedup (set semantics — order irrelevant for pairs), form
    all ordered pairs x≠y; keep pairs co-occurring in ≥ ``threshold`` lines;
    PMI = log10( c(x,y) · N / (c(x) · c(y)) ) with N = total line count and
    c(w) = lines containing w (within the cap). Rounded to 6 decimals for
    cross-engine float stability.
    """
    toks = _doc_tokens(spark, sf_dir).select(
        "doc_id",
        F.array_distinct(F.slice("tokens", 1, cap)).alias("words"),
    )
    toks.cache()  # reused by pair counts and unigram counts

    # PMI is symmetric (count(a,b) == count(b,a)), so only the a<b
    # orientation goes through the explode + shuffle — half the pair rows —
    # and the output's ordered-pair form is reconstructed by mirroring the
    # thresholded aggregate, which is orders of magnitude smaller.
    half = (
        toks.select(
            F.explode(unordered_cooccurrence_pairs(F.col("words"))).alias("p")
        )
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("pair_cnt"))
        .where(F.col("pair_cnt") >= threshold)
    )
    pair_counts = half.unionByName(
        half.select(
            F.col("b").alias("a"), F.col("a").alias("b"), "pair_cnt"
        )
    )
    word_counts = (
        toks.select(F.explode("words").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("w_cnt"))
    )
    n_lines = toks.agg(F.count("*").alias("n_lines"))

    wc_a = word_counts.select(F.col("w").alias("a"), F.col("w_cnt").alias("cnt_a"))
    wc_b = word_counts.select(F.col("w").alias("b"), F.col("w_cnt").alias("cnt_b"))
    return (
        # No strategy hint on the unigram-count joins: at test scale AQE
        # broadcasts the small vocabulary; at 100 TB the vocabulary is a
        # heavy-tailed 1e8+-row table and a forced driver broadcast would
        # OOM — AQE falls back to shuffle join there (same convention as
        # the simhash dict join in dedup.py).
        pair_counts.join(wc_a, "a")
        .join(wc_b, "b")
        .crossJoin(F.broadcast(n_lines))
        .select(
            "a",
            "b",
            "pair_cnt",
            # + 0.0: PMI crosses zero, so a cell rounding to -0.0 on one
            # engine would serialize '-0' vs '0' (the dsir_weights class,
            # caught at sf0.1); +0.0 canonicalizes negative zero only.
            (
                F.round(
                    F.log10(
                        F.col("pair_cnt")
                        * F.col("n_lines")
                        / (F.col("cnt_a") * F.col("cnt_b"))
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("pmi"),
        )
    )


def bigram_relative_frequency_stripes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stripes output format of the same computation (A4/A6).

    The reference maintains ``Map[String,Int]`` stripes as aggregation values
    (``a2/ComputeBigramRelativeFrequencyStripes.scala:59-83``); the engine
    computes in long form (shuffle does the merging — SURVEY §1 mapping) and
    packs the stripe only at output: (a, stripe MAP<b, rel_freq>). Pairs and
    stripes are two formats of one operator, not two implementations.
    """
    pairs = bigram_relative_frequency(spark, sf_dir)
    return pairs.groupBy("a").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("b", "rel_freq")))
        ).alias("stripe")
    )


def bigram_relfreq_stripes_serialized(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Driver-gate surface for ``bigram_relative_frequency_stripes``:
    (a, stripe STRING) — same convention as ``pmi_stripes_serialized``
    (entries in the map's b-sorted pack order, values in micro-units).
    rel_freq is an unrounded ratio, so it first passes the repo-wide
    cross-engine ``round(·, 6)`` convention; micro-scaling the rounded
    value is then exact, keeping float formatting out of the hash."""
    stripes = bigram_relative_frequency_stripes(spark, sf_dir)
    return stripes.select(
        "a",
        F.concat_ws(
            ";",
            F.transform(
                F.map_entries("stripe"),
                lambda e: F.format_string(
                    "%s=%d",
                    e["key"],
                    F.round(F.round(e["value"], 6) * 1e6).cast("long"),
                ),
            ),
        ).alias("stripe"),
    )


def pmi_stripes(
    spark: SparkSession,
    sf_dir: str,
    threshold: int = PMI_THRESHOLD,
    cap: int = PMI_TOKEN_CAP,
) -> DataFrame:
    """Stripes output format of PMI: (a, stripe MAP<b, STRUCT<pmi, cnt>>).

    The reference emits one ``Map[String, (Double, Int)]`` per left word —
    pmi plus co-occurrence count per right word
    (``a2/StripesPMI.scala:105``, ``a1/StripesPMI.java``). Same convention
    as ``bigram_relative_frequency_stripes``: pairs and stripes are two
    FORMATS of one operator (SURVEY §1), so the stripe packs the already-
    aggregated long form at output — ``map_from_entries`` over the
    b-sorted entry list — rather than re-implementing the aggregation
    with map-valued combiners. The pack's groupBy(a) shuffle carries the
    thresholded pair table (orders of magnitude smaller than the raw
    pair stream), and per-stripe width is bounded by the same cap that
    bounds the reference's in-memory stripe: a word co-occurs with at
    most the vocabulary admitted by the ≥threshold filter.
    """
    pairs = pmi_pairs(spark, sf_dir, threshold, cap)
    return pairs.groupBy("a").agg(
        F.map_from_entries(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("b"),
                        F.struct(
                            F.col("pmi"), F.col("pair_cnt").alias("cnt")
                        ).alias("v"),
                    )
                )
            )
        ).alias("stripe")
    )


def pmi_stripes_serialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate surface for ``pmi_stripes``: (a, stripe STRING).

    Map columns don't round-trip the driver's sorted-column value hash,
    so the registered row serializes each stripe deterministically from
    the REAL map column (the packing is exercised, not bypassed):
    entries in the map's b-sorted order, pmi in exact micro-units
    (the value is already rounded to 6 decimals, so round(pmi·1e6) is
    integral — no cross-engine float formatting in the hash, the
    dsir_weights lesson). The oracle builds the same string with
    ``string_agg(... ORDER BY b)``.
    """
    return pmi_stripes(spark, sf_dir).select(
        "a",
        F.concat_ws(
            ";",
            F.transform(
                F.map_entries("stripe"),
                lambda e: F.format_string(
                    "%s=%d/%d",
                    e["key"],
                    F.round(e["value"]["pmi"] * 1e6).cast("long"),
                    e["value"]["cnt"],
                ),
            ),
        ).alias("stripe"),
    )


# ---------------------------------------------------------------------------
KEYWORDS_PER_DOC = 3


def keyword_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, rank, term, score): top-3 tf-idf keywords for every document.

    Corpus-wide keyword tagging — the per-document generalization of
    ``ranked_retrieval_tfidf`` (which scores 3 pinned query terms): here
    EVERY term competes, so df comes from a window count over the full
    (term, doc) tf table rather than a 3-term filter. Two shuffles total:
    the (term, doc_id) tf aggregation reshuffled once by term for df, once
    by doc_id for the top-3 window; the ``rank <= 3`` cut on ``row_number``
    is a WindowGroupLimit — Spark prunes to 3 rows per doc map-side before
    the exchange, so the second shuffle carries O(3·|docs|) rows, not |tf|.
    Scoring expression is the identical double both engines evaluate
    (ints in, one log10, one multiply); ties break lexically on the term,
    making the cut deterministic.
    """
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    n_docs = docs.agg(F.count("*").alias("n"))
    tf = (
        _doc_tokens(spark, sf_dir)
        .select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    scored = (
        tf.withColumn("df", F.count("*").over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log10(F.col("n").cast("double") / F.col("df"))).alias(
                "w"
            ),
        )
    )
    top = Window.partitionBy("doc_id").orderBy(F.desc("w"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(top).cast("long"))
        .where(F.col("rank") <= KEYWORDS_PER_DOC)
        .select("doc_id", "rank", "term", F.round("w", 6).alias("score"))
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------

_TOKENS = DUCKDB_TOKENS.format(col="text")

ORACLE_SQL: dict[str, str] = {
    "word_count": f"""
        SELECT word, count(*) AS cnt
        FROM (SELECT unnest({_TOKENS}) AS word FROM documents)
        GROUP BY word
    """,
    "next_word_after": f"""
        WITH tok AS (
          SELECT doc_id,
                 unnest({_TOKENS}) AS word,
                 unnest(range(1, len({_TOKENS}) + 1)) AS pos
          FROM documents
        ),
        pairs AS (
          SELECT word AS a,
                 lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS b
          FROM tok
        )
        SELECT b AS word, count(*) AS cnt
        FROM pairs
        WHERE a = '{PIVOT_WORD}' AND b IS NOT NULL
        GROUP BY b
        HAVING count(*) > 1
    """,
    "bigram_relative_frequency": f"""
        WITH tok AS (
          SELECT doc_id,
                 unnest({_TOKENS}) AS word,
                 unnest(range(1, len({_TOKENS}) + 1)) AS pos
          FROM documents
        ),
        bigrams AS (
          SELECT doc_id, word AS a,
                 lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS b
          FROM tok
        ),
        pair_counts AS (
          SELECT a, b, count(*) AS cnt FROM bigrams WHERE b IS NOT NULL GROUP BY a, b
        )
        SELECT a, b, cnt, cnt / sum(cnt) OVER (PARTITION BY a) AS rel_freq
        FROM pair_counts
    """,
    "pmi_pairs": f"""
        WITH words AS (
          SELECT doc_id, list_distinct(({_TOKENS})[1:{PMI_TOKEN_CAP}]) AS ws
          FROM documents
        ),
        exploded AS (SELECT doc_id, unnest(ws) AS w FROM words),
        pair_counts AS (
          SELECT x.w AS a, y.w AS b, count(*) AS pair_cnt
          FROM exploded x JOIN exploded y
            ON x.doc_id = y.doc_id AND x.w <> y.w
          GROUP BY x.w, y.w
          HAVING count(*) >= {PMI_THRESHOLD}
        ),
        word_counts AS (SELECT w, count(*) AS w_cnt FROM exploded GROUP BY w),
        n AS (SELECT count(*) AS n_lines FROM words)
        SELECT p.a, p.b, p.pair_cnt,
               round(log10(p.pair_cnt * n.n_lines /
                           (wa.w_cnt * wb.w_cnt)), 6) + 0.0 AS pmi
        FROM pair_counts p
        JOIN word_counts wa ON p.a = wa.w
        JOIN word_counts wb ON p.b = wb.w
        CROSS JOIN n
    """,
    "bigram_relfreq_stripes": f"""
        WITH tok AS (
          SELECT doc_id,
                 unnest({_TOKENS}) AS word,
                 unnest(range(1, len({_TOKENS}) + 1)) AS pos
          FROM documents
        ),
        bigrams AS (
          SELECT doc_id, word AS a,
                 lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS b
          FROM tok
        ),
        pair_counts AS (
          SELECT a, b, count(*) AS cnt FROM bigrams WHERE b IS NOT NULL GROUP BY a, b
        ),
        rf AS (
          SELECT a, b, cnt / sum(cnt) OVER (PARTITION BY a) AS rel_freq
          FROM pair_counts
        )
        SELECT a,
               string_agg(b || '=' ||
                          CAST(round(round(rel_freq, 6) * 1000000) AS BIGINT),
                          ';' ORDER BY b) AS stripe
        FROM rf
        GROUP BY a
    """,
    "pmi_stripes": f"""
        WITH words AS (
          SELECT doc_id, list_distinct(({_TOKENS})[1:{PMI_TOKEN_CAP}]) AS ws
          FROM documents
        ),
        exploded AS (SELECT doc_id, unnest(ws) AS w FROM words),
        pair_counts AS (
          SELECT x.w AS a, y.w AS b, count(*) AS pair_cnt
          FROM exploded x JOIN exploded y
            ON x.doc_id = y.doc_id AND x.w <> y.w
          GROUP BY x.w, y.w
          HAVING count(*) >= {PMI_THRESHOLD}
        ),
        word_counts AS (SELECT w, count(*) AS w_cnt FROM exploded GROUP BY w),
        n AS (SELECT count(*) AS n_lines FROM words),
        pmi AS (
          SELECT p.a, p.b, p.pair_cnt,
                 round(log10(p.pair_cnt * n.n_lines /
                             (wa.w_cnt * wb.w_cnt)), 6) + 0.0 AS pmi
          FROM pair_counts p
          JOIN word_counts wa ON p.a = wa.w
          JOIN word_counts wb ON p.b = wb.w
          CROSS JOIN n
        )
        SELECT a,
               string_agg(b || '=' ||
                          CAST(round(pmi * 1000000) AS BIGINT) || '/' ||
                          pair_cnt, ';' ORDER BY b) AS stripe
        FROM pmi
        GROUP BY a
    """,
    "keyword_extraction": f"""
        WITH tf AS (
          SELECT doc_id, word AS term, count(*) AS tf
          FROM (SELECT doc_id, unnest({_TOKENS}) AS word FROM documents)
          GROUP BY doc_id, word
        ),
        n AS (SELECT count(*) AS n FROM documents),
        scored AS (
          SELECT doc_id, term,
                 tf * log10(CAST(n.n AS DOUBLE) /
                            (count(*) OVER (PARTITION BY term))) AS w
          FROM tf CROSS JOIN n
        )
        SELECT doc_id, rank, term, round(w, 6) AS score
        FROM (
          SELECT doc_id, term, w,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY w DESC, term) AS rank
          FROM scored
        )
        WHERE rank <= {KEYWORDS_PER_DOC}
    """,
}

QUERIES = {
    "word_count": word_count,
    "next_word_after": next_word_after,
    "bigram_relative_frequency": bigram_relative_frequency,
    "bigram_relfreq_stripes": bigram_relfreq_stripes_serialized,
    "pmi_pairs": pmi_pairs,
    "pmi_stripes": pmi_stripes_serialized,
    "keyword_extraction": keyword_extraction,
}


# ---------------------------------------------------------------------------
# Distributed BPE merge induction
# ---------------------------------------------------------------------------

BPE_MERGES = 8  # learned merge rules; the oracle unrolls the same count


def _bpe_merge_expr(x: str, y: str) -> str:
    """Greedy left-to-right merge of adjacent (x, y) in the `syms` array as
    ONE Catalyst fold — the classic merge scan (i += 2 after a fusion) as
    an aggregate with a `fused` flag so a freshly fused token never chains
    into the next original symbol. Tokens are [a-z]+ so literal inlining
    is injection-safe."""
    return f"""
    aggregate(
      syms,
      named_struct('out', cast(array() as array<string>), 'fused', false),
      (acc, s) -> IF(NOT acc.fused AND size(acc.out) > 0
                       AND element_at(acc.out, -1) = '{x}' AND s = '{y}',
                     named_struct('out',
                                  concat(slice(acc.out, 1, size(acc.out) - 1),
                                         array('{x}{y}')),
                                  'fused', true),
                     named_struct('out', concat(acc.out, array(s)),
                                  'fused', false)),
      acc -> acc.out)
    """


_BPE_PAIRS = (
    "CASE WHEN size(syms) < 2 THEN array() "
    "ELSE transform(sequence(0, size(syms) - 2), "
    "i -> named_struct('x', syms[i], 'y', syms[i + 1])) END"
)


def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(step, merge_left, merge_right, pair_count): the first
    ``BPE_MERGES`` byte-pair-encoding merge rules learned from the corpus
    — tokenizer training (Sennrich et al. 2016) as a distributed
    iteration, the vocabulary-induction pass an LLM data pipeline runs
    before anything is tokenized.

    Classic BPE trains on the word-FREQUENCY table, not the token stream:
    the corpus is scanned ONCE for (word, count), and every merge round
    runs over the |vocab| table — iteration cost is independent of corpus
    size (vocab ≪ corpus at 100 TB). Per round: one pair-count
    aggregation (adjacent symbol pairs generated IN-ROW, weighted by word
    count, partial-aggregated map-side), a 1-row driver fetch of the
    argmax pair (cnt desc, then lexical — deterministic; the kmeans
    plan-literal pattern), then a MAP-ONLY in-array greedy fold applies
    the rule (``_bpe_merge_expr``; overlapping occurrences like 'aaa'
    merge left-to-right, matching the reference algorithm). The vocab
    table ``localCheckpoint``s per round to keep lineage flat (the
    PageRank discipline).

    Pair counts include overlapping occurrences ('aaa' counts (a,a)
    twice), exactly like get_stats in the original implementation. The
    DuckDB oracle unrolls the same rounds in ROW form: greedy
    non-overlapping application = keep every odd-ranked candidate within
    a run of consecutive candidate positions (runs only arise when
    x == y), an islands-and-parity window — two formulations, equal by
    construction, asserted equal by the gate.
    """
    _, merges = _bpe_train(spark, sf_dir)
    return local_table(
        spark,
        merges,
        "step long, merge_left string, merge_right string, pair_count long",
    )


def _bpe_train(
    spark: SparkSession, sf_dir: str, rounds: int = BPE_MERGES
) -> tuple[DataFrame, list[tuple[int, str, str, int]]]:
    """Run the BPE induction; return the post-merge vocabulary table
    (word, cnt, syms) and the learned merge list — shared by
    ``bpe_merges`` (the rules) and ``bpe_vocab`` (the applied result)."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokenize("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "syms",
            F.expr(
                "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
            ),
        )
        .localCheckpoint()
    )
    return _bpe_train_words(words, rounds)


def _bpe_train_words(
    words: DataFrame, rounds: int
) -> tuple[DataFrame, list[tuple[int, str, str, int]]]:
    """The merge-round loop over a (word, cnt, syms) frequency table —
    factored out of ``_bpe_train`` so property tests can drive it over
    arbitrary generated vocabularies against a pure-Python BPE replica."""
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, rounds + 1):
        top = (
            words.select("cnt", F.explode(F.expr(_BPE_PAIRS)).alias("p"))
            .groupBy("p.x", "p.y")
            .agg(F.sum("cnt").alias("total"))
            .orderBy(F.desc("total"), "x", "y")
            .first()
        )
        if top is None:
            break
        merges.append((step, top["x"], top["y"], int(top["total"])))
        words = words.withColumn(
            "syms", F.expr(_bpe_merge_expr(top["x"], top["y"]))
        ).localCheckpoint()
    return words, merges


def bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(token, cnt): the corpus subword vocabulary AFTER applying the
    ``BPE_MERGES`` learned rules — the train→apply closure of
    ``bpe_merges`` (what the tokenizer actually emits, with corpus
    frequencies).

    One explode of the post-merge symbol arrays weighted by word count;
    the aggregation partial-combines map-side. At 100 TB applying a
    FROZEN merge table to new text is the same fold chain as a map-only
    expression — no iteration, no driver round-trips.
    """
    words, _ = _bpe_train(spark, sf_dir)
    return (
        words.select("cnt", F.explode("syms").alias("token"))
        .groupBy("token")
        .agg(F.sum("cnt").alias("cnt"))
    )


def _bpe_oracle_sql(rounds: int = BPE_MERGES) -> str:
    """The same induction unrolled as CTEs over (word, cnt, pos, sym) rows."""
    sql = _bpe_oracle_chain(rounds)
    union = "\n    UNION ALL ".join(
        f"SELECT * FROM m{r}" for r in range(1, rounds + 1)
    )
    return sql + f"\n    {union}\n    ORDER BY step"


def _bpe_vocab_oracle_sql(rounds: int = BPE_MERGES) -> str:
    """Final subword counts off the same unrolled chain's end state."""
    return (
        _bpe_oracle_chain(rounds)
        + f"""
    SELECT sym AS token, CAST(sum(cnt) AS BIGINT) AS cnt
    FROM s{rounds + 1} GROUP BY sym"""
    )


def _bpe_oracle_chain(rounds: int) -> str:
    sql = f"""
    WITH w0 AS (
      SELECT word, count(*) AS cnt
      FROM (SELECT unnest({_TOKENS}) AS word FROM documents)
      GROUP BY word
    ),
    s1 AS MATERIALIZED (
      SELECT word, cnt, unnest(range(1, length(word) + 1)) AS pos,
             unnest(list_transform(range(1, length(word) + 1),
                                   i -> substr(word, i, 1))) AS sym
      FROM w0
    )"""
    for r in range(1, rounds + 1):
        sql += f""",
    p{r} AS MATERIALIZED (
      SELECT a.sym AS x, b.sym AS y, sum(a.cnt) AS total
      FROM s{r} a JOIN s{r} b ON a.word = b.word AND b.pos = a.pos + 1
      GROUP BY 1, 2
    ),
    t{r} AS MATERIALIZED (SELECT x, y FROM p{r} ORDER BY total DESC, x, y LIMIT 1),
    m{r} AS (
      SELECT {r} AS step, p.x AS merge_left, p.y AS merge_right,
             CAST(p.total AS BIGINT) AS pair_count
      FROM p{r} p JOIN t{r} t ON p.x = t.x AND p.y = t.y
    ),
    c{r} AS (
      SELECT s.word, s.cnt, s.pos, s.sym, t.x, t.y,
             coalesce(s.sym = t.x
                      AND lead(s.sym) OVER (PARTITION BY s.word
                                            ORDER BY s.pos) = t.y,
                      false) AS cand
      FROM s{r} s, t{r} t
    ),
    k{r} AS MATERIALIZED (
      SELECT word, cnt, pos, sym, x, y,
             cand AND (row_number() OVER (PARTITION BY word, cand, grp
                                          ORDER BY pos) % 2 = 1) AS keep
      FROM (SELECT *, pos - row_number() OVER (PARTITION BY word, cand
                                               ORDER BY pos) AS grp
            FROM c{r})
    ),
    n{r} AS (
      SELECT word, cnt, pos,
             CASE WHEN keep THEN x || y ELSE sym END AS sym,
             coalesce(lag(keep) OVER (PARTITION BY word ORDER BY pos),
                      false) AS consumed
      FROM k{r}
    ),
    s{r + 1} AS MATERIALIZED (
      SELECT word, cnt,
             row_number() OVER (PARTITION BY word ORDER BY pos) AS pos, sym
      FROM n{r} WHERE NOT consumed
    )"""
    return sql


ORACLE_SQL["bpe_merges"] = _bpe_oracle_sql()
QUERIES["bpe_merges"] = bpe_merges
ORACLE_SQL["bpe_vocab"] = _bpe_vocab_oracle_sql()
QUERIES["bpe_vocab"] = bpe_vocab


CMS_DEPTH = 4  # independent hash rows
CMS_WIDTH = 1024  # buckets per row
CMS_TOP_K = 10


def _cms_bucket(d: int) -> F.Column:
    """Row-d hash bucket of the `word` column (md5-derived, cross-engine)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{d}:"), F.col("word"))), 1, 8),
        16,
        10,
    ).cast("long")
    return h % CMS_WIDTH


def cms_grid(words: DataFrame) -> DataFrame:
    """(d, bucket, cnt): the Count-Min grid over a `word` column — THE grid
    definition, shared by the batch query and the streaming ingest twin
    (`streaming/curation.py`). A pure groupBy-count, so it runs unchanged
    as a streaming aggregation (cell-wise addition is the CMS merge)."""
    return (
        words.select(
            "word",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("d"), _cms_bucket(d).alias("bucket")
                        )
                        for d in range(CMS_DEPTH)
                    ]
                )
            ).alias("cell"),
        )
        .groupBy("cell.d", "cell.bucket")
        .agg(F.count("*").alias("cnt"))
    )


def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, exact_cnt, est_cnt): the exact top-``CMS_TOP_K`` words with
    their Count-Min-sketch estimates alongside the truth — the frequency
    member of the mergeable-sketch family (HLL reach, KLL percentiles,
    CMS heavy hitters).

    The sketch is a (depth × width) integer count grid: one aggregation
    pass buckets every token through ``CMS_DEPTH`` md5-derived hashes
    (deterministic, so BOTH engines build the identical grid and the
    query is fully oracle-checkable — rare for a sketch); the estimate is
    the MIN over rows of the word's bucket counts, which can only
    over-count (collisions add, never subtract — ``est ≥ exact`` is
    asserted in pytest, and the CMS bound est ≤ exact + εN holds with
    ε = e/width). At 100 TB the grid is 4×1024 cells per corpus shard —
    mergeable by cell-wise addition like the HLL sketches — while the
    exact counts need the full word-frequency shuffle; here both run so
    the error is measurable. The probe set is the exact top-k (cnt desc,
    word) — a production pipeline keeps a heap of candidates instead.
    """
    words = (
        _doc_tokens(spark, sf_dir)
        .select(F.explode("tokens").alias("word"))
    )
    bucket = _cms_bucket
    grid = cms_grid(words)
    top = (
        words.groupBy("word")
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "word")
        .limit(CMS_TOP_K)
    )
    probes = top.select(
        "word",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(d).alias("d"), bucket(d).alias("bucket"))
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("cell"),
    )
    return (
        probes.join(
            F.broadcast(grid),
            (probes["cell.d"] == grid["d"])
            & (probes["cell.bucket"] == grid["bucket"]),
        )
        .groupBy("word", "exact_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
    )


ORACLE_SQL["heavy_hitters_cms"] = f"""
    WITH words AS (
      SELECT unnest({_TOKENS}) AS word FROM documents
    ),
    cells AS (
      SELECT word, d,
             ('0x' || substr(md5(d || ':' || word), 1, 8))::BIGINT
               % {CMS_WIDTH} AS bucket
      FROM words, (SELECT unnest(range({CMS_DEPTH})) AS d)
    ),
    grid AS (
      SELECT d, bucket, count(*) AS cnt FROM cells GROUP BY d, bucket
    ),
    top AS (
      SELECT word, count(*) AS exact_cnt FROM words GROUP BY word
      ORDER BY exact_cnt DESC, word LIMIT {CMS_TOP_K}
    ),
    probes AS (
      SELECT t.word, t.exact_cnt, d,
             ('0x' || substr(md5(d || ':' || t.word), 1, 8))::BIGINT
               % {CMS_WIDTH} AS bucket
      FROM top t, (SELECT unnest(range({CMS_DEPTH})) AS d)
    )
    SELECT p.word, p.exact_cnt, CAST(min(g.cnt) AS BIGINT) AS est_cnt
    FROM probes p JOIN grid g ON p.d = g.d AND p.bucket = g.bucket
    GROUP BY p.word, p.exact_cnt
"""

QUERIES["heavy_hitters_cms"] = heavy_hitters_cms
