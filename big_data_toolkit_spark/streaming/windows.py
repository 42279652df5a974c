"""Windowed event analytics (reference a7), in both batch and streaming form.

The reference's DStream programs are processing-time micro-batch pipelines
over a manually-advanced clock (``a7/EventCount.scala:51-87``). The engine
upgrades them to *event-time* windows over ``events.ts`` (deterministic, and
strictly more capable — SURVEY §2.9), and keeps a batch-mode formulation of
every streaming query so the DuckDB oracle can check the exact same
semantics (``groupBy(window(...))`` runs identically in batch and stream).

Reference shapes replaced:

* EventCount (``a7/EventCount.scala:66-69``, ST2/A11): 60-min tumbling count
  → ``groupBy(window('ts', '60 minutes')).count()``. The
  ``reduceByKeyAndWindow`` inverse-function incremental maintenance is the
  streaming state store's job now.
* RegionEventCount (``a7/RegionEventCount.scala:44-88``, P3/P4/ST3): the
  lon/lat bounding-box filter + region CASE label become a categorical
  filter+CASE over ``event_type`` (TESTDATA events carry no coordinates);
  the operator shape — filter → conditional label → keyed tumbling count —
  is identical.
* TrendingArrivals batch formulation (``a7/TrendingArrivals.scala:47-59``,
  ST4): previous-window count lookup via ``mapWithState`` becomes
  ``lag(cnt) over (partition by key order by window)`` in batch mode; the
  true stateful streaming variant lives in ``trending.py``.

Scale: tumbling-window aggregation shuffles on (key, window) — unbounded
key-space growth is bounded by watermarking in the streaming form; the batch
form partial-aggregates map-side. The lag window shuffles on key only, which
is the same exchange as the count aggregation (reused by Catalyst).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_toolkit_spark.catalog import load_table

# Region labeling: the engine analogue of the reference's two geo boxes
# (citigroup/goldman, a7/RegionEventCount.scala:44-58). ``error`` events fall
# outside both "regions" and are dropped, mirroring the reference dropping
# points outside both boxes.
def region_case():
    return (
        F.when(F.col("event_type").isin("click", "view"), F.lit("citigroup"))
        .when(F.col("event_type").isin("purchase", "signup"), F.lit("goldman"))
        .otherwise(F.lit(None))
    )

TREND_MIN_COUNT = 10  # a7/TrendingArrivals.scala:119-131: current >= 10
TREND_FACTOR = 2  # ... and current >= 2 * previous


def event_count_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-minute tumbling event counts (ST2 batch form)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "60 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "cnt")
    )


def region_event_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed 60-minute tumbling counts after filter + CASE labeling (ST3)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("region", region_case())
        .where(F.col("region").isNotNull())
        .groupBy("region", F.window("ts", "60 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select("region", F.col("w.start").alias("window_start"), "cnt")
    )


def trending_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-min windows per event_type with previous-window count + trend flag.

    Batch formulation of ST4/ST5: prev = lag(cnt) (0 when absent, matching
    mapWithState's zero initial state); trending iff cnt >= 10 and
    cnt >= 2*prev (``a7/TrendingArrivals.scala:119-131``).
    """
    events = load_table(spark, sf_dir, "events")
    counts = (
        events.groupBy("event_type", F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select("event_type", F.col("w.start").alias("window_start"), "cnt")
    )
    byk = Window.partitionBy("event_type").orderBy("window_start")
    return counts.select(
        "event_type",
        "window_start",
        "cnt",
        F.coalesce(F.lag("cnt").over(byk), F.lit(0)).alias("prev_cnt"),
    ).withColumn(
        "trending",
        (F.col("cnt") >= TREND_MIN_COUNT)
        & (F.col("cnt") >= TREND_FACTOR * F.col("prev_cnt")),
    )


# ---------------------------------------------------------------------------
# Structured Streaming forms (same plans over a readStream source)
# ---------------------------------------------------------------------------


def stream_event_count_hourly(events_stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming ST2: event-time tumbling count with a late-data watermark.

    The watermark bounds state: windows older than max(event time) − 2h are
    finalized and evicted — the piece the reference lacks entirely (its
    manual-clock windows can never handle late data, SURVEY §2.9).
    """
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "60 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "cnt")
    )


def stream_region_event_count(
    events_stream: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming ST3: keyed tumbling counts."""
    return (
        events_stream.withColumn("region", region_case())
        .where(F.col("region").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy("region", F.window("ts", "60 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select("region", F.col("w.start").alias("window_start"), "cnt")
    )


def stream_event_count_sliding(
    events_stream: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming sliding-window count (width ≠ slide — the one windowed
    shape that had only a batch-gated form): 60-min windows every 15 min
    over event time, sharing THE window definition with the oracle-green
    batch query (``relational_ext.sliding_count``), so stream == batch by
    construction and the replay test pins it.

    State: each event updates width/slide = 4 open windows; the watermark
    finalizes and evicts windows older than max(event time) − 2 h, so the
    state store holds O(4 · active-window-span) aggregates per partition
    regardless of stream length.
    """
    from big_data_toolkit_spark.operators.relational_ext import sliding_count

    return sliding_count(events_stream.withWatermark("ts", watermark))


def stream_user_sessions(
    events_stream: DataFrame, gap: str = "30 minutes", watermark: str = "1 minute"
) -> DataFrame:
    """Streaming sessionization: 30-min-gap sessions per user.

    ``session_window`` sessions are merge-able in the state store (overlapping
    [ts, ts+gap) intervals coalesce as events arrive out of order, up to the
    watermark). Append mode emits a session only once its window can no
    longer grow — i.e. when the watermark passes session end. Batch-form
    twin: ``relational_ext.user_sessions`` (oracle-checked).
    """
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("s"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def stream_dedup_events(
    events_stream: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exact dedup on event_id with watermark-bounded state.

    Without the watermark the seen-keys state grows forever; with it, a key
    is remembered only while a duplicate could still arrive (the at-least-
    once-source → exactly-once-pipeline repair step). Batch-form twin:
    ``dedup.dedup_exact`` semantics on the events table.
    """
    return events_stream.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def stream_dedup_incremental(
    new_docs_stream: DataFrame, corpus_fp: DataFrame
) -> DataFrame:
    """Stream-static LEFT ANTI join: the streaming form of snapshot-delta
    ingestion dedup (batch twin: ``dedup.dedup_incremental``).

    Incoming docs are fingerprinted in-row (md5 of the sorted distinct
    token set) and dropped when the fingerprint already exists in the
    STATIC corpus fingerprint table. The static side re-reads per
    micro-batch (Spark's stream-static contract), so at scale it should be
    a compact fingerprint table, not raw text — which is exactly what the
    batch op materializes.
    """
    from big_data_toolkit_spark.functions.text import tokenize

    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokenize("text")))))
    return (
        new_docs_stream.withColumn("content_md5", fp)
        .join(corpus_fp.select("content_md5"), "content_md5", "left_anti")
        .select("doc_id", "content_md5")
    )


def stream_dedup_incremental_bloom(
    new_docs_stream: DataFrame, corpus_fp: DataFrame
) -> DataFrame:
    """Bloom-prefiltered streaming ingestion dedup — the same output as
    ``stream_dedup_incremental`` (replay-tested equal), but Bloom-NEGATIVE
    documents never touch the stream-static anti-join: the corpus bitmap
    is built once at plan time (``dedup.bloom_bitmap_broadcast``,
    m/8 bytes shipped) and each micro-batch tests membership map-only
    (Arrow ``pandas_udf`` over JVM-computed position arrays). Only the
    dup-or-false-positive sliver re-reads the static fingerprint side,
    which under Spark's per-batch stream-static contract is the whole
    point — the per-batch static-scan cost drops from every incoming doc
    to the Bloom-positive few. Output stays exact: zero false negatives
    by construction.
    """
    from big_data_toolkit_spark.functions.text import tokenize
    from big_data_toolkit_spark.operators.dedup import (
        bloom_bitmap_broadcast,
        bloom_hit_udf,
    )

    bloom = bloom_bitmap_broadcast(new_docs_stream.sparkSession, corpus_fp)
    bloom_hit = bloom_hit_udf(bloom)
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokenize("text")))))
    new = new_docs_stream.withColumn("content_md5", fp).withColumn(
        "_hit", bloom_hit(bloom.positions_of("content_md5"))
    )
    definitely_new = new.where(~F.col("_hit")).select("doc_id", "content_md5")
    survivors_of_maybe = (
        new.where(F.col("_hit"))
        .join(corpus_fp.select("content_md5"), "content_md5", "left_anti")
        .select("doc_id", "content_md5")
    )
    return definitely_new.unionByName(survivors_of_maybe)


def stream_dedup_embedding_lsh(
    emb_stream: DataFrame,
    corpus_bands: DataFrame,
    corpus_vecs: DataFrame,
    planes: dict,
    ts_col: str | None = None,
    watermark: str = "1 hour",
    threshold: float | None = None,
) -> DataFrame:
    """Streaming embedding near-dup detection against a static corpus —
    the embedding-space sibling of ``stream_dedup_minhash_lsh`` and the
    streaming form of ``dedup.dedup_embedding_incremental`` (replay-
    tested equal).

    The stream side is map-only: each arriving vector's hyperplane sign
    bits come from the Arrow-batched ``_bucket_udf`` over the broadcast
    ``planes`` constants, band strings are built in-row, and the bands
    stream-static join against ``corpus_bands`` (dup_of, band). Matches
    verify with the exact in-row cosine against ``corpus_vecs``
    (dup_of, emb_corpus, n_corpus — norms precomputed on the static side,
    the `_verify_pairs_cosine` lesson) at the shared threshold
    (overridable — sign-band blocking is a HIGH-similarity dedup; see the
    regime note on ``dedup_embedding_lsh``). Multi-band pair hits
    collapse exactly as in the MinHash twin.
    """
    from big_data_toolkit_spark.operators.dedup import (
        COSINE_DUP_THRESHOLD,
        EMB_LSH_BAND_BITS,
        EMB_LSH_BANDS,
    )
    from big_data_toolkit_spark.operators.similarity import (
        _bucket_udf,
        _dot,
        _norm,
    )

    keep = ["vec_id"] + ([ts_col] if ts_col else [])
    sigs = emb_stream.select(
        *keep,
        "embedding",
        _norm("embedding").alias("n_new"),
        _bucket_udf(planes)("embedding").alias("bits"),
    )
    bands = F.array(
        *[
            F.concat_ws(
                "_",
                F.lit(b),
                F.substring(
                    "bits", b * EMB_LSH_BAND_BITS + 1, EMB_LSH_BAND_BITS
                ),
            )
            for b in range(EMB_LSH_BANDS)
        ]
    )
    scored = (
        sigs.select(*keep, "embedding", "n_new", F.explode(bands).alias("band"))
        .join(corpus_bands, "band")
        .join(corpus_vecs, "dup_of")
        .select(
            *keep,
            "dup_of",
            F.round(
                _dot("embedding", "emb_corpus")
                / (F.col("n_new") * F.col("n_corpus")),
                6,
            ).alias("cos"),
        )
        .where(
            F.col("cos")
            >= (COSINE_DUP_THRESHOLD if threshold is None else threshold)
        )
    )
    if ts_col:
        return scored.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["vec_id", "dup_of"]
        )
    return scored.dropDuplicates(["vec_id", "dup_of"])


def stream_dedup_minhash_lsh(
    new_docs_stream: DataFrame,
    corpus_bands: DataFrame,
    corpus_shingles: DataFrame,
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming MinHash-LSH NEAR-dup detection against a static corpus —
    the streaming form of ``dedup.dedup_minhash_incremental`` (replay-
    tested equal on the same delta/corpus split).

    The stream side is a PURE PROJECTION: each incoming document's
    distinct-shingle array, 16 signature minima, and 4 LSH band strings
    are computed in-row (``dedup.with_minhash_inrow`` — bit-identical to
    the batch aggregation path, staged projections so the shingle chain
    evaluates once per row), then the bands explode 4x and stream-
    static equi-join against ``corpus_bands`` (doc_id AS dup_of, band).
    Matches verify with exact in-row Jaccard against ``corpus_shingles``
    (dup_of, sh_corpus) at the shared threshold. No streaming
    aggregation, so any output mode works and per-batch cost is
    O(batch x bands + candidates) — corpus size only enters through the
    static join sides, which at scale are the persisted signature
    artifact, not raw text.

    A new doc sharing MULTIPLE bands with the same corpus doc would emit
    the pair once per band; the pair-level dedup is
    ``dropDuplicatesWithinWatermark`` when ``ts_col`` names an event-time
    column (bounded state — all of one arrival's band hits land in its
    own micro-batch, so any watermark covers them), else plain
    ``dropDuplicates`` (unbounded seen-pair state; fine for replays and
    bounded backfills, pass a ts for production streams).
    """
    keep = ["doc_id"] + ([ts_col] if ts_col else [])
    scored = _minhash_match_corpus(
        new_docs_stream, corpus_bands, corpus_shingles, keep
    )
    if ts_col:
        return scored.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["doc_id", "dup_of"]
        )
    return scored.dropDuplicates(["doc_id", "dup_of"])


def _minhash_match_corpus(
    df: DataFrame,
    corpus_bands: DataFrame,
    corpus_shingles: DataFrame,
    keep: list[str],
) -> DataFrame:
    """(*keep, dup_of, jaccard): in-row MinHash of ``df`` band-joined
    against the static corpus sides and exact-Jaccard verified at the
    shared threshold — THE one match-verify definition behind
    ``stream_dedup_minhash_lsh`` and ``manifest_delta_microbatch``, so
    a banding or rounding change cannot desync the two streaming
    consumers from the oracle-gated batch forms."""
    from big_data_toolkit_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        with_minhash_inrow,
    )

    hits = (
        with_minhash_inrow(df, "text", keep=keep)
        .withColumnRenamed("sh", "sh_new")
        .select(*keep, "sh_new", F.explode("bands").alias("band"))
        .join(corpus_bands, "band")
        .join(corpus_shingles, "dup_of")
    )
    inter = F.size(F.array_intersect("sh_new", "sh_corpus"))
    return hits.select(
        *keep,
        "dup_of",
        F.round(
            inter / (F.size("sh_new") + F.size("sh_corpus") - inter), 6
        ).alias("jaccard"),
    ).where(F.col("jaccard") >= JACCARD_THRESHOLD)


def stream_ann_pq(
    emb_stream: DataFrame,
    corpus_coded: DataFrame,
    donors: dict[int, list[int]],
    cents_q: dict[int, list[int]],
    radius: int | None = None,
) -> DataFrame:
    """Streaming IVF-PQ ANN radius matching against a static coded corpus —
    the streaming form of ``similarity.ann_pq_incremental`` (replay-tested
    equal) and the ANN family's last missing twin: MinHash and embedding
    near-dup got theirs in round 9; this is the same ingest shape for
    "alert when an arriving vector lands near the corpus".

    The stream side is a PURE PROJECTION: each arriving embedding
    quantizes to the fixed-point grid in-row, assigns its coarse cell by
    integer argmin over the 16 broadcast centroid literals, and computes
    its 8 in-row ADC lookup arrays (8×16 integer folds — the per-row form
    of ``knn_pq``'s driver-side LUT, since a stream cannot collect per-row
    LUTs). Candidates come from a stream-static CELL EQUI-JOIN against
    ``corpus_coded`` (match_id, cell, 8 code positions — the persisted
    8-bytes/vector index form, built once by ``pq_corpus_coded``), the ADC
    is 8 array lookups per candidate, and matches pass the shared
    ``PQ_RADIUS`` bound. No streaming aggregation and one cell per
    arriving vector (each pair emits exactly once), so any output mode
    works and per-batch cost is O(batch × cell occupancy) — corpus size
    enters only through the static index side.
    """
    from big_data_toolkit_spark.operators.similarity import (
        KMEANS_QUANT,
        PQ_RADIUS,
        _adc_from_lut_cols,
        pq_cell_col,
        pq_lut_cols,
    )

    qv = F.expr(
        f"transform(embedding, x -> floor(double(x) * {KMEANS_QUANT}))"
    )
    new = emb_stream.withColumn("qv", qv).select(
        "vec_id",
        pq_cell_col(cents_q).alias("cell"),
        *pq_lut_cols(donors),
    )
    return (
        new.join(corpus_coded, "cell")
        .select("vec_id", "match_id", _adc_from_lut_cols().alias("adc_dist2"))
        .where(
            F.col("adc_dist2") <= (PQ_RADIUS if radius is None else radius)
        )
    )


def manifest_delta_microbatch(
    batch_df: DataFrame,
    corpus_bands: DataFrame,
    corpus_shingles: DataFrame,
    comp: DataFrame,
) -> DataFrame:
    """(doc_id, component, split, quality, ws_tokens, kept): ONE
    micro-batch of the streaming ingest-manifest — the ``foreachBatch``
    body behind ``stream_manifest_ingest_delta`` and the per-batch form
    of ``curation.manifest_ingest_delta`` minus the shard column
    (shard packing is arrival-ordered append state, which the batch
    delta op owns; the streaming manifest emits the survive/split
    verdicts a downstream packer consumes).

    Why ``foreachBatch`` rather than a pure stream transform: the
    dropped-doc component is min() over a doc's verified corpus matches
    — a per-doc aggregation, which append-mode streaming disallows
    without event time. Every band hit of an arriving doc lands in its
    own micro-batch (the ``stream_dedup_minhash_lsh`` property), so the
    per-batch groupBy is exact and replay-invariant: each doc is
    processed exactly once, in whichever batch it arrives, against the
    same static corpus sides.
    """
    from big_data_toolkit_spark.operators.dedup import split_col
    from big_data_toolkit_spark.operators.quality import quality_expressions

    matches = _minhash_match_corpus(
        batch_df, corpus_bands, corpus_shingles, ["doc_id"]
    )
    mc = (
        matches.join(
            comp.select(F.col("doc_id").alias("dup_of"), "component"),
            "dup_of",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("component", F.col("dup_of")).alias("component"),
        )
        .groupBy("doc_id")
        .agg(F.min("component").alias("_mcomp"))
    )
    e = quality_expressions()
    ws = F.size(F.filter(F.split("text", " +"), lambda t: t != F.lit("")))
    base = batch_df.select(
        "doc_id",
        F.round(e["score"], 6).alias("quality"),
        ws.cast("long").alias("ws_tokens"),
    )
    return (
        base.join(mc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("_mcomp", F.col("doc_id")).alias("component"),
            F.col("_mcomp").isNull().alias("kept"),
            "quality",
            "ws_tokens",
        )
        .withColumn("split", split_col(F.col("component")))
        .select(
            "doc_id", "component", "split", "quality", "ws_tokens", "kept"
        )
    )


def stream_manifest_ingest_delta(
    new_docs_stream: DataFrame,
    corpus_bands: DataFrame,
    corpus_shingles: DataFrame,
    comp: DataFrame,
    path: str,
    checkpoint: str,
):
    """Streaming ingest-manifest writer: each arriving micro-batch of
    documents gets survive/split verdicts against the static corpus
    (``manifest_delta_microbatch``) and appends batch-stamped parquet
    (the ST8 convention) — the continuous form of the nightly-manifest
    + delta-append story. Returns the DataStreamWriter (caller calls
    ``.trigger(...).start()``)."""

    def emit(batch_df: DataFrame, batch_id: int) -> None:
        out = manifest_delta_microbatch(
            batch_df, corpus_bands, corpus_shingles, comp
        )
        out.withColumn("_batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(path)

    return new_docs_stream.writeStream.foreachBatch(emit).option(
        "checkpointLocation", checkpoint
    )


SHARD_APPEND_OUTPUT = (
    "split string, doc_id long, ws_tokens long, shard_id long"
)
SHARD_APPEND_STATE = "next_offset long"


def stream_shard_append(kept_stream: DataFrame, budget: int | None = None):
    """(split, doc_id, ws_tokens, shard_id): the STATEFUL continuation
    of the delta shard packer — arriving kept manifest rows append to
    each split's token line, which persists in keyed state across
    micro-batches so shard ids keep counting instead of resetting per
    batch. This is the piece ``manifest_ingest_delta`` leaves to the
    stream: an append-only packer whose only state is ONE offset per
    split (bounded regardless of corpus size — the state-store survival
    property).

    Within a batch, a split's rows pack in (hash32(doc_id), doc_id)
    order — the same deterministic hash order the batch packers use —
    so a given batch-cut sequence is fully reproducible. ACROSS cuts
    the assignment is arrival-ordered by contract (an appender cannot
    reorder what already shipped), unlike the nightly
    ``training_manifest``, which repacks the whole corpus bucket-major;
    the invariant that holds under ANY cut sequence is the token-line
    law: concatenating the batches (each internally hash-ordered) and
    taking the exclusive running token sum DIV budget reproduces every
    shard id exactly (replay-tested), and shard ids per split are dense
    from 0. ``budget`` defaults to ``curation.SHARD_TOKENS``.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from big_data_toolkit_spark.operators.curation import (
        SHARD_TOKENS,
        _hash32,
    )

    b = SHARD_TOKENS if budget is None else budget

    def update(key, pdf_iter, state):
        import pandas as pd

        offset = state.get[0] if state.exists else 0
        parts = [p for p in pdf_iter if len(p)]
        if not parts:
            state.update((offset,))
            yield pd.DataFrame(
                {
                    "split": pd.Series([], dtype=str),
                    "doc_id": pd.Series([], dtype="int64"),
                    "ws_tokens": pd.Series([], dtype="int64"),
                    "shard_id": pd.Series([], dtype="int64"),
                }
            )
            return
        pdf = pd.concat(parts).sort_values(["h", "doc_id"])
        pre = pdf["ws_tokens"].cumsum().shift(fill_value=0) + offset
        out = pd.DataFrame(
            {
                "split": pdf["split"].to_numpy(),
                "doc_id": pdf["doc_id"].to_numpy(),
                "ws_tokens": pdf["ws_tokens"].to_numpy(),
                "shard_id": (pre // b).astype("int64").to_numpy(),
            }
        )
        state.update((int(offset + pdf["ws_tokens"].sum()),))
        yield out

    return (
        kept_stream.select(
            "split",
            "doc_id",
            "ws_tokens",
            _hash32(F.col("doc_id")).alias("h"),
        )
        .groupBy("split")
        .applyInPandasWithState(
            update,
            outputStructType=SHARD_APPEND_OUTPUT,
            stateStructType=SHARD_APPEND_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    max_gap: str = "60 minutes",
    watermark: str = "1 minute",
) -> DataFrame:
    """Stream-stream inner join: purchases within 60 min AFTER a user's click.

    Both sides are watermarked and the join carries an event-time interval
    bound, so each side's buffered state is evicted once the other side's
    watermark passes the interval — bounded memory, the piece that makes
    stream-stream joins viable. (The reference has no stream joins at all;
    SURVEY §2.9 'not present'.)
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    ).withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {max_gap}")),
        "inner",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL (batch forms)
# ---------------------------------------------------------------------------

ORACLE_SQL: dict[str, str] = {
    "event_count_hourly": """
        SELECT date_trunc('hour', ts) AS window_start, count(*) AS cnt
        FROM events GROUP BY 1
    """,
    "region_event_count": """
        SELECT CASE WHEN event_type IN ('click','view') THEN 'citigroup'
                    WHEN event_type IN ('purchase','signup') THEN 'goldman'
               END AS region,
               date_trunc('hour', ts) AS window_start, count(*) AS cnt
        FROM events
        WHERE event_type IN ('click','view','purchase','signup')
        GROUP BY 1, 2
    """,
    "trending_events": """
        WITH counts AS (
          SELECT event_type,
                 time_bucket(INTERVAL '10 minutes', ts) AS window_start,
                 count(*) AS cnt
          FROM events GROUP BY 1, 2
        )
        SELECT event_type, window_start, cnt,
               coalesce(lag(cnt) OVER (PARTITION BY event_type
                                       ORDER BY window_start), 0) AS prev_cnt,
               (cnt >= 10 AND cnt >= 2 * coalesce(lag(cnt) OVER (
                   PARTITION BY event_type ORDER BY window_start), 0))
                 AS trending
        FROM counts
    """,
}

QUERIES = {
    "event_count_hourly": event_count_hourly,
    "region_event_count": region_event_count,
    "trending_events": trending_events,
}
