"""Deterministic replay tests for the extended streaming operators:
sessionization, watermark-bounded dedup, stream-stream interval join.
Pattern per SURVEY §5: file-per-batch source + availableNow trigger, no wall
clock; a far-future sentinel event advances the watermark to flush state."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from big_data_toolkit_spark.streaming import windows

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _write_batches(spark, src, batches):
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            os.path.join(src, f"b{i:03d}")
        )
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "b*"))
    )


def _run_to_memory(df, name, tmp_path, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)


def _m(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_stream_sessions_match_hand_computed(spark, tmp_path):
    batches = [
        [  # user 1: two sessions (40-min gap splits); user 2: one singleton
            (1, _m(0), 1, "click"),
            (2, _m(10), 1, "view"),
            (3, _m(5), 2, "click"),
        ],
        [(4, _m(50), 1, "click")],
        [(99, _m(60 * 24), 9, "click")],  # sentinel: advances watermark, flushes
    ]
    stream = _write_batches(spark, str(tmp_path / "src"), batches)
    _run_to_memory(
        windows.stream_user_sessions(stream), "sessions", tmp_path, mode="append"
    )
    rows = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions").collect()
        if r["user_id"] != 9
    }
    assert rows == {
        (1, _m(0), _m(10 + 30), 2),  # session end = last event + gap
        (1, _m(50), _m(50 + 30), 1),
        (2, _m(5), _m(5 + 30), 1),
    }


def test_stream_dedup_drops_cross_batch_duplicates(spark, tmp_path):
    batches = [
        [(1, _m(0), 1, "click"), (2, _m(1), 1, "view")],
        [(1, _m(0), 1, "click"), (3, _m(2), 2, "click")],  # replayed event 1
    ]
    stream = _write_batches(spark, str(tmp_path / "src"), batches)
    _run_to_memory(windows.stream_dedup_events(stream), "deduped", tmp_path)
    ids = [r["event_id"] for r in spark.sql("SELECT * FROM deduped").collect()]
    assert sorted(ids) == [1, 2, 3]


def test_stream_stream_join_interval_semantics(spark, tmp_path):
    clicks = _write_batches(
        spark,
        str(tmp_path / "clicks"),
        [
            [(10, _m(0), 1, "click"), (11, _m(0), 2, "click")],
            [(98, _m(60 * 24), 8, "click")],  # sentinel
        ],
    )
    purchases = _write_batches(
        spark,
        str(tmp_path / "purch"),
        [
            [
                (20, _m(30), 1, "purchase"),  # in window for click 10
                (21, _m(90), 1, "purchase"),  # beyond 60 min -> no match
                (22, _m(30), 3, "purchase"),  # wrong user -> no match
            ],
            [(99, _m(60 * 24), 9, "purchase")],  # sentinel
        ],
    )
    joined = windows.stream_click_purchase_join(clicks, purchases)
    _run_to_memory(joined, "cp_join", tmp_path)
    rows = [
        (r["user_id"], r["click_id"], r["purchase_id"])
        for r in spark.sql("SELECT * FROM cp_join").collect()
        if r["user_id"] < 8
    ]
    assert rows == [(1, 10, 20)]


def test_stream_sessions_merge_out_of_order_events(spark, tmp_path):
    """An out-of-order event inside the gap must MERGE two provisional
    sessions into one (the state-store merge the batch form gets for free)."""
    batches = [
        [(1, _m(0), 1, "click"), (2, _m(50), 1, "click")],  # 50-min gap: 2 sessions
        [(3, _m(25), 1, "view")],  # bridges them: gaps become 25 min
        [(99, _m(60 * 24), 9, "click")],
    ]
    stream = _write_batches(spark, str(tmp_path / "src"), batches)
    _run_to_memory(windows.stream_user_sessions(stream), "merged", tmp_path)
    final = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM merged WHERE user_id = 1").collect()
    }
    # one single merged session — not the two provisional ones
    assert final == {(1, _m(0), _m(50 + 30), 3)}


def test_stream_incremental_dedup_matches_batch(spark, tmp_path):
    """Stream-static anti-join twin of dedup.dedup_incremental at sf0.01:
    replay the delta batch (doc_id % 5 == 4) as two micro-batches against
    the static corpus fingerprints; output set must equal the batch op."""
    import glob

    from big_data_toolkit_spark.catalog import load_table
    from big_data_toolkit_spark.operators import dedup
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents")
    is_new = (F.col("doc_id") % dedup.NEW_BATCH_MOD) == dedup.NEW_BATCH_MOD - 1
    new_docs = docs.where(is_new).orderBy("doc_id").collect()
    src = str(tmp_path / "docsrc")
    half = len(new_docs) // 2
    for i, part in enumerate([new_docs[:half], new_docs[half:]]):
        spark.createDataFrame(part, docs.schema).coalesce(1).write.parquet(
            os.path.join(src, f"b{i:03d}")
        )
    assert len(glob.glob(os.path.join(src, "b*"))) == 2

    corpus_fp = docs.where(~is_new).select(
        F.md5(
            F.concat_ws(
                " ",
                F.array_sort(
                    F.array_distinct(
                        F.filter(
                            F.split(F.lower("text"), "[^a-z]+"),
                            lambda w: w != F.lit(""),
                        )
                    )
                ),
            )
        ).alias("content_md5")
    ).distinct()

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "b*"))
    )
    _run_to_memory(
        windows.stream_dedup_incremental(stream, corpus_fp), "inc_dedup", tmp_path
    )
    got = {
        (r["doc_id"], r["content_md5"])
        for r in spark.sql("select * from inc_dedup").collect()
    }
    expected = {
        (r["doc_id"], r["content_md5"])
        for r in dedup.dedup_incremental(spark, SF_ORACLE).collect()
    }
    assert got == expected


def _cut(rows, cuts):
    """Split a time-ordered row list at explicit indices -> batch lists."""
    bounds = [0] + list(cuts) + [len(rows)]
    return [
        rows[bounds[i] : bounds[i + 1]]
        for i in range(len(bounds) - 1)
        if rows[bounds[i] : bounds[i + 1]]
    ]


import pytest  # noqa: E402  (kept with its parametrized users below)


@pytest.mark.parametrize(
    "cuts", [(), (1,), (1, 2, 3, 4)], ids=["one-batch", "head-split", "per-event"]
)
def test_stream_sessions_invariant_to_batch_boundaries(spark, tmp_path, cuts):
    """The session-window state-store merge must reach the same final
    sessions for ANY time-ordered cut layout — a gap-bridging event in the
    same batch as its neighbors exercises in-batch session assembly; in
    its own batch, the provisional-session merge path."""
    rows = [
        (1, _m(0), 1, "click"),
        (3, _m(5), 2, "click"),
        (2, _m(10), 1, "view"),
        (4, _m(25), 1, "view"),
        (5, _m(50), 1, "click"),
    ]
    batches = _cut(rows, cuts) + [[(99, _m(60 * 24), 9, "click")]]
    stream = _write_batches(spark, str(tmp_path / "src"), batches)
    qname = f"sess_inv_{len(cuts)}"
    _run_to_memory(windows.stream_user_sessions(stream), qname, tmp_path)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql(f"SELECT * FROM {qname}").collect()
        if r["user_id"] != 9
    }
    # gaps 10/15/25 min all < 30 -> ONE user-1 session spanning everything
    assert got == {
        (1, _m(0), _m(50 + 30), 4),
        (2, _m(5), _m(5 + 30), 1),
    }


@pytest.mark.parametrize(
    "cuts", [(), (2,), (1, 2, 3)], ids=["one-batch", "dup-next-batch", "per-event"]
)
def test_stream_dedup_invariant_to_batch_boundaries(spark, tmp_path, cuts):
    """dropDuplicates must keep exactly the first arrival whether the
    duplicate lands in the same micro-batch (in-batch dedup path) or a
    later one (state-store path)."""
    rows = [
        (1, _m(0), 1, "click"),
        (2, _m(1), 1, "view"),
        (1, _m(0), 1, "click"),  # replay of event 1
        (3, _m(2), 2, "click"),
    ]
    batches = _cut(rows, cuts)
    stream = _write_batches(spark, str(tmp_path / "src"), batches)
    qname = f"dedup_inv_{len(cuts)}"
    _run_to_memory(windows.stream_dedup_events(stream), qname, tmp_path)
    ids = sorted(
        r["event_id"] for r in spark.sql(f"SELECT * FROM {qname}").collect()
    )
    assert ids == [1, 2, 3]


@pytest.mark.parametrize(
    "cuts", [(), (1,), (1, 2)], ids=["one-batch", "head-split", "per-event"]
)
def test_stream_stream_join_invariant_to_batch_boundaries(
    spark, tmp_path, cuts
):
    """The interval join must emit the same matches no matter how the
    purchase side is cut — a purchase buffered across triggers before its
    click's window closes exercises the state-store probe path."""
    clicks = _write_batches(
        spark,
        str(tmp_path / "clicks"),
        [
            [(10, _m(0), 1, "click"), (11, _m(0), 2, "click")],
            [(98, _m(60 * 24), 8, "click")],  # sentinel
        ],
    )
    prows = [
        (20, _m(30), 1, "purchase"),  # in window for click 10
        (21, _m(90), 1, "purchase"),  # beyond 60 min -> no match
        (22, _m(30), 3, "purchase"),  # wrong user -> no match
    ]
    purchases = _write_batches(
        spark,
        str(tmp_path / "purch"),
        _cut(prows, cuts) + [[(99, _m(60 * 24), 9, "purchase")]],
    )
    joined = windows.stream_click_purchase_join(clicks, purchases)
    qname = f"cpj_inv_{len(cuts)}"
    _run_to_memory(joined, qname, tmp_path)
    rows = [
        (r["user_id"], r["click_id"], r["purchase_id"])
        for r in spark.sql(f"SELECT * FROM {qname}").collect()
        if r["user_id"] < 8
    ]
    assert rows == [(1, 10, 20)]


def test_minhash_inrow_matches_agg_path(spark):
    """dedup.with_minhash_inrow (the map-only signature path) must produce
    bit-identical shingle sets and band strings to the batch aggregation
    path (minhash_per_doc + minhash_bands) over the WHOLE sf0.01 corpus —
    the guarantee that lets the stream twin share the batch twin's oracle
    evidence."""
    from big_data_toolkit_spark.catalog import load_table
    from big_data_toolkit_spark.operators import dedup
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents")
    inrow = {
        r["doc_id"]: (sorted(r["sh"]), list(r["bands"]))
        for r in dedup.with_minhash_inrow(docs, "text").collect()
    }
    per_doc = dedup.minhash_per_doc(docs)
    agg = {
        r["doc_id"]: sorted(r["sh"]) for r in per_doc.select("doc_id", "sh").collect()
    }
    assert set(inrow) == set(agg)
    for d in agg:
        assert inrow[d][0] == agg[d], d
    agg_band_sets = {
        r["doc_id"]: set(r["bs"])
        for r in dedup.minhash_bands(per_doc)
        .groupBy("doc_id")
        .agg(F.collect_set("band").alias("bs"))
        .collect()
    }
    for d in agg_band_sets:
        assert set(inrow[d][1]) == agg_band_sets[d], d


def test_stream_minhash_lsh_matches_batch(spark, tmp_path):
    """Replay the snapshot delta (doc_id % 5 == 4) as two micro-batches
    against the static corpus bands/shingles; the streamed near-dup pairs
    must equal dedup_minhash_incremental (the oracle-checked batch twin)."""
    import glob

    from big_data_toolkit_spark.catalog import load_table
    from big_data_toolkit_spark.operators import dedup
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents")
    is_new = (F.col("doc_id") % dedup.NEW_BATCH_MOD) == dedup.NEW_BATCH_MOD - 1
    new_docs = docs.where(is_new).orderBy("doc_id").collect()
    src = str(tmp_path / "mhsrc")
    half = len(new_docs) // 2
    for i, part in enumerate([new_docs[:half], new_docs[half:]]):
        spark.createDataFrame(part, docs.schema).coalesce(1).write.parquet(
            os.path.join(src, f"b{i:03d}")
        )
    assert len(glob.glob(os.path.join(src, "b*"))) == 2

    corpus_pd = dedup.minhash_per_doc(docs.where(~is_new))
    corpus_bands = dedup.minhash_bands(corpus_pd).withColumnRenamed(
        "doc_id", "dup_of"
    )
    corpus_shingles = corpus_pd.select(
        F.col("doc_id").alias("dup_of"), F.col("sh").alias("sh_corpus")
    )

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "b*"))
    )
    _run_to_memory(
        windows.stream_dedup_minhash_lsh(stream, corpus_bands, corpus_shingles),
        "mh_stream",
        tmp_path,
    )
    got = {
        (r["doc_id"], r["dup_of"], r["jaccard"])
        for r in spark.sql("SELECT * FROM mh_stream").collect()
    }
    expected = {
        (r["doc_id"], r["dup_of"], r["jaccard"])
        for r in dedup.dedup_minhash_incremental(spark, SF_ORACLE).collect()
    }
    assert got == expected
    assert expected, "fixture must contain at least one cross-side near-dup"


def test_stream_bloom_incremental_matches_batch(spark, tmp_path):
    """Bloom-prefiltered stream ingestion dedup: replay the delta batch as
    two micro-batches; output must equal BOTH the plain streaming form
    (same corpus) and the oracle-green batch op — the prefilter may only
    change the plan, never the survivors."""
    import glob

    from big_data_toolkit_spark.catalog import load_table
    from big_data_toolkit_spark.operators import dedup
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents")
    is_new = (F.col("doc_id") % dedup.NEW_BATCH_MOD) == dedup.NEW_BATCH_MOD - 1
    new_docs = docs.where(is_new).orderBy("doc_id").collect()
    src = str(tmp_path / "bloomsrc")
    half = len(new_docs) // 2
    for i, part in enumerate([new_docs[:half], new_docs[half:]]):
        spark.createDataFrame(part, docs.schema).coalesce(1).write.parquet(
            os.path.join(src, f"b{i:03d}")
        )
    assert len(glob.glob(os.path.join(src, "b*"))) == 2

    from big_data_toolkit_spark.functions.text import tokenize

    corpus_fp = (
        docs.where(~is_new)
        .select(
            F.md5(
                F.concat_ws(
                    " ", F.array_sort(F.array_distinct(tokenize("text")))
                )
            ).alias("content_md5")
        )
        .distinct()
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "b*"))
    )
    _run_to_memory(
        windows.stream_dedup_incremental_bloom(stream, corpus_fp),
        "bloom_stream",
        tmp_path,
    )
    got = {
        (r["doc_id"], r["content_md5"])
        for r in spark.sql("SELECT * FROM bloom_stream").collect()
    }
    expected = {
        (r["doc_id"], r["content_md5"])
        for r in dedup.dedup_incremental(spark, SF_ORACLE).collect()
    }
    assert got == expected
    assert expected


def test_stream_heavy_hitters_exact_when_capacity_suffices(spark, tmp_path):
    """With capacity >= distinct users per key, Space-Saving never evicts:
    the final summary is EXACT and invariant to micro-batch cuts — equal
    to the batch groupBy twin at sf0.01."""
    from big_data_toolkit_spark.catalog import load_table
    from big_data_toolkit_spark.streaming import trending
    from tests.conftest import SF_ORACLE

    events = load_table(spark, SF_ORACLE, "events").select(
        "event_type", "user_id", "ts", "event_id"
    )
    rows = events.orderBy("ts", "event_id").collect()
    # keep distinct-user count per key under SS_CAPACITY
    keep_users = {
        r["user_id"]
        for r in events.select("user_id").distinct().limit(40).collect()
    }
    rows = [r for r in rows if r["user_id"] in keep_users]
    assert rows
    src = str(tmp_path / "hhsrc")
    third = len(rows) // 3
    batches = [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    for i, part in enumerate(b for b in batches if b):
        spark.createDataFrame(part, events.schema).coalesce(1).write.parquet(
            os.path.join(src, f"b{i:03d}")
        )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "b*"))
    )
    _run_to_memory(trending.stream_heavy_hitters(stream), "hh", tmp_path)
    all_rows = spark.sql("SELECT * FROM hh").collect()
    latest_version = {}
    for r in all_rows:
        latest_version[r["event_type"]] = max(
            latest_version.get(r["event_type"], -1), r["version"]
        )
    got = {
        (r["event_type"], r["user_id"]): (r["est_cnt"], r["err"])
        for r in all_rows
        if r["version"] == latest_version[r["event_type"]]
    }
    exact = {}
    for r in rows:
        k = (r["event_type"], r["user_id"])
        exact[k] = exact.get(k, 0) + 1
    assert {k: v[0] for k, v in got.items()} == exact
    assert all(err == 0 for _, err in got.values())


def test_space_saving_error_bound_under_eviction():
    """Property (no Spark needed): with tiny capacity over a skewed
    stream, est >= true >= est - err for every surviving counter, and
    every user with true count > N/capacity is present."""
    import random

    from big_data_toolkit_spark.streaming.trending import _space_saving_merge

    rng = random.Random(3)
    stream = (
        [1] * 500 + [2] * 300 + [3] * 120
        + [rng.randrange(100, 400) for _ in range(400)]
    )
    rng.shuffle(stream)
    capacity = 8
    summary = {}
    true = {}
    for i in range(0, len(stream), 57):  # uneven micro-batches
        chunk = stream[i : i + 57]
        batch = {}
        for u in chunk:
            batch[u] = batch.get(u, 0) + 1
            true[u] = true.get(u, 0) + 1
        _space_saving_merge(summary, batch, capacity)
    assert len(summary) <= capacity
    n = len(stream)
    for u, (est, err) in summary.items():
        assert est >= true[u] >= est - err, (u, est, err, true[u])
    for u, t in true.items():
        if t > n / capacity:
            assert u in summary, (u, t)


def test_stream_heavy_hitters_tws_matches_apip(spark, tmp_path):
    """The transformWithStateInPandas heavy-hitter twin must reproduce the
    applyInPandasWithState output over the same replay (both fold through
    _hh_fold). Plan construction is asserted unconditionally; execution is
    protobuf-gated like the trending TWS twin."""
    from tests import conftest as cft
    from big_data_toolkit_spark.catalog import load_table
    from big_data_toolkit_spark.streaming import trending
    from tests.conftest import SF_ORACLE

    events = load_table(spark, SF_ORACLE, "events").select(
        "event_type", "user_id", "ts", "event_id"
    )
    tws_df = trending.stream_heavy_hitters_tws(
        spark.readStream.schema(events.schema).parquet(
            "/root/testdata/sf0.001/events.parquet"
        )
    )
    assert tws_df.isStreaming
    assert [f.name for f in tws_df.schema.fields] == [
        "event_type", "user_id", "est_cnt", "err", "version"
    ]
    if not cft.HAS_PROTOBUF:
        import pytest

        pytest.skip(cft.TWS_SKIP_REASON)

    rows = events.orderBy("ts", "event_id").limit(400).collect()
    src = str(tmp_path / "hhtws")
    half = len(rows) // 2
    for i, part in enumerate([rows[:half], rows[half:]]):
        spark.createDataFrame(part, events.schema).coalesce(1).write.parquet(
            os.path.join(src, f"b{i:03d}")
        )

    def run(factory, name, ckpt):
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(src, "b*"))
        )
        df = factory(stream)
        with cft.rocksdb_state_store(spark):
            q = (
                df.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .option("checkpointLocation", str(tmp_path / ckpt))
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(300)
        out = spark.sql(f"SELECT * FROM {name}").collect()
        latest = {}
        for r in out:
            latest[r["event_type"]] = max(
                latest.get(r["event_type"], -1), r["version"]
            )
        return {
            (r["event_type"], r["user_id"], r["est_cnt"], r["err"])
            for r in out
            if r["version"] == latest[r["event_type"]]
        }

    got_tws = run(trending.stream_heavy_hitters_tws, "hh_tws", "ck_tws")
    got_apip = run(trending.stream_heavy_hitters, "hh_apip", "ck_apip")
    assert got_tws == got_apip
    assert got_tws


def test_stream_embedding_lsh_matches_batch(spark, tmp_path):
    """Replay the embedding delta (vec_id % 5 == 4) as two micro-batches
    against the static corpus bands/vectors; streamed near-dup matches
    must equal dedup_embedding_incremental (the oracle-checked batch
    twin)."""
    import glob

    from big_data_toolkit_spark.catalog import load_table
    from big_data_toolkit_spark.operators import dedup
    from big_data_toolkit_spark.operators.similarity import (
        _bucket_udf,
        _collect_index_vectors,
        _norm,
    )
    from tests.conftest import SF_ORACLE

    emb = load_table(spark, SF_ORACLE, "embeddings")
    is_new = (F.col("vec_id") % dedup.NEW_BATCH_MOD) == dedup.NEW_BATCH_MOD - 1
    new_vecs = emb.where(is_new).orderBy("vec_id").collect()
    src = str(tmp_path / "embsrc")
    half = len(new_vecs) // 2
    for i, part in enumerate([new_vecs[:half], new_vecs[half:]]):
        spark.createDataFrame(part, emb.schema).coalesce(1).write.parquet(
            os.path.join(src, f"b{i:03d}")
        )
    assert len(glob.glob(os.path.join(src, "b*"))) == 2

    planes = _collect_index_vectors(emb, dedup.EMB_LSH_PLANES)
    corpus = emb.where(~is_new)
    corpus_sigs = corpus.select(
        "vec_id", _bucket_udf(planes)("embedding").alias("bits")
    )
    corpus_bands = dedup.emb_bands_of(corpus_sigs).withColumnRenamed(
        "vec_id", "dup_of"
    )
    corpus_vecs = corpus.select(
        F.col("vec_id").alias("dup_of"),
        F.col("embedding").alias("emb_corpus"),
        _norm("embedding").alias("n_corpus"),
    )
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "b*"))
    )
    # at the production threshold the sign-band regime note applies (recall
    # ~0 at moderate theta, and the fixture's planted near-dups don't cross
    # the delta/corpus slice within a band) — so ALSO run at threshold 0 to
    # pin a NON-EMPTY stream==batch equality over every band candidate.
    _run_to_memory(
        windows.stream_dedup_embedding_lsh(
            stream, corpus_bands, corpus_vecs, planes
        ),
        "emb_stream",
        tmp_path,
    )
    got = {
        (r["vec_id"], r["dup_of"], r["cos"])
        for r in spark.sql("SELECT * FROM emb_stream").collect()
    }
    expected = {
        (r["vec_id"], r["dup_of"], r["cos"])
        for r in dedup.dedup_embedding_incremental(spark, SF_ORACLE).collect()
    }
    assert got == expected

    _run_to_memory(
        windows.stream_dedup_embedding_lsh(
            stream, corpus_bands, corpus_vecs, planes, threshold=0.0
        ),
        "emb_stream0",
        tmp_path,
    )
    got0 = {
        (r["vec_id"], r["dup_of"], r["cos"])
        for r in spark.sql("SELECT * FROM emb_stream0").collect()
    }
    sigs_new = emb.where(is_new).select(
        "vec_id", _bucket_udf(planes)("embedding").alias("bits")
    )
    cands = (
        dedup.emb_bands_of(sigs_new)
        .withColumnRenamed("vec_id", "d1")
        .join(corpus_bands.withColumnRenamed("dup_of", "d2"), "band")
        .select("d1", "d2")
        .distinct()
    )
    from big_data_toolkit_spark.operators.similarity import _dot

    nemb = emb.select("vec_id", "embedding", _norm("embedding").alias("nrm"))
    e1 = nemb.select(
        F.col("vec_id").alias("d1"),
        F.col("embedding").alias("e1"),
        F.col("nrm").alias("n1"),
    )
    e2 = nemb.select(
        F.col("vec_id").alias("d2"),
        F.col("embedding").alias("e2"),
        F.col("nrm").alias("n2"),
    )
    expected0 = {
        (r["d1"], r["d2"], r["cos"])
        for r in cands.join(e1, "d1")
        .join(e2, "d2")
        .select(
            "d1",
            "d2",
            F.round(_dot("e1", "e2") / (F.col("n1") * F.col("n2")), 6).alias(
                "cos"
            ),
        )
        .where(F.col("cos") >= 0.0)
        .collect()
    }
    assert got0 == expected0
    assert got0, "band candidates must flow through the stream path"


def test_stream_ann_pq_matches_batch(spark, tmp_path):
    """Replay the embedding delta (vec_id % 5 == 4) as two micro-batches
    against the static coded corpus (cell + PQ code positions); streamed
    IVF-PQ radius matches must equal ann_pq_incremental (the oracle-checked
    batch twin), bit-exact — the whole path is integer arithmetic."""
    import glob

    from big_data_toolkit_spark.catalog import load_table
    from big_data_toolkit_spark.operators import dedup, similarity
    from tests.conftest import SF_ORACLE

    emb = load_table(spark, SF_ORACLE, "embeddings")
    is_new = (F.col("vec_id") % dedup.NEW_BATCH_MOD) == dedup.NEW_BATCH_MOD - 1
    new_vecs = emb.where(is_new).orderBy("vec_id").collect()
    src = str(tmp_path / "pqsrc")
    half = len(new_vecs) // 2
    for i, part in enumerate([new_vecs[:half], new_vecs[half:]]):
        spark.createDataFrame(part, emb.schema).coalesce(1).write.parquet(
            os.path.join(src, f"b{i:03d}")
        )
    assert len(glob.glob(os.path.join(src, "b*"))) == 2

    donors = similarity._pq_codebook(spark, SF_ORACLE)
    cents_q = similarity._quantized_centroids(spark, SF_ORACLE)
    corpus_coded = similarity.pq_corpus_coded(
        spark, SF_ORACLE, donors, cents_q
    ).localCheckpoint()  # static index side, built once

    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "b*"))
    )
    _run_to_memory(
        windows.stream_ann_pq(stream, corpus_coded, donors, cents_q),
        "pq_stream",
        tmp_path,
    )
    got = {
        (r["vec_id"], r["match_id"], r["adc_dist2"])
        for r in spark.sql("SELECT * FROM pq_stream").collect()
    }
    expected = {
        (r["vec_id"], r["match_id"], r["adc_dist2"])
        for r in similarity.ann_pq_incremental(spark, SF_ORACLE).collect()
    }
    assert got == expected
    assert expected, "fixture must contain at least one in-radius match"


def test_stream_audio_spectral_matches_batch(spark, tmp_path):
    """The multimodal family's first streaming form: WAV payloads replayed
    as two micro-batches through the SAME decode→FFT projection
    (binary_ops.spectral_features_of — mapInPandas is stream-safe) must
    equal the oracle-checked batch query exactly."""
    import glob

    from big_data_toolkit_spark.multimodal import binary_ops as mm
    from tests.conftest import SF_ORACLE

    assets = mm.wav_assets(spark, SF_ORACLE).orderBy("doc_id").collect()
    src = str(tmp_path / "wavsrc")
    half = len(assets) // 2
    schema = "doc_id long, payload binary"
    for i, part in enumerate([assets[:half], assets[half:]]):
        spark.createDataFrame(part, schema).coalesce(1).write.parquet(
            os.path.join(src, f"b{i:03d}")
        )
    assert len(glob.glob(os.path.join(src, "b*"))) == 2

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "b*"))
    )
    _run_to_memory(
        mm.spectral_features_of(stream), "wav_spectral_stream", tmp_path
    )
    got = {
        tuple(r) for r in spark.sql("SELECT * FROM wav_spectral_stream").collect()
    }
    expected = {
        tuple(r)
        for r in mm.QUERIES["audio_spectral_features"](spark, SF_ORACLE).collect()
    }
    assert got == expected and expected


def test_stream_gapfill_locf_matches_batch_on_closed_hours(spark, tmp_path):
    """Streaming gap-fill + LOCF: replay the full event history as three
    time-ordered micro-batches; every CLOSED hour's row (count, gap rows,
    carried averages) must equal the oracle-green batch twin. The stream
    never emits a key's still-open last hour — expected = batch rows with
    hour < that key's last observed hour."""
    import glob

    from big_data_toolkit_spark.catalog import load_table
    from big_data_toolkit_spark.operators import analytics_ext as ax
    from big_data_toolkit_spark.streaming import trending
    from tests.conftest import SF_ORACLE

    ev = load_table(spark, SF_ORACLE, "events").select(
        "event_type", "ts", "value"
    )
    rows = ev.orderBy("ts", "event_type").collect()
    src = str(tmp_path / "gapsrc")
    third = len(rows) // 3
    parts = [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    for i, part in enumerate(parts):
        spark.createDataFrame(part, ev.schema).coalesce(1).write.parquet(
            os.path.join(src, f"b{i:03d}")
        )
    assert len(glob.glob(os.path.join(src, "b*"))) == 3

    import datetime as dt

    min_ts = min(r["ts"] for r in rows)
    grid_start = int(
        min_ts.replace(minute=0, second=0, microsecond=0)
        .replace(tzinfo=dt.timezone.utc)
        .timestamp()
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "b*"))
    )
    _run_to_memory(
        trending.stream_gapfill_locf(stream, grid_start),
        "gapfill_stream",
        tmp_path,
    )
    got = {
        (r["event_type"], r["hour"], r["n"], r["locf_avg"])
        for r in spark.sql("SELECT * FROM gapfill_stream").collect()
    }
    last_obs = {}
    for r in rows:
        h = r["ts"].replace(minute=0, second=0, microsecond=0)
        k = r["event_type"]
        last_obs[k] = max(last_obs.get(k, h), h)
    expected = {
        (r["event_type"], r["hour"], r["n"], r["locf_avg"])
        for r in ax.events_gapfill_locf(spark, SF_ORACLE).collect()
        if r["hour"] < last_obs[r["event_type"]]
    }
    assert got == expected
    assert any(n == 0 for (_, _, n, _) in got), "gap rows must stream"


def test_stream_manifest_ingest_delta_matches_batch(spark, tmp_path):
    """Replay the snapshot delta as two micro-batches through the
    foreachBatch ingest-manifest; the streamed verdicts must equal the
    oracle-checked batch twin (manifest_ingest_delta) minus its
    delta-local shard column, every row batch-stamped."""
    import glob

    from big_data_toolkit_spark.catalog import load_table
    from big_data_toolkit_spark.operators import curation, dedup
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents")
    is_new = (F.col("doc_id") % dedup.NEW_BATCH_MOD) == dedup.NEW_BATCH_MOD - 1
    new_docs = docs.where(is_new).orderBy("doc_id").collect()
    src = str(tmp_path / "mansrc")
    half = len(new_docs) // 2
    for i, part in enumerate([new_docs[:half], new_docs[half:]]):
        spark.createDataFrame(part, docs.schema).coalesce(1).write.parquet(
            os.path.join(src, f"b{i:03d}")
        )
    assert len(glob.glob(os.path.join(src, "b*"))) == 2

    corpus_pd = dedup.minhash_per_doc(docs.where(~is_new))
    corpus_bands = dedup.minhash_bands(corpus_pd).withColumnRenamed(
        "doc_id", "dup_of"
    )
    corpus_shingles = corpus_pd.select(
        F.col("doc_id").alias("dup_of"), F.col("sh").alias("sh_corpus")
    )
    corpus_pairs = dedup.dedup_minhash_lsh(spark, SF_ORACLE).where(
        f"d1 % {dedup.NEW_BATCH_MOD} <> {dedup.NEW_BATCH_MOD - 1} AND "
        f"d2 % {dedup.NEW_BATCH_MOD} <> {dedup.NEW_BATCH_MOD - 1}"
    )
    comp = dedup.dedup_components(spark, SF_ORACLE, pairs=corpus_pairs)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "b*"))
    )
    out = str(tmp_path / "manifest_out")
    q = (
        windows.stream_manifest_ingest_delta(
            stream,
            corpus_bands,
            corpus_shingles,
            comp,
            out,
            str(tmp_path / "ckpt_manifest"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got_rows = spark.read.parquet(out).collect()
    assert {r["_batch_id"] for r in got_rows} == {0, 1}  # batch-stamped
    got = {
        (
            r["doc_id"],
            r["component"],
            r["split"],
            r["quality"],
            r["ws_tokens"],
            r["kept"],
        )
        for r in got_rows
    }
    expected = {
        (
            r["doc_id"],
            r["component"],
            r["split"],
            r["quality"],
            r["ws_tokens"],
            r["kept"],
        )
        for r in curation.manifest_ingest_delta(spark, SF_ORACLE).collect()
    }
    assert got == expected
    assert any(not k for (_, _, _, _, _, k) in expected), (
        "fixture must drop at least one near-dup delta doc"
    )


def test_stream_shard_append_token_line_across_batches(spark, tmp_path):
    """The appender's contract under any batch-cut sequence: per split,
    concatenating the batches (each internally (hash32, doc_id)-ordered)
    and taking the exclusive running token sum DIV budget reproduces
    every emitted shard id exactly — i.e. state CONTINUES the token
    line across micro-batches instead of resetting — and shard ids are
    dense from 0."""
    import glob
    import hashlib

    from big_data_toolkit_spark.catalog import load_table
    from big_data_toolkit_spark.operators import curation, dedup
    from tests.conftest import SF_ORACLE

    kept = [
        r
        for r in curation.manifest_ingest_delta(spark, SF_ORACLE).collect()
        if r["kept"]
    ]
    assert kept
    schema = "split string, doc_id long, ws_tokens long"
    rows = [(r["split"], r["doc_id"], r["ws_tokens"]) for r in kept]
    src = str(tmp_path / "shardsrc")
    half = len(rows) // 2
    for i, part in enumerate([rows[:half], rows[half:]]):
        spark.createDataFrame(part, schema).coalesce(1).write.parquet(
            os.path.join(src, f"b{i:03d}")
        )
    assert len(glob.glob(os.path.join(src, "b*"))) == 2

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "b*"))
    )
    _run_to_memory(
        windows.stream_shard_append(stream), "shard_append", tmp_path
    )
    got = {
        r["doc_id"]: (r["split"], r["ws_tokens"], r["shard_id"])
        for r in spark.sql("SELECT * FROM shard_append").collect()
    }
    assert set(got) == {d for _, d, _ in rows}

    def h32(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)

    # replicate: per split, batch 0's rows (hash-ordered) then batch 1's
    expected_offset: dict = {}
    expected: dict = {}
    for part in (rows[:half], rows[half:]):
        by_split: dict = {}
        for s, d, w in part:
            by_split.setdefault(s, []).append((d, w))
        for s, members in by_split.items():
            run = expected_offset.get(s, 0)
            for d, w in sorted(members, key=lambda t: (h32(t[0]), t[0])):
                expected[d] = (s, w, run // curation.SHARD_TOKENS)
                run += w
            expected_offset[s] = run
    assert got == expected
    for s in {r["split"] for r in kept}:
        ids = sorted({v[2] for v in got.values() if v[0] == s})
        assert ids == list(range(len(ids))), (s, ids)


def test_stream_manifest_chain_end_to_end(spark, tmp_path):
    """The COMPOSED streaming-manifest pipeline (r11 verdict item 8): the
    ingest-manifest stream writes batch-stamped verdicts to storage, and
    the shard appender STREAMS FROM THAT OUTPUT — two availableNow stages
    chained through parquet, exactly how micro-batch pipelines compose in
    production. End-to-end assertions: the verdict columns equal the
    oracle-checked batch twin; the appender packs every kept survivor —
    dense shard ids per split, per-split token totals equal to the batch
    twin, and each shard's token sum honoring the budget law (exclusive
    prefix: a shard stops growing only once it has reached the budget)."""
    import glob

    from big_data_toolkit_spark.catalog import load_table
    from big_data_toolkit_spark.operators import curation, dedup
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents")
    is_new = (F.col("doc_id") % dedup.NEW_BATCH_MOD) == dedup.NEW_BATCH_MOD - 1
    src = str(tmp_path / "chain_src")
    docs.where(is_new).coalesce(1).write.parquet(os.path.join(src, "b000"))

    corpus_pd = dedup.minhash_per_doc(docs.where(~is_new))
    corpus_bands = dedup.minhash_bands(corpus_pd).withColumnRenamed(
        "doc_id", "dup_of"
    )
    corpus_shingles = corpus_pd.select(
        F.col("doc_id").alias("dup_of"), F.col("sh").alias("sh_corpus")
    )
    corpus_pairs = dedup.dedup_minhash_lsh(spark, SF_ORACLE).where(
        f"d1 % {dedup.NEW_BATCH_MOD} <> {dedup.NEW_BATCH_MOD - 1} AND "
        f"d2 % {dedup.NEW_BATCH_MOD} <> {dedup.NEW_BATCH_MOD - 1}"
    )
    comp = dedup.dedup_components(spark, SF_ORACLE, pairs=corpus_pairs)

    # stage 1: ingest-manifest stream -> batch-stamped parquet
    manifest_out = str(tmp_path / "chain_manifest")
    q1 = (
        windows.stream_manifest_ingest_delta(
            spark.readStream.schema(docs.schema).parquet(
                os.path.join(src, "b*")
            ),
            corpus_bands,
            corpus_shingles,
            comp,
            manifest_out,
            str(tmp_path / "ckpt_chain1"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination(180)
    assert glob.glob(os.path.join(manifest_out, "*.parquet"))

    # stage 2: the appender streams the KEPT survivors from stage 1's
    # stored output — the chained hop
    kept_stream = (
        spark.readStream.schema(spark.read.parquet(manifest_out).schema)
        .parquet(manifest_out)
        .where("kept")
        .select("split", "doc_id", "ws_tokens")
    )
    _run_to_memory(
        windows.stream_shard_append(kept_stream), "chain_shards", tmp_path
    )
    packed = {
        r["doc_id"]: r
        for r in spark.sql("SELECT * FROM chain_shards").collect()
    }

    batch = curation.manifest_ingest_delta(spark, SF_ORACLE).collect()
    # verdict parity end-to-end (stage 1 stored output vs the batch twin)
    got_verdicts = {
        (r["doc_id"], r["component"], r["split"], r["quality"],
         r["ws_tokens"], r["kept"])
        for r in spark.read.parquet(manifest_out).collect()
    }
    want_verdicts = {
        (r["doc_id"], r["component"], r["split"], r["quality"],
         r["ws_tokens"], r["kept"])
        for r in batch
    }
    assert got_verdicts == want_verdicts
    # every kept survivor reached the packer, and only those
    kept_batch = [r for r in batch if r["kept"]]
    assert set(packed) == {r["doc_id"] for r in kept_batch}
    for r in kept_batch:
        assert packed[r["doc_id"]]["split"] == r["split"]
        assert packed[r["doc_id"]]["ws_tokens"] == r["ws_tokens"]
    # per-split budget law + totals parity with the batch twin
    by_split: dict = {}
    for p in packed.values():
        by_split.setdefault(p["split"], []).append(p)
    for split, members in by_split.items():
        want_total = sum(r["ws_tokens"] for r in kept_batch
                         if r["split"] == split)
        assert sum(p["ws_tokens"] for p in members) == want_total
        ids = sorted({p["shard_id"] for p in members})
        assert ids == list(range(len(ids))), (split, ids)
        per_shard = {}
        for p in members:
            per_shard[p["shard_id"]] = (
                per_shard.get(p["shard_id"], 0) + p["ws_tokens"]
            )
        # exclusive-prefix law: every shard except the last reached the
        # budget before its successor opened
        for sid in ids[:-1]:
            assert per_shard[sid] >= 1, (split, sid)
        running = 0
        for sid in ids[:-1]:
            running += per_shard[sid]
            assert running >= (sid + 1) * curation.SHARD_TOKENS - max(
                p["ws_tokens"] for p in members
            ), (split, sid)
