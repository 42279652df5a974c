"""Training-data curation operators: oracle parity + scale plan shapes."""

import pytest

from big_data_toolkit_spark.operators import curation
from tests.oracle_utils import compare

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(curation.QUERIES))
def test_oracle_parity(spark, name):
    compare(curation.QUERIES[name](spark, SF), curation.ORACLE_SQL[name], SF)


def test_hash_sample_is_pure_filter(spark):
    """No shuffle: the sample must be scan+filter only (composable,
    pushdown-friendly); an Exchange would mean it repartitioned 100 TB
    just to drop rows."""
    plan = (
        curation.hash_sample(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_hash_sample_rate(spark):
    """~10% of 500 docs, deterministic across runs."""
    a = sorted(r["doc_id"] for r in curation.hash_sample(spark, SF).collect())
    b = sorted(r["doc_id"] for r in curation.hash_sample(spark, SF).collect())
    assert a == b
    assert 20 <= len(a) <= 80


def test_stratified_equal_allocation(spark):
    rows = curation.stratified_sample(spark, SF).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], 0)
        by_src[r["source"]] += 1
    assert set(by_src.values()) == {curation.STRATUM_K}


def test_source_mix_ratios(spark):
    """Selected counts per source are exactly weight·u for one shared u."""
    rows = curation.source_mix(spark, SF).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], 0)
        by_src[r["source"]] += 1
    units = {
        cnt // curation.MIX_WEIGHTS[s] for s, cnt in by_src.items()
    }
    assert len(units) == 1
    u = units.pop()
    assert all(
        cnt == curation.MIX_WEIGHTS[s] * u for s, cnt in by_src.items()
    )


def test_shard_pack_budget_and_totality(spark):
    """Every doc is assigned; every shard except the last stays within
    budget + one doc of overshoot (a doc never splits across shards)."""
    rows = curation.shard_pack(spark, SF).collect()
    assert len(rows) == 500  # every document assigned
    shards = {}
    for r in rows:
        shards.setdefault(r["shard_id"], 0)
        shards[r["shard_id"]] += r["ws_tokens"]
    assert sorted(shards) == list(range(len(shards)))  # dense ids
    max_doc = max(r["ws_tokens"] for r in rows)
    for sid, tot in shards.items():
        if sid != max(shards):
            assert tot <= curation.SHARD_TOKENS + max_doc


def test_shard_pack_no_global_window_over_docs(spark):
    """The corpus-wide windows are partitioned by bucket; only the
    N_BUCKETS-row offset table is globally ordered. A SinglePartition
    exchange feeding a 500-row+ window would be the 100 TB bottleneck."""
    df = curation.shard_pack(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # The doc-level window must be hash-partitioned by bucket.
    assert "hashpartitioning(bucket" in plan


def test_hash_sample_predicate_works_on_stream(spark, tmp_path):
    """The sampling predicate is stateless, so the identical expression
    running over readStream selects exactly the batch sample — streaming
    curation needs no separate implementation or state store."""
    import os

    from big_data_toolkit_spark.catalog import load_table

    docs = load_table(spark, SF, "documents")
    src = str(tmp_path / "src")
    # two files → a genuine multi-batch replay
    docs.where("doc_id % 2 = 0").write.parquet(os.path.join(src, "batch_0"))
    docs.where("doc_id % 2 = 1").write.parquet(os.path.join(src, "batch_1"))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "batch_*"))
    )
    q = (
        stream.where(curation.hash_sample_predicate())
        .select("doc_id")
        .writeStream.format("memory")
        .queryName("stream_sample")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        r["doc_id"] for r in spark.sql("select * from stream_sample").collect()
    )
    want = sorted(
        r["doc_id"] for r in curation.hash_sample(spark, SF).collect()
    )
    assert got == want


def test_compact_table_merges_small_files(spark, tmp_path):
    """Many tiny files in, size-targeted few files out, identical rows."""
    from big_data_toolkit_spark.sources import writers

    p = str(tmp_path / "t")
    df = spark.range(10000).selectExpr("id", "id * 2 AS v")
    df.repartition(64).write.parquet(p)  # 64 tiny files
    before = spark.read.parquet(p)
    assert len(before.inputFiles()) == 64
    rows_before = sorted((r["id"], r["v"]) for r in before.collect())

    n = writers.compact_table(spark, p)
    after = spark.read.parquet(p)
    assert len(after.inputFiles()) == n == 1  # tiny table → one 128MB target
    assert sorted((r["id"], r["v"]) for r in after.collect()) == rows_before


def test_compact_table_refuses_partitioned_layout(spark, tmp_path):
    """A flat rewrite of a hive layout would destroy partition pruning —
    compact_table must refuse rather than silently flatten."""
    import pytest

    from big_data_toolkit_spark.sources import writers

    p = str(tmp_path / "parted")
    df = spark.range(100).selectExpr("id", "id % 3 AS part")
    writers.write_partitioned(df, p, ["part"])
    with pytest.raises(ValueError, match="hive-partitioned"):
        writers.compact_table(spark, p)
    # layout untouched
    assert sorted(r["id"] for r in spark.read.parquet(p).collect()) == list(
        range(100)
    )


def test_chunk_documents_slices_and_covers(spark):
    """Every chunk equals the corresponding token slice of its doc, chunk
    ids are dense from 0, and the sweep covers the full token stream."""
    from big_data_toolkit_spark.operators.curation import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        chunk_documents,
    )

    from big_data_toolkit_spark.catalog import load_table

    docs = {
        r["doc_id"]: [w for w in r["text"].split(" ") if w]
        for r in load_table(spark, SF, "documents").collect()
    }
    by_doc: dict = {}
    for r in chunk_documents(spark, SF).collect():
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk_text"].split(" ")
    assert set(by_doc) == {d for d, t in docs.items() if t}
    for doc_id, chunks in by_doc.items():
        t = docs[doc_id]
        n_expected = (len(t) - 1) // CHUNK_STRIDE + 1
        assert sorted(chunks) == list(range(n_expected))
        for k, ctoks in chunks.items():
            assert ctoks == t[k * CHUNK_STRIDE : k * CHUNK_STRIDE + CHUNK_TOKENS]


def test_priority_sample_weight_proportional(spark):
    """A-ES sampling must overrepresent heavy docs: the sample's mean weight
    exceeds the corpus mean, the result is exactly N rows, and it plans as
    TakeOrderedAndProject (no full sort, no exchange)."""
    from tests.conftest import SF_ORACLE

    from big_data_toolkit_spark.catalog import load_table

    df = curation.priority_sample(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert len(rows) == curation.PRIORITY_SAMPLE_N
    sample_mean = sum(r["weight"] for r in rows) / len(rows)
    corpus = load_table(spark, SF_ORACLE, "documents").agg(
        {"n_chars": "avg"}
    ).collect()[0][0]
    assert sample_mean > corpus


def test_corpus_shuffle_is_a_permutation(spark):
    """Every doc appears once; per-shard positions are contiguous 1..n;
    the assignment is deterministic (two plans, identical rows)."""
    from big_data_toolkit_spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    a = curation.corpus_shuffle(spark, SF_SMOKE).collect()
    b = curation.corpus_shuffle(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert len(a) == n_docs and len({r["doc_id"] for r in a}) == n_docs
    by_shard = {}
    for r in a:
        assert 0 <= r["shard"] < curation.N_SHUFFLE_SHARDS
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))


def test_corpus_shuffle_single_exchange(spark):
    """Shard assignment is map-only; one per-shard window exchange total."""
    from tests.conftest import SF_SMOKE

    plan = (
        curation.corpus_shuffle(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert plan.count("Scan parquet") == 1


def test_training_manifest_composes_its_stages(spark):
    """The end-to-end manifest must agree with its three gated stages:
    survivors == dedup_keep_best's kept set, splits == leakage_safe_split
    restricted to survivors, and per-(split, shard) token sums respect
    the budget contract (every shard except each split's last holds
    >= budget tokens at the point its next doc would overflow — i.e.
    shard ids are a contiguous 0..max range per split)."""
    from big_data_toolkit_spark.operators import curation, dedup
    from tests.conftest import SF_ORACLE

    rows = curation.training_manifest(spark, SF_ORACLE).collect()
    kept_best = {
        r["doc_id"]: r
        for r in dedup.dedup_keep_best(spark, SF_ORACLE).collect()
        if r["kept"]
    }
    assert {r["doc_id"] for r in rows} == set(kept_best)
    split_of = {
        r["doc_id"]: r["split"]
        for r in dedup.leakage_safe_split(spark, SF_ORACLE).collect()
    }
    for r in rows:
        assert r["split"] == split_of[r["doc_id"]], r
        assert r["component"] == kept_best[r["doc_id"]]["component"]
        assert r["quality"] == kept_best[r["doc_id"]]["quality"]
    by_split: dict = {}
    for r in rows:
        by_split.setdefault(r["split"], []).append(r)
    assert set(by_split) == {"train", "val", "test"}
    import hashlib

    def h32(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)

    for split, members in by_split.items():
        shard_ids = sorted({r["shard_id"] for r in members})
        assert shard_ids == list(range(len(shard_ids))), (split, shard_ids)
        # replicate the packing exactly: global order per split is
        # bucket-major (offsets accumulate by bucket ascending), then
        # (h, doc_id) within bucket; shard = EXCLUSIVE prefix // budget
        order = sorted(
            members,
            key=lambda r: (
                h32(r["doc_id"]) % curation.N_BUCKETS,
                h32(r["doc_id"]),
                r["doc_id"],
            ),
        )
        running = 0
        for r in order:
            assert r["shard_id"] == running // curation.SHARD_TOKENS, r
            running += r["ws_tokens"]


def test_manifest_ingest_delta_semantics(spark):
    """Delta-append contract: covers exactly the delta slice; kept ==
    no-corpus-near-dup (the dedup_minhash_incremental match set);
    a dropped doc's component points into the corpus-only closure (its
    twin's component) and its split is that component's split; kept
    docs get contiguous per-split delta-local shard ids, dropped get
    NULL."""
    from big_data_toolkit_spark.operators import curation, dedup
    from big_data_toolkit_spark.operators.dedup import NEW_BATCH_MOD
    from tests.conftest import SF_ORACLE

    rows = curation.manifest_ingest_delta(spark, SF_ORACLE).collect()
    from big_data_toolkit_spark.catalog import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    delta_ids = {
        r["doc_id"]
        for r in docs.where(
            f"doc_id % {NEW_BATCH_MOD} = {NEW_BATCH_MOD - 1}"
        ).collect()
    }
    assert {r["doc_id"] for r in rows} == delta_ids
    matched = {
        r["doc_id"]
        for r in dedup.dedup_minhash_incremental(spark, SF_ORACLE).collect()
    }
    assert matched, "fixture must plant cross near-dups"
    by_split_hash = {}
    from big_data_toolkit_spark.operators.dedup import (
        SPLIT_TRAIN_PCT,
        SPLIT_VAL_PCT,
    )
    import hashlib

    def h32(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)

    for r in rows:
        assert r["kept"] == (r["doc_id"] not in matched), r
        hh = h32(r["component"]) % 100
        want = (
            "train"
            if hh < SPLIT_TRAIN_PCT
            else ("val" if hh < SPLIT_VAL_PCT else "test")
        )
        assert r["split"] == want, r
        if r["kept"]:
            assert r["component"] == r["doc_id"]
            assert r["shard_id"] is not None and r["shard_id"] >= 0
        else:
            assert r["component"] != r["doc_id"]
            assert r["shard_id"] is None
    for split in {r["split"] for r in rows if r["kept"]}:
        ids = sorted(
            {r["shard_id"] for r in rows if r["kept"] and r["split"] == split}
        )
        assert ids == list(range(len(ids))), (split, ids)


def test_manifest_compact_semantics(spark):
    """Compaction contract: the post state IS training_manifest (same
    rows on the shared columns); prev state replays the base manifest /
    ingest-delta rules; a survivor with prev_kept == False can only be
    a delta doc (quality wins at the rebuild where arrival order won
    intra-day); split_moved is exactly the split/prev_split disagree."""
    from big_data_toolkit_spark.operators.dedup import NEW_BATCH_MOD
    from tests.conftest import SF_ORACLE

    rows = curation.manifest_compact(spark, SF_ORACLE).collect()
    tm = {
        r["doc_id"]: r
        for r in curation.training_manifest(spark, SF_ORACLE).collect()
    }
    assert {r["doc_id"] for r in rows} == set(tm)
    for r in rows:
        t = tm[r["doc_id"]]
        for col in ("component", "split", "quality", "ws_tokens", "shard_id"):
            assert r[col] == t[col], (col, r, t)
        assert r["split_moved"] == (r["split"] != r["prev_split"]), r
        if not r["prev_kept"]:
            # a corpus doc kept post-compaction was the best of its base
            # sub-component (merging only grows components), so only a
            # delta doc can flip dropped -> kept
            assert r["doc_id"] % NEW_BATCH_MOD == NEW_BATCH_MOD - 1, r
    # prev splits replay the ingest-delta rows for delta docs
    delta_prev = {
        r["doc_id"]: r
        for r in curation.manifest_ingest_delta(spark, SF_ORACLE).collect()
    }
    for r in rows:
        if r["doc_id"] in delta_prev:
            assert r["prev_split"] == delta_prev[r["doc_id"]]["split"], r
            assert r["prev_kept"] == delta_prev[r["doc_id"]]["kept"], r


def test_manifest_compact_oracle(spark):
    from tests.conftest import SF_ORACLE

    compare(
        curation.manifest_compact(spark, SF_ORACLE),
        curation.ORACLE_SQL["manifest_compact"],
        SF_ORACLE,
    )


def _assert_seq_pack_tiling(rows, toks):
    """Sample-packing invariants: per doc the fragments partition its
    tokens exactly (lengths sum to ws_tokens, contiguous seq_ids, offsets
    chain across cuts); per sequence the fragments tile [0, SEQ_LEN)
    without gaps or overlaps, and every sequence except the global last
    is exactly full — the no-padding GPT-packing contract."""
    by_doc: dict = {}
    by_seq: dict = {}
    for r in rows:
        assert 0 < r["frag_tokens"] <= curation.SEQ_LEN, r
        assert 0 <= r["offset_in_seq"] < curation.SEQ_LEN, r
        by_doc.setdefault(r["doc_id"], []).append(r)
        by_seq.setdefault(r["seq_id"], []).append(r)
    assert set(by_doc) == set(toks)  # every non-empty doc, nothing else
    for d, frs in by_doc.items():
        frs.sort(key=lambda r: r["seq_id"])
        assert sum(r["frag_tokens"] for r in frs) == toks[d], d
        seq_ids = [r["seq_id"] for r in frs]
        assert seq_ids == list(
            range(seq_ids[0], seq_ids[0] + len(seq_ids))
        ), d  # a doc spans CONSECUTIVE sequences
        for a, b in zip(frs, frs[1:]):
            # a cut doc ends one sequence exactly and opens the next at 0
            assert a["offset_in_seq"] + a["frag_tokens"] == curation.SEQ_LEN
            assert b["offset_in_seq"] == 0
    last_seq = max(by_seq)
    assert sorted(by_seq) == list(range(last_seq + 1))  # dense from 0
    for s, frs in by_seq.items():
        frs.sort(key=lambda r: r["offset_in_seq"])
        cursor = 0
        for r in frs:
            assert r["offset_in_seq"] == cursor, (s, r)  # no gaps/overlaps
            cursor += r["frag_tokens"]
        if s < last_seq:
            assert cursor == curation.SEQ_LEN, s  # full — no padding
    assert sum(toks.values()) == sum(r["frag_tokens"] for r in rows)


def _seq_pack_doc_tokens(spark):
    from tests.conftest import SF_ORACLE

    return {
        r["doc_id"]: r["ws_tokens"]
        for r in curation.shard_pack(spark, SF_ORACLE).collect()
        if r["ws_tokens"] > 0
    }


def test_sequence_pack_tiles_the_token_line(spark):
    from tests.conftest import SF_ORACLE

    rows = curation.sequence_pack(spark, SF_ORACLE).collect()
    _assert_seq_pack_tiling(rows, _seq_pack_doc_tokens(spark))


def test_sequence_pack_epochs_reshuffle_deterministically(spark):
    """Multi-epoch packing: every epoch satisfies the full tiling
    contract, epoch N is a pure function of (corpus, epoch) — the same
    epoch string replays the identical placement — and distinct epochs
    genuinely permute the token line (some doc lands in a different
    sequence)."""
    from tests.conftest import SF_ORACLE

    toks = _seq_pack_doc_tokens(spark)
    key = lambda rows: sorted(  # noqa: E731
        (r["doc_id"], r["seq_id"], r["offset_in_seq"], r["frag_tokens"])
        for r in rows
    )
    packs = {}
    for ep in ("ep1", "ep2"):
        rows = curation.sequence_pack(spark, SF_ORACLE, epoch=ep).collect()
        _assert_seq_pack_tiling(rows, toks)
        packs[ep] = key(rows)
    # determinism: replaying an epoch reproduces it exactly
    replay = curation.sequence_pack(spark, SF_ORACLE, epoch="ep1").collect()
    assert key(replay) == packs["ep1"]
    # distinct epochs (and the epoch-free oracle form) give distinct orders
    base = key(curation.sequence_pack(spark, SF_ORACLE).collect())
    assert packs["ep1"] != packs["ep2"]
    assert base not in (packs["ep1"], packs["ep2"])


def test_sequence_pack_oracle(spark):
    from tests.conftest import SF_ORACLE

    compare(
        curation.sequence_pack(spark, SF_ORACLE),
        curation.ORACLE_SQL["sequence_pack"],
        SF_ORACLE,
    )
