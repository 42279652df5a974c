from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from big_data_toolkit_spark.catalog import load_table
from big_data_toolkit_spark.streaming import trending, windows
from tests import conftest
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(windows.QUERIES))
def test_batch_oracle_match(spark, name):
    df = windows.QUERIES[name](spark, SF_ORACLE)
    compare(df, windows.ORACLE_SQL[name], SF_ORACLE)


def _write_stream_files(spark, sf_dir, out_dir, n_files=4):
    """Split the events table into n time-ordered parquet files (one file =
    one micro-batch: the reference's per-minute part-file replay,
    a7/EventCount.scala:108-118)."""
    events = load_table(spark, sf_dir, "events").orderBy("ts")
    rows = events.collect()
    chunk = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(part, events.schema).coalesce(1).write.parquet(
                os.path.join(out_dir, f"batch_{i:04d}")
            )
    return sorted(glob.glob(os.path.join(out_dir, "batch_*")))


def test_stream_event_count_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    dirs = _write_stream_files(spark, SF_SMOKE, src)
    stream = (
        spark.readStream.schema(load_table(spark, SF_SMOKE, "events").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "batch_*"))
    )
    q = (
        windows.stream_event_count_hourly(stream)
        .writeStream.format("memory")
        .queryName("hourly_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["cnt"])
        for r in spark.sql("select * from hourly_counts").collect()
    }
    expected = {
        (r["window_start"], r["cnt"])
        for r in windows.event_count_hourly(spark, SF_SMOKE).collect()
    }
    assert got == expected
    assert len(dirs) >= 2  # really was a multi-batch replay


def test_stateful_trending_prev_propagates_across_batches(spark, tmp_path):
    """Two micro-batches, same key: the second batch must see the first
    window's count as prev (mapWithState semantics, ST4)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    b1 = [(f"e{i}", t0 + dt.timedelta(seconds=i), "click") for i in range(5)]
    t1 = dt.datetime(2024, 1, 1, 0, 10, 0)
    b2 = [(f"f{i}", t1 + dt.timedelta(seconds=i), "click") for i in range(12)]
    src = str(tmp_path / "src")
    for i, batch in enumerate([b1, b2]):
        spark.createDataFrame(batch, "event_id string, ts timestamp, event_type string") \
            .coalesce(1).write.parquet(os.path.join(src, f"batch_{i:04d}"))

    stream = (
        spark.readStream.schema("event_id string, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "batch_*"))
    )
    q = (
        trending.stream_trending(stream)
        .writeStream.format("memory")
        .queryName("trend_updates")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        spark.sql("select * from trend_updates").collect(),
        key=lambda r: r["window_start"],
    )
    assert [r["cnt"] for r in rows] == [5, 12]
    assert [r["prev_cnt"] for r in rows] == [0, 5]
    # window 2: 12 >= 10 and 12 >= 2*5 → trending (a7/TrendingArrivals:119-131)
    assert [r["trending"] for r in rows] == [False, True]


def test_trend_alert_boundaries(spark, tmp_path):
    """cnt exactly at the floor and exactly 2x prev counts as trending."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    b1 = [(f"e{i}", t0 + dt.timedelta(seconds=i), "view") for i in range(5)]
    t1 = dt.datetime(2024, 1, 1, 0, 10, 0)
    b2 = [(f"f{i}", t1 + dt.timedelta(seconds=i), "view") for i in range(10)]
    src = str(tmp_path / "src")
    for i, batch in enumerate([b1, b2]):
        spark.createDataFrame(batch, "event_id string, ts timestamp, event_type string") \
            .coalesce(1).write.parquet(os.path.join(src, f"batch_{i:04d}"))
    stream = (
        spark.readStream.schema("event_id string, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "batch_*"))
    )
    q = (
        trending.stream_trending(stream)
        .writeStream.format("memory")
        .queryName("trend_bounds")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        spark.sql("select * from trend_bounds").collect(),
        key=lambda r: r["window_start"],
    )
    # 10 >= 10 and 10 >= 2*5 → exactly-at-boundary trending is True
    assert [r["trending"] for r in rows] == [False, True]


def test_stream_trending_matches_batch_full_sf001(spark, tmp_path):
    """ST4 full-table equivalence at sf0.01: replay ALL 10k events as
    time-ordered micro-batches; the final update per (key, window) from the
    stateful stream must equal the oracle-green batch twin row-for-row
    (cnt, prev_cnt, trending)."""
    src = str(tmp_path / "src")
    dirs = _write_stream_files(spark, SF_ORACLE, src, n_files=6)
    assert len(dirs) == 6
    stream = (
        spark.readStream.schema(load_table(spark, SF_ORACLE, "events").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "batch_*"))
    )
    q = (
        trending.stream_trending(stream)
        .writeStream.format("memory")
        .queryName("trend_full")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_full"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # Updates within one (key, window) only grow cnt and share one prev_cnt
    # (prev changes only when a NEWER window opens, which emits under that
    # window's key) — so the final state per window is the max-cnt update.
    final: dict = {}
    for r in spark.sql("select * from trend_full").collect():
        k = (r["event_type"], r["window_start"])
        if k not in final or r["cnt"] > final[k]["cnt"]:
            final[k] = r
    got = {
        (k[0], k[1], v["cnt"], v["prev_cnt"], v["trending"])
        for k, v in final.items()
    }
    expected = {
        (r["event_type"], r["window_start"], r["cnt"], r["prev_cnt"], r["trending"])
        for r in windows.trending_events(spark, SF_ORACLE).collect()
    }
    assert got == expected


def test_tws_probe_tracks_environment():
    """The conftest protobuf probe must agree with actual importability —
    the gate self-heals (runs the replay) the moment the environment gains
    protobuf, and can never silently diverge from reality."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        importable = True
    except ImportError:
        importable = False
    assert conftest.HAS_PROTOBUF == importable
    assert "protobuf" in conftest.TWS_SKIP_REASON


def test_tws_plan_constructs(spark):
    """Plan construction for the TWS twin must work everywhere — only
    EXECUTION needs the protobuf state-server protocol (gated below)."""
    stream = (
        spark.readStream.schema(load_table(spark, SF_SMOKE, "events").schema)
        .parquet("/root/testdata/sf0.001/events.parquet")
    )
    df = trending.stream_trending_tws(stream)
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == [
        "event_type", "window_start", "cnt", "prev_cnt", "trending"
    ]


@conftest.requires_protobuf
def test_tws_trending_matches_batch_full_sf001(spark, tmp_path):
    """The transformWithStateInPandas twin must reproduce the oracle-green
    batch formulation over the same multi-batch replay — pinning that the
    Spark 4 stateful-processor port didn't drift from the
    applyInPandasWithState semantics (both fold through _fold_batch)."""
    src = str(tmp_path / "src")
    dirs = _write_stream_files(spark, SF_ORACLE, src, n_files=6)
    assert len(dirs) == 6
    stream = (
        spark.readStream.schema(load_table(spark, SF_ORACLE, "events").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "batch_*"))
    )
    with conftest.rocksdb_state_store(spark):
        q = (
            trending.stream_trending_tws(stream)
            .writeStream.format("memory")
            .queryName("trend_tws")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    final: dict = {}
    for r in spark.sql("select * from trend_tws").collect():
        k = (r["event_type"], r["window_start"])
        if k not in final or r["cnt"] > final[k]["cnt"]:
            final[k] = r
    got = {
        (k[0], k[1], v["cnt"], v["prev_cnt"], v["trending"])
        for k, v in final.items()
    }
    expected = {
        (r["event_type"], r["window_start"], r["cnt"], r["prev_cnt"], r["trending"])
        for r in windows.trending_events(spark, SF_ORACLE).collect()
    }
    assert got == expected


def test_stream_sliding_window_matches_batch(spark, tmp_path):
    """Sliding (width != slide) streaming twin == the oracle-green batch
    query, replayed file-per-micro-batch — closes the last batch-gated-only
    streaming shape (VERDICT r7 item 5)."""
    from big_data_toolkit_spark.operators import relational_ext

    src = str(tmp_path / "src")
    dirs = _write_stream_files(spark, SF_SMOKE, src)
    stream = (
        spark.readStream.schema(load_table(spark, SF_SMOKE, "events").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "batch_*"))
    )
    q = (
        windows.stream_event_count_sliding(stream)
        .writeStream.format("memory")
        .queryName("sliding_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["n_events"])
        for r in spark.sql("select * from sliding_counts").collect()
    }
    expected = {
        (r["window_start"], r["n_events"])
        for r in relational_ext.event_count_sliding(spark, SF_SMOKE).collect()
    }
    assert got == expected
    # really a sliding window: more windows than the hourly tumbling form,
    # and every event covered by 4 of them (sum of counts = 4x event count)
    n_events = load_table(spark, SF_SMOKE, "events").count()
    assert sum(n for _, n in got) == 4 * n_events
    assert len(dirs) >= 2  # really was a multi-batch replay


def _write_stream_files_at_cuts(spark, sf_dir, out_dir, fracs):
    """Split the time-ordered events at explicit fractional cut points —
    the boundary-variation twin of ``_write_stream_files``."""
    events = load_table(spark, sf_dir, "events").orderBy("ts")
    rows = events.collect()
    bounds = [0] + [int(f * len(rows)) for f in fracs] + [len(rows)]
    for i in range(len(bounds) - 1):
        part = rows[bounds[i] : bounds[i + 1]]
        if part:
            spark.createDataFrame(part, events.schema).coalesce(1).write.parquet(
                os.path.join(out_dir, f"batch_{i:04d}")
            )
    return sorted(glob.glob(os.path.join(out_dir, "batch_*")))


@pytest.mark.parametrize(
    "fracs",
    [
        (),  # everything in ONE micro-batch
        (0.9,),  # one giant batch + a small tail
        (0.07, 0.11, 0.5, 0.53, 0.9, 0.97),  # 7 uneven batches
    ],
    ids=["one-batch", "tail-heavy", "seven-uneven"],
)
def test_sliding_stream_invariant_to_batch_boundaries(spark, tmp_path, fracs):
    """The sliding-window twin must produce the SAME result no matter how
    the replay is cut into micro-batches — batch-boundary invariance is
    the core streaming correctness property (state bugs surface exactly
    when a window straddles a trigger boundary). The fixed 4-way split is
    covered by test_stream_sliding_window_matches_batch; this varies the
    cuts."""
    from big_data_toolkit_spark.operators import relational_ext

    src = str(tmp_path / "src")
    _write_stream_files_at_cuts(spark, SF_SMOKE, src, fracs)
    stream = (
        spark.readStream.schema(load_table(spark, SF_SMOKE, "events").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "batch_*"))
    )
    qname = f"sliding_inv_{len(fracs)}"
    q = (
        windows.stream_event_count_sliding(stream)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["n_events"])
        for r in spark.sql(f"select * from {qname}").collect()
    }
    expected = {
        (r["window_start"], r["n_events"])
        for r in relational_ext.event_count_sliding(spark, SF_SMOKE).collect()
    }
    assert got == expected


@pytest.mark.parametrize(
    "fracs",
    [
        (0.9,),  # one giant batch + a small tail
        (0.07, 0.11, 0.5, 0.53, 0.9, 0.97),  # 7 uneven batches
    ],
    ids=["tail-heavy", "seven-uneven"],
)
def test_stateful_trending_invariant_to_batch_boundaries(
    spark, tmp_path, fracs
):
    """The applyInPandasWithState trending operator must converge to the
    same final per-window state for ANY micro-batch layout — the stateful
    analogue of the sliding-window invariance test (prev-window handoff is
    the piece that breaks when a window boundary lands mid-batch vs
    between batches)."""
    src = str(tmp_path / "src")
    _write_stream_files_at_cuts(spark, SF_SMOKE, src, fracs)
    stream = (
        spark.readStream.schema(load_table(spark, SF_SMOKE, "events").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "batch_*"))
    )
    qname = f"trend_inv_{len(fracs)}"
    q = (
        trending.stream_trending(stream)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    final: dict = {}
    for r in spark.sql(f"select * from {qname}").collect():
        k = (r["event_type"], r["window_start"])
        if k not in final or r["cnt"] > final[k]["cnt"]:
            final[k] = r
    got = {
        (k[0], k[1], v["cnt"], v["prev_cnt"], v["trending"])
        for k, v in final.items()
    }
    expected = {
        (r["event_type"], r["window_start"], r["cnt"], r["prev_cnt"], r["trending"])
        for r in windows.trending_events(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_watermark_drops_late_events(spark, tmp_path):
    """An event arriving AFTER the watermark has passed its window must be
    excluded from the finalized count — the late-data semantic the
    reference's manual-clock windows cannot express at all (SURVEY §2.9).

    Spark's watermark guarantee is ONE-SIDED: data less delayed than the
    watermark is never dropped, data more delayed is dropped only once the
    window's state has been evicted — a straggler arriving while its
    window still sits in the state store is merged (verified empirically:
    wm propagation lags one batch, eviction happens at batch commit). So
    the drop is staged to be observable: batch 1 puts three on-time
    events in window W0; batch 2's event 4 h later advances the watermark
    past W0's end; batch 3 (any later data) is where that watermark takes
    effect and W0 is finalized, emitted, and EVICTED; batch 4 replays a
    W0-timestamped straggler against the evicted window. It must neither
    update the emitted row nor surface as a spurious second W0 row (which
    is what would happen if the engine re-created state instead of
    filtering the late row). The same W0 rows through the batch query
    count 4 — proving this test detects late-inclusion."""
    import datetime as dt

    t0 = dt.datetime(2021, 6, 1, 12, 0, 0)
    on_time = [
        (t0,),
        (t0 + dt.timedelta(minutes=20),),
        (t0 + dt.timedelta(minutes=40),),
    ]
    driver = [(t0 + dt.timedelta(hours=4),)]  # watermark driver
    evictor = [(t0 + dt.timedelta(hours=4, minutes=10),)]  # wm takes effect
    late = [(t0 + dt.timedelta(minutes=10),)]  # W0 straggler
    src = str(tmp_path / "src")
    for i, batch in enumerate((on_time, driver, evictor, late)):
        spark.createDataFrame(batch, "ts timestamp").coalesce(1).write.parquet(
            os.path.join(src, f"batch_{i:04d}")
        )
    stream = (
        spark.readStream.schema("ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "batch_*"))
    )
    q = (
        windows.stream_event_count_hourly(stream)
        .writeStream.format("memory")
        .queryName("late_drop")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["cnt"])
        for r in spark.sql("select * from late_drop").collect()
    }
    # only windows the watermark finalized are emitted; W0 counts 3, the
    # straggler is dropped (4 would mean late inclusion, a second W0 row
    # would mean state was recreated after eviction)
    assert got == {(t0, 3)}
    # contrast: batch semantics over the same rows count the straggler
    all_rows = spark.createDataFrame(
        on_time + driver + evictor + late, "ts timestamp"
    )
    batch_w0 = (
        all_rows.groupBy(F.window("ts", "60 minutes").alias("w"))
        .count()
        .where(F.col("w.start") == t0)
        .collect()[0]["count"]
    )
    assert batch_w0 == 4
