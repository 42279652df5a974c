"""Online anomaly detection: batch oracle + stream==batch replay parity."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from big_data_toolkit_spark.catalog import load_table
from big_data_toolkit_spark.streaming import anomaly
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle_utils import compare
from tests.test_streaming import (
    _write_stream_files,
    _write_stream_files_at_cuts,
)


def test_online_anomaly_oracle(spark):
    compare(
        anomaly.online_user_anomalies(spark, SF_ORACLE),
        anomaly.ORACLE_SQL["online_user_anomalies"],
        SF_ORACLE,
    )


def test_online_is_prefix_consistent_with_retrospective_inputs(spark):
    """The online rule only ever uses days <= d: recompute each flagged row
    from the raw prefix and confirm the integer cut."""
    daily = {
        (r["user_id"], r["day"]): r["count"]
        for r in load_table(spark, SF_ORACLE, "events")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .count()
        .collect()
    }
    flagged = anomaly.online_user_anomalies(spark, SF_ORACLE).collect()
    assert flagged
    for r in flagged:
        prefix = sorted(
            cnt
            for (u, day), cnt in daily.items()
            if u == r["user_id"] and day <= r["day"]
        )
        n = len(prefix)
        s = sum(prefix)
        sq = sum(c * c for c in prefix)
        d = r["n_events"] * n - s
        big_d = n * sq - s * s
        assert n >= anomaly.MIN_ANOMALY_DAYS
        assert d > 0 and d * d > 9 * big_d


def test_stream_anomalies_match_batch_on_closed_days(spark, tmp_path):
    """Replaying sf0.01 in 4 time-ordered micro-batches must produce exactly
    the batch result minus each user's final (never-closed) day."""
    src = str(tmp_path / "src")
    dirs = _write_stream_files(spark, SF_ORACLE, src, n_files=4)
    assert len(dirs) >= 2
    stream = (
        spark.readStream.schema(load_table(spark, SF_ORACLE, "events").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "batch_*"))
    )
    q = (
        anomaly.stream_user_anomalies(stream)
        .writeStream.format("memory")
        .queryName("online_anoms")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["day"], r["n_events"], round(r["z"], 6))
        for r in spark.sql("select * from online_anoms").collect()
    }
    last_day = {
        r["user_id"]: r["last_day"]
        for r in load_table(spark, SF_ORACLE, "events")
        .groupBy("user_id")
        .agg(F.max(F.to_date("ts")).alias("last_day"))
        .collect()
    }
    expected = {
        (r["user_id"], r["day"], r["n_events"], r["z"])
        for r in anomaly.online_user_anomalies(spark, SF_ORACLE).collect()
        if r["day"] < last_day[r["user_id"]]
    }
    assert got == expected
    assert expected  # the corpus actually produces closed-day anomalies


import pytest  # noqa: E402  (kept with its parametrized users below)


@pytest.mark.parametrize(
    "fracs",
    [
        (0.9,),  # one giant batch + a small tail
        (0.07, 0.11, 0.5, 0.53, 0.9, 0.97),  # 7 uneven batches
    ],
    ids=["tail-heavy", "seven-uneven"],
)
def test_anomaly_invariant_to_batch_boundaries(spark, tmp_path, fracs):
    """The closed-day verdicts must be identical for ANY time-ordered
    micro-batch layout — a cut landing mid-day exercises the open-day
    (cur_day/cur_cnt) state handoff, a cut between days exercises the
    close-and-fold path, and both must reach the batch cumulative window's
    answer on every closed day."""
    src = str(tmp_path / "src")
    _write_stream_files_at_cuts(spark, SF_ORACLE, src, fracs)
    stream = (
        spark.readStream.schema(load_table(spark, SF_ORACLE, "events").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "batch_*"))
    )
    qname = f"anom_inv_{len(fracs)}"
    q = (
        anomaly.stream_user_anomalies(stream)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["day"], r["n_events"], round(r["z"], 6))
        for r in spark.sql(f"select * from {qname}").collect()
    }
    last_day = {
        r["user_id"]: r["last_day"]
        for r in load_table(spark, SF_ORACLE, "events")
        .groupBy("user_id")
        .agg(F.max(F.to_date("ts")).alias("last_day"))
        .collect()
    }
    expected = {
        (r["user_id"], r["day"], r["n_events"], r["z"])
        for r in anomaly.online_user_anomalies(spark, SF_ORACLE).collect()
        if r["day"] < last_day[r["user_id"]]
    }
    assert got == expected and expected


def test_fold_raises_on_out_of_order_days():
    import pandas as pd
    import pytest

    good = pd.DataFrame({"ts": pd.to_datetime(["2021-01-02", "2021-01-03"])})
    n, s, sq, cur_day, cur_cnt, out = anomaly._fold_day_batches(
        0, 0, 0, -1, 0, [good]
    )
    assert cur_cnt == 1 and n == 1
    stale = pd.DataFrame({"ts": pd.to_datetime(["2021-01-01"])})
    with pytest.raises(ValueError, match="out-of-order"):
        anomaly._fold_day_batches(n, s, sq, cur_day, cur_cnt, [stale])


def test_anomaly_tws_plan_constructs(spark):
    """Plan construction for the TWS twin works everywhere — only
    execution needs protobuf (gated below)."""
    stream = (
        spark.readStream.schema(load_table(spark, SF_SMOKE, "events").schema)
        .parquet("/root/testdata/sf0.001/events.parquet")
    )
    df = anomaly.stream_user_anomalies_tws(stream)
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == [
        "user_id", "day", "n_events", "z"
    ]


from tests import conftest  # noqa: E402


@conftest.requires_protobuf
def test_anomaly_tws_matches_apply_in_pandas(spark, tmp_path):
    """Where protobuf exists, the TWS twin must equal the
    applyInPandasWithState stream over the same replay (shared fold)."""
    import os

    src = str(tmp_path / "src")
    _write_stream_files(spark, SF_ORACLE, src, n_files=4)
    schema = load_table(spark, SF_ORACLE, "events").schema

    def run(fn, name, ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(src, "batch_*"))
        )
        # RocksDB for BOTH runs (TWS requires it; applyInPandasWithState
        # merely tolerates it) so the twins differ only in operator, not
        # state-store provider.
        with conftest.rocksdb_state_store(spark):
            q = (
                fn(stream)
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .option("checkpointLocation", str(tmp_path / ckpt))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
        return {
            (r["user_id"], r["day"], r["n_events"], round(r["z"], 6))
            for r in spark.sql(f"select * from {name}").collect()
        }

    a = run(anomaly.stream_user_anomalies, "anoms_apply", "ck_a")
    b = run(anomaly.stream_user_anomalies_tws, "anoms_tws", "ck_b")
    assert a == b and a
