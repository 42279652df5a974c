"""Streaming funnel: replay parity vs the oracle-checked batch funnel."""

from __future__ import annotations

import os

import pytest

from big_data_toolkit_spark.catalog import load_table
from big_data_toolkit_spark.operators import analytics_ext as ax
from big_data_toolkit_spark.streaming import funnel
from tests.conftest import SF_ORACLE
from tests.test_streaming import (
    _write_stream_files,
    _write_stream_files_at_cuts,
)


def test_stream_funnel_stage_counts_match_batch(spark, tmp_path):
    """Replaying sf0.01 in time-ordered micro-batches must reach exactly the
    batch funnel's per-stage user counts (the greedy fold computes the same
    filtered mins), with each user's stages strictly ordered in time."""
    src = str(tmp_path / "src")
    dirs = _write_stream_files(spark, SF_ORACLE, src, n_files=4)
    assert len(dirs) >= 2
    stream = (
        spark.readStream.schema(load_table(spark, SF_ORACLE, "events").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "batch_*"))
    )
    q = (
        funnel.stream_event_funnel(stream)
        .writeStream.format("memory")
        .queryName("funnel_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from funnel_stream").collect()
    per_user: dict[int, dict[int, object]] = {}
    for r in rows:
        per_user.setdefault(r["user_id"], {})[r["stage_idx"]] = r["ts"]
    # each user's stages are dense from 1 and strictly time-ordered
    for stages in per_user.values():
        idxs = sorted(stages)
        assert idxs == list(range(1, len(idxs) + 1))
        ts = [stages[i] for i in idxs]
        assert all(a < b for a, b in zip(ts, ts[1:]))
    got = {
        i: sum(1 for st in per_user.values() if i in st) for i in (1, 2, 3)
    }
    expected = {
        r["stage_idx"]: r["users"]
        for r in ax.event_funnel(spark, SF_ORACLE).collect()
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
def test_funnel_invariant_to_batch_boundaries(spark, tmp_path, fracs):
    """The per-user keyed-state fold must reach the same per-stage counts
    for ANY time-ordered micro-batch layout — a user's view/click/purchase
    triple landing in one batch vs split across three exercises different
    fold paths (in-batch greedy scan vs cross-batch state handoff), and
    both must agree with the oracle-checked batch funnel."""
    src = str(tmp_path / "src")
    _write_stream_files_at_cuts(spark, SF_ORACLE, src, fracs)
    stream = (
        spark.readStream.schema(load_table(spark, SF_ORACLE, "events").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "batch_*"))
    )
    qname = f"funnel_inv_{len(fracs)}"
    q = (
        funnel.stream_event_funnel(stream)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    per_user: dict[int, set[int]] = {}
    for r in spark.sql(f"select * from {qname}").collect():
        per_user.setdefault(r["user_id"], set()).add(r["stage_idx"])
    got = {
        i: sum(1 for st in per_user.values() if i in st) for i in (1, 2, 3)
    }
    expected = {
        r["stage_idx"]: r["users"]
        for r in ax.event_funnel(spark, SF_ORACLE).collect()
    }
    assert got == expected


def test_funnel_fold_rejects_out_of_order_batches():
    import pandas as pd
    import pytest

    b1 = pd.DataFrame(
        {"ts": pd.to_datetime(["2021-01-02"]), "event_type": ["view"]}
    )
    t1, t2, t3, tmax, out = funnel._fold_funnel(-1, -1, -1, -1, [b1])
    assert out == [(1, t1)]
    stale = pd.DataFrame(
        {"ts": pd.to_datetime(["2021-01-01"]), "event_type": ["click"]}
    )
    with pytest.raises(ValueError, match="out-of-order"):
        funnel._fold_funnel(t1, t2, t3, tmax, [stale])
