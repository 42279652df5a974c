"""Stateful streaming trend detection (reference a7 TrendingArrivals, ST4/ST5).

The reference keeps ``region → previous 10-min count`` in ``mapWithState``
(``a7/TrendingArrivals.scala:47-59,102-110``) and prints an alert when a
region's count doubles past a floor (``:119-131``). The engine implements the
same keyed state machine with ``applyInPandasWithState`` (Arrow-batched,
executor-distributed state backed by the checkpointed state store — the
scale-out replacement for DStream state RDDs):

* group = event_type (the "region");
* state = (current_window_epoch, current_count, previous_count);
* each micro-batch's events are bucketed to 10-minute windows in event time
  and folded into the state in window order; closing a window promotes its
  count to ``previous``.

Emitted rows mirror the reference's ``(region, (count, batch_time, prev))``
tuples: one row per (key, window) update with the prev count at that point,
plus the trend flag so a ``foreachBatch`` sink can filter alerts (ST5).

The deterministic replay harness the reference builds by hand (ManualClock +
batch counter, ``a7/EventCount.scala:51,80-106``) is a file source with
``maxFilesPerTrigger=1`` + ``trigger(availableNow)`` in tests: one file = one
micro-batch, no wall clock anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from big_data_toolkit_spark.streaming.windows import TREND_FACTOR, TREND_MIN_COUNT

WINDOW_SECONDS = 600  # 10 minutes, a7/TrendingArrivals.scala:102-107

OUTPUT_SCHEMA = (
    "event_type string, window_start timestamp, cnt long, prev_cnt long, "
    "trending boolean"
)
STATE_SCHEMA = "window long, cnt long, prev long"


def _update_trend_state(
    key: tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold one micro-batch of events for one key into the window state."""
    (window, cnt, prev) = state.get if state.exists else (-1, 0, 0)
    window, cnt, prev, out = _fold_batch(window, cnt, prev, pdfs)
    state.update((window, cnt, prev))
    for row in out:
        row["event_type"] = key[0]
    yield pd.DataFrame(
        out,
        columns=["event_type", "window_start", "cnt", "prev_cnt", "trending"],
    )


def stream_trending(events_stream: DataFrame) -> DataFrame:
    """Keyed stateful trend detection over a stream of raw events.

    Input schema must include ``event_type`` and ``ts``; output one row per
    (key, window) update with the previous-window count and trend flag.
    """
    return (
        events_stream.select("event_type", "ts")
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_trend_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def trend_alerts(updates: DataFrame) -> DataFrame:
    """ST5 alert filter — apply inside foreachBatch or on the update stream."""
    return updates.where("trending")


# ---------------------------------------------------------------------------
# transformWithStateInPandas twin (Spark 4 successor API)
# ---------------------------------------------------------------------------

def _fold_batch(window: int, cnt: int, prev: int, pdfs) -> tuple:
    """Shared state-fold: bucket one micro-batch's events into 10-min
    windows and advance the (window, cnt, prev) machine. Returns the new
    state and the update rows — used by BOTH stateful APIs so the two
    implementations cannot drift."""
    import pandas as pd  # local: executor-side import

    buckets: dict[int, int] = {}
    for pdf in pdfs:
        epochs = (
            pdf["ts"].astype("int64") // 1_000_000_000 // WINDOW_SECONDS
        ) * WINDOW_SECONDS
        for w, c in epochs.value_counts().items():
            buckets[int(w)] = buckets.get(int(w), 0) + int(c)

    out: list[dict[str, Any]] = []
    for w in sorted(buckets):
        if w == window:
            cnt += buckets[w]
        else:
            if window != -1 and w > window:
                prev = cnt  # close the current window
            window, cnt = w, buckets[w]
        out.append(
            {
                "window_start": pd.Timestamp(window, unit="s"),
                "cnt": cnt,
                "prev_cnt": prev,
                "trending": cnt >= TREND_MIN_COUNT
                and cnt >= TREND_FACTOR * prev,
            }
        )
    return window, cnt, prev, out


def stream_trending_tws(events_stream: DataFrame) -> DataFrame:
    """`stream_trending` on ``transformWithStateInPandas`` — the Spark 4
    stateful-processor API that supersedes ``applyInPandasWithState``.

    Same state machine, same output schema; the state lives in a typed
    ``ValueState`` (checkpointed, per-key, executor-distributed — at scale
    backed by the RocksDB state store rather than Arrow-shipped tuples).
    Both APIs fold through ``_fold_batch``, and a replay test pins
    TWS == applyInPandasWithState == the oracle-green batch twin.

    DEPENDENCY BOUNDARY: executing this stream requires the ``protobuf``
    package (the TWS Python worker speaks a protobuf state-server protocol
    to the JVM; ``pyspark/sql/streaming/proto/StateMessage_pb2``). This
    container does not ship it, so the replay test skips when
    ``google.protobuf`` is missing — the plan construction below is still
    exercised unconditionally. Where protobuf is installed, no code change
    is needed.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TrendProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("trend", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd  # executor-side

            (window, cnt, prev) = (
                self._state.get() if self._state.exists() else (-1, 0, 0)
            )
            window, cnt, prev, out = _fold_batch(window, cnt, prev, rows)
            self._state.update((window, cnt, prev))
            for row in out:
                row["event_type"] = key[0]
            yield pd.DataFrame(
                out,
                columns=[
                    "event_type", "window_start", "cnt", "prev_cnt", "trending"
                ],
            )

        def close(self) -> None:
            pass

    return (
        events_stream.select("event_type", "ts")
        .groupBy("event_type")
        .transformWithStateInPandas(
            TrendProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )


# ---------------------------------------------------------------------------
# Space-Saving streaming heavy hitters (bounded-memory top-k state)
# ---------------------------------------------------------------------------

SS_CAPACITY = 64  # counters kept per key (the Metwally et al. 2005 m)

HH_OUTPUT_SCHEMA = (
    "event_type string, user_id long, est_cnt long, err long, version long"
)
HH_STATE_SCHEMA = (
    "users array<long>, counts array<long>, errs array<long>, version long"
)


def _space_saving_merge(
    summary: dict[int, tuple[int, int]], batch: dict[int, int], capacity: int
) -> None:
    """Fold one micro-batch's exact per-user counts into the Space-Saving
    summary IN PLACE. Batched variant of the per-item rule: an eviction
    charges the victim's count as the newcomer's error, preserving the
    invariant est_cnt >= true_cnt >= est_cnt - err. Deterministic: batch
    entries merge in (count DESC, user ASC) order; the eviction victim is
    the (count ASC, user ASC) minimum."""
    for user, c in sorted(batch.items(), key=lambda kv: (-kv[1], kv[0])):
        if user in summary:
            cnt, err = summary[user]
            summary[user] = (cnt + c, err)
        elif len(summary) < capacity:
            summary[user] = (c, 0)
        else:
            victim = min(summary.items(), key=lambda kv: (kv[1][0], kv[0]))
            vcnt = victim[1][0]
            del summary[victim[0]]
            summary[user] = (vcnt + c, vcnt)


def _hh_fold(stored: tuple | None, key, pdfs) -> tuple[tuple, "pd.DataFrame"]:
    """Shared heavy-hitter state fold — used by BOTH stateful APIs so the
    two implementations cannot drift. Returns (new_state_tuple, out_df)."""
    users, counts, errs, version = stored if stored else ([], [], [], 0)
    summary = {
        int(u): (int(c), int(e)) for u, c, e in zip(users, counts, errs)
    }
    batch: dict[int, int] = {}
    n = 0
    for pdf in pdfs:
        n += len(pdf)
        for u, c in pdf["user_id"].value_counts().items():
            batch[int(u)] = batch.get(int(u), 0) + int(c)
    _space_saving_merge(summary, batch, SS_CAPACITY)
    version += n
    items = sorted(summary.items())
    new_state = (
        [u for u, _ in items],
        [c for _, (c, _) in items],
        [e for _, (_, e) in items],
        version,
    )
    out = pd.DataFrame(
        {
            "event_type": key[0],
            "user_id": [u for u, _ in items],
            "est_cnt": [c for _, (c, _) in items],
            "err": [e for _, (_, e) in items],
            "version": version,
        },
        columns=["event_type", "user_id", "est_cnt", "err", "version"],
    )
    return new_state, out


def _update_hh_state(key, pdfs, state) -> "Iterator[pd.DataFrame]":
    new_state, out = _hh_fold(state.get if state.exists else None, key, pdfs)
    state.update(new_state)
    yield out


def stream_heavy_hitters(events_stream: DataFrame) -> DataFrame:
    """Bounded-memory streaming heavy hitters per event_type — the
    Space-Saving algorithm as keyed streaming state (the missing piece
    between exact streaming counts, whose state grows with the key
    domain, and the batch CMS sketch, which cannot stream).

    State per key is AT MOST ``SS_CAPACITY`` counters regardless of how
    many distinct users flow past — the survival property at 100 TB/day
    ingest where per-user exact state would OOM the state store. Each
    batch emits the full summary stamped with ``version`` (events
    processed so far for that key): downstream reads MAX(version) rows
    per key. Guarantees (Metwally et al. 2005, preserved by the batched
    merge): est_cnt >= true >= est_cnt - err, and every user with true
    count > N/capacity is present in the summary. With capacity >= the
    key's distinct-user count, no eviction ever fires and the output is
    EXACT and invariant to micro-batch cuts (replay-tested vs the batch
    groupBy twin); under eviction pressure the result is cut-dependent
    like every streaming summary, but the error bound always holds
    (property-tested).
    """
    return (
        events_stream.select("event_type", "user_id")
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_hh_state,
            outputStructType=HH_OUTPUT_SCHEMA,
            stateStructType=HH_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_heavy_hitters_tws(events_stream: DataFrame) -> DataFrame:
    """``stream_heavy_hitters`` on ``transformWithStateInPandas`` — same
    Space-Saving fold (``_hh_fold``, shared so the two APIs cannot
    drift), state in a typed ``ValueState``. Same dependency boundary as
    ``stream_trending_tws``: executing the stream needs protobuf; the
    plan construction is exercised unconditionally."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class HHProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("hh", HH_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            new_state, out = _hh_fold(
                self._state.get() if self._state.exists() else None, key, rows
            )
            self._state.update(new_state)
            yield out

        def close(self) -> None:
            pass

    return (
        events_stream.select("event_type", "user_id")
        .groupBy("event_type")
        .transformWithStateInPandas(
            HHProcessor(),
            outputStructType=HH_OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )


# ---------------------------------------------------------------------------
# Streaming gap-fill + LOCF (the hypertable rollup, stateful-stream form)
# ---------------------------------------------------------------------------

GAPFILL_HOUR = 3600
GAPFILL_OUTPUT_SCHEMA = (
    "event_type string, hour timestamp, n long, locf_avg double"
)
GAPFILL_STATE_SCHEMA = "open_hour long, n long, ticks long"


def _fold_gapfill(
    open_hour: int, n: int, ticks: int, pdfs, grid_start: int
) -> tuple:
    """Shared gap-fill state fold: bucket one micro-batch's events into
    hours, CLOSE the open hour when a later one arrives (emitting its
    final row plus n=0 LOCF rows for every skipped hour), keep the newest
    hour open. An hour's row emits exactly once, with its complete count
    — so replay output is batch-boundary invariant and equals the batch
    twin (``analytics_ext.events_gapfill_locf``) on every closed hour.
    Leading gaps before a key's first event fill from ``grid_start`` (the
    batch twin's global grid origin) with NULL locf. Assumes event-time-
    ordered arrival per key (late rows for a closed hour would need a
    watermarked re-emit policy — out of scope here, as for the reference's
    state machine)."""
    import numpy as np  # executor-side

    buckets: dict[int, list[int]] = {}
    for pdf in pdfs:
        hours = (
            pdf["ts"].astype("int64") // 1_000_000_000 // GAPFILL_HOUR
        ) * GAPFILL_HOUR
        tick = np.floor(
            pdf["value"].to_numpy(dtype="float64") * 1_000_000 + 0.5
        ).astype("int64")
        for h, bn, bt in (
            pd.DataFrame({"h": hours, "t": tick})
            .groupby("h")
            .agg(bn=("t", "size"), bt=("t", "sum"))
            .itertuples()
        ):
            cur = buckets.setdefault(int(h), [0, 0])
            cur[0] += int(bn)
            cur[1] += int(bt)

    out: list[dict] = []
    for h in sorted(buckets):
        bn, bt = buckets[h]
        if h == open_hour:
            n += bn
            ticks += bt
            continue
        if h < open_hour:  # late data for a closed hour: fail loud
            raise ValueError(
                f"out-of-order hour {h} after open {open_hour}"
            )
        if open_hour == -1:
            for g in range(grid_start, h, GAPFILL_HOUR):
                out.append(
                    {"hour": pd.Timestamp(g, unit="s"), "n": 0,
                     "locf_avg": None}
                )
        else:
            # unrounded, like the batch twin: exact-BIGINT operands make
            # the two divisions bit-identical across Python/Spark/DuckDB
            # (no engine-rounding boundary to disagree on); float(ticks)
            # first mirrors the twin's CAST(ticks AS DOUBLE) exactly
            avg = float(ticks) / n / 1e6
            out.append(
                {"hour": pd.Timestamp(open_hour, unit="s"), "n": n,
                 "locf_avg": avg}
            )
            for g in range(open_hour + GAPFILL_HOUR, h, GAPFILL_HOUR):
                out.append(
                    {"hour": pd.Timestamp(g, unit="s"), "n": 0,
                     "locf_avg": avg}
                )
        open_hour, n, ticks = h, bn, bt
    return open_hour, n, ticks, out


def stream_gapfill_locf(
    events_stream: DataFrame, grid_start_epoch: int
) -> DataFrame:
    """Streaming gap-filled hourly rollup + LOCF — the stateful-stream
    form of ``analytics_ext.events_gapfill_locf`` (replay-tested equal on
    all closed hours). State per event_type is ONE open (hour, n, ticks)
    triple; emission is close-driven, so output is batch-boundary
    invariant and every emitted hour carries its complete count. Pass the
    batch twin's grid origin (global min event hour, epoch seconds) so
    leading gaps match the dense grid."""

    def update(key, pdfs, state):
        (open_hour, n, ticks) = (
            state.get if state.exists else (-1, 0, 0)
        )
        open_hour, n, ticks, out = _fold_gapfill(
            open_hour, n, ticks, pdfs, grid_start_epoch
        )
        state.update((open_hour, n, ticks))
        for row in out:
            row["event_type"] = key[0]
        yield pd.DataFrame(
            out, columns=["event_type", "hour", "n", "locf_avg"]
        )

    return (
        events_stream.select("event_type", "ts", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=GAPFILL_OUTPUT_SCHEMA,
            stateStructType=GAPFILL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
