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
