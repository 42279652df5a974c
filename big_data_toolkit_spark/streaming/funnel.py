"""Streaming conversion funnel: per-user ordered stage matching as keyed
state (stream twin of the oracle-checked ``analytics_ext.event_funnel``).

The batch funnel computes, per user, t1 = min(view ts), t2 = min(click ts
> t1), t3 = min(purchase ts > t2). Folding events in event-time order
makes those mins GREEDY: the first view IS min(view), the first click
after t1 IS min(click > t1), and so on — so the whole per-user state is
three timestamps regardless of event volume, and each stage entry can be
emitted the moment it happens (a batch recomputation only ever confirms
it). Same ordering contract as ``streaming.anomaly``: batches must be
event-time-ordered (watermarked source in production; the deterministic
replay harness by construction) — an out-of-order regression would make
the greedy mins wrong, so monotonicity is asserted per batch fold.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from big_data_toolkit_spark.operators.analytics_ext import FUNNEL_STAGES

OUTPUT_SCHEMA = "user_id long, stage_idx long, stage string, ts timestamp"
STATE_SCHEMA = "t1 long, t2 long, t3 long, tmax long"  # epoch micros; -1 = unset
_US = 1_000


def _fold_funnel(t1: int, t2: int, t3: int, tmax: int, pdfs) -> tuple:
    """Advance the 3-stage machine over one micro-batch; returns new state +
    emitted (stage_idx, ts_us) transitions. Events fold in (ts, type) order
    within the batch; ties at the same timestamp resolve by stage order
    (view before click before purchase), matching the batch form's strict
    ``>`` inter-stage comparisons. A batch reaching back before an already
    -processed timestamp raises — the greedy mins need event-time order
    across batches (watermark the source)."""
    events: list[tuple[int, str]] = []
    for pdf in pdfs:
        ts_us = pdf["ts"].astype("int64") // _US
        events.extend(zip(ts_us.tolist(), pdf["event_type"].tolist()))
    events.sort(key=lambda e: (e[0], FUNNEL_STAGES.index(e[1]) if e[1] in FUNNEL_STAGES else 3))
    if events:
        if tmax != -1 and events[0][0] < tmax:
            raise ValueError(
                f"out-of-order batch: event at {events[0][0]}us precedes "
                f"already-processed {tmax}us; the funnel fold needs "
                "event-time-ordered batches (watermark the source)"
            )
        tmax = max(tmax, events[-1][0])

    out: list[tuple[int, int]] = []
    for ts, typ in events:
        if typ == FUNNEL_STAGES[0] and t1 == -1:
            t1 = ts
            out.append((1, ts))
        elif typ == FUNNEL_STAGES[1] and t1 != -1 and ts > t1 and t2 == -1:
            t2 = ts
            out.append((2, ts))
        elif typ == FUNNEL_STAGES[2] and t2 != -1 and ts > t2 and t3 == -1:
            t3 = ts
            out.append((3, ts))
    return t1, t2, t3, tmax, out


def _update_funnel_state(
    key: tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (t1, t2, t3, tmax) = state.get if state.exists else (-1, -1, -1, -1)
    t1, t2, t3, tmax, out = _fold_funnel(t1, t2, t3, tmax, pdfs)
    state.update((t1, t2, t3, tmax))
    rows: list[dict[str, Any]] = [
        {
            "user_id": key[0],
            "stage_idx": idx,
            "stage": FUNNEL_STAGES[idx - 1],
            "ts": pd.Timestamp(ts * _US, unit="ns"),
        }
        for idx, ts in out
    ]
    yield pd.DataFrame(rows, columns=["user_id", "stage_idx", "stage", "ts"])


def stream_event_funnel(events_stream: DataFrame) -> DataFrame:
    """Keyed stateful funnel over a raw event stream: one row per (user,
    stage entry), emitted the moment the stage is reached. Per-key state is
    THREE timestamps at any event volume — the same bounded-state property
    as the batch form's filtered-min formulation."""
    return (
        events_stream.select("user_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_funnel_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
