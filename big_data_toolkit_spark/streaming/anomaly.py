"""Online per-user anomaly detection: batch (oracle-checked) + stateful
streaming twin.

``analytics_ext.user_activity_anomalies`` is RETROSPECTIVE — a day is
judged against the user's full history, including days after it. This
module is the PROSPECTIVE (online) form a production monitor actually
runs: day d is judged against days ≤ d only, so the decision is available
the moment the day closes and never changes afterwards. That property is
what makes it streamable: the per-user state is three integers
(n, Σcnt, Σcnt²) plus the open day's count, and the 3σ cut is the same
ALL-INTEGER rule as the batch op (d > 0 ∧ d² > 9·D with
d = cnt·n − Σ, D = n·Σsq − Σ²) — bit-identical between the cumulative
window (batch), the Python state fold (stream), and the DuckDB oracle,
because no float accumulator exists anywhere.

The batch form is one cumulative window over per-(user, day) counts; the
streaming form is ``applyInPandasWithState`` keyed by user, folding day
buckets in event-time order and emitting a day's verdict when it closes
(the open day is never emitted — its count may still grow). A replay test
pins stream == batch on the shared prefix.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from big_data_toolkit_spark.catalog import load_table
from big_data_toolkit_spark.operators.analytics_ext import (
    ANOMALY_SIGMAS,
    MIN_ANOMALY_DAYS,
)

OUTPUT_SCHEMA = "user_id long, day date, n_events long, z double"
STATE_SCHEMA = "n long, s long, sq long, cur_day long, cur_cnt long"
_SECONDS_PER_DAY = 86_400


def online_user_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, day, n_events, z): days whose count exceeds the user's mean
    over days ≤ d by more than 3 population-σ — the online decision rule.

    One (user, day) count aggregate + ONE cumulative window per user (all
    three running moments share the frame); the integer cut makes the
    filter exact at any scale and the z division is the only float.
    """
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select("user_id", F.to_date("ts").alias("day"))
        .groupBy("user_id", "day")
        .agg(F.count("*").alias("n_events"))
    )
    w = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = daily.select(
        "user_id",
        "day",
        "n_events",
        F.count("*").over(w).alias("n"),
        F.sum("n_events").over(w).alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).over(w).alias("sq"),
    )
    d = F.col("n_events") * F.col("n") - F.col("s")
    big_d = F.col("n") * F.col("sq") - F.col("s") * F.col("s")
    return cum.where(
        (F.col("n") >= MIN_ANOMALY_DAYS)
        & (big_d > 0)
        & (d > 0)
        & (d * d > F.lit(ANOMALY_SIGMAS * ANOMALY_SIGMAS) * big_d)
    ).select(
        "user_id",
        "day",
        "n_events",
        F.round(d.cast("double") / F.sqrt(big_d.cast("double")), 6).alias("z"),
    )


def _close_day(n: int, s: int, sq: int, day: int, cnt: int) -> tuple:
    """Fold a finished day into the moments; return the new moments plus the
    emitted row (or None). Pure integers until the final z division — the
    exact arithmetic the batch window evaluates."""
    n, s, sq = n + 1, s + cnt, sq + cnt * cnt
    d = cnt * n - s
    big_d = n * sq - s * s
    row = None
    if (
        n >= MIN_ANOMALY_DAYS
        and big_d > 0
        and d > 0
        and d * d > ANOMALY_SIGMAS * ANOMALY_SIGMAS * big_d
    ):
        row = {
            "day": pd.Timestamp(day * _SECONDS_PER_DAY, unit="s").date(),
            "n_events": cnt,
            "z": float(d) / math.sqrt(float(big_d)),
        }
    return n, s, sq, row


def _fold_day_batches(
    n: int, s: int, sq: int, cur_day: int, cur_cnt: int, pdfs
) -> tuple:
    """Shared per-user fold: bucket a micro-batch's events into UTC days and
    advance the (moments, open-day) machine. Replay order must be
    event-time-ordered across batches (the deterministic harness and any
    watermarked production source guarantee it); a regression is raised,
    not absorbed."""
    buckets: dict[int, int] = {}
    for pdf in pdfs:
        days = pdf["ts"].astype("int64") // 1_000_000_000 // _SECONDS_PER_DAY
        for day, c in days.value_counts().items():
            buckets[int(day)] = buckets.get(int(day), 0) + int(c)

    out: list[dict[str, Any]] = []
    for day in sorted(buckets):
        if day == cur_day:
            cur_cnt += buckets[day]
        elif cur_day == -1:
            cur_day, cur_cnt = day, buckets[day]
        elif day > cur_day:
            n, s, sq, row = _close_day(n, s, sq, cur_day, cur_cnt)
            if row is not None:
                out.append(row)
            cur_day, cur_cnt = day, buckets[day]
        else:
            raise ValueError(
                f"out-of-order day {day} after {cur_day}: the online fold "
                "needs event-time-ordered batches (watermark the source)"
            )
    return n, s, sq, cur_day, cur_cnt, out


def _update_anomaly_state(
    key: tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (n, s, sq, cur_day, cur_cnt) = (
        state.get if state.exists else (0, 0, 0, -1, 0)
    )
    n, s, sq, cur_day, cur_cnt, out = _fold_day_batches(
        n, s, sq, cur_day, cur_cnt, pdfs
    )
    state.update((n, s, sq, cur_day, cur_cnt))
    for row in out:
        row["user_id"] = key[0]
    yield pd.DataFrame(out, columns=["user_id", "day", "n_events", "z"])


def stream_user_anomalies(events_stream: DataFrame) -> DataFrame:
    """Keyed stateful online anomaly detection over a raw event stream.

    Input needs ``user_id`` and ``ts``; emits one row per (user, closed
    anomalous day). Per-key state is FIVE integers regardless of history
    length — the 100 TB property; the retrospective batch op needs the
    full (user, day) matrix, this needs O(users)."""
    return (
        events_stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_anomaly_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_user_anomalies_tws(events_stream: DataFrame) -> DataFrame:
    """``stream_user_anomalies`` on ``transformWithStateInPandas`` — the
    Spark 4 stateful-processor twin, mirroring the trending pair
    (``streaming/trending.py``): same 5-integer state in a typed
    ``ValueState``, same ``_fold_day_batches`` fold, so the two APIs
    cannot drift.

    DEPENDENCY BOUNDARY (same as ``stream_trending_tws``): executing this
    stream needs ``protobuf``; plan construction is exercised
    unconditionally and the replay test env-skips without it.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class AnomalyProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("moments", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd  # executor-side

            (n, s, sq, cur_day, cur_cnt) = (
                self._state.get() if self._state.exists() else (0, 0, 0, -1, 0)
            )
            n, s, sq, cur_day, cur_cnt, out = _fold_day_batches(
                n, s, sq, cur_day, cur_cnt, rows
            )
            self._state.update((n, s, sq, cur_day, cur_cnt))
            for row in out:
                row["user_id"] = key[0]
            yield pd.DataFrame(out, columns=["user_id", "day", "n_events", "z"])

        def close(self) -> None:
            pass

    return (
        events_stream.select("user_id", "ts")
        .groupBy("user_id")
        .transformWithStateInPandas(
            AnomalyProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )


ORACLE_SQL: dict[str, str] = {
    "online_user_anomalies": f"""
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_events
          FROM events GROUP BY 1, 2
        ),
        cum AS (
          SELECT user_id, day, n_events,
                 count(*) OVER w AS n,
                 sum(n_events) OVER w AS s,
                 sum(n_events * n_events) OVER w AS sq
          FROM daily
          WINDOW w AS (PARTITION BY user_id ORDER BY day
                       ROWS UNBOUNDED PRECEDING)
        )
        SELECT user_id, day, n_events,
               round(CAST(n_events * n - s AS DOUBLE) /
                     sqrt(CAST(n * sq - s * s AS DOUBLE)), 6) AS z
        FROM cum
        WHERE n >= {MIN_ANOMALY_DAYS}
          AND n * sq - s * s > 0
          AND n_events * n - s > 0
          AND (n_events * n - s) * (n_events * n - s)
              > {ANOMALY_SIGMAS * ANOMALY_SIGMAS} * (n * sq - s * s)
    """,
}

QUERIES = {
    "online_user_anomalies": online_user_anomalies,
}
