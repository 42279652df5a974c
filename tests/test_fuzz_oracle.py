"""Engine-vs-oracle fuzzing on GENERATED tables.

The driver gate compares engine and oracle on the fixed testdata; these
tests re-run the same compare over randomized miniature schema dirs, so
the subtle translations (correlated subqueries, tie-breaks under equal
sort keys, RANGE frames over duplicate timestamps, sessionization gap
edges) are exercised on shapes the fixed generator may never emit.

Two generators:
* the TPC-H miniature from ``test_sql_analytics._write_fuzz_sf`` —
  reused for the tie-prone relational shapes (Q15's max-over-view ties,
  Q13's zero bucket, Q22's NOT-EXISTS, ratio windows);
* an events miniature here, tuned for the window/sessionization family:
  timestamps are drawn from a SMALL pool of distinct seconds so exact
  ties — including same-user-same-second — are common, which is exactly
  where RANGE frames, session gap boundaries, and documented tie-break
  orderings diverge if either side gets them wrong.  The twice-red
  ``user_value_moving_avg`` (r6/r7 HUGEINT episode) is a permanent
  member.
"""

from __future__ import annotations

import os
import shutil

import pytest

import __spark_entry__ as entry
from tests.oracle_utils import compare
from tests.test_sql_analytics import _write_fuzz_sf

TPCH_FUZZ = [
    "q15_top_supplier",           # max-over-view: ties on the max
    "q17_small_quantity_revenue",  # correlated scalar avg
    "q13_customer_distribution",   # LEFT OUTER zero bucket
    "dormant_rich_customers",      # Q22: global avg + NOT EXISTS
    "q18_large_volume_customers",  # HAVING over grouped sum
    "q11_important_parts",         # global-scalar fraction threshold
    "q8_market_share",             # ratio-to-report window, ppm ints
]

EVENTS_FUZZ = [
    "user_value_moving_avg",   # RANGE frame over duplicate seconds
    "event_count_sliding",     # width != slide window set
    "user_sessions",           # 30-min gap sessionization
    "session_paths",           # in-session trigrams, (ts, event_id) ties
    "event_funnel",            # ordered stage progression
    "retention_cohorts",       # cohort date bucketing
    "error_bursts",            # gaps-and-islands burst detection
    "daily_activity_full",     # dense calendar incl. empty days
    "dau_wau_stickiness",      # rolling distinct-user windows
    "asof_purchase_attribution",  # as-of backward join, tie at equal ts
]


def _write_events_fuzz(tmpdir: str, seed: int) -> str:
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(1000 + seed)
    out = os.path.join(tmpdir, f"evfuzz{seed}")
    os.makedirs(out, exist_ok=True)
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings",
    ):
        shutil.copy(
            f"/root/testdata/sf0.001/{t}.parquet", f"{out}/{t}.parquet"
        )

    n_ev, n_users = 400, 12
    # a SMALL pool of distinct seconds over ~3 days -> many exact ties,
    # including same-user-same-second rows
    pool = rng.integers(0, 3 * 86400, 120)
    secs = rng.choice(pool, n_ev)
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(secs, unit="s")
    pd.DataFrame({
        "event_id": np.arange(n_ev, dtype="int64"),
        "ts": ts.astype("datetime64[us]"),
        "user_id": rng.integers(1, n_users + 1, n_ev).astype("int64"),
        "event_type": rng.choice(
            ["signup", "click", "view", "purchase", "error"], n_ev
        ),
        "value": np.round(rng.uniform(0, 300, n_ev), 2),
        "props": [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n_ev)],
    }).to_parquet(f"{out}/events.parquet")
    return out


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("name", TPCH_FUZZ)
def test_tpch_shapes_fuzz_vs_oracle(spark, tmp_path, name, seed):
    sf = _write_fuzz_sf(str(tmp_path), seed)
    compare(entry.queries()[name](spark, sf), entry.oracle_sql()[name], sf)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("name", EVENTS_FUZZ)
def test_events_family_fuzz_vs_oracle(spark, tmp_path, name, seed):
    sf = _write_events_fuzz(str(tmp_path), seed)
    compare(entry.queries()[name](spark, sf), entry.oracle_sql()[name], sf)
