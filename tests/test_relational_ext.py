from __future__ import annotations

import pytest

from big_data_toolkit_spark.operators import relational_ext as rx
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(rx.ORACLE_SQL))
def test_oracle_match(spark, name):
    df = rx.QUERIES[name](spark, SF_ORACLE)
    compare(df, rx.ORACLE_SQL[name], SF_ORACLE)


def test_every_query_has_oracle_or_is_sketch(spark):
    assert set(rx.QUERIES) - set(rx.ORACLE_SQL) == {
        "order_fulfillment_percentiles_approx"
    }


def test_approx_percentiles_track_exact(spark):
    """The sketch profile must sit within 1 day of the exact twin on every
    (priority, quantile): within max(1 day, 0.2%) — the sketch returns a
    real data point while the exact form interpolates, so wide-spread
    tails differ by a fraction of the local gap."""
    exact = {
        r["o_orderpriority"]: r
        for r in rx.order_fulfillment_percentiles(spark, SF_ORACLE).collect()
    }
    approx = {
        r["o_orderpriority"]: r
        for r in rx.order_fulfillment_percentiles_approx(
            spark, SF_ORACLE
        ).collect()
    }
    assert set(exact) == set(approx)
    for prio, a in approx.items():
        e = exact[prio]
        assert a["n"] == e["n"]
        for p in rx.FULFILLMENT_PCTS:
            col = f"p{int(p * 100)}_days"
            tol = max(1.0, 0.002 * abs(e[col]))
            assert abs(a[col] - e[col]) <= tol, (prio, col, a[col], e[col])


def test_asof_single_shuffle_no_join(spark):
    """The as-of join must compile to union + one window, not a join at all."""
    plan = (
        rx.asof_purchase_attribution(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan  # sort-merge-asof via window, no join operator
    assert plan.count("Exchange hashpartitioning") == 1  # one shuffle: user_id


def test_error_bursts_is_equi_join(spark):
    """Banding must turn the range join into an equi hash/sort-merge join —
    no BroadcastNestedLoopJoin / CartesianProduct anywhere in the plan."""
    plan = (
        rx.error_bursts(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_rollup_single_pass(spark):
    """All rollup levels aggregate in one Expand+Aggregate, not one job each."""
    plan = (
        rx.orders_rollup(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Expand") == 1


def test_curated_corpus_thresholds(spark):
    rows = rx.curated_corpus(spark, SF_ORACLE).collect()
    assert rows  # thresholds keep a non-trivial corpus
    assert all(r["quality"] >= rx.MIN_QUALITY for r in rows)
    assert all(r["n_tokens"] >= rx.MIN_TOKENS for r in rows)


def test_sessions_cover_all_events(spark):
    ev_cnt = (
        spark.read.parquet(f"{SF_ORACLE}/events.parquet").count()
    )
    sess = rx.user_sessions(spark, SF_ORACLE)
    total = sess.groupBy().sum("n_events").collect()[0][0]
    assert total == ev_cnt  # sessionization is a partition of the events


def test_fulfillment_percentiles_monotone(spark):
    """p50 <= p90 <= p99 within every priority, and delays are sane ints."""
    rows = rx.order_fulfillment_percentiles(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["p50_days"] <= r["p90_days"] <= r["p99_days"]
        assert r["n"] > 0


def test_session_paths_windows_share_one_exchange(spark):
    """The session-id window (user_id) and the lead window (user_id, sid)
    must share a single user_id exchange — (user_id, sid) is a prefix
    refinement; only the trigram groupBy adds a second exchange."""
    plan = (
        rx.session_paths(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_priority_revenue_share_sums_to_one(spark):
    """Shares partition the total: they sum to ~1 and the window ran over
    the 5-row aggregate (assert small result)."""
    rows = rx.priority_revenue_share(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 10
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-5
    assert all(r["share"] > 0 for r in rows)
