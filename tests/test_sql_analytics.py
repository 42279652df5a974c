from __future__ import annotations

import pytest

from big_data_toolkit_spark.operators import sql_analytics as sa
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(sa.QUERIES))
def test_oracle_match(spark, name):
    df = sa.QUERIES[name](spark, SF_ORACLE)
    compare(df, sa.ORACLE_SQL[name], SF_ORACLE)


def test_q1_smoke_rows(spark):
    rows = sa.q1_count_shipped(spark, SF_SMOKE).collect()
    assert len(rows) == 1
    assert rows[0]["cnt"] >= 0


def test_q3_broadcasts_dimensions(spark):
    plan = sa.q3_part_supplier_shipped(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_q1_filter_pushdown(spark):
    plan = sa.q1_count_shipped(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_shipdate" in plan


def test_q5_broadcasts_dims_single_agg_exchange(spark):
    """Q5's cycle-closing join keeps the fact un-reshuffled: every
    dimension (orders is fact-sized — allowed to shuffle) broadcast or
    AQE-decided, nation explicitly broadcast, and aggregation is the
    only hash exchange beyond the fact-orders join."""
    from tests.conftest import SF_SMOKE

    df = sa.q5_local_supplier_volume(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    rows = df.collect()
    assert rows
    assert all(r["revenue_cc"] > 0 for r in rows)
    revs = [r["revenue_cc"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_q6_quantity_filter_pushed_to_scan(spark):
    """Q6's quantity predicate must reach the parquet scan (the whole
    point of the query shape); one row out, positive revenue."""
    df = sa.q6_forecast_revenue(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_quantity" in plan
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["revenue_cc"] > 0


def test_q7_two_role_nation_broadcasts(spark):
    """Q7 joins nation twice under different roles — both broadcast; the
    inequality never degrades to a cartesian/nested-loop plan."""
    df = sa.q7_volume_shipping(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    rows = df.collect()
    assert rows
    assert all(r["supp_nation"] != r["cust_nation"] for r in rows)


def test_q8_shares_sum_to_one_per_cell(spark):
    """Within every (region, year): ppm shares sum to ~1e6 (each of the
    ≤|nations| cells truncates < 1 ppm) and the whole dim tree stays
    broadcast (region-nation-supplier chain; no extra exchanges)."""
    df = sa.q8_market_share(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert dict(df.dtypes)["share_ppm"] == "bigint"
    rows = df.collect()
    assert rows
    cells = {}
    for r in rows:
        cells.setdefault((r["r_name"], r["l_year"]), []).append(r["share_ppm"])
    for shares in cells.values():
        assert 1_000_000 - len(shares) <= sum(shares) <= 1_000_000


def test_q1_pricing_summary_pushes_date_and_reconciles(spark):
    """Date predicate reaches the scan; group sums reconcile with the
    global filtered totals."""
    df = sa.q1_pricing_summary(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_shipdate" in plan
    rows = df.collect()
    assert rows
    from big_data_toolkit_spark.catalog import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, SF_SMOKE, "lineitem").where(
        F.col("l_shipdate") <= F.lit(sa.Q1_CUTOFF).cast("timestamp")
    )
    assert sum(r["count_order"] for r in rows) == li.count()
    want_qty = li.select(
        F.sum((F.col("l_quantity").cast("decimal(18,2)") * 100).cast("long"))
    ).first()[0]
    assert sum(r["sum_qty_c"] for r in rows) == want_qty


def test_q10_pushes_returnflag_and_broadcasts(spark):
    """The returnflag filter reaches the scan (pre-join selectivity) and
    the dims broadcast; exactly Q10_TOP_K rows, descending revenue."""
    df = sa.q10_returned_items(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_returnflag" in plan
    assert "BroadcastHashJoin" in plan
    rows = df.collect()
    assert len(rows) == sa.Q10_TOP_K
    revs = [r["revenue_cc"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_q19_disjunction_prunes_both_scans(spark):
    """Constraint propagation from the OR must derive per-table filters:
    both scans carry pushed filters, the join broadcasts, one row out."""
    df = sa.q19_discounted_revenue(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "l_quantity" in plan and "p_brand" in plan
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["revenue_cc"] > 0


def test_q3_real_pushes_both_dates_and_takeordered(spark):
    """The canonical Q3: BOTH date-disjoint predicates reach their parquet
    scans, the segment-filtered customer broadcasts, and the top-k is
    TakeOrderedAndProject (never a global sort)."""
    df = sa.q3_shipping_priority(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "o_orderdate" in plan and "l_shipdate" in plan
    assert "PushedFilters" in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert 0 < len(rows) <= sa.Q3_TOP_K
    revs = [r["revenue_cc"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_q14_single_agg_pass_and_share_bounds(spark):
    """Q14's two conditional sums fold into ONE aggregate over one scan
    (exactly one HashAggregate pair), part broadcasts, the month predicate
    pushes down, and the ppm share is consistent with its own numerator."""
    df = sa.q14_promo_revenue(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_shipdate" in plan
    assert "BroadcastHashJoin" in plan
    [row] = df.collect()
    assert 0 <= row["promo_revenue_cc"] <= row["total_revenue_cc"]
    expect = row["promo_revenue_cc"] * 1_000_000 // row["total_revenue_cc"]
    assert row["promo_share_ppm"] == expect


def test_q18_aggregate_filtered_semijoin(spark):
    """Q18: the qualifier set is a groupBy+HAVING over the fact joined back
    on the same key; customer broadcasts; top-k is TakeOrderedAndProject;
    every emitted order really exceeds the threshold."""
    df = sa.q18_large_volume_customers(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert 0 < len(rows) <= sa.Q18_TOP_K
    assert all(r["sum_qty_c"] > sa.Q18_MIN_QTY_C for r in rows)
    prices = [r["o_totalprice_c"] for r in rows]
    assert prices == sorted(prices, reverse=True)


def test_q4_exists_semijoin_no_blowup(spark):
    """Q4: the correlated EXISTS compiles to a LEFT SEMI join shuffling on
    the equi key only (no cartesian/nested-loop from the date inequality);
    the quarter predicate prunes the orders scan; counts bounded by the
    quarter's order count."""
    from big_data_toolkit_spark.catalog import load_table
    from pyspark.sql import functions as F

    df = sa.q4_order_priority_checking(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    assert "PushedFilters" in plan and "o_orderdate" in plan
    rows = df.collect()
    assert rows
    quarter_orders = (
        load_table(spark, SF_SMOKE, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit(sa.Q4_QTR_START).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(sa.Q4_QTR_END).cast("timestamp"))
        )
        .count()
    )
    assert sum(r["order_count"] for r in rows) <= quarter_orders
