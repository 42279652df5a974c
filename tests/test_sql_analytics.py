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
