"""The preflight replica normalizes DuckDB cells to Python values, which made
it structurally blind to integer-width serialization differences: DuckDB
widens ``sum(BIGINT)`` (aggregate AND window forms) to HUGEINT and keeps
DECIMAL arithmetic as DECIMAL, the external driver hashes TYPED values, so
rows/schema passed locally while the driver hashed red (r2 decimal episode,
r6+r7 ``user_value_moving_avg``, r5 ``shard_pack``).  These tests pin the
guard that closes the class: any oracle emitting HUGEINT/UHUGEINT/DECIMAL
now fails the local sweep too.
"""

from __future__ import annotations

import pytest

from tests.oracle_utils import assert_driver_safe_types, run_oracle

SF = "/root/testdata/sf0.001"


def test_windowed_bigint_sum_widens_to_hugeint_and_is_caught():
    cols, _rows, types = run_oracle(
        """
        SELECT user_id,
               sum(CAST(value * 100 AS BIGINT)) OVER (PARTITION BY user_id) AS s
        FROM events LIMIT 5
        """,
        SF,
    )
    assert "HUGEINT" in types[cols.index("s")]
    with pytest.raises(AssertionError, match="driver-unsafe"):
        assert_driver_safe_types(cols, types)


def test_aggregate_bigint_sum_widens_and_is_caught():
    cols, _rows, types = run_oracle(
        "SELECT sum(CAST(o_custkey AS BIGINT)) AS s FROM orders",
        SF,
    )
    assert any("HUGEINT" in t for t in types)
    with pytest.raises(AssertionError, match="CAST"):
        assert_driver_safe_types(cols, types)


def test_decimal_arithmetic_is_caught():
    cols, _rows, types = run_oracle(
        "SELECT CAST(value AS DECIMAL(18,2)) * 2 AS d FROM events LIMIT 3",
        SF,
    )
    assert any("DECIMAL" in t for t in types)
    with pytest.raises(AssertionError, match="DECIMAL|driver-unsafe"):
        assert_driver_safe_types(cols, types)


def test_cast_back_to_bigint_passes():
    cols, _rows, types = run_oracle(
        """
        SELECT user_id,
               CAST(sum(CAST(value * 100 AS BIGINT))
                    OVER (PARTITION BY user_id) AS BIGINT) AS s
        FROM events LIMIT 5
        """,
        SF,
    )
    assert_driver_safe_types(cols, types)


def test_user_value_moving_avg_oracle_emits_only_bigints():
    # The exact oracle that hashed red in r6 AND r7: every column must now
    # come back BIGINT (commit fixing VERDICT r7 item 1).
    from big_data_toolkit_spark.operators import relational_ext

    cols, _rows, types = run_oracle(
        relational_ext.ORACLE_SQL["user_value_moving_avg"], SF
    )
    assert types == ["BIGINT"] * 5, types
    assert_driver_safe_types(cols, types)
