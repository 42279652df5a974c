"""The CLI front-end (SURVEY §3 entry point 1): list / run / sql / explain.

Each command funnels through ``cli.main(argv)``; ``get_spark()`` reuses the
test session, so these are cheap end-to-end passes over the real registry.
"""

from __future__ import annotations

from big_data_toolkit_spark import cli
from tests.conftest import SF_SMOKE


def test_list_prints_full_registry(spark, capsys):
    assert cli.main(["list"]) == 0
    names = capsys.readouterr().out.split()
    assert "q1_count_shipped" in names and "q15_top_supplier" in names
    import __spark_entry__ as entry

    assert set(names) == set(entry.queries())


def test_run_executes_registered_query(spark, capsys):
    assert cli.main(["run", "q1_count_shipped", "--sf-dir", SF_SMOKE]) == 0
    assert "cnt" in capsys.readouterr().out


def test_run_unknown_query_exits_2(spark, capsys):
    assert cli.main(["run", "no_such_query", "--sf-dir", SF_SMOKE]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_sql_runs_over_registered_views(spark, capsys):
    assert (
        cli.main(["sql", "SELECT count(*) AS n FROM nation", "--sf-dir", SF_SMOKE])
        == 0
    )
    assert "25" in capsys.readouterr().out


def test_explain_prints_physical_plan(spark, capsys):
    assert cli.main(["explain", "q14_promo_revenue", "--sf-dir", SF_SMOKE]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out
    assert "BroadcastHashJoin" in out  # the part dim broadcast, visible here


def test_explain_unknown_query_exits_2(spark, capsys):
    assert cli.main(["explain", "no_such_query"]) == 2
    assert "unknown query" in capsys.readouterr().err
