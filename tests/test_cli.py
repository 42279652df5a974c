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


def test_run_output_writes_parquet(spark, capsys, tmp_path):
    out_dir = str(tmp_path / "wc")
    assert (
        cli.main(
            [
                "run", "word_count",
                "--sf-dir", SF_SMOKE,
                "--output", out_dir,
            ]
        )
        == 0
    )
    assert "wrote" in capsys.readouterr().out
    n_first = spark.read.parquet(out_dir).count()
    assert n_first > 0
    assert set(spark.read.parquet(out_dir).columns) == {"word", "cnt"}
    # S14 semantics: a second run overwrites, not appends (fresh read —
    # a pre-overwrite DataFrame would hold the stale file listing)
    assert cli.main(
        ["run", "word_count", "--sf-dir", SF_SMOKE, "--output", out_dir]
    ) == 0
    assert spark.read.parquet(out_dir).count() == n_first


def test_run_output_csv_has_header(spark, capsys, tmp_path):
    out_dir = str(tmp_path / "wc_csv")
    assert (
        cli.main(
            [
                "run", "word_count",
                "--sf-dir", SF_SMOKE,
                "--output", out_dir,
                "--format", "csv",
            ]
        )
        == 0
    )
    got = spark.read.option("header", "true").csv(out_dir)
    assert set(got.columns) == {"word", "cnt"}
