"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL side-by-side at a given sf_dir and
compares row count, column names, and order-insensitive values — the same
gate CORRECTNESS_r{N}.json records, so a pass here predicts a pass there.
"""

from __future__ import annotations

import math

import duckdb

from big_data_toolkit_spark.catalog import TABLES, table_path


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    try:
        for name in TABLES:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM '{table_path(sf_dir, name)}'"
            )
        rel = con.sql(sql)
        return list(rel.columns), rel.fetchall()
    finally:
        con.close()


def _norm_cell(v, strict: bool = False):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # strict replicates the external driver, which hashes floats at
        # FULL precision: a last-ulp divergence (round() implementations,
        # aggregation order) passes the 9-sig-digit check but fails the
        # driver hash (the user_value_moving_avg r6 red, VERDICT r6).
        return repr(v) if strict else f"{v:.9g}"
    if isinstance(v, list):
        return tuple(_norm_cell(x, strict) for x in v)
    return v


def _norm_rows(cols, rows, strict: bool = False):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append(tuple(_norm_cell(row[i], strict) for i in order))
    out.sort(key=repr)
    return out


def compare(spark_df, oracle_sql: str, sf_dir: str, strict: bool = False) -> None:
    """Assert the Spark result and the DuckDB oracle result match.

    ``strict=True`` compares floats at full precision (``repr``), the
    closest local replica of the driver's value-hash; the default 9
    significant digits tolerates last-ulp engine drift.
    """
    spark_cols = [c.lower() for c in spark_df.columns]
    spark_rows = [tuple(r) for r in spark_df.collect()]

    duck_cols, duck_rows = run_oracle(oracle_sql, sf_dir)
    duck_cols = [c.lower() for c in duck_cols]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={spark_cols} duckdb={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )
    s = _norm_rows(spark_cols, spark_rows, strict)
    d = _norm_rows(duck_cols, duck_rows, strict)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"value mismatch (first 5): {mismatches[:5]}"
