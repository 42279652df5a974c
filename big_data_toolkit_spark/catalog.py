"""Table catalog: register the TESTDATA parquet tables as named views.

The reference has no catalog — every program re-parses raw text positionally
(``a6/Q1.scala:48-52`` splits on ``|`` and indexes ``tokens(10)``) or reads
parquet only to immediately drop to ``Row`` RDDs (``a6/Q1.scala:58-62``,
defeating column pruning). Here tables are registered once as temp views with
their self-describing parquet schemas, so every operator can be written either
as DataFrame code or ``spark.sql`` — which is also what lets the DuckDB oracle
run the identical statement.

Scale note: ``spark.read.parquet`` on a directory of files partitions by
row-group/128 MB splits automatically; at 100 TB the same call distributes the
scan across the cluster, and filters/projections written against these views
reach the parquet reader (PushedFilters / ReadSchema in ``.explain``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one TESTDATA table as a DataFrame.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects outright; it is read via the legacy
    nanos-as-long escape hatch and truncated to a proper microsecond
    timestamp (identical to how DuckDB's micro-precision timestamps read the
    same column, so oracle comparisons stay exact).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # integer `div`: double division would lose precision above 2^53 ns
        return spark.read.parquet(table_path(sf_dir, name)).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(table_path(sf_dir, name))


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register each table as a temp view; returns name -> DataFrame."""
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
