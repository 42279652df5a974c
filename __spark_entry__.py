"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (Q4: filtered fact join chain +
per-nation aggregation) at sf0.001. ``queries()`` / ``oracle_sql()`` expose
every implemented operator from SURVEY.md §2 for the DuckDB correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from big_data_toolkit_spark.multimodal import binary_ops as multimodal
from big_data_toolkit_spark.operators import (
    analytics_ext,
    curation,
    dedup,
    inverted_index,
    pagerank,
    quality,
    relational_ext,
    similarity,
    spam,
    sql_analytics,
    text_analytics,
)
from big_data_toolkit_spark.streaming import windows as streaming_windows

_MODULES = [
    sql_analytics,
    text_analytics,
    inverted_index,
    spam,
    pagerank,
    streaming_windows,
    dedup,
    similarity,
    quality,
    relational_ext,
    analytics_ext,
    multimodal,
    curation,
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return sql_analytics.q4_orders_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLE_SQL)
    return out
