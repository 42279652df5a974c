"""big_data_toolkit_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of
devp12345/big-data-toolkit (UWaterloo CS451 Hadoop-MapReduce / Spark-RDD
assignment collection) on idiomatic Spark DataFrame / SQL / Structured
Streaming, plus the LLM-training-data pipeline operators (dedup, similarity
search, text quality, multimodal plumbing) such an engine needs at 100 TB.

See SURVEY.md at the repo root for the full capability map.
"""

from big_data_toolkit_spark.catalog import load_table, register_tables
from big_data_toolkit_spark.session import build_spark, get_spark

__all__ = ["build_spark", "get_spark", "load_table", "register_tables"]
