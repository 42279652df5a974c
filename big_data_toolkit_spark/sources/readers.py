"""Raw-input readers for every format the reference consumes (SURVEY §2.1).

The reference parses each format positionally by hand (``line.split`` +
ordinal indexing); the engine reads each into a typed DataFrame with named
columns, permissive parsing, and pushdown-friendly schemas:

* S1/S4 — plain text lines → (line_id, text). ``line_id`` is a monotonic id
  standing in for the byte offset the reference uses as docno
  (``a3/BuildInvertedIndexCompressed.java:51-63``).
* S2 — pipe-delimited TPC-H ``.tbl`` → CSV reader with ``sep='|'`` and an
  explicit schema (``a6/Q1.scala:48-52`` tokens(N) ordinals become names).
* B3 — spam instances ``docid label f1 f2 …`` → (docid, label, features
  ARRAY<INT>) (``a5/TrainSpamClassifier.scala:62-67``).
* B4 — adjacency lists ``node n1 n2 …`` → (id, neighbors ARRAY<LONG>); a
  bare node id is a dangling node
  (``a4/BuildPersonalizedPageRankRecords.java:70-94``).
* S13 — model text ``(feature,weight)`` lines → (feature, weight)
  (``a5/ApplySpamClassifier.scala:48-58``); malformed lines are dropped, as
  the reference's regex guards do.
* B5 — taxi-style CSV events where the lon/lat ordinal depends on the row's
  type (green: 8/9, yellow: 10/11 — ``a7/RegionEventCount.scala:63-70``),
  handled with a per-row CASE instead of two parse paths.

All readers are scan + expressions — malformed rows filter out instead of
failing the job (P10 validity guards), which is the only survivable behavior
at 100 TB of crawl-grade input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Explicit TPC-H text schemas (ordinals per a6; only columns the reference
# touches are named strictly, the rest keep positional names).
TPCH_TBL_SCHEMAS = {
    "lineitem": (
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, "
        "l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, "
        "l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING, "
        "l_linestatus STRING, l_shipdate STRING"
    ),
    "orders": (
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate STRING, o_orderpriority STRING, "
        "o_clerk STRING"
    ),
    "part": "p_partkey BIGINT, p_name STRING",
    "supplier": "s_suppkey BIGINT, s_name STRING",
    "customer": "c_custkey BIGINT, c_name STRING, c_address STRING, c_nationkey INT",
    "nation": "n_nationkey INT, n_name STRING",
}


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """S1/S4: text → (line_id, text), line_id monotonic per file-partition."""
    return spark.read.text(path).select(
        F.monotonically_increasing_id().alias("line_id"),
        F.col("value").alias("text"),
    )


def read_tpch_tbl(spark: SparkSession, path: str, table: str) -> DataFrame:
    """S2: pipe-delimited ``.tbl`` with explicit schema; bad rows dropped."""
    if table not in TPCH_TBL_SCHEMAS:
        raise KeyError(f"no text schema for table {table!r}")
    return spark.read.csv(
        path, sep="|", schema=TPCH_TBL_SCHEMAS[table], mode="DROPMALFORMED"
    )


def read_spam_instances(spark: SparkSession, path: str) -> DataFrame:
    """B3: ``docid label f1 f2 …`` → (docid, label, features ARRAY<INT>)."""
    toks = F.split(F.col("value"), r"\s+")
    return (
        spark.read.text(path)
        .where(F.length(F.trim("value")) > 0)
        .select(
            F.element_at(toks, 1).alias("docid"),
            F.element_at(toks, 2).alias("label"),
            F.expr(
                "filter(transform(slice(split(value, '\\\\s+'), 3, "
                "size(split(value, '\\\\s+'))), x -> try_cast(x AS INT)), "
                "x -> x IS NOT NULL)"
            ).alias("features"),
        )
        .where(F.col("label").isin("spam", "ham"))
    )


def read_adjacency_list(spark: SparkSession, path: str) -> DataFrame:
    """B4: ``node n1 n2 …`` → (id, neighbors ARRAY<LONG>); bare id = dangling."""
    toks = F.split(F.trim(F.col("value")), r"\s+")
    return (
        spark.read.text(path)
        .where(F.length(F.trim("value")) > 0)
        .select(
            F.element_at(toks, 1).try_cast("long").alias("id"),
            F.expr(
                "filter(transform(slice(split(trim(value), '\\\\s+'), 2, "
                "size(split(trim(value), '\\\\s+'))), x -> try_cast(x AS BIGINT)), "
                "x -> x IS NOT NULL)"
            ).alias("neighbors"),
        )
        .where(F.col("id").isNotNull())
    )


def read_model_text(spark: SparkSession, path: str) -> DataFrame:
    """S13: ``(feature,weight)`` lines → (feature INT, weight DOUBLE).

    Malformed lines (no parens, non-numeric fields) drop out — the engine
    form of ``a5/ApplySpamClassifier.scala:51-56``'s strip/guard chain.
    """
    stripped = F.regexp_replace(F.trim(F.col("value")), r"^\(|\)$", "")
    parts = F.split(stripped, ",")
    return (
        spark.read.text(path)
        .select(
            F.element_at(parts, 1).try_cast("int").alias("feature"),
            F.element_at(parts, 2).try_cast("double").alias("weight"),
        )
        .where(F.col("feature").isNotNull() & F.col("weight").isNotNull())
    )


def read_taxi_events(spark: SparkSession, path: str) -> DataFrame:
    """B5: taxi CSV → (taxi_type, lon, lat); ordinal depends on row type.

    green rows carry lon/lat at fields 9/10 (1-based), others at 11/12 —
    the reference's per-row schema divergence handled with one CASE
    (``a7/RegionEventCount.scala:63-70``).
    """
    c = F.split(F.col("value"), ",")
    is_green = F.element_at(c, 1) == "green"
    return (
        spark.read.text(path)
        .where(F.length(F.trim("value")) > 0)
        .select(
            F.element_at(c, 1).alias("taxi_type"),
            F.when(is_green, F.element_at(c, 9)).otherwise(F.element_at(c, 11))
            .try_cast("double")
            .alias("lon"),
            F.when(is_green, F.element_at(c, 10)).otherwise(F.element_at(c, 12))
            .try_cast("double")
            .alias("lat"),
        )
        .where(F.col("lon").isNotNull() & F.col("lat").isNotNull())
    )


def geo_box_filter(
    df: DataFrame,
    boxes: dict[str, tuple[float, float, float, float]],
    inclusive: bool = False,
) -> DataFrame:
    """P3: label rows by bounding box; boundary inclusivity is a parameter
    (the reference diverges: strict ``<`` in RegionEventCount:49-51 vs
    ``<=`` in TrendingArrivals:66-67 — SURVEY §7 risk list).

    boxes: name -> (lon_min, lon_max, lat_min, lat_max). Rows in no box drop.
    """
    label = F.lit(None).cast("string")
    for name, (x0, x1, y0, y1) in boxes.items():
        if inclusive:
            cond = (
                (F.col("lon") >= x0) & (F.col("lon") <= x1)
                & (F.col("lat") >= y0) & (F.col("lat") <= y1)
            )
        else:
            cond = (
                (F.col("lon") > x0) & (F.col("lon") < x1)
                & (F.col("lat") > y0) & (F.col("lat") < y1)
            )
        label = F.when(cond, F.lit(name)).otherwise(label)
    return df.withColumn("region", label).where(F.col("region").isNotNull())
