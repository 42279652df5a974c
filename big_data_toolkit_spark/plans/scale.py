"""Scale techniques as reusable plan fragments: skew salting, two-phase
aggregation, bucketed layouts, and plan introspection.

The reference hand-rolls its scale tricks (custom partitioners,
``a2/ComputeBigramRelativeFrequencyPairs.scala:24-30``; 32 MB split tuning,
``a1/PairsPMI.java:288-292``). Most of that is Catalyst/AQE's job now — AQE
skew-join splitting handles moderately skewed joins automatically — but two
situations still need explicit plan shapes at 100 TB:

* **Heavy-hitter aggregation skew** (one key owns a double-digit share of
  rows): AQE splits skewed *join* partitions, not skewed *aggregation* groups.
  ``salted_count`` pre-splits each key into ``n_salts`` subgroups (map-side
  partial agg already shrinks data; the salt bounds the single-reducer
  hotspot for the final merge) then merges — two small shuffles instead of
  one stuck straggler.
* **Repeated co-located joins** on the same key (fact-to-fact): a one-time
  ``bucketize`` write (stable hash layout, sorted files) lets every later
  join read both sides pre-partitioned — the shuffle is paid once at write
  time. This is the cluster analogue of the reference pre-partitioning its
  graph (``a4/PartitionGraph.java``) so PageRank iterations don't reshuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_toolkit_spark.catalog import load_table


def salted_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """Skew-safe ``groupBy(key).count()`` via two-phase salted aggregation.

    Phase 1 groups on (key, salt) — hot keys fan out over ``n_salts``
    reducers; phase 2 merges the per-salt partials. Result is identical to
    the plain aggregation (tests assert equality).
    """
    salted = df.withColumn("_salt", (F.rand(seed=7) * n_salts).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("_partial"))
    return partial.groupBy(key).agg(F.sum("_partial").alias("cnt"))


def salted_sum(df: DataFrame, key: str, value: str, n_salts: int = 16) -> DataFrame:
    """Skew-safe ``groupBy(key).sum(value)`` (same two-phase shape)."""
    salted = df.withColumn("_salt", (F.rand(seed=7) * n_salts).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(F.sum(value).alias("_partial"))
    return partial.groupBy(key).agg(F.sum("_partial").alias(f"sum_{value}"))


def salted_join_skewed_left(
    left: DataFrame, right: DataFrame, key: str, n_salts: int = 16
) -> DataFrame:
    """Skew-safe inner equi-join when ``left`` has heavy-hitter keys and
    ``right`` is too large to broadcast: salt the left, replicate the right
    across all salts, join on (key, salt). Row-identical to the plain join.
    """
    salted_left = left.withColumn("_salt", (F.rand(seed=7) * n_salts).cast("int"))
    salts = left.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("_salt")
    )
    replicated_right = right.crossJoin(F.broadcast(salts))
    return salted_left.join(replicated_right, [key, "_salt"]).drop("_salt")


def bucketize(
    df: DataFrame, path: str, table: str, key: str, n_buckets: int = 32
) -> None:
    """One-time bucketed+sorted layout so later equi-joins on ``key`` skip
    the shuffle (both sides read pre-partitioned)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .saveAsTable(table)
    )


def two_phase_distinct(df: DataFrame, key: str, value: str) -> DataFrame:
    """Skew-safe exact ``count(DISTINCT value)`` per key.

    Plain distinct-count shuffles every (key, value) pair to the key's one
    reducer — the aggregation shape map-side combine CANNOT save (unlike
    count/sum, where partial agg already absorbs skew and salting would be
    pure overhead). Phase 1 groups on (key, value) — the hot key's pairs
    spread over all reducers of the pair space; phase 2 counts the
    now-deduplicated pairs per key. Identical result, no single-reducer
    hotspot.
    """
    pairs = df.groupBy(key, value).agg(F.lit(1))
    return pairs.groupBy(key).agg(F.count("*").alias(f"distinct_{value}"))


# ---------------------------------------------------------------------------
# Driver-gated queries exercising the scale fragments on real tables.
# ``events.event_type`` is the skewed key: 5 values over the whole table, so
# every key is a heavy hitter by construction.
# ---------------------------------------------------------------------------


def distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, distinct_user_id): two-phase exact distinct per hot key."""
    events = load_table(spark, sf_dir, "events")
    return two_phase_distinct(events, "event_type", "user_id")


def skewed_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, event_type, type_cnt): every event joined to its type's
    row count through ``salted_join_skewed_left`` — the hot-key fact-to-dim
    join shape where the left's 5-value key would otherwise concentrate on
    5 reducers. The salt fans each hot key over 16 reducers; the row set is
    identical to the plain join (the salt column never leaves the plan).
    Counts (not float sums) keep the oracle comparison exact.
    """
    events = load_table(spark, sf_dir, "events")
    type_cnt = events.groupBy("event_type").agg(F.count("*").alias("type_cnt"))
    joined = salted_join_skewed_left(
        events.select("event_id", "event_type"), type_cnt, "event_type"
    )
    return joined.select("event_id", "event_type", "type_cnt")


QUERIES = {
    "distinct_users_by_type": distinct_users_by_type,
    "skewed_join_enrich": skewed_join_enrich,
}

ORACLE_SQL = {
    "distinct_users_by_type": """
        SELECT event_type, count(DISTINCT user_id) AS distinct_user_id
        FROM events GROUP BY event_type
    """,
    "skewed_join_enrich": """
        SELECT e.event_id, e.event_type, t.type_cnt
        FROM events e
        JOIN (SELECT event_type, count(*) AS type_cnt
              FROM events GROUP BY event_type) t
          ON e.event_type = t.event_type
    """,
}


def explain_str(df: DataFrame) -> str:
    """Executed-plan string (for assertions on pushdown/broadcast/codegen)."""
    return df._jdf.queryExecution().executedPlan().toString()
