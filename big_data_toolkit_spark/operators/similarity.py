"""Similarity search over embedding vectors: brute-force cosine top-k and an
LSH-bucketed ANN variant.

Not in the reference; part of the engine's LLM-pipeline surface. Design:

* **Brute force** (the correctness baseline): query vector broadcast to all
  partitions, cosine computed with JVM-side higher-order functions
  (``zip_with`` + ``aggregate`` — a left-to-right double fold, bit-identical
  to the oracle's ``list_sum(list_transform(...))``), then
  ``orderBy(desc).limit(k)`` = TakeOrderedAndProject: per-partition top-k
  heaps, only k rows per partition reach the driver. At 100 TB this is one
  full scan, no shuffle — the right plan for a single ad-hoc query.
* **LSH ANN** (the scale path): random-hyperplane signature — 8 sign bits of
  dot products against fixed hyperplanes (here: 8 designated corpus vectors,
  so the oracle reproduces them exactly; production would use seeded Gaussian
  planes). Vectors sharing the query's bucket are candidates; cosine + top-k
  within the bucket only. Stored bucketed/partitioned by signature, this
  prunes the scan to ~1/2^8 of the data — the IVF-style index a repeated-
  query workload needs; the tradeoff is recall (near-neighbors across a
  hyperplane land in other buckets; production uses multi-probe/band OR).

No UDFs, no collect-based loops; everything is expressions + one broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_toolkit_spark.catalog import load_table

QUERY_VEC_ID = 0
TOP_K = 10
N_HYPERPLANES = 8
HYPERPLANE_IDS = tuple(range(1, N_HYPERPLANES + 1))  # vec_ids used as planes


def _dot(a: str, b: str) -> Column:
    """Double-precision dot product of two float-array columns (in-order fold)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> double(x) * double(y)), "
        f"0D, (acc, v) -> acc + v)"
    )


def _norm(a: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate(transform({a}, x -> double(x) * double(x)), "
            f"0D, (acc, v) -> acc + v)"
        )
    )


def _cosine(a: str, b: str) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def knn_brute_force(
    spark: SparkSession, sf_dir: str, query_vec_id: int = QUERY_VEC_ID, k: int = TOP_K
) -> DataFrame:
    """Exact cosine top-k for one query vector: (vec_id, sim)."""
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv")
    )
    return (
        emb.where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(query))
        .select("vec_id", F.round(_cosine("embedding", "qv"), 6).alias("sim"))
        .orderBy(F.desc("sim"), "vec_id")
        .limit(k)
    )


def lsh_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, bucket): 8-bit random-hyperplane signature per vector."""
    emb = load_table(spark, sf_dir, "embeddings")
    planes = (
        emb.where(F.col("vec_id").isin(list(HYPERPLANE_IDS)))
        .select(F.col("vec_id").alias("plane_id"), F.col("embedding").alias("pv"))
    )
    bits = (
        emb.crossJoin(F.broadcast(planes))
        .select(
            "vec_id",
            "plane_id",
            (_dot("embedding", "pv") > 0).cast("int").alias("bit"),
        )
    )
    return (
        bits.groupBy("vec_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("plane_id", "bit"))
                    ),
                    lambda s: s["bit"].cast("string"),
                ),
            ).alias("bucket")
        )
    )


def knn_lsh(
    spark: SparkSession, sf_dir: str, query_vec_id: int = QUERY_VEC_ID, k: int = TOP_K
) -> DataFrame:
    """ANN top-k within the query's LSH bucket: (vec_id, sim)."""
    emb = load_table(spark, sf_dir, "embeddings")
    sigs = lsh_signatures(spark, sf_dir)
    query_bucket = sigs.where(F.col("vec_id") == query_vec_id).select(
        F.col("bucket").alias("qb")
    )
    query = emb.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv")
    )
    cands = (
        sigs.crossJoin(F.broadcast(query_bucket))
        .where((F.col("bucket") == F.col("qb")) & (F.col("vec_id") != query_vec_id))
        .select("vec_id")
    )
    return (
        cands.join(emb, "vec_id")
        .crossJoin(F.broadcast(query))
        .select("vec_id", F.round(_cosine("embedding", "qv"), 6).alias("sim"))
        .orderBy(F.desc("sim"), "vec_id")
        .limit(k)
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------

_DOT = (
    "list_sum(list_transform(range(1, len({a})+1), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
)
_NORM = "sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE)))"
_COS = (
    f"({_DOT.format(a='{a}', b='{b}')} / "
    f"({_NORM.format(a='{a}')} * {_NORM.format(a='{b}')}))"
)

_COS_EQ = _COS.format(a="e.embedding", b="q.qv")

ORACLE_SQL: dict[str, str] = {
    "knn_brute_force": f"""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
        SELECT e.vec_id, round({_COS_EQ}, 6) AS sim
        FROM embeddings e, q
        WHERE e.vec_id <> {QUERY_VEC_ID}
        ORDER BY sim DESC, e.vec_id
        LIMIT {TOP_K}
    """,
    "knn_lsh": f"""
        WITH planes AS (
          SELECT vec_id AS plane_id, embedding AS pv FROM embeddings
          WHERE vec_id BETWEEN 1 AND {N_HYPERPLANES}
        ),
        bits AS (
          SELECT e.vec_id, p.plane_id,
                 CASE WHEN {_DOT.format(a='e.embedding', b='p.pv')} > 0
                      THEN 1 ELSE 0 END AS bit
          FROM embeddings e, planes p
        ),
        sigs AS (
          SELECT vec_id, string_agg(bit::VARCHAR, '' ORDER BY plane_id) AS bucket
          FROM bits GROUP BY vec_id
        ),
        qb AS (SELECT bucket FROM sigs WHERE vec_id = {QUERY_VEC_ID}),
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
        cands AS (
          SELECT s.vec_id FROM sigs s, qb
          WHERE s.bucket = qb.bucket AND s.vec_id <> {QUERY_VEC_ID}
        )
        SELECT e.vec_id, round({_COS_EQ}, 6) AS sim
        FROM cands c JOIN embeddings e ON c.vec_id = e.vec_id, q
        ORDER BY sim DESC, e.vec_id
        LIMIT {TOP_K}
    """,
}

QUERIES = {
    "knn_brute_force": knn_brute_force,
    "knn_lsh": knn_lsh,
}
