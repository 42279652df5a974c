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
CENTROID_IDS = tuple(range(10, 26))  # 16 designated vectors as IVF centroids
NPROBE = 2


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


def _cosine_lambda(emb_col: str, vec_field) -> Column:
    """Cosine between a column and a struct-field vector, usable in HOF lambdas."""
    dot = F.aggregate(
        F.zip_with(
            F.col(emb_col),
            vec_field,
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform(vec_field, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return dot / (_norm(emb_col) * nrm)


def ivf_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, centroid_id): IVF index build — nearest centroid per vector.

    Centroids are CENTROID_IDS corpus vectors (a deterministic stand-in for a
    seeded k-means sample, so the oracle reproduces them exactly; Lloyd
    refinement iterations would reuse this same plan with recomputed means).
    The assignment is SHUFFLE-FREE: the 16 centroids collapse to one
    broadcast array row and the argmax runs as an in-row higher-order
    ``array_max`` over per-centroid cosines — a map-only pass, which is what
    makes the index build viable at 100 TB (cost = one scan).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cents = (
        emb.where(F.col("vec_id").isin(list(CENTROID_IDS)))
        .select(F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cv"))
        .agg(F.collect_list(F.struct("centroid_id", "cv")).alias("cents"))
    )
    best = F.array_max(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(
                _cosine_lambda("embedding", c["cv"]).alias("cs"),
                (-c["centroid_id"]).alias("ncid"),
            ),
        )
    )
    return (
        emb.crossJoin(F.broadcast(cents))
        .select("vec_id", (-best["ncid"]).alias("centroid_id"))
    )


def knn_ivf(
    spark: SparkSession, sf_dir: str, query_vec_id: int = QUERY_VEC_ID, k: int = TOP_K
) -> DataFrame:
    """IVF ANN top-k: probe the NPROBE nearest centroid lists only.

    (vec_id, sim). Query side: rank centroids by cosine to the query, keep
    NPROBE; candidates = vectors assigned to those centroids; exact cosine +
    top-k within candidates. With the assignment table written partitioned by
    ``centroid_id``, the probe is partition-pruned to nprobe/n_centroids of
    the corpus — the IVF recall/cost dial (vs LSH's fixed bucket grid).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    assign = ivf_assignments(spark, sf_dir)
    query = emb.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv")
    )
    probe = (
        emb.where(F.col("vec_id").isin(list(CENTROID_IDS)))
        .select(F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cv"))
        .crossJoin(F.broadcast(query))
        .orderBy(F.desc(_cosine("cv", "qv")), "centroid_id")
        .limit(NPROBE)
        .select("centroid_id")
    )
    cands = assign.join(F.broadcast(probe), "centroid_id").where(
        F.col("vec_id") != query_vec_id
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

_CENT_LIST = ", ".join(str(c) for c in CENTROID_IDS)
_COS_EC = _COS.format(a="e.embedding", b="c.cv")
_COS_CQ = _COS.format(a="c.cv", b="q.qv")

ORACLE_SQL["ivf_assignments"] = f"""
    WITH cents AS (
      SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings
      WHERE vec_id IN ({_CENT_LIST})
    )
    SELECT e.vec_id, c.centroid_id
    FROM embeddings e, cents c
    QUALIFY row_number() OVER (PARTITION BY e.vec_id
                               ORDER BY {_COS_EC} DESC, c.centroid_id) = 1
"""

ORACLE_SQL["knn_ivf"] = f"""
    WITH cents AS (
      SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings
      WHERE vec_id IN ({_CENT_LIST})
    ),
    assign AS (
      SELECT e.vec_id, c.centroid_id
      FROM embeddings e, cents c
      QUALIFY row_number() OVER (PARTITION BY e.vec_id
                                 ORDER BY {_COS_EC} DESC, c.centroid_id) = 1
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    probe AS (
      SELECT c.centroid_id FROM cents c, q
      ORDER BY {_COS_CQ} DESC, c.centroid_id LIMIT {NPROBE}
    ),
    cands AS (
      SELECT a.vec_id FROM assign a JOIN probe p ON a.centroid_id = p.centroid_id
      WHERE a.vec_id <> {QUERY_VEC_ID}
    )
    SELECT e.vec_id, round({_COS_EQ}, 6) AS sim
    FROM cands cd JOIN embeddings e ON cd.vec_id = e.vec_id, q
    ORDER BY sim DESC, e.vec_id
    LIMIT {TOP_K}
"""

QUERIES = {
    "knn_brute_force": knn_brute_force,
    "knn_lsh": knn_lsh,
    "ivf_assignments": ivf_assignments,
    "knn_ivf": knn_ivf,
}
