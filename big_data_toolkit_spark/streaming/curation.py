"""Streaming corpus-curation ingest: the batch curation gate applied to a
document stream, with cross-batch exact dedup in the state store.

The batch curation family (`operators/quality.py`, `operators/curation.py`,
`operators/relational_ext.curated_corpus`) is all STATELESS column
expressions except the dedup step — which means the same transform drops
onto a ``readStream`` unchanged (the `hash_sample_predicate` design note
generalized to the whole gate). This module makes that claim executable:

* ``curation_columns`` — ONE shared stateless transform (quality features,
  gate filter, stopword cleaning, md5 fingerprint) used verbatim by the
  batch twin and the stream plan, so the two cannot drift;
* ``stream_curate_documents`` — the stream form: shared transform +
  ``dropDuplicates(text_md5)`` (exact cross-batch dedup in the state
  store, first arrival wins);
* ``batch_curate_documents`` — the batch twin: shared transform +
  groupBy-min canonical pick (lowest doc_id per fingerprint).

Stream == batch whenever the replay feeds batches in doc_id order (first
arrival IS the lowest doc_id) — asserted by the replay test at sf0.001.
At 100 TB the stream form is the live-ingest gate: map-only expressions
per batch, dedup state is one fingerprint per KEPT document (bound it in
production with a watermark on ingest time or a TTL'd state store; the
reference's streams evict by window close the same way,
``a7/TrendingArrivals.scala``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_toolkit_spark.catalog import load_table
from big_data_toolkit_spark.operators.quality import quality_expressions
from big_data_toolkit_spark.operators.relational_ext import MIN_QUALITY, MIN_TOKENS


def curation_columns(docs: DataFrame) -> DataFrame:
    """Stateless gate + clean + fingerprint; identical on batch and stream.

    Built on ``quality_expressions()`` — the SAME Column definitions
    ``quality_score`` emits (one source of truth, so a future change to
    the blend or stopwords updates the batch family and this gate
    together) — then filters to the ``curated_corpus`` gate.
    """
    e = quality_expressions()
    return docs.select(
        "doc_id",
        "source",
        e["n_tokens"].alias("n_tokens"),
        F.round(e["score"], 6).alias("quality"),
        F.md5("text").alias("text_md5"),
        F.concat_ws(" ", e["cleaned_tokens"]).alias("clean_text"),
    ).where(
        (F.col("quality") >= MIN_QUALITY) & (F.col("n_tokens") >= MIN_TOKENS)
    )


def stream_curate_documents(docs_stream: DataFrame) -> DataFrame:
    """Stream form: shared gate + exact cross-batch dedup (state store)."""
    return curation_columns(docs_stream).dropDuplicates(["text_md5"])


def batch_curate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin: shared gate + lowest-doc_id canonical pick per md5."""
    gated = curation_columns(load_table(spark, sf_dir, "documents"))
    canon = gated.groupBy("text_md5").agg(F.min("doc_id").alias("doc_id"))
    return gated.join(canon, ["text_md5", "doc_id"]).select(
        "doc_id", "source", "n_tokens", "quality", "text_md5", "clean_text"
    )


def stream_cms_grid(docs_stream: DataFrame) -> DataFrame:
    """Streaming Count-Min grid over a document stream — the live-ingest
    frequency sketch (pair to the batch ``heavy_hitters_cms``).

    The grid is a pure groupBy-count over (row, bucket) cells, so the
    BATCH definition (``text_analytics.cms_grid``) runs unchanged as a
    streaming aggregation: state is the fixed 4×1024 cell counts (never
    per-word), each micro-batch's tokens partial-aggregate map-side, and
    the merge is cell-wise addition — exactly how per-shard CMS grids
    merge at 100 TB. Replay == batch asserted at sf0.001.
    """
    from pyspark.sql import functions as F

    from big_data_toolkit_spark.functions.text import tokenize
    from big_data_toolkit_spark.operators.text_analytics import cms_grid

    words = docs_stream.select(F.explode(tokenize("text")).alias("word"))
    return cms_grid(words)
