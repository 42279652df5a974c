"""Streaming curation ingest: replay == batch twin, shared-transform drift
guard, and cross-batch dedup actually deduplicating."""

from __future__ import annotations

import glob
import os

from big_data_toolkit_spark.catalog import load_table
from big_data_toolkit_spark.streaming import curation as sc
from tests.conftest import SF_SMOKE


def _write_doc_batches(spark, sf_dir, out_dir, n_files=4):
    """doc_id-ordered file-per-batch replay (first arrival == lowest id —
    the ordering under which stream dedup equals the batch min-id pick)."""
    docs = load_table(spark, sf_dir, "documents").orderBy("doc_id")
    rows = docs.collect()
    chunk = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(part, docs.schema).coalesce(1).write.parquet(
                os.path.join(out_dir, f"batch_{i:04d}")
            )
    return sorted(glob.glob(os.path.join(out_dir, "batch_*")))


def test_stream_curation_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    dirs = _write_doc_batches(spark, SF_SMOKE, src)
    assert len(dirs) >= 2
    stream = (
        spark.readStream.schema(load_table(spark, SF_SMOKE, "documents").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "batch_*"))
    )
    q = (
        sc.stream_curate_documents(stream)
        .writeStream.format("memory")
        .queryName("curated_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        tuple(r)
        for r in spark.sql(
            "select doc_id, source, n_tokens, quality, text_md5, clean_text "
            "from curated_stream"
        ).collect()
    }
    want = {tuple(r) for r in sc.batch_curate_documents(spark, SF_SMOKE).collect()}
    assert got == want and got


def test_curation_gate_filters_and_dedups(spark):
    rows = sc.batch_curate_documents(spark, SF_SMOKE).collect()
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert 0 < len(rows) < n_docs  # the gate really dropped something
    md5s = [r["text_md5"] for r in rows]
    assert len(md5s) == len(set(md5s))  # one row per fingerprint
    assert all(
        r["quality"] >= sc.MIN_QUALITY and r["n_tokens"] >= sc.MIN_TOKENS
        for r in rows
    )


def test_stream_cms_grid_matches_batch(spark, tmp_path):
    """The streaming Count-Min grid after a multi-batch replay equals the
    batch grid cell-for-cell (cell-wise addition is the CMS merge)."""
    from big_data_toolkit_spark.operators.text_analytics import (
        _doc_tokens,
        cms_grid,
    )

    src = str(tmp_path / "src")
    dirs = _write_doc_batches(spark, SF_SMOKE, src)
    assert len(dirs) >= 2
    stream = (
        spark.readStream.schema(load_table(spark, SF_SMOKE, "documents").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "batch_*"))
    )
    q = (
        sc.stream_cms_grid(stream)
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in spark.sql("select * from cms_stream").collect()
    }
    from pyspark.sql import functions as F

    words = _doc_tokens(spark, SF_SMOKE).select(F.explode("tokens").alias("word"))
    want = {(r["d"], r["bucket"]): r["cnt"] for r in cms_grid(words).collect()}
    assert got == want and got
