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


def _write_doc_batches_at_cuts(spark, sf_dir, out_dir, fracs):
    """Split the doc_id-ordered corpus at explicit fractional cut points —
    the boundary-variation twin of ``_write_doc_batches``."""
    docs = load_table(spark, sf_dir, "documents").orderBy("doc_id")
    rows = docs.collect()
    bounds = [0] + [int(f * len(rows)) for f in fracs] + [len(rows)]
    for i in range(len(bounds) - 1):
        part = rows[bounds[i] : bounds[i + 1]]
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


import pytest  # noqa: E402  (kept with its parametrized users below)


@pytest.mark.parametrize(
    "fracs",
    [
        (0.9,),  # one giant batch + a small tail
        (0.07, 0.11, 0.5, 0.53, 0.9, 0.97),  # 7 uneven batches
    ],
    ids=["tail-heavy", "seven-uneven"],
)
def test_curation_invariant_to_batch_boundaries(spark, tmp_path, fracs):
    """The curation gate + cross-batch dropDuplicates must emit the same
    curated set for ANY doc_id-ordered micro-batch layout — a duplicate
    pair landing in one batch vs straddling a trigger boundary exercises
    the in-batch dedup path vs the state-store path, and both must agree
    with the oracle-checked batch twin."""
    src = str(tmp_path / "src")
    _write_doc_batches_at_cuts(spark, SF_SMOKE, src, fracs)
    stream = (
        spark.readStream.schema(load_table(spark, SF_SMOKE, "documents").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "batch_*"))
    )
    qname = f"curated_inv_{len(fracs)}"
    q = (
        sc.stream_curate_documents(stream)
        .writeStream.format("memory")
        .queryName(qname)
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
            f"from {qname}"
        ).collect()
    }
    want = {
        tuple(r) for r in sc.batch_curate_documents(spark, SF_SMOKE).collect()
    }
    assert got == want and got


@pytest.mark.parametrize(
    "fracs",
    [
        (0.9,),  # one giant batch + a small tail
        (0.07, 0.11, 0.5, 0.53, 0.9, 0.97),  # 7 uneven batches
    ],
    ids=["tail-heavy", "seven-uneven"],
)
def test_cms_grid_invariant_to_batch_boundaries(spark, tmp_path, fracs):
    """Cell-wise CMS addition is the sketch merge, so the final grid must
    be identical for ANY micro-batch layout — asserted cell-for-cell
    against the batch grid rather than argued from commutativity."""
    from pyspark.sql import functions as F

    from big_data_toolkit_spark.operators.text_analytics import (
        _doc_tokens,
        cms_grid,
    )

    src = str(tmp_path / "src")
    _write_doc_batches_at_cuts(spark, SF_SMOKE, src, fracs)
    stream = (
        spark.readStream.schema(load_table(spark, SF_SMOKE, "documents").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "batch_*"))
    )
    qname = f"cms_inv_{len(fracs)}"
    q = (
        sc.stream_cms_grid(stream)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in spark.sql(f"select * from {qname}").collect()
    }
    words = _doc_tokens(spark, SF_SMOKE).select(F.explode("tokens").alias("word"))
    want = {(r["d"], r["bucket"]): r["cnt"] for r in cms_grid(words).collect()}
    assert got == want and got


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
