from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_toolkit_spark.operators import inverted_index as ii
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(ii.QUERIES))
def test_oracle_match(spark, name):
    df = ii.QUERIES[name](spark, SF_ORACLE)
    compare(df, ii.ORACLE_SQL[name], SF_ORACLE)


def test_unknown_term_yields_empty(spark):
    out = ii.boolean_retrieval(spark, SF_SMOKE, "zzznotaword spark AND")
    assert out.count() == 0


def test_malformed_query_raises(spark):
    with pytest.raises(ValueError):
        ii.boolean_retrieval(spark, SF_SMOKE, "spark fast")  # two operands left


def test_written_index_roundtrip_and_pushdown(spark, tmp_path):
    path = str(tmp_path / "index")
    ii.write_index(spark, SF_SMOKE, path)
    hit = ii.lookup_term(spark, path, "spark")
    rows = hit.collect()
    assert len(rows) == 1
    assert rows[0]["df"] == len(rows[0]["postings"])
    # postings docno-sorted (a3 secondary-sort semantics)
    ids = [p["doc_id"] for p in rows[0]["postings"]]
    assert ids == sorted(ids)
    plan = hit._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "term" in plan


def test_written_index_is_compressed_columnar(spark, tmp_path):
    """A14's VInt-compression heritage, closed with a measurement: the
    reference hand-rolls VInt delta encoding for postings
    (``a3/BuildInvertedIndexCompressed.java:107-118``); here the claim is
    that parquet's dictionary/RLE + snappy on the docno-sorted layout does
    that job. Assert the encodings are actually in effect (not just
    hoped-for) and that the parquet form is materially smaller than the
    text serialization of the same postings (numbers recorded in
    SCALE.md)."""
    import glob
    import os

    import pyarrow.parquet as pq

    path = str(tmp_path / "index")
    ii.write_index(spark, SF_SMOKE, path)
    files = glob.glob(f"{path}/*.parquet")
    assert files
    encodings: set[str] = set()
    for f in files:
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            group = meta.row_group(rg)
            for ci in range(group.num_columns):
                col = group.column(ci)
                encodings.update(col.encodings)
                assert col.compression != "UNCOMPRESSED", col.path_in_schema
    # dictionary and/or RLE must be present somewhere in the postings
    # columns — this is the machinery standing in for hand-rolled VInt
    assert encodings & {"PLAIN_DICTIONARY", "RLE_DICTIONARY", "RLE"}, encodings

    # text form of the same index: "term\tdf\tdoc:tf,doc:tf,..." per line;
    # the on-disk parquet (footers included, across all range partitions)
    # must beat it even at this tiny vocabulary (sf0.01 measurement in
    # SCALE.md: text 1.42x the 8-file on-disk form, 1.83x the column data)
    disk_bytes = sum(os.path.getsize(f) for f in files)
    text_bytes = sum(
        len(r["term"]) + 1 + len(str(r["df"])) + 1
        + len(",".join(f"{p['doc_id']}:{p['tf']}" for p in r["postings"])) + 1
        for r in spark.read.parquet(path).collect()
    )
    assert disk_bytes < text_bytes, (disk_bytes, text_bytes)


def test_bm25_scores_positive_descending(spark):
    rows = ii.ranked_retrieval_bm25(spark, SF_SMOKE).collect()
    assert rows, "bm25 should rank at least one matching doc"
    scores = [r["score"] for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_hybrid_subset_of_legs_and_ordered(spark):
    from big_data_toolkit_spark.operators.similarity import knn_ivf

    fused = ii.hybrid_retrieval(spark, SF_SMOKE).collect()
    assert 0 < len(fused) <= ii.HYBRID_TOP_K
    rrfs = [r["rrf"] for r in fused]
    assert rrfs == sorted(rrfs, reverse=True)
    lex_ids = {r["doc_id"] for r in ii.ranked_retrieval_bm25(spark, SF_SMOKE).collect()}
    sem_ids = {r["vec_id"] for r in knn_ivf(spark, SF_SMOKE).collect()}
    assert {r["doc_id"] for r in fused} <= (lex_ids | sem_ids)


def test_index_merge_equals_rebuild_restricted(spark):
    """Incremental maintenance must equal a from-scratch rebuild restricted
    to the delta's terms — compared row-for-row against the full postings."""
    from tests.conftest import SF_ORACLE

    merged = {
        (r["term"], r["doc_id"], r["tf"], r["df"])
        for r in ii.index_merge_incremental(spark, SF_ORACLE).collect()
    }
    full = ii.postings(spark, SF_ORACLE).collect()
    touched = {
        r["term"]
        for r in full
        if r["doc_id"] % ii.INDEX_BATCH_MOD == ii.INDEX_BATCH_MOD - 1
    }
    rebuild = {
        (r["term"], r["doc_id"], r["tf"], r["df"])
        for r in full
        if r["term"] in touched
    }
    assert merged == rebuild and merged


def test_boolean_not_semantics(spark):
    """NOT compiles to a LeftAnti join; result = spark-docs minus
    slow-docs, cross-checked directly."""
    from tests.conftest import SF_ORACLE

    df = ii.boolean_and_not(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan and "Cartesian" not in plan
    got = {r["doc_id"] for r in df.collect()}
    spark_docs = {
        r["doc_id"] for r in ii.boolean_retrieval(spark, SF_ORACLE, "spark").collect()
    }
    slow_docs = {
        r["doc_id"] for r in ii.boolean_retrieval(spark, SF_ORACLE, "slow").collect()
    }
    assert got == spark_docs - slow_docs and got


def test_phrase_search_matches_python_scan(spark):
    """Every (doc, n_matches) equals a direct Python scan for adjacent
    'spark fast' token pairs; phrase docs are a subset of the AND result."""
    import re

    from tests.conftest import SF_ORACLE

    from big_data_toolkit_spark.catalog import load_table

    got = {
        r["doc_id"]: r["n_matches"]
        for r in ii.phrase_search(spark, SF_ORACLE).collect()
    }
    assert got
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text").collect()
    expect = {}
    for r in docs:
        toks = [t for t in re.split("[^a-z]+", r["text"].lower()) if t]
        n = sum(
            1
            for x, y in zip(toks, toks[1:])
            if (x, y) == ii.PHRASE
        )
        if n:
            expect[r["doc_id"]] = n
    assert got == expect
    and_docs = {r["doc_id"] for r in ii.boolean_and(spark, SF_ORACLE).collect()}
    assert set(got) <= and_docs
