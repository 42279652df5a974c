from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_toolkit_spark.operators import dedup
from tests.conftest import SF_ORACLE
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(dedup.QUERIES))
def test_oracle_match(spark, name):
    df = dedup.QUERIES[name](spark, SF_ORACLE)
    compare(df, dedup.ORACLE_SQL[name], SF_ORACLE)


def test_near_dups_actually_found(spark):
    """TESTDATA plants near-duplicate docs; the detectors must find them."""
    jacc = dedup.dedup_ngram_jaccard(spark, SF_ORACLE)
    assert jacc.count() > 0


def test_minhash_recall_vs_exact(spark):
    """LSH candidates (verified) should recover ~all true Jaccard pairs."""
    exact = {
        (r["d1"], r["d2"]) for r in dedup.dedup_ngram_jaccard(spark, SF_ORACLE).collect()
    }
    lsh = {
        (r["d1"], r["d2"]) for r in dedup.dedup_minhash_lsh(spark, SF_ORACLE).collect()
    }
    assert lsh <= exact  # verify step guarantees no false positives
    assert len(lsh) >= 0.9 * len(exact)  # 4x4 banding @ j>=0.5: recall ~1


def test_simhash_no_udf_in_plan(spark):
    plan = (
        dedup.simhash_fingerprints(spark, SF_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_embedding_lsh_subset_of_exact(spark):
    exact = {(r["d1"], r["d2"]): r["cos"]
             for r in dedup.dedup_embedding_cosine(spark, SF_ORACLE).collect()}
    lsh = {(r["d1"], r["d2"]): r["cos"]
           for r in dedup.dedup_embedding_lsh(spark, SF_ORACLE).collect()}
    assert set(lsh) <= set(exact)  # blocking never fabricates pairs
    for k, v in lsh.items():
        assert v == exact[k]
