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
