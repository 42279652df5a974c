from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_toolkit_spark.operators import similarity as sim
from tests.conftest import SF_ORACLE
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(sim.QUERIES))
def test_oracle_match(spark, name):
    df = sim.QUERIES[name](spark, SF_ORACLE)
    compare(df, sim.ORACLE_SQL[name], SF_ORACLE)


def test_brute_force_topk_shape(spark):
    rows = sim.knn_brute_force(spark, SF_ORACLE).collect()
    assert len(rows) == sim.TOP_K
    sims = [r["sim"] for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in sims)


def test_lsh_is_subset_semantics(spark):
    """ANN results come from the query's bucket: every hit must also rank in
    brute force when restricted to those candidates (no fabricated sims)."""
    brute = {r["vec_id"]: r["sim"] for r in
             sim.knn_brute_force(spark, SF_ORACLE, k=10**6).collect()}
    ann = sim.knn_lsh(spark, SF_ORACLE).collect()
    assert len(ann) > 0
    for r in ann:
        assert r["vec_id"] in brute
        assert r["sim"] == pytest.approx(brute[r["vec_id"]], abs=1e-6)


def test_no_python_udf_in_plan(spark):
    plan = (
        sim.knn_brute_force(spark, SF_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


def test_ivf_assignment_is_total(spark):
    """Every vector gets exactly one centroid, and centroids self-assign."""
    rows = sim.ivf_assignments(spark, SF_ORACLE).collect()
    n = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").count()
    assert len(rows) == n
    by_id = {r["vec_id"]: r["centroid_id"] for r in rows}
    for cid in sim.CENTROID_IDS:
        assert by_id[cid] == cid  # cosine(v, v) = 1 is the max


def test_ivf_no_fabricated_sims(spark):
    brute = {r["vec_id"]: r["sim"] for r in
             sim.knn_brute_force(spark, SF_ORACLE, k=10**6).collect()}
    ann = sim.knn_ivf(spark, SF_ORACLE).collect()
    assert len(ann) > 0
    for r in ann:
        assert r["sim"] == pytest.approx(brute[r["vec_id"]], abs=1e-6)
