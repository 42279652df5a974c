"""Measured sub-quadratic guarantees for every blocking layer.

SCALE.md claims the df-cap / banding keep candidate-pair counts
sub-quadratic. These tests back the claim with numbers (VERDICT r6 item 6):

* the STRUCTURAL identity — a blocking layer can only emit pairs that
  co-occur in a bucket, so candidates ≤ Σ_buckets C(size, 2); a violation
  means the pair join leaked outside its blocking key;
* a CALIBRATED per-doc fan-out ceiling at sf0.01 (measured value × ~4-5
  headroom) — a regression alarm if a constant or banding change silently
  densifies the candidate set;
* the sub-quadratic sanity check — blocking must exclude most of the
  corpus-squared pair space.

Measured fan-out (candidates / docs), recorded for SCALE.md:
sf0.01 (500 docs): ngram 23.1, minhash 0.27, simhash 3.7;
sf0.1 (5000 docs, 2000 vecs): ngram 226, minhash 2.2, simhash 37.7.
On this synthetic corpus (small shared vocabulary) shingle df grows with
the corpus, so the PROPORTIONAL regime applies at tested scales; at 100 TB
the absolute MAX_SHINGLE_DF cap binds (df > 1000 shingles drop) and the
candidate count is ≤ distinct_shingles · C(1000, 2) — linear in the
corpus, never |docs|².
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import Window

from big_data_toolkit_spark.catalog import load_table
from big_data_toolkit_spark.operators import dedup
from big_data_toolkit_spark.operators.similarity import (
    _bucket_udf,
    _collect_index_vectors,
)
from tests.conftest import SF_ORACLE

# sf0.01-calibrated ceilings (measured × ~4-5 headroom for data drift)
MAX_FANOUT = {"ngram": 100.0, "minhash": 2.0, "simhash": 15.0, "emb": 10.0}


def _sum_c2(bucketed, key: str) -> int:
    """Σ over buckets of C(size, 2) — the blocking layer's structural cap."""
    row = (
        bucketed.groupBy(key)
        .agg(F.count("*").alias("sz"))
        .agg(F.sum(F.col("sz") * (F.col("sz") - 1) / 2).alias("cap"))
        .first()
    )
    return int(row["cap"] or 0)


@pytest.fixture(scope="module")
def n_docs(spark):
    return load_table(spark, SF_ORACLE, "documents").count()


def _check(n_candidates: int, structural_cap: int, n_items: int, layer: str):
    assert n_candidates <= structural_cap, (
        f"{layer}: {n_candidates} candidates exceed the structural bucket "
        f"bound {structural_cap} — the pair join leaked outside its block"
    )
    assert n_candidates <= MAX_FANOUT[layer] * n_items, (
        f"{layer}: fan-out {n_candidates / n_items:.1f}/doc exceeds the "
        f"calibrated ceiling {MAX_FANOUT[layer]} — blocking densified"
    )
    assert n_candidates < n_items * (n_items - 1) // 2, (
        f"{layer}: candidate set is the full quadratic pair space"
    )


def test_ngram_candidates_bounded(spark, n_docs):
    # the SAME capped_shingles the production path blocks on
    capped = dedup.capped_shingles(dedup._shingles(spark, SF_ORACLE))
    cap = _sum_c2(capped, "shingle")
    n = dedup.ngram_candidate_pairs(spark, SF_ORACLE).count()
    _check(n, cap, n_docs, "ngram")


def test_minhash_candidates_bounded(spark, n_docs):
    # the SAME minhash_bands layout the production pair join uses
    bands = dedup.minhash_bands(dedup.minhash_signatures(spark, SF_ORACLE))
    cap = _sum_c2(bands, "band")
    n = dedup.minhash_band_candidates(spark, SF_ORACLE).count()
    _check(n, cap, n_docs, "minhash")


def test_simhash_candidates_bounded(spark, n_docs):
    fps = dedup.simhash_fingerprints(spark, SF_ORACLE)
    blocks = fps.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "_",
                        F.lit(i),
                        (
                            F.shiftright(
                                F.col("simhash"), dedup.SIMHASH_BAND_BITS * i
                            ).bitwiseAND(
                                F.lit((1 << dedup.SIMHASH_BAND_BITS) - 1)
                            )
                        ),
                    )
                    for i in range(dedup.SIMHASH_BANDS)
                ]
            )
        ).alias("block"),
    )
    cap = _sum_c2(blocks, "block")
    n = dedup.simhash_candidates(fps).count()
    _check(n, cap, n_docs, "simhash")


def test_emb_band_candidates_bounded(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    n_vecs = emb.count()
    planes = _collect_index_vectors(emb, dedup.EMB_LSH_PLANES)
    sigs = emb.select("vec_id", _bucket_udf(planes)("embedding").alias("bits"))
    bands = sigs.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "_",
                        F.lit(b),
                        F.substring(
                            "bits",
                            b * dedup.EMB_LSH_BAND_BITS + 1,
                            dedup.EMB_LSH_BAND_BITS,
                        ),
                    )
                    for b in range(dedup.EMB_LSH_BANDS)
                ]
            )
        ).alias("band"),
    )
    cap = _sum_c2(bands, "band")
    n = dedup.emb_band_candidates(sigs).count()
    _check(n, cap, n_vecs, "emb")


def test_ngram_candidates_bounded_at_sf01(spark):
    """The measured-curve companion (SCALE.md r7/r8 note): the shingle-join
    blocking bound must hold at sf0.1 too, where the synthetic corpus's
    shared vocabulary puts df growth in the proportional regime (per-doc
    fan-out 23 → ~226 for 10x docs). Asserts the structural identity, a
    ceiling calibrated from the r7/r8 measurements (226 x ~1.5 drift
    headroom), and strict sub-quadratic candidates — so any future
    densification of the blocking layer fails HERE, at the scale where the
    curve bends, not only at sf0.01."""
    sf = "/root/testdata/sf0.1"
    n_docs = load_table(spark, sf, "documents").count()
    capped = dedup.capped_shingles(dedup._shingles(spark, sf))
    cap = _sum_c2(capped, "shingle")
    n = dedup.ngram_candidate_pairs(spark, sf).count()
    assert n <= cap, "pair join leaked outside its blocking key at sf0.1"
    assert n <= 350.0 * n_docs, (
        f"ngram sf0.1 fan-out {n / n_docs:.1f}/doc exceeds the measured-"
        f"curve ceiling (226 measured r8, x1.5 headroom)"
    )
    assert n < n_docs * (n_docs - 1) // 2
