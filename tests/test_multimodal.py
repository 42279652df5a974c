from __future__ import annotations

import pytest

from big_data_toolkit_spark.multimodal import binary_ops as mm
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle_utils import compare


def test_meta_oracle_match(spark):
    compare(mm.multimodal_meta(spark, SF_ORACLE), mm.ORACLE_SQL["multimodal_meta"], SF_ORACLE)


def test_meta_no_shuffle(spark):
    plan = mm.multimodal_meta(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_image_features_shape_and_determinism(spark):
    df = mm.fake_decode_features(spark, SF_SMOKE)
    rows1 = {r["doc_id"]: r["features"] for r in df.collect()}
    rows2 = {r["doc_id"]: r["features"] for r in mm.fake_decode_features(spark, SF_SMOKE).collect()}
    assert rows1 == rows2
    assert len(rows1) > 0
    for feats in rows1.values():
        assert len(feats) == mm.N_FEATURES
        assert abs(sum(feats) - 1.0) < 1e-3  # normalized histogram


def test_frame_sample_fanout(spark):
    frames = mm.frame_sample(spark, SF_SMOKE).collect()
    assert len(frames) > 0
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_frames in by_doc.values():
        idxs = sorted(f["frame_idx"] for f in doc_frames)
        assert idxs[0] == 0
        assert all(i % mm.FRAME_STRIDE == 0 for i in idxs)
        assert all(len(f["frame_bytes"]) <= mm.FRAME_CHUNK for f in doc_frames)


def test_audio_stub_raises(spark):
    with pytest.raises(NotImplementedError):
        mm.decode_audio(spark, SF_SMOKE)


def test_image_features_oracle_parity(spark):
    """The byte-histogram oracle is only valid while documents.text is pure
    ASCII (UTF-8 bytes == character codes); assert the precondition, then
    the parity."""
    from pyspark.sql import functions as F

    from big_data_toolkit_spark.catalog import load_table
    from tests.oracle_utils import compare

    docs = load_table(spark, SF_SMOKE, "documents")
    non_ascii = docs.where(
        F.length("text") != F.length(F.encode("text", "UTF-8"))
    ).count()
    assert non_ascii == 0, "oracle precondition broken: non-ASCII text"

    # array form (pytest-only oracle: compare handles list cells)
    compare(
        mm.fake_decode_features(spark, SF_SMOKE),
        mm.IMAGE_FEATURES_ARRAY_ORACLE,
        SF_SMOKE,
    )
    # long form — what the driver gate actually runs
    compare(
        mm.image_features_checked(spark, SF_SMOKE),
        mm.ORACLE_SQL["image_features"],
        SF_SMOKE,
    )
