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


def test_audio_decode_is_real_now():
    """r7's decode_audio NotImplementedError stub is gone: the WAV path is
    a real stdlib codec (audio_wav_features); only compressed formats
    remain external-codec territory."""
    assert not hasattr(mm, "decode_audio")
    assert "audio_wav_features" in mm.QUERIES


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


# ---------------------------------------------------------------------------
# REAL codec paths (r8)
# ---------------------------------------------------------------------------


def test_png_roundtrip_all_filters():
    """Encoder cycles filter types per row (None/Sub/Up/Average/Paeth);
    5+ row images therefore exercise every unfilter. Bit-exact."""
    import numpy as np

    from big_data_toolkit_spark.multimodal import codecs

    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (5, 3), (6, 17), (11, 2)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        back = codecs.decode_png(codecs.encode_png_rgb8(px))
        assert back.shape == (h, w, 3) and (back == px).all()


def test_png_decoder_rejects_corruption():
    import numpy as np
    import pytest

    from big_data_toolkit_spark.multimodal import codecs

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    b = bytearray(codecs.encode_png_rgb8(px))
    with pytest.raises(ValueError, match="signature"):
        codecs.decode_png(b"nope" + bytes(b))
    b[20] ^= 0xFF  # flip a byte inside IHDR body -> CRC must catch it
    with pytest.raises(ValueError, match="CRC"):
        codecs.decode_png(bytes(b))


def test_wav_roundtrip_mono_and_stereo():
    import numpy as np

    from big_data_toolkit_spark.multimodal import codecs

    rng = np.random.default_rng(13)
    mono = (rng.integers(0, 65536, 300) - 32768).astype(np.int16)
    rate, ch, back = codecs.decode_wav(codecs.encode_wav_pcm16(mono, 8000))
    assert (rate, ch) == (8000, 1) and (back == mono).all()
    stereo = (rng.integers(0, 65536, 400) - 32768).astype(np.int16)
    rate, ch, back = codecs.decode_wav(
        codecs.encode_wav_pcm16(stereo, 44100, n_channels=2)
    )
    assert (rate, ch) == (44100, 2) and (back == stereo).all()


def test_codec_queries_oracle_match_and_map_only(spark):
    """Both real-codec feature queries: oracle MATCH at sf0.001 and a
    shuffle-free plan (generate + decode are chained mapInPandas over the
    pruned documents scan — partitioning inherited, no Exchange)."""
    for name in ("audio_wav_features", "image_png_features"):
        df = mm.QUERIES[name](spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"{name} shuffles: {plan}"
        compare(df, mm.ORACLE_SQL[name], SF_SMOKE)


def test_wav_payloads_are_real_riff(spark):
    rows = mm.wav_assets(spark, SF_SMOKE).limit(3).collect()
    assert rows
    for r in rows:
        b = bytes(r["payload"])
        assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"


def test_png_decoder_grayscale_and_rgba():
    """The decoder claims 8-bit gray (color 0) and RGBA (color 6) support;
    the encoder only emits RGB, so build those files chunk-by-chunk (filter
    0 rows) and decode."""
    import struct
    import zlib

    import numpy as np

    from big_data_toolkit_spark.multimodal import codecs

    def build(px, color_type):
        h, w = px.shape[:2]
        ch = 1 if px.ndim == 2 else px.shape[2]
        flat = px.reshape(h, w * ch)
        lines = b"".join(b"\x00" + flat[y].astype(np.uint8).tobytes()
                         for y in range(h))
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + codecs._chunk(b"IHDR", ihdr)
                + codecs._chunk(b"IDAT", zlib.compress(lines))
                + codecs._chunk(b"IEND", b""))

    rng = np.random.default_rng(17)
    gray = rng.integers(0, 256, (5, 7), dtype=np.uint8)
    out = codecs.decode_png(build(gray, 0))
    assert out.shape == (5, 7, 1) and (out[:, :, 0] == gray).all()

    rgba = rng.integers(0, 256, (4, 3, 4), dtype=np.uint8)
    out = codecs.decode_png(build(rgba, 6))
    assert out.shape == (4, 3, 4) and (out == rgba).all()


def test_jpeg_roundtrip_exact_on_block_constant():
    """Block-constant grayscale under unit quantization is DC-only and must
    round-trip EXACTLY — the property the oracle query relies on."""
    import numpy as np

    from big_data_toolkit_spark.multimodal import codecs

    rng = np.random.default_rng(17)
    for bh, bw in [(1, 1), (2, 4), (5, 3)]:
        vals = rng.integers(0, 256, (bh, bw), dtype=np.int64)
        px = np.kron(vals, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
        back = codecs.decode_jpeg(codecs.encode_jpeg(px))
        assert back.shape == px.shape and (back == px).all()


def test_jpeg_roundtrip_near_lossless_general():
    """Arbitrary content under unit tables: bounded rounding error only
    (|err| <= 4 gray / <= 6 rgb from coefficient rounding + color xform),
    including non-multiple-of-8 dims (edge-replication padding + crop)."""
    import numpy as np

    from big_data_toolkit_spark.multimodal import codecs

    rng = np.random.default_rng(19)
    gray = rng.integers(0, 256, (19, 26), dtype=np.uint8)
    back = codecs.decode_jpeg(codecs.encode_jpeg(gray))
    assert back.shape == gray.shape
    assert np.abs(back.astype(int) - gray.astype(int)).max() <= 4
    rgb = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    back = codecs.decode_jpeg(codecs.encode_jpeg(rgb))
    assert back.shape == rgb.shape
    assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 6


def test_jpeg_lossy_quantization_compresses():
    """A REAL quant table (coarser than unit) must shrink the scan and
    stay visually close — exercising the nontrivial run/size + ZRL paths."""
    import numpy as np

    from big_data_toolkit_spark.multimodal import codecs

    rng = np.random.default_rng(23)
    # smooth gradient + mild noise: realistic DCT energy distribution
    y, x = np.mgrid[0:32, 0:40]
    px = np.clip(
        4 * (x + y) // 2 + rng.integers(-8, 9, (32, 40)), 0, 255
    ).astype(np.uint8)
    qt = np.full(64, 16, dtype=np.int64)
    qt[0] = 1  # keep DC exact-ish
    coarse = codecs.encode_jpeg(px, qt=qt)
    fine = codecs.encode_jpeg(px)
    assert len(coarse) < len(fine)
    back = codecs.decode_jpeg(coarse)
    assert np.abs(back.astype(int) - px.astype(int)).max() <= 64


def test_jpeg_decoder_rejects_malformed():
    import numpy as np
    import pytest

    from big_data_toolkit_spark.multimodal import codecs

    px = np.zeros((8, 8), dtype=np.uint8)
    good = codecs.encode_jpeg(px)
    with pytest.raises(ValueError, match="SOI"):
        codecs.decode_jpeg(b"\x00\x00" + good)
    # progressive SOF2 marker in place of SOF0
    bad = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="non-baseline"):
        codecs.decode_jpeg(bad)
    # scan cut mid-entropy-segment: uniform ValueError, not IndexError
    cut = good[: good.index(b"\xff\xda") + 12]
    with pytest.raises(ValueError, match="truncated"):
        codecs.decode_jpeg(cut)
    # truncation mid-restart-marker on an interval-coded stream
    g = np.arange(64 * 4, dtype=np.uint8).reshape(16, 16)
    dri_bytes = codecs.encode_jpeg(g, dri=1)
    cut = dri_bytes[: dri_bytes.index(b"\xff\xd0") + 1]
    with pytest.raises(ValueError, match="truncated"):
        codecs.decode_jpeg(cut)


def test_jpeg_encoder_rejects_oversized_quant_divisors():
    """Divisors > 255 need a 16-bit DQT (Pq=1) the baseline pipeline
    doesn't support — the encoder must refuse, not mask to 8 bits."""
    import numpy as np
    import pytest

    from big_data_toolkit_spark.multimodal import codecs

    px = np.zeros((8, 8), dtype=np.uint8)
    qt = np.full(64, 16, dtype=np.int64)
    qt[63] = 256
    with pytest.raises(ValueError, match="1..255"):
        codecs.encode_jpeg(px, qt=qt)
    with pytest.raises(ValueError, match="1..255"):
        codecs.encode_jpeg(px, qt=np.zeros(64, dtype=np.int64))


def test_jpeg_query_oracle_match_and_map_only(spark):
    df = mm.QUERIES["image_jpeg_features"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"image_jpeg_features shuffles: {plan}"
    compare(df, mm.ORACLE_SQL["image_jpeg_features"], SF_SMOKE)


def test_jpeg_payloads_are_real_jfif_markers(spark):
    rows = mm.jpeg_assets(spark, SF_SMOKE).limit(3).collect()
    assert rows
    for r in rows:
        b = bytes(r["payload"])
        assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
        assert b"\xff\xdb" in b and b"\xff\xc0" in b and b"\xff\xc4" in b


def test_jpeg_420_roundtrip_and_dims():
    """4:2:0 (luma 2x2, chroma subsampled) — the layout real cameras emit.
    MCU-constant color content survives the chroma downsample nearly
    exactly; odd (non-multiple-of-16) dims crop back correctly; random
    content is bounded by the chroma information loss."""
    import numpy as np

    from big_data_toolkit_spark.multimodal import codecs

    rng = np.random.default_rng(29)
    vals = rng.integers(0, 256, (2, 3, 3), dtype=np.int64)
    img = (
        np.kron(vals, np.ones((16, 16, 1), np.int64))
        .reshape(32, 48, 3)
        .astype(np.uint8)
    )
    out = codecs.decode_jpeg(codecs.encode_jpeg(img, subsampling="420"))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3

    y, x = np.mgrid[0:37, 0:45]
    smooth = np.stack(
        [np.minimum(2 * x + y, 255), np.minimum(x + 2 * y, 255), 3 * x % 256],
        axis=2,
    ).astype(np.uint8)
    out = codecs.decode_jpeg(codecs.encode_jpeg(smooth, subsampling="420"))
    assert out.shape == smooth.shape

    # 420 bitstream advertises 2x2 luma sampling in SOF0
    b = codecs.encode_jpeg(img, subsampling="420")
    sof = b.index(b"\xff\xc0")
    assert b[sof + 11] == 0x22 and b[sof + 14] == 0x11

    import pytest

    with pytest.raises(ValueError, match="3 components"):
        codecs.encode_jpeg(img[:, :, 0].copy(), subsampling="420")


def test_jpeg_restart_intervals():
    """DRI/RSTn support: interval-coded streams round-trip at several
    interval lengths (including intervals that don't divide the MCU
    count), DC prediction resets per interval, and a tampered RST index
    raises rather than desyncing."""
    import numpy as np
    import pytest

    from big_data_toolkit_spark.multimodal import codecs

    rng = np.random.default_rng(31)
    g = rng.integers(0, 256, (40, 56), np.uint8)  # 35 MCUs
    for dri in (1, 2, 5, 7):
        b = codecs.encode_jpeg(g, dri=dri)
        assert b"\xff\xdd" in b
        out = codecs.decode_jpeg(b)
        assert np.abs(out.astype(int) - g.astype(int)).max() <= 4, dri
    c = rng.integers(0, 256, (48, 64, 3), np.uint8)
    out = codecs.decode_jpeg(
        codecs.encode_jpeg(c, subsampling="420", dri=3)
    )
    assert out.shape == c.shape

    b = bytearray(codecs.encode_jpeg(g, dri=2))
    i = b.index(b"\xff\xd0", 20)
    b[i + 1] = 0xD7
    with pytest.raises(ValueError, match="RST"):
        codecs.decode_jpeg(bytes(b))


def test_audio_spectral_features_numpy_replica(spark):
    """Independent replica: regenerate each asset's PCM from the closed
    form (never touching the operator's decode path), FFT it with the
    same quantization discipline, and require exact equality — plus the
    map-only plan assert every codec scan carries."""
    import numpy as np

    df = mm.QUERIES["audio_spectral_features"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"audio_spectral_features shuffles: {plan}"
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows
    N = mm.AUDIO_FFT_N
    for d, r in rows.items():
        i = np.arange(N, dtype=np.int64)
        x = ((d * 7919 + i * 31) % 65536 - 32768).astype(np.float64)
        rate = 16000 if d % 2 == 0 else 8000
        mag_q = np.floor(np.abs(np.fft.rfft(x))[1:] + 0.5).astype(np.int64)
        k = np.arange(1, len(mag_q) + 1, dtype=np.int64)
        centroid = int(rate) * int((k * mag_q).sum()) / (N * int(mag_q.sum()))
        rms = float(np.sqrt(int((x.astype(np.int64) ** 2).sum()) / N))
        assert r["sample_rate"] == rate and r["n_fft"] == N, d
        assert r["spectral_centroid_hz"] == centroid, d
        assert r["rms"] == rms, d


def test_audio_spectral_quantization_margin(spark):
    """The cross-engine safety property: every quantized magnitude must sit
    FAR from its rounding boundary relative to float-summation drift (the
    naive-DFT-vs-FFT difference is ~1e-7; require > 1e-4 margin so the
    oracle can never flip a tick on this fixture)."""
    import numpy as np
    from pyspark.sql import functions as F

    from big_data_toolkit_spark.catalog import load_table

    doc_ids = [
        r["doc_id"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .where((F.col("doc_id") % 3) == 1)
        .select("doc_id")
        .collect()
    ]
    assert doc_ids
    N = mm.AUDIO_FFT_N
    worst = 0.5
    for d in doc_ids:
        i = np.arange(N, dtype=np.int64)
        x = ((d * 7919 + i * 31) % 65536 - 32768).astype(np.float64)
        mag = np.abs(np.fft.rfft(x))[1:]
        f = (mag + 0.5) - np.floor(mag + 0.5)  # flips when this crosses 0/1
        margin = np.minimum(f, 1.0 - f)
        worst = min(worst, float(margin.min()))
    assert worst > 1e-4, worst
