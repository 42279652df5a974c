"""Multimodal column plumbing: opaque binary payloads + typed metadata, with
Arrow-batched decode/feature/frame-sample operators.

Not in the reference; part of the engine's LLM-pipeline surface. The design
principle for 100 TB of images/audio/video interleaved with text:

* media lives in **binary columns** with a typed metadata struct alongside
  (media_type, byte_len, checksum) — parquet stores the blobs page-compressed
  and the metadata columns remain prunable/filterable without touching
  payload bytes (predicate pushdown on ``media_type``/``byte_len`` skips
  whole row groups of blobs);
* decode / feature-extraction runs in ``mapInPandas`` — Arrow moves the
  binary batches to Python zero-copy, the decode library runs per batch, and
  the result is a normal columnar DataFrame again. Partitioning is inherited
  from the scan, so the decode scales exactly like the scan does;
* codecs: REAL where the stdlib allows it — ``audio_wav_features``
  writes and parses genuine RIFF/WAVE PCM16 containers,
  ``image_png_features`` a genuine PNG bitstream (CRC'd chunks, DEFLATE,
  all five row filters), and ``image_jpeg_features`` (r9) a genuine
  baseline JPEG bitstream (DQT/DHT/SOF0/SOS markers, canonical Huffman,
  8x8 DCT), all via ``multimodal/codecs.py``, all with exact closed-form
  DuckDB oracles over the deterministic encode parameters (JPEG's assets
  are block-constant under unit quantization, which is DC-only and
  round-trips exactly). Formats whose codecs genuinely aren't in this
  container (MP3/H.264) keep the STUB path: ``fake_decode_features``
  derives deterministic per-byte histogram "features", and soundfile/pyav
  drop into the same batch signatures.

TESTDATA has no binary table, so ``assets`` derives one deterministically
from ``documents`` (payload = UTF-8 bytes of text, media_type cycled by
doc_id), and the codec paths synthesize real WAV/PNG payloads from
doc_id — the plumbing (schemas, batch shapes, partition behavior) AND the
WAV/PNG codecs are real and oracle-checked end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_toolkit_spark.catalog import load_table

MEDIA_TYPES = ("image", "audio", "video")
N_FEATURES = 16  # fake feature dim: byte-value histogram mod 16
FRAME_CHUNK = 64  # bytes per fake "frame"
FRAME_STRIDE = 4  # sample every 4th frame


def assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the multimodal assets table: (doc_id, media_type, payload, meta)."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(m) for m in MEDIA_TYPES]),
            (F.col("doc_id") % len(MEDIA_TYPES) + 1).cast("int"),
        ).alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("byte_len"),
            F.md5(payload).alias("checksum"),
        ).alias("meta"),
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only projection — runs without touching payload bytes.

    (doc_id, media_type, byte_len, checksum); the plan must show payload
    pruned away (tests assert no shuffle and the narrow ReadSchema).
    """
    a = assets(spark, sf_dir)
    return a.select(
        "doc_id",
        "media_type",
        F.col("meta.byte_len").alias("byte_len"),
        F.col("meta.checksum").alias("checksum"),
    )


def fake_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STUB decode: deterministic byte-histogram features per image asset.

    Real plumbing / fake codec: the ``mapInPandas`` batch signature, output
    schema (``array<double>`` feature column), and partition inheritance are
    exactly what a real image decoder uses — swap the histogram for
    ``PIL.Image.open(io.BytesIO(b))`` + model inference and nothing else
    changes. Deterministic, so driver rows-checks are stable.
    """
    imgs = assets(spark, sf_dir).where(F.col("media_type") == "image")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(arr % N_FEATURES, minlength=N_FEATURES)
                total = max(len(arr), 1)
                feats.append((hist / total).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    # Rounding happens JVM-side, not in numpy: numpy rounds ties half-to-even
    # while SQL round() is half-up, and the cross-engine oracle needs the two
    # sides to agree at exact .5 boundaries (byte_len is occasionally a power
    # of two, where histogram ratios terminate right at a tie).
    return imgs.mapInPandas(
        decode, schema="doc_id long, features array<double>"
    ).select(
        "doc_id",
        F.transform("features", lambda x: F.round(x, 6)).alias("features"),
    )


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STUB frame sampler: every FRAME_STRIDE-th FRAME_CHUNK-byte slice of
    each video payload → (doc_id, frame_idx, frame_bytes).

    Stands in for keyframe extraction; the fan-out shape (one input row →
    many frame rows, still map-only) is the real thing.
    """
    vids = assets(spark, sf_dir).where(F.col("media_type") == "video")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_bytes = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(b)
                n_frames = (len(data) + FRAME_CHUNK - 1) // FRAME_CHUNK
                for i in range(0, n_frames, FRAME_STRIDE):
                    out_id.append(doc_id)
                    out_idx.append(i)
                    out_bytes.append(data[i * FRAME_CHUNK : (i + 1) * FRAME_CHUNK])
            yield pd.DataFrame(
                {"doc_id": out_id, "frame_idx": out_idx, "frame_bytes": out_bytes}
            )

    return vids.mapInPandas(
        sample, schema="doc_id long, frame_idx int, frame_bytes binary"
    )


def image_features_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable long form of ``fake_decode_features``.

    The driver's canonicalizer cannot sort list-valued cells (``array<double>``
    collects as a Python list → unhashable), so the gate sees the exploded
    ``(doc_id, feature_idx, value)`` form — same decode path, same values,
    scalar columns. The array form stays registered for pytest
    (``test_image_features_oracle_parity``).
    """
    return fake_decode_features(spark, sf_dir).select(
        "doc_id", F.posexplode("features").alias("feature_idx", "value")
    )


def frame_sample_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable view of ``frame_sample``: frames decoded to UTF-8.

    The binary column collects as ``bytearray`` in Spark but ``bytes`` from
    DuckDB, so the oracle compares the decoded text instead (TESTDATA text
    is pure ASCII — asserted in tests — so bytes == characters). The real
    mapInPandas fan-out path runs unchanged underneath.
    """
    return frame_sample(spark, sf_dir).select(
        "doc_id", "frame_idx", F.decode("frame_bytes", "UTF-8").alias("frame_text")
    )


# ---------------------------------------------------------------------------
# REAL codecs (r8): stdlib-only WAV and PNG paths — actual containers,
# actual bitstreams, decoded back inside mapInPandas. The encode parameters
# are deterministic functions of doc_id, so the decoded features have EXACT
# integer DuckDB oracles: the whole encode→container-bytes→decode loop is
# driver-hash-checkable. Formats needing external codecs (MP3/H.264)
# drop into the same batch signatures with soundfile/pyav swapped in.
# ---------------------------------------------------------------------------

WAV_BASE_SAMPLES = 256  # n_samples = WAV_BASE_SAMPLES + doc_id % WAV_MOD_SAMPLES
WAV_MOD_SAMPLES = 512
PNG_BASE_W, PNG_MOD_W = 4, 13  # width  = 4 + doc_id % 13
PNG_BASE_H, PNG_MOD_H = 4, 11  # height = 4 + doc_id % 11
# JPEG assets: dims are BLOCK counts (x8 pixels) and content is constant per
# 8x8 block — DC-only under the encoder's unit quantization tables, so the
# lossy format round-trips exactly and the oracle stays closed-form.
JPEG_BASE_BW, JPEG_MOD_BW = 2, 4  # width  = 8 * (2 + doc_id % 4)
JPEG_BASE_BH, JPEG_MOD_BH = 2, 3  # height = 8 * (2 + doc_id % 3)


def wav_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, payload): genuine RIFF/WAVE PCM16 containers for the audio
    slice of the corpus (``doc_id % 3 == 1``, matching ``assets``'s cycle).

    Sample i of doc d is ``((d*7919 + i*31) % 65536) - 32768`` (int16),
    rate 16 kHz for even d / 8 kHz for odd, mono — every byte of the
    payload is a deterministic function of doc_id, written through the
    stdlib ``wave`` encoder (real fmt/data chunks, not synthetic bytes).
    Map-only: partitioning inherited from the pruned documents scan.
    """
    from big_data_toolkit_spark.multimodal.codecs import encode_wav_pcm16

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 3 == 1)
        .select("doc_id")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = WAV_BASE_SAMPLES + d % WAV_MOD_SAMPLES
                i = np.arange(n, dtype=np.int64)
                samples = ((d * 7919 + i * 31) % 65536 - 32768).astype(np.int16)
                rate = 16000 if d % 2 == 0 else 8000
                payloads.append(encode_wav_pcm16(samples, rate))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.mapInPandas(gen, schema="doc_id long, payload binary")


def audio_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sample_rate, n_channels, n_samples, abs_sum): REAL WAV
    decode — parses the RIFF container back through the stdlib ``wave``
    reader and aggregates the PCM samples. ``abs_sum`` (Σ|sample|, BIGINT)
    is addition-order-independent, so the result is exact and
    oracle-checkable end to end: the driver row certifies encode, the
    container bytes, AND decode agree with closed-form SQL.

    Replaces the r7 ``decode_audio`` NotImplementedError stub — the codec
    boundary is now real for PCM WAV; compressed formats still need
    soundfile/librosa in the same batch signature.
    """
    from big_data_toolkit_spark.multimodal.codecs import decode_wav

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "sample_rate": [], "n_channels": [],
                   "n_samples": [], "abs_sum": []}
            for d, b in zip(pdf["doc_id"], pdf["payload"]):
                rate, channels, samples = decode_wav(bytes(b))
                out["doc_id"].append(d)
                out["sample_rate"].append(rate)
                out["n_channels"].append(channels)
                out["n_samples"].append(len(samples))
                out["abs_sum"].append(int(np.abs(samples.astype(np.int64)).sum()))
            yield pd.DataFrame(out)

    return wav_assets(spark, sf_dir).mapInPandas(
        feats,
        schema="doc_id long, sample_rate int, n_channels int, "
        "n_samples long, abs_sum long",
    )


AUDIO_FFT_N = 256  # analysis frame: the first N PCM samples (>= BASE_SAMPLES)


def audio_spectral_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sample_rate, n_fft, spectral_centroid_hz, rms): FFT-based
    SIGNAL features over the decoded WAV PCM — upgrades the audio column
    story from container parsing (``audio_wav_features``) to spectral
    analysis, in the same Arrow ``mapInPandas`` batch signature.

    Per asset: decode the RIFF container, take the first ``AUDIO_FFT_N``
    samples as the analysis frame, ``np.fft.rfft`` it, and quantize the
    non-DC magnitude spectrum to unit integers (|X_k| is O(1e5) here, so
    unit ticks keep ~5 significant digits while eliminating cross-engine
    float-summation drift — the ``label_centroids`` fixed-point
    discipline applied to a spectrum). The spectral centroid is then a
    RATIO OF EXACT BIGINTs scaled by rate/N — one float division, bit-
    identical in both engines — and the RMS is sqrt of an exact integer
    sum over an exact power-of-two divisor. The DuckDB oracle recomputes
    the same spectrum from the closed-form sample formula with a naive
    O(N²) DFT (cos/sin sums) — a green row certifies the encoder, the
    container bytes, the decoder, AND the FFT agree across two completely
    different transform algorithms. Map-only plan, like every codec scan.
    """
    return spectral_features_of(wav_assets(spark, sf_dir))


SPECTRAL_SCHEMA = (
    "doc_id long, sample_rate int, n_fft int, "
    "spectral_centroid_hz double, rms double"
)


def spectral_features_of(payloads: DataFrame) -> DataFrame:
    """The decode→FFT→features projection over any (doc_id, payload)
    frame — batch AND streaming (``mapInPandas`` is stream-safe: pure
    per-batch projection, no state), so an audio ingest stream computes
    features per micro-batch with this exact code path
    (replay-tested == the batch query in tests/test_streaming_ext)."""
    from big_data_toolkit_spark.multimodal.codecs import decode_wav

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "sample_rate": [], "n_fft": [],
                   "spectral_centroid_hz": [], "rms": []}
            for d, b in zip(pdf["doc_id"], pdf["payload"]):
                rate, _channels, samples = decode_wav(bytes(b))
                frame = samples[:AUDIO_FFT_N].astype(np.float64)
                mag = np.abs(np.fft.rfft(frame))[1:]  # bins 1..N/2
                mag_q = np.floor(mag + 0.5).astype(np.int64)
                k = np.arange(1, len(mag_q) + 1, dtype=np.int64)
                num = int(rate) * int((k * mag_q).sum())
                den = AUDIO_FFT_N * int(mag_q.sum())
                # UNROUNDED emission: num/den are exact ints < 2^53, so
                # the single division is bit-identical to the oracle's;
                # any round-6 here would have to match the oracle's
                # rounding mode exactly (Python's is banker's, DuckDB's
                # is binary-based, Spark's is shortest-repr HALF_UP —
                # all three disagree on exact .5-at-7th-decimal values)
                centroid = num / den if den else 0.0
                sq = int((frame.astype(np.int64) ** 2).sum())
                out["doc_id"].append(d)
                out["sample_rate"].append(rate)
                out["n_fft"].append(AUDIO_FFT_N)
                out["spectral_centroid_hz"].append(centroid)
                out["rms"].append(float(np.sqrt(sq / AUDIO_FFT_N)))
            yield pd.DataFrame(out)

    return payloads.mapInPandas(feats, schema=SPECTRAL_SCHEMA)


def png_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, payload): genuine PNG files (signature, CRC'd IHDR/IDAT/
    IEND, DEFLATE scanlines, row filters cycling None/Sub/Up/Average/Paeth)
    for the image slice (``doc_id % 3 == 0``). Pixel k (row-major flat
    RGB index) of doc d is ``(d*31 + k) % 256``; width ``4 + d % 13``,
    height ``4 + d % 11``."""
    from big_data_toolkit_spark.multimodal.codecs import encode_png_rgb8

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 3 == 0)
        .select("doc_id")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w = PNG_BASE_W + d % PNG_MOD_W
                h = PNG_BASE_H + d % PNG_MOD_H
                k = np.arange(h * w * 3, dtype=np.int64)
                px = ((d * 31 + k) % 256).astype(np.uint8).reshape(h, w, 3)
                payloads.append(encode_png_rgb8(px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.mapInPandas(gen, schema="doc_id long, payload binary")


def image_png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, width, height, channels, pixel_sum): REAL PNG decode — CRC
    check, inflate, all-five-unfilter reconstruction — then exact integer
    pixel aggregation. Oracle-checkable end to end like the WAV path."""
    from big_data_toolkit_spark.multimodal.codecs import decode_png

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "channels": [],
                   "pixel_sum": []}
            for d, b in zip(pdf["doc_id"], pdf["payload"]):
                px = decode_png(bytes(b))
                out["doc_id"].append(d)
                out["height"].append(px.shape[0])
                out["width"].append(px.shape[1])
                out["channels"].append(px.shape[2])
                out["pixel_sum"].append(int(px.astype(np.int64).sum()))
            yield pd.DataFrame(out)

    return png_assets(spark, sf_dir).mapInPandas(
        feats,
        schema="doc_id long, width int, height int, channels int, "
        "pixel_sum long",
    )


def jpeg_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, payload): genuine baseline JPEG files (SOI/DQT/SOF0/DHT/SOS
    markers, canonical Huffman scan with byte stuffing) for the image slice
    (``doc_id % 3 == 0``). Content is grayscale, CONSTANT per 8x8 block:
    block t (row-major) of doc d has value ``(d * 31 + t) % 256``; width
    ``8*(2 + d % 4)``, height ``8*(2 + d % 3)``. DC-only blocks under the
    default unit quantization tables round-trip exactly (the property that
    makes a lossy format oracle-checkable)."""
    from big_data_toolkit_spark.multimodal.codecs import encode_jpeg

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 3 == 0)
        .select("doc_id")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                bw = JPEG_BASE_BW + d % JPEG_MOD_BW
                bh = JPEG_BASE_BH + d % JPEG_MOD_BH
                t = np.arange(bh * bw, dtype=np.int64).reshape(bh, bw)
                vals = (d * 31 + t) % 256
                px = np.kron(vals, np.ones((8, 8), dtype=np.int64)).astype(
                    np.uint8
                )
                payloads.append(encode_jpeg(px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.mapInPandas(gen, schema="doc_id long, payload binary")


def image_jpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, width, height, n_components, pixel_sum): REAL baseline JPEG
    decode — marker walk, DQT/DHT read from the stream, Huffman + DC
    prediction, dequantize, IDCT — then exact integer pixel aggregation
    (exact because the assets are DC-only; see ``jpeg_assets``)."""
    from big_data_toolkit_spark.multimodal.codecs import decode_jpeg

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [],
                   "n_components": [], "pixel_sum": []}
            for d, b in zip(pdf["doc_id"], pdf["payload"]):
                px = decode_jpeg(bytes(b))
                out["doc_id"].append(d)
                out["height"].append(px.shape[0])
                out["width"].append(px.shape[1])
                out["n_components"].append(
                    1 if px.ndim == 2 else px.shape[2]
                )
                out["pixel_sum"].append(int(px.astype(np.int64).sum()))
            yield pd.DataFrame(out)

    return jpeg_assets(spark, sf_dir).mapInPandas(
        feats,
        schema="doc_id long, width int, height int, n_components int, "
        "pixel_sum long",
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL (metadata path only — codecs are stubbed)
# ---------------------------------------------------------------------------

ORACLE_SQL: dict[str, str] = {
    "multimodal_meta": """
        SELECT doc_id,
               ['image','audio','video'][(doc_id % 3 + 1)::INT] AS media_type,
               octet_length(encode(text)) AS byte_len,
               md5(text) AS checksum
        FROM documents
    """,
    # Valid because TESTDATA documents.text is pure ASCII (asserted in
    # tests): UTF-8 payload bytes == character codes, so the byte histogram
    # is computable from ord() per character. The fake codec is thereby
    # SQL-expressible even though the Spark side runs the real
    # mapInPandas/Arrow decode path. Long (doc_id, feature_idx, value) form —
    # scalar cells only, so the driver canonicalizer can sort them.
    "image_features": f"""
        WITH img AS (
          SELECT doc_id,
                 list_transform(
                   list_filter(string_split_regex(text, ''), c -> c <> ''),
                   c -> ord(c) % {N_FEATURES}) AS cs,
                 greatest(length(text), 1) AS total
          FROM documents
          WHERE doc_id % 3 = 0
        )
        SELECT doc_id,
               CAST(t.k AS INT) AS feature_idx,
               round(len(list_filter(cs, c -> c = t.k))
                     / CAST(total AS DOUBLE), 6) AS value
        FROM img, range(0, {N_FEATURES}) AS t(k)
    """,
    # Frame slices as substr over the ASCII text (bytes == characters):
    # frame i covers characters [i*CHUNK+1, (i+1)*CHUNK], every STRIDE-th
    # frame of ceil(len/CHUNK) total — mirroring the mapInPandas sampler.
    "video_frame_sample": f"""
        WITH vids AS (
          SELECT doc_id, text, length(text) AS len
          FROM documents WHERE doc_id % 3 = 2
        )
        SELECT doc_id,
               frame_idx::INT AS frame_idx,
               substr(text, frame_idx::INT * {FRAME_CHUNK} + 1, {FRAME_CHUNK})
                 AS frame_text
        FROM (
          SELECT doc_id, text,
                 unnest(range(0, CAST(ceil(len / {FRAME_CHUNK}.0) AS BIGINT),
                              {FRAME_STRIDE})) AS frame_idx
          FROM vids
        )
    """,
}

# Array-form oracle, pytest-only (driver gate uses the long form above):
# oracle_utils.compare handles list cells, the driver canonicalizer doesn't.
IMAGE_FEATURES_ARRAY_ORACLE = f"""
    WITH img AS (
      SELECT doc_id,
             list_transform(
               list_filter(string_split_regex(text, ''), c -> c <> ''),
               c -> ord(c) % {N_FEATURES}) AS cs,
             greatest(length(text), 1) AS total
      FROM documents
      WHERE doc_id % 3 = 0
    )
    SELECT doc_id,
           list_transform(range(0, {N_FEATURES}),
             k -> round(len(list_filter(cs, c -> c = k))
                        / CAST(total AS DOUBLE), 6)) AS features
    FROM img
"""

# Closed-form oracles for the REAL codec paths: every decoded feature is a
# deterministic function of doc_id, so DuckDB recomputes it without ever
# seeing the container bytes — a green row certifies the whole
# encode→container→decode loop. Sums CAST back to BIGINT (DuckDB widens).
ORACLE_SQL["audio_wav_features"] = f"""
    WITH a AS (
      SELECT doc_id, {WAV_BASE_SAMPLES} + doc_id % {WAV_MOD_SAMPLES} AS n
      FROM documents WHERE doc_id % 3 = 1
    ),
    s AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM a)
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 16000 ELSE 8000 END AS INT)
             AS sample_rate,
           CAST(1 AS INT) AS n_channels,
           CAST(n AS BIGINT) AS n_samples,
           CAST(sum(abs((doc_id * 7919 + i * 31) % 65536 - 32768)) AS BIGINT)
             AS abs_sum
    FROM s GROUP BY doc_id, n
"""

# The spectral oracle re-derives the analysis frame from the closed-form
# sample formula and runs a NAIVE O(N²) DFT (cos/sin sums) — a completely
# different transform algorithm from numpy's FFT. Magnitudes quantize to
# unit BIGINT ticks on both sides (~1e-7 cross-engine float drift vs a
# 0.5 quantization margin), after which centroid = one division of exact
# integers — bit-identical.
ORACLE_SQL["audio_spectral_features"] = f"""
    WITH a AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN 16000 ELSE 8000 END AS rate
      FROM documents WHERE doc_id % 3 = 1
    ),
    frame AS (
      SELECT doc_id, rate, i,
             CAST((doc_id * 7919 + i * 31) % 65536 - 32768 AS DOUBLE) AS x
      FROM (SELECT doc_id, rate, unnest(range(0, {AUDIO_FFT_N})) AS i FROM a)
    ),
    spec AS (
      SELECT doc_id, rate, k,
             CAST(floor(sqrt(
               pow(sum(x * cos(-2 * pi() * k * i / {AUDIO_FFT_N})), 2)
             + pow(sum(x * sin(-2 * pi() * k * i / {AUDIO_FFT_N})), 2)
             ) + 0.5) AS BIGINT) AS mag_q
      FROM frame, range(1, {AUDIO_FFT_N // 2} + 1) AS t(k)
      GROUP BY doc_id, rate, k
    ),
    cent AS (
      SELECT doc_id, rate,
             CAST(sum(k * mag_q) AS BIGINT) AS km,
             CAST(sum(mag_q) AS BIGINT) AS m
      FROM spec GROUP BY doc_id, rate
    ),
    sq AS (
      SELECT doc_id, CAST(sum(CAST(x AS BIGINT) * CAST(x AS BIGINT))
                          AS BIGINT) AS ss
      FROM frame GROUP BY doc_id
    )
    SELECT c.doc_id,
           CAST(c.rate AS INT) AS sample_rate,
           CAST({AUDIO_FFT_N} AS INT) AS n_fft,
           CASE WHEN c.m = 0 THEN 0.0
                ELSE (c.rate * c.km) / CAST({AUDIO_FFT_N} * c.m AS DOUBLE)
           END AS spectral_centroid_hz,
           sqrt(s.ss / {AUDIO_FFT_N}.0) AS rms
    FROM cent c JOIN sq s ON c.doc_id = s.doc_id
"""

ORACLE_SQL["image_png_features"] = f"""
    WITH im AS (
      SELECT doc_id,
             {PNG_BASE_W} + doc_id % {PNG_MOD_W} AS w,
             {PNG_BASE_H} + doc_id % {PNG_MOD_H} AS h
      FROM documents WHERE doc_id % 3 = 0
    ),
    px AS (SELECT doc_id, w, h, unnest(range(0, w * h * 3)) AS k FROM im)
    SELECT doc_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(3 AS INT) AS channels,
           CAST(sum((doc_id * 31 + k) % 256) AS BIGINT) AS pixel_sum
    FROM px GROUP BY doc_id, w, h
"""

ORACLE_SQL["image_jpeg_features"] = f"""
    WITH im AS (
      SELECT doc_id,
             {JPEG_BASE_BW} + doc_id % {JPEG_MOD_BW} AS bw,
             {JPEG_BASE_BH} + doc_id % {JPEG_MOD_BH} AS bh
      FROM documents WHERE doc_id % 3 = 0
    ),
    blk AS (SELECT doc_id, bw, bh, unnest(range(0, bw * bh)) AS t FROM im)
    SELECT doc_id,
           CAST(8 * bw AS INT) AS width,
           CAST(8 * bh AS INT) AS height,
           CAST(1 AS INT) AS n_components,
           CAST(sum(64 * ((doc_id * 31 + t) % 256)) AS BIGINT) AS pixel_sum
    FROM blk GROUP BY doc_id, bw, bh
"""

QUERIES = {
    "multimodal_meta": multimodal_meta,
    "image_features": image_features_checked,
    "video_frame_sample": frame_sample_checked,
    "audio_wav_features": audio_wav_features,
    "audio_spectral_features": audio_spectral_features,
    "image_png_features": image_png_features,
    "image_jpeg_features": image_jpeg_features,
}
