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
* the actual codec calls are STUBBED here (image/audio libs are not in this
  container): ``fake_decode_features`` derives deterministic per-byte
  histogram "features", and real decoders drop into the same batch signature.

TESTDATA has no binary table, so ``assets`` derives one deterministically
from ``documents`` (payload = UTF-8 bytes of text, media_type cycled by
doc_id) — the plumbing (schemas, batch shapes, partition behavior) is real
and tested; only the codec is fake.
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


def decode_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode STUB — raises, documenting the missing-codec boundary."""
    raise NotImplementedError(
        "audio codecs not available in this environment; implement with "
        "soundfile/librosa inside a mapInPandas with the same batch signature "
        "as fake_decode_features"
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

QUERIES = {
    "multimodal_meta": multimodal_meta,
    "image_features": image_features_checked,
    "video_frame_sample": frame_sample_checked,
}
