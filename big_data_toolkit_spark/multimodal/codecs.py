"""Pure-stdlib media codecs: REAL container/bitstream encode + decode.

This container ships no media libraries (no PIL/cv2/soundfile), but real
codecs are still possible from the standard library alone:

* WAV — genuine RIFF/WAVE PCM16 containers written and parsed with the
  stdlib ``wave`` module (actual chunk headers, actual interleaved PCM
  frames), not a byte-histogram stand-in.
* PNG — a genuine PNG encoder/decoder over ``struct`` + ``zlib``:
  signature, IHDR/IDAT/IEND chunks with CRC32, DEFLATE-compressed
  scanlines, and ALL FIVE row filters (None/Sub/Up/Average/Paeth) on both
  sides. The encoder cycles filter types per row precisely so the decoder's
  unfilter paths are all exercised by round-trip tests.

A format needing an external codec (JPEG, MP3, H.264 keyframes) drops into
the same ``mapInPandas`` batch signature in ``binary_ops`` with
``PIL.Image.open`` / ``soundfile.read`` replacing these functions — the
Spark-side plumbing is identical.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE, PCM16)
# ---------------------------------------------------------------------------


def encode_wav_pcm16(
    samples: np.ndarray, sample_rate: int, n_channels: int = 1
) -> bytes:
    """int16 samples (interleaved if multi-channel) → RIFF/WAVE bytes."""
    if samples.dtype != np.int16:
        raise ValueError(f"samples must be int16, got {samples.dtype}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE bytes → (sample_rate, n_channels, int16 sample array)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(f"only PCM16 supported, width={w.getsampwidth()}")
        rate = w.getframerate()
        channels = w.getnchannels()
        frames = w.readframes(w.getnframes())
    return rate, channels, np.frombuffer(frames, dtype=np.int16)


# ---------------------------------------------------------------------------
# PNG (8-bit RGB, non-interlaced)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png_rgb8(pixels: np.ndarray) -> bytes:
    """HxWx3 uint8 array → PNG bytes; row filter type cycles row % 5 so
    every filter (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth) appears."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("need HxWx3 uint8")
    h, w, _ = pixels.shape
    bpp = 3
    raw = pixels.astype(np.int32)
    lines = bytearray()
    prior = np.zeros((w, 3), dtype=np.int32)
    for y in range(h):
        row = raw[y]
        ftype = y % 5
        if ftype == 0:
            filt = row
        elif ftype == 1:  # Sub
            left = np.vstack([np.zeros((1, 3), np.int32), row[:-1]])
            filt = row - left
        elif ftype == 2:  # Up
            filt = row - prior
        elif ftype == 3:  # Average
            left = np.vstack([np.zeros((1, 3), np.int32), row[:-1]])
            filt = row - (left + prior) // 2
        else:  # Paeth
            filt = np.empty_like(row)
            for x in range(w):
                for c in range(bpp):
                    a = int(row[x - 1, c]) if x > 0 else 0
                    b = int(prior[x, c])
                    cc = int(prior[x - 1, c]) if x > 0 else 0
                    filt[x, c] = int(row[x, c]) - _paeth(a, b, cc)
        lines.append(ftype)
        lines.extend((filt % 256).astype(np.uint8).tobytes())
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → HxWxC uint8 array. Real parse: signature, chunk walk
    with CRC verification, IHDR, concatenated-IDAT inflate, and all five
    unfilters. Supports 8-bit grayscale (0), RGB (2), RGBA (6),
    non-interlaced — the shapes the encoder above and common tools emit."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0:
        raise ValueError(f"unsupported PNG: depth={depth} interlace={interlace}")
    channels = {0: 1, 2: 3, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color}")
    data = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(data) != h * (stride + 1):
        raise ValueError("PNG scanline payload has wrong length")
    out = np.zeros((h, stride), dtype=np.int32)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = data[y * (stride + 1)]
        row = np.frombuffer(
            data[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], dtype=np.uint8
        ).astype(np.int32)
        if ftype == 0:
            recon = row
        elif ftype == 1:  # Sub
            recon = row.copy()
            for x in range(channels, stride):
                recon[x] = (recon[x] + recon[x - channels]) % 256
        elif ftype == 2:  # Up
            recon = (row + prior) % 256
        elif ftype == 3:  # Average
            recon = row.copy()
            for x in range(stride):
                a = recon[x - channels] if x >= channels else 0
                recon[x] = (recon[x] + (a + prior[x]) // 2) % 256
        elif ftype == 4:  # Paeth
            recon = row.copy()
            for x in range(stride):
                a = int(recon[x - channels]) if x >= channels else 0
                b = int(prior[x])
                c = int(prior[x - channels]) if x >= channels else 0
                recon[x] = (recon[x] + _paeth(a, b, c)) % 256
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = recon
        prior = recon
    return out.reshape(h, w, channels).astype(np.uint8)
