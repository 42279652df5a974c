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
* JPEG — a baseline ITU-T T.81 encoder/decoder over ``struct`` + numpy:
  real marker structure, DQT/DHT tables written to and read back from the
  stream, canonical Huffman entropy coding with byte stuffing, and the 8x8
  DCT via an orthonormal matrix product. Grayscale and 4:4:4 RGB (YCbCr).

A format still needing an external codec (MP3, H.264 keyframes) drops into
the same ``mapInPandas`` batch signature in ``binary_ops`` with
``soundfile.read`` / pyav replacing these functions — the Spark-side
plumbing is identical.
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


# ---------------------------------------------------------------------------
# JPEG (baseline DCT / SOF0, Huffman, grayscale or 4:4:4 YCbCr)
# ---------------------------------------------------------------------------
# A genuine ITU-T T.81 baseline bitstream from the stdlib + numpy alone:
# real markers (SOI/DQT/SOF0/DHT/SOS/EOI), real canonical Huffman entropy
# coding with 0xFF byte stuffing, real 8x8 DCT-II via an orthonormal matrix
# product. The Huffman tables are OUR OWN canonical tables (12 DC symbols
# at 4 bits, all 162 AC run/size symbols at 8 bits) — legal per the spec,
# written into DHT and READ BACK by the decoder, so the two sides are
# decoupled exactly as with foreign files; compression is modest but the
# bitstream is conformant. JPEG is lossy in general, but a block-constant
# image under unit quantization tables is DC-only and round-trips EXACTLY —
# which is what keeps `image_jpeg_features` DuckDB-oracle-checkable.

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Canonical table specs: (bits[1..16], symbol order). DC: sizes 0..11 all
# at length 4 (16 slots, all-ones code unused). AC: EOB, ZRL, then every
# (run, size) pair, all at length 8 (256 slots, 162 used).
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]
_AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]

_UNIT_QT = np.ones(64, dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix C: coef = C @ block @ C.T."""
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c[0, :] = 1.0
    return c * np.where(k[:, None] == 0, np.sqrt(1 / 8), np.sqrt(2 / 8))


_DCT_C = _dct_matrix()


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical code assignment (T.81 C.2): symbol -> (code, length)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s (spec F.1.2.3)


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(
    w: _BitWriter,
    block: np.ndarray,
    qt: np.ndarray,
    pred: int,
    dc: dict[int, tuple[int, int]],
    ac: dict[int, tuple[int, int]],
) -> int:
    coef = _DCT_C @ (block.astype(np.float64) - 128.0) @ _DCT_C.T
    q = np.round(coef.reshape(64)[_ZIGZAG] / qt).astype(np.int64)
    diff = int(q[0]) - pred
    s = _size_cat(diff)
    w.write(dc[s][0], dc[s][1])
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(q[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            w.write(ac[0xF0][0], ac[0xF0][1])
            run -= 16
        s = _size_cat(v)
        sym = (run << 4) | s
        w.write(ac[sym][0], ac[sym][1])
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        w.write(ac[0x00][0], ac[0x00][1])
    return int(q[0])


def encode_jpeg(
    pixels: np.ndarray,
    qt: np.ndarray | None = None,
    subsampling: str = "444",
    dri: int = 0,
) -> bytes:
    """HxW (grayscale) or HxWx3 (RGB) uint8 -> baseline JPEG bytes.

    Dimensions are padded by edge replication (decoder crops back). RGB
    converts to YCbCr (JFIF/BT.601); ``subsampling`` is ``"444"`` (every
    component full-resolution, 1x1 sampling) or ``"420"`` (RGB only: luma
    2x2, chroma 2x2-mean-downsampled — the layout nearly every camera and
    web encoder emits). ``qt``: 64 quantization divisors in zigzag order
    (default all-ones — near-lossless, and EXACTLY lossless for
    block-constant grayscale). ``dri``: restart interval in MCUs (0 =
    none) — emits a DRI segment and RST0-7 markers with per-interval DC
    prediction resets, the error-resilience layout camera files use."""
    qt = _UNIT_QT if qt is None else np.asarray(qt, dtype=np.int64)
    if pixels.dtype != np.uint8:
        raise ValueError(f"pixels must be uint8, got {pixels.dtype}")
    gray = pixels.ndim == 2
    if not gray and (pixels.ndim != 3 or pixels.shape[2] != 3):
        raise ValueError(f"expected HxW or HxWx3, got {pixels.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if subsampling == "420" and gray:
        raise ValueError("420 subsampling needs 3 components")
    h, w_ = pixels.shape[:2]
    if gray:
        planes = [pixels.astype(np.float64)]
    else:
        r, g, b = (pixels[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    ncomp = len(planes)
    # per-component sampling factors (h_i, v_i)
    samp = (
        [(2, 2), (1, 1), (1, 1)]
        if subsampling == "420" and not gray
        else [(1, 1)] * ncomp
    )
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w_ // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comp_planes = []
    for (hi, vi), plane in zip(samp, planes):
        if (hi, vi) != (hmax, vmax):
            # pad full-res to even dims, then 2x2 mean downsample
            fh, fw = -(-h // 2) * 2, -(-w_ // 2) * 2
            p = np.pad(plane, ((0, fh - h), (0, fw - w_)), mode="edge")
            plane = (
                p.reshape(fh // 2, 2, fw // 2, 2).mean(axis=(1, 3))
            )
        th, tw = mcuy * 8 * vi, mcux * 8 * hi  # padded plane dims
        ch, cw = plane.shape
        plane = np.pad(plane, ((0, th - ch), (0, tw - cw)), mode="edge")
        comp_planes.append(np.clip(np.round(plane), 0, 255))

    dc, ac = _huff_codes(_DC_BITS, _DC_VALS), _huff_codes(_AC_BITS, _AC_VALS)
    out = bytearray(b"\xff\xd8")  # SOI
    # DQT: Lq=67, Pq/Tq=0, 64 divisors in zigzag order. Divisors above
    # 255 would need a 16-bit table (Pq=1), which this baseline encoder
    # (and the decoder) doesn't emit — fail loud rather than emit a
    # silently truncated corrupt-but-parseable table.
    if any(not 1 <= int(x) <= 255 for x in qt):
        raise ValueError("quantization divisors must be in 1..255")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(x) for x in qt
    )
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    # SOF0 carries the TRUE dimensions; the decoder re-derives the padding
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w_, ncomp)
    for cid in range(1, ncomp + 1):
        hi, vi = samp[cid - 1]
        out += struct.pack(">BBB", cid, (hi << 4) | vi, 0)
    for cls, bits, vals in ((0, _DC_BITS, _DC_VALS), (1, _AC_BITS, _AC_VALS)):
        out += (
            b"\xff\xc4"
            + struct.pack(">HB", 19 + len(vals), cls << 4)
            + bytes(bits)
            + bytes(vals)
        )
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid in range(1, ncomp + 1):
        out += struct.pack(">BB", cid, 0x00)  # DC table 0, AC table 0
    out += b"\x00\x3f\x00"  # Ss=0, Se=63, Ah/Al=0
    bw = _BitWriter()
    preds = [0] * ncomp
    mcu_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_n and mcu_n % dri == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (mcu_n // dri - 1) % 8])
                preds = [0] * ncomp
            mcu_n += 1
            for ci, ((hi, vi), comp) in enumerate(zip(samp, comp_planes)):
                for j in range(vi):
                    for i in range(hi):
                        y0 = (my * vi + j) * 8
                        x0 = (mx * hi + i) * 8
                        block = comp[y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(
                            bw, block, qt, preds[ci], dc, ac
                        )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG scan")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG scan")
                marker = self.data[self.pos]
                if marker == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(
                        f"unexpected marker 0xFF{marker:02X} inside scan"
                    )
            self.acc = byte
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, count: int) -> int:
        v = 0
        for _ in range(count):
            v = (v << 1) | self.read_bit()
        return v

    def read_restart(self, expect_n: int) -> None:
        """Byte-align and consume the RSTn marker (T.81 E.1.2)."""
        self.n = 0  # discard pad bits
        if self.pos + 1 >= len(self.data):
            raise ValueError("truncated JPEG scan")
        b0, b1 = self.data[self.pos], self.data[self.pos + 1]
        if b0 != 0xFF or b1 != 0xD0 + expect_n:
            raise ValueError(
                f"expected RST{expect_n} marker, got 0x{b0:02X}{b1:02X}"
            )
        self.pos += 2


def _huff_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, from a DHT's canonical spec."""
    enc = _huff_codes(bits, vals)
    return {(length, code): sym for sym, (code, length) in enc.items()}


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: size-bit magnitude -> signed value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> HxW (grayscale) or HxWx3 (RGB) uint8.

    Real parse: marker walk, DQT/DHT tables read FROM THE STREAM (not
    assumed), SOF0 with 1x1 sampling (grayscale or 4:4:4) or the standard
    4:2:0 layout (luma 2x2, chroma 1x1 — nearest-neighbor chroma
    upsample), Huffman + DC prediction + EXTEND, dequantize, de-zigzag,
    IDCT, level shift, crop to the SOF dimensions, YCbCr->RGB for 3
    components. Restart-interval streams are decoded (DRI segment +
    RST0-7 markers with per-interval DC prediction resets); progressive,
    arithmetic, and exotic sampling grids raise."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    sof = None
    dri = 0  # restart interval in MCUs (0 = none)
    comps: list[tuple[int, int, int]] = []  # (id, sampling, qtable)
    scan: list[tuple[int, int, int]] = []  # (comp_idx, dc_tab, ac_tab)
    br = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly multiple tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qts[tq] = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int64)
                i += 65
        elif marker == 0xC4:  # DHT (possibly multiple tables)
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                (dc_tabs if cls == 0 else ac_tabs)[tid] = _huff_decode_map(
                    bits, vals
                )
                i += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w_, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise ValueError(f"unsupported precision {precision}")
            for c in range(ncomp):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                if samp not in (0x11, 0x22):
                    raise ValueError(
                        f"sampling factor 0x{samp:02X} unsupported "
                        "(1x1 and 2x2 only)"
                    )
                comps.append((cid, samp, tq))
            sampset = {s for _, s, _ in comps}
            if 0x22 in sampset and (
                comps[0][1] != 0x22 or sampset - {0x11, 0x22}
                or any(s != 0x11 for _, s, _ in comps[1:])
            ):
                raise ValueError("only 4:4:4 or standard 4:2:0 supported")
            sof = (h, w_, ncomp)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise ValueError(f"non-baseline SOF 0xFF{marker:02X} unsupported")
        elif marker == 0xDD:  # DRI: restart interval in MCUs
            (dri,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                ci = next(
                    i for i, (id_, _, _) in enumerate(comps) if id_ == cid
                )
                scan.append((ci, tabs >> 4, tabs & 0xF))
            br = _BitReader(payload, pos + 2 + seg_len)
            break
        pos += 2 + seg_len
    if sof is None or br is None:
        raise ValueError("JPEG missing SOF0/SOS")
    h, w_, ncomp = sof
    samp = [((s >> 4) & 0xF, s & 0xF) for _, s, _ in comps]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w_ // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * 8 * vi, mcux * 8 * hi), dtype=np.float64)
        for hi, vi in samp
    ]
    preds = [0] * ncomp
    mcu_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_n and mcu_n % dri == 0:
                br.read_restart((mcu_n // dri - 1) % 8)
                preds = [0] * ncomp  # DC prediction resets per interval
            mcu_n += 1
            for ci, dct_id, act_id in scan:
                hi, vi = samp[ci]
                qt = qts[comps[ci][2]]
                for j in range(vi):
                    for i in range(hi):
                        s = _read_symbol(br, dc_tabs[dct_id])
                        diff = _extend(br.read_bits(s), s) if s else 0
                        preds[ci] += diff
                        zz = np.zeros(64, dtype=np.int64)
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = _read_symbol(br, ac_tabs[act_id])
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            run, size = sym >> 4, sym & 0xF
                            k += run
                            if k > 63:
                                raise ValueError("AC run past end of block")
                            zz[k] = _extend(br.read_bits(size), size)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[_ZIGZAG] = zz * qt
                        block = _DCT_C.T @ coef.reshape(8, 8) @ _DCT_C
                        y0 = (my * vi + j) * 8
                        x0 = (mx * hi + i) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    # upsample subsampled components to full resolution, then crop
    full = []
    for (hi, vi), p in zip(samp, planes):
        if (hi, vi) != (hmax, vmax):
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w_] + 128.0)
    planes = full
    if ncomp == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if ncomp != 3:
        raise ValueError(f"unsupported component count {ncomp}")
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
