"""Multimodal column plumbing (training-data pipeline extension).

Images/audio/video ride through the engine as opaque ``binary`` columns
with typed metadata structs. The Spark-side machinery — schema,
partition-size-aware batching, Arrow-batched Pandas UDF signatures —
is real and tested. Decode is real for the stdlib-decodable formats:
PPM (P6), PNG, and baseline JPEG images plus PCM WAV audio go payload
→ numpy array → feature vector with no external codec
(``media_decoder`` sniffs the magic bytes); video/lossy-audio formats
(MP4/MP3) still require ffmpeg and stay behind
``real_decoder_unavailable``.

Scale notes: binary payloads dominate partition size, so callers should
keep ``spark.sql.files.maxPartitionBytes`` at/below 128 MB and avoid
wide shuffles of the payload column — derive features first, then drop
the blob before any join/agg.
"""

from __future__ import annotations

import io
import wave
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("format", StringType(), True),
    ]
)

FEATURE_DIM = 16


def default_fake_decoder(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decode+featurize kernel: folds
    the payload bytes into a FEATURE_DIM float vector. Replace with a
    real codec (PIL/librosa) where those libs exist."""
    if payload is None or len(payload) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float64)
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    pad = (-len(arr)) % FEATURE_DIM
    if pad:
        arr = np.pad(arr, (0, pad))
    return arr.reshape(-1, FEATURE_DIM).mean(axis=0) / 255.0


def real_decoder_unavailable(payload: bytes) -> np.ndarray:
    """Decode path for formats needing EXTERNAL codec libraries
    (MP4/WebM containers, MP3/WebP &c.) this container doesn't ship.
    PPM/WAV/PNG/baseline-JPEG and raw motion-JPEG video payloads decode
    for real (:func:`media_decoder`, :func:`decode_mjpeg`)."""
    raise NotImplementedError(
        "container video / lossy-audio codecs (ffmpeg/librosa) are not "
        "installed in this environment; PPM/WAV/PNG/baseline-JPEG/"
        "raw-MJPEG decode for real via media_decoder / decode_mjpeg, "
        "otherwise inject a decoder or use default_fake_decoder"
    )


# ------------------------------------------------- real codecs: PPM / WAV


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 array → binary PPM (P6, maxval 255). Stdlib-only
    writer used by tests/fixtures; any P6 produced elsewhere decodes the
    same."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8 array. Pure header parse +
    one zero-copy frombuffer; handles comment lines and any whitespace
    between header tokens per the netpbm spec."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # tokenize the header: magic, width, height, maxval — '#' starts a
    # comment running to end-of-line; a single whitespace ends the header
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # exactly one whitespace byte after maxval, then raster
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    raster = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=i)
    return raster.reshape(h, w, 3)


# --------------------------------------------- real codec: PNG (zlib)

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §9.4), vectorized over int32 lanes."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w, 3) uint8 → truecolor 8-bit PNG. Stdlib ``zlib`` + numpy —
    no codec library. ``filter_type`` applies one scanline filter
    (0 None / 1 Sub / 2 Up / 3 Average / 4 Paeth) to every row so
    decode tests can exercise each unfilter path."""
    import struct
    import zlib

    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    bpp = 3
    rows = img.reshape(h, w * bpp).astype(np.int32)
    zero = np.zeros(w * bpp, dtype=np.int32)
    out = bytearray()
    for y in range(h):
        cur, prev = rows[y], (rows[y - 1] if y else zero)
        left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, dtype=np.int32), prev[:-bpp]])
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = cur - left
        elif filter_type == 2:
            filt = cur - prev
        elif filter_type == 3:
            filt = cur - (left + prev) // 2
        elif filter_type == 4:
            filt = cur - _paeth(left, prev, ul)
        else:
            raise ValueError(f"unknown PNG filter {filter_type}")
        out += bytes([filter_type]) + (filt % 256).astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit truecolor
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """PNG → (h, w, 3) uint8, stdlib ``zlib`` + numpy (no PIL).

    Supports 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha), 6 (RGBA); all five scanline filters. Gray expands
    to 3 channels, alpha is dropped — the phash/feature kernels see the
    same array a PPM of the image would produce. Adam7 interlace and
    sub-8-bit depths raise (rare in ML corpora; re-encode upstream).
    """
    import struct
    import zlib

    if not payload.startswith(PNG_SIG):
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, plte = len(PNG_SIG), None, bytearray(), None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # skip CRC
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"only 8-bit PNG supported, got depth {depth}")
    if interlace:
        raise ValueError("Adam7-interlaced PNG not supported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unknown PNG color type {color_type}")

    stride = w * channels
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    raw = raw.reshape(h, stride + 1)
    bpp = channels
    recon = np.empty((h, stride), dtype=np.int32)
    zero = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = int(raw[y, 0])
        cur = raw[y, 1:].astype(np.int32)
        prev = recon[y - 1] if y else zero
        if f == 0:
            recon[y] = cur
        elif f == 1:  # Sub: per-lane prefix sum mod 256
            recon[y] = np.cumsum(cur.reshape(-1, bpp), axis=0).ravel() % 256
        elif f == 2:  # Up
            recon[y] = (cur + prev) % 256
        elif f in (3, 4):  # Average / Paeth: sequential in x, lane-vectorized
            row = recon[y]
            for px in range(w):
                i = px * bpp
                a = row[i - bpp : i] if px else np.zeros(bpp, dtype=np.int32)
                b = prev[i : i + bpp]
                c = prev[i - bpp : i] if px else np.zeros(bpp, dtype=np.int32)
                pred = (a + b) // 2 if f == 3 else _paeth(a, b, c)
                row[i : i + bpp] = (cur[i : i + bpp] + pred) % 256
        else:
            raise ValueError(f"unknown PNG scanline filter {f}")
    px = recon.astype(np.uint8).reshape(h, w, channels)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[px[:, :, 0]]
    if color_type in (4, 6):
        px = px[:, :, :-1]  # drop alpha
    if px.shape[2] == 1:
        px = np.repeat(px, 3, axis=2)  # gray → RGB
    return px


# ------------------------------------ real codec: baseline JPEG (DCT)

JPEG_SIG = b"\xff\xd8"

# JPEG Annex K example quantization tables (the de-facto standard the
# quality dial scales) — these are DATA tables from the public spec,
# not a borrowed implementation.
_JPEG_QLUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
_JPEG_QCHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)


def _zigzag() -> np.ndarray:
    """Flat (row*8+col) indices in JPEG zigzag scan order: anti-diagonals
    d = i+j, odd diagonals top→bottom, even bottom→top."""
    out = []
    for d in range(15):
        pts = [(i, d - i) for i in range(max(0, d - 7), min(d, 7) + 1)]
        if d % 2 == 0:
            pts.reverse()
        out.extend(pts)
    return np.array([i * 8 + j for i, j in out], dtype=np.int64)


_ZZ = _zigzag()

# orthonormal 8-point DCT-II matrix: dct(B) = M @ B @ M.T, idct = M.T @ C @ M
_DCT_M = np.array([
    [(np.sqrt(1 / 8) if u == 0 else 0.5)
     * np.cos((2 * x + 1) * u * np.pi / 16) for x in range(8)]
    for u in range(8)
])


def _bit_size(v: int) -> int:
    return int(abs(v)).bit_length()


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF→0xFF00 byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.put((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # pad with 1s
        return bytes(self.out)


def _fixed_huffman(symbols: set[int]) -> tuple[list[int], list[int], dict[int, tuple[int, int]]]:
    """Degenerate-but-valid Huffman table: every used symbol gets the
    same code length L = ceil(log2(n+1)), codes 0..n-1 — the all-ones
    code (forbidden by the spec) is then provably unused. The encoder
    writes THESE tables into DHT, so decode correctness never depends
    on transcribing Annex K's example code tables; compression ratio is
    the only casualty, and this codec's job is plumbing, not ratio.
    Returns (bits[1..16], values, symbol → (code, length))."""
    vals = sorted(symbols)
    n = max(len(vals), 1)
    length = max((n + 1 - 1).bit_length(), 1)  # 2^L ≥ n+1
    bits = [0] * 16
    bits[length - 1] = len(vals)
    return bits, vals, {s: (i, length) for i, s in enumerate(vals)}


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_JPEG_QLUM, _JPEG_QCHROM):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    x = img.astype(np.float64)
    r, g, b = x[:, :, 0], x[:, :, 1], x[:, :, 2]
    return np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ],
        axis=2,
    )


def _component_symbols_and_coefs(
    plane: np.ndarray, qtab: np.ndarray
) -> list[np.ndarray]:
    """8×8-block DCT + quantization of one padded component plane →
    per-block zigzag coefficient vectors (row-major block order)."""
    h, w = plane.shape
    shifted = plane - 128.0
    blocks = []
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            B = shifted[by : by + 8, bx : bx + 8]
            coef = _DCT_M @ B @ _DCT_M.T
            q = np.round(coef / qtab).astype(np.int64)
            blocks.append(q.ravel()[_ZZ])
    return blocks


def encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    """(h, w, 3) uint8 (or (h, w) grayscale) → baseline JFIF JPEG
    (SOF0, 4:4:4 / single-component, 8-bit).

    Stdlib + numpy: RGB→YCbCr, per-8×8 DCT-II, Annex-K quantization
    scaled by ``quality``, DC-difference + run-length symbols entropy-
    coded with self-emitted fixed-length Huffman tables (see
    :func:`_fixed_huffman` — the file carries its own DHT, as the
    format requires, so any conformant decoder reads it back)."""
    import struct

    gray = img.ndim == 2
    assert img.dtype == np.uint8 and (gray or img.shape[2] == 3)
    h, w = img.shape[:2]
    n_comp = 1 if gray else 3
    qlum, qchrom = _quality_tables(quality)
    ycc = img[:, :, None].astype(np.float64) if gray else _rgb_to_ycbcr(img)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")

    comp_blocks = [
        _component_symbols_and_coefs(padded[:, :, ci], qlum if ci == 0 else qchrom)
        for ci in range(n_comp)
    ]

    # symbol pass: gather every (run, size) + DC category per table class
    dc_syms: list[set[int]] = [set(), set()]
    ac_syms: list[set[int]] = [set(), set()]
    mcus = len(comp_blocks[0])

    def _ac_symbols(coefs: np.ndarray):
        """Yield (symbol, value) AC pairs for one block's zigzag coefs."""
        ac = coefs[1:]
        nz = np.nonzero(ac)[0]
        prev = -1
        for i in nz:
            run = i - prev - 1
            while run >= 16:
                yield 0xF0, 0
                run -= 16
            yield (run << 4) | _bit_size(int(ac[i])), int(ac[i])
            prev = i
        if prev != len(ac) - 1:
            yield 0x00, 0  # EOB

    for ci in range(n_comp):
        cls = 0 if ci == 0 else 1
        prev_dc = 0
        for coefs in comp_blocks[ci]:
            diff = int(coefs[0]) - prev_dc
            prev_dc = int(coefs[0])
            dc_syms[cls].add(_bit_size(diff))
            for sym, _v in _ac_symbols(coefs):
                ac_syms[cls].add(sym)

    dc_tabs = [_fixed_huffman(s) for s in dc_syms]
    ac_tabs = [_fixed_huffman(s) for s in ac_syms]

    # entropy-coded segment: interleaved MCU = Y, Cb, Cr block (4:4:4)
    bw = _BitWriter()
    prev_dcs = [0, 0, 0]
    for m in range(mcus):
        for ci in range(n_comp):
            cls = 0 if ci == 0 else 1
            coefs = comp_blocks[ci][m]
            diff = int(coefs[0]) - prev_dcs[ci]
            prev_dcs[ci] = int(coefs[0])
            s = _bit_size(diff)
            code, ln = dc_tabs[cls][2][s]
            bw.put(code, ln)
            if s:
                bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
            for sym, v in _ac_symbols(coefs):
                code, ln = ac_tabs[cls][2][sym]
                bw.put(code, ln)
                sz = sym & 0x0F
                if sz:
                    bw.put(v if v > 0 else v + (1 << sz) - 1, sz)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(
            0xFFC4,
            bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals),
        )

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(qlum.ravel()[_ZZ].astype(np.uint8)))
    if n_comp == 3:
        out += seg(0xFFDB, b"\x01" + bytes(qchrom.ravel()[_ZZ].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for cid, tq in ((1, 0), (2, 1), (3, 1))[:n_comp]:
        sof += bytes([cid, 0x11, tq])  # sampling 1×1 each: 4:4:4
    out += seg(0xFFC0, sof)
    for cls, tabs in ((0, dc_tabs), (1, ac_tabs)):
        for tid in range(min(n_comp, 2)):
            bits, vals, _ = tabs[tid]
            out += dht(cls, tid, bits, vals)
    sos = bytes([n_comp])
    for cid, tid in ((1, 0), (2, 1), (3, 1))[:n_comp]:
        sos += bytes([cid, (tid << 4) | tid])
    sos += b"\x00\x3f\x00"  # spectral selection 0..63, baseline
    out += seg(0xFFDA, sos)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first reader over the entropy-coded segment; un-stuffs
    0xFF00 and stops at any other marker (leaving it for the caller)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller via sync()
                raise _RestartMarker(nxt)
            else:
                raise EOFError("marker inside entropy segment")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_to_restart(self) -> None:
        """Byte-align and consume the RSTn marker just hit."""
        self.acc, self.nbits = 0, 0
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _huff_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical (length, code) → symbol map from a DHT payload."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    while ln <= 16:
        code = (code << 1) | br.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG (SOF0) → (h, w, 3) uint8, stdlib + numpy.

    General baseline decoder: any Huffman tables from DHT, 1- or
    3-component, arbitrary sampling factors (chroma planes upsampled
    nearest-neighbor), restart intervals. Progressive (SOF2) and
    arithmetic coding raise — re-encode upstream (rare in ML corpora
    relative to baseline)."""
    import struct

    if not payload.startswith(JPEG_SIG):
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                flat = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8)
                t = np.zeros(64, dtype=np.int32)
                t[_ZZ] = flat
                qtabs[tq] = t.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                htabs[(cls, tid)] = _huff_decode_map(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + ci * 3 : 9 + ci * 3]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("progressive/extended JPEG not supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS: entropy data follows the header
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = {}
            for ci in range(ns):
                cid, tids = seg[1 + ci * 2 : 3 + ci * 2]
                scan[cid] = (tids >> 4, tids & 0x0F)
            fh, fw, comps = frame
            hmax = max(cp[1] for cp in comps)
            vmax = max(cp[2] for cp in comps)
            mcux = -(-fw // (8 * hmax))
            mcuy = -(-fh // (8 * vmax))
            planes = {
                cid: np.zeros((mcuy * v * 8, mcux * hh * 8))
                for cid, hh, v, _ in comps
            }
            br = _BitReader(payload, pos + ln)
            preds = {cid: 0 for cid, *_ in comps}
            mcu = 0
            while mcu < mcux * mcuy:
                try:
                    my, mx = divmod(mcu, mcux)
                    for cid, hh, v, tq in comps:
                        dct, act = scan[cid]
                        dtab, atab = htabs[(0, dct)], htabs[(1, act)]
                        q = qtabs[tq]
                        for vy in range(v):
                            for hx in range(hh):
                                coefs = np.zeros(64, dtype=np.int64)
                                s = _read_symbol(br, dtab)
                                diff = _extend(br.receive(s), s) if s else 0
                                preds[cid] += diff
                                coefs[0] = preds[cid]
                                k = 1
                                while k < 64:
                                    sym = _read_symbol(br, atab)
                                    if sym == 0x00:
                                        break
                                    run, sz = sym >> 4, sym & 0x0F
                                    if sz == 0:
                                        if run != 15:
                                            raise ValueError("bad AC symbol")
                                        k += 16
                                        continue
                                    k += run
                                    if k > 63:
                                        raise ValueError("AC index overrun")
                                    coefs[k] = _extend(br.receive(sz), sz)
                                    k += 1
                                block = np.zeros(64)
                                block[_ZZ] = coefs * q.ravel()[_ZZ]
                                px = _DCT_M.T @ block.reshape(8, 8) @ _DCT_M
                                py0 = (my * v + vy) * 8
                                px0 = (mx * hh + hx) * 8
                                planes[cid][py0 : py0 + 8, px0 : px0 + 8] = px
                    mcu += 1
                    if restart_interval and mcu % restart_interval == 0 \
                            and mcu < mcux * mcuy:
                        # byte-align; the RSTn surfaces on the next fill
                        try:
                            br.acc, br.nbits = 0, 0
                            while payload[br.pos] != 0xFF or not (
                                0xD0 <= payload[br.pos + 1] <= 0xD7
                            ):
                                br.pos += 1
                            br.pos += 2
                        except IndexError as exc:
                            raise ValueError("missing restart marker") from exc
                        preds = {cid: 0 for cid in preds}
                except _RestartMarker:
                    br.sync_to_restart()
                    preds = {cid: 0 for cid in preds}
            # assemble: per-component planes → full-size via nearest rep
            out = []
            for cid, hh, v, _ in comps:
                p = planes[cid] + 128.0
                ph, pw = p.shape
                if hh != hmax or v != vmax:
                    p = np.repeat(np.repeat(p, vmax // v, axis=0), hmax // hh, axis=1)
                out.append(p[:fh, :fw])
            if len(out) == 1:
                y = np.clip(out[0], 0, 255)
                return np.repeat(y[:, :, None], 3, axis=2).astype(np.uint8)
            y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
            rgb = np.stack(
                [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
                axis=2,
            )
            return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        pos += ln
    raise ValueError("JPEG had no scan data")


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-byte-sniffed image decode: P6 PPM, PNG, or baseline JPEG →
    (h, w, 3) uint8. Anything else raises via
    :func:`real_decoder_unavailable`."""
    if payload.startswith(b"P6"):
        return decode_ppm(payload)
    if payload.startswith(PNG_SIG):
        return decode_png(payload)
    if payload.startswith(JPEG_SIG):
        return decode_jpeg(payload)
    return real_decoder_unavailable(payload)


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono sample array → RIFF/WAV bytes (stdlib ``wave``)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAV bytes → (samples float64 in [-1, 1), sample_rate).
    16-bit PCM via stdlib ``wave``; channels are averaged to mono so the
    feature kernel sees one series either way."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        rate = wf.getframerate()
        nch = wf.getnchannels()
        raw = wf.readframes(wf.getnframes())
    samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    if nch > 1:
        samples = samples.reshape(-1, nch).mean(axis=1)
    return samples, rate


def stft_power(
    samples: np.ndarray, n_fft: int = 256, hop: int = 128
) -> np.ndarray:
    """Short-time Fourier power spectrogram: Hann-windowed frames of
    ``n_fft`` samples every ``hop``, |rfft|² per frame →
    ``(n_frames, n_fft//2 + 1)`` float64. The trailing partial frame is
    dropped (no zero-pad inflation); a clip shorter than one frame
    yields an empty (0, n_fft//2+1) array. Pure numpy — pinned against
    a direct O(n²) DFT in tests, so the fft backend can't drift
    unnoticed."""
    n = len(samples)
    if n < n_fft:
        return np.zeros((0, n_fft // 2 + 1), dtype=np.float64)
    window = 0.5 - 0.5 * np.cos(
        2.0 * np.pi * np.arange(n_fft, dtype=np.float64) / n_fft
    )
    n_frames = 1 + (n - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = samples[idx] * window[None, :]
    spec = np.fft.rfft(frames, axis=1)
    return (spec.real**2 + spec.imag**2).astype(np.float64)


def spectrogram_features(
    samples: np.ndarray,
    rate: int,
    n_fft: int = 256,
    hop: int = 128,
    n_bands: int = 8,
) -> np.ndarray:
    """Per-clip spectral descriptor from the power spectrogram:
    ``[n_frames, centroid_hz, bandwidth_hz, flatness, band_0..band_{k-1}]``
    (bands are equal-width energy FRACTIONS over [0, rate/2], so they
    sum to 1 for any non-silent clip). Centroid/bandwidth are the
    energy-weighted mean/std of bin frequencies; flatness is the
    geometric/arithmetic mean ratio of the time-averaged spectrum
    (1 = white noise, →0 = pure tone). Deterministic numpy; silence
    returns all-zero spectral stats."""
    p = stft_power(samples, n_fft, hop)
    out = np.zeros(4 + n_bands, dtype=np.float64)
    out[0] = p.shape[0]
    if p.shape[0] == 0:
        return out
    avg = p.mean(axis=0)
    total = avg.sum()
    if total <= 0.0:
        return out
    freqs = np.arange(len(avg), dtype=np.float64) * rate / n_fft
    centroid = float((avg * freqs).sum() / total)
    bandwidth = float(np.sqrt((avg * (freqs - centroid) ** 2).sum() / total))
    flatness = float(
        np.exp(np.log(avg + 1e-300).mean()) / (avg.mean())
    )
    out[1], out[2], out[3] = centroid, bandwidth, flatness
    # equal-width band energy fractions over [0, rate/2]
    band_edges = (np.arange(n_bands + 1) * len(avg)) // n_bands
    for b in range(n_bands):
        out[4 + b] = float(avg[band_edges[b]: band_edges[b + 1]].sum() / total)
    return out


def audio_spectrograms(
    media: DataFrame, n_fft: int = 256, hop: int = 128,
    n_bands: int = 8, batch_limit: int = 256,
) -> DataFrame:
    """WAV payloads → per-clip spectral descriptors via mapInPandas:
    ``(media_id, n_frames, centroid_hz, bandwidth_hz, flatness,
    band_energy array<double>, dominant_band int)``. Same bounded-batch
    Arrow shape as :func:`extract_features`; the payload is dropped on
    output so only ~100 bytes/clip shuffle — at 100 TB of audio the
    spectral index costs what a row-count does."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start: start + batch_limit]
                rows = []
                for mid, payload in zip(chunk["media_id"], chunk["content"]):
                    feats = spectrogram_features(
                        *decode_wav(payload), n_fft=n_fft, hop=hop,
                        n_bands=n_bands,
                    )
                    bands = feats[4:]
                    rows.append(
                        (
                            mid,
                            int(feats[0]),
                            float(feats[1]),
                            float(feats[2]),
                            float(feats[3]),
                            bands.tolist(),
                            int(np.argmax(bands)),
                        )
                    )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_id", "n_frames", "centroid_hz",
                        "bandwidth_hz", "flatness", "band_energy",
                        "dominant_band",
                    ],
                )

    id_type = dict(media.dtypes)["media_id"]
    return media.filter(F.col("kind") == "audio").mapInPandas(
        run,
        f"media_id {id_type}, n_frames long, centroid_hz double,"
        " bandwidth_hz double, flatness double,"
        " band_energy array<double>, dominant_band int",
    )


def image_features(img: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 → FEATURE_DIM deterministic descriptor: per-channel
    mean/std, 2×2 luminance-quadrant means, normalized dims, 4-bin
    luminance histogram. All exact numpy reductions — no RNG, no codec."""
    h, w, _ = img.shape
    x = img.astype(np.float64) / 255.0
    lum = x @ np.array([0.299, 0.587, 0.114])
    quads = [
        lum[: h // 2 or 1, : w // 2 or 1].mean(),
        lum[: h // 2 or 1, w // 2 :].mean() if w > 1 else 0.0,
        lum[h // 2 :, : w // 2 or 1].mean() if h > 1 else 0.0,
        lum[h // 2 :, w // 2 :].mean() if h > 1 and w > 1 else 0.0,
    ]
    hist = np.histogram(lum, bins=4, range=(0.0, 1.0))[0] / lum.size
    return np.array(
        [
            *x.mean(axis=(0, 1)),        # 0-2 channel means
            *x.std(axis=(0, 1)),         # 3-5 channel stds
            *quads,                      # 6-9 luminance quadrants
            h / 1024.0, w / 1024.0,      # 10-11 normalized dims
            *hist,                       # 12-15 luminance histogram
        ]
    )


def audio_features(samples: np.ndarray, rate: int) -> np.ndarray:
    """(n,) float64 in [-1, 1) → FEATURE_DIM descriptor: rms / zero-cross
    rate / peak / duration + 8-segment energy profile + 4-bin |amp|
    histogram. Deterministic numpy reductions."""
    n = len(samples)
    if n == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float64)
    rms = float(np.sqrt((samples**2).mean()))
    zcr = float((np.signbit(samples[1:]) != np.signbit(samples[:-1])).mean()) if n > 1 else 0.0
    segs = np.array_split(samples, 8)
    total_e = (samples**2).sum() or 1.0
    seg_e = [float((s**2).sum()) / total_e for s in segs]
    hist = np.histogram(np.abs(samples), bins=4, range=(0.0, 1.0))[0] / n
    return np.array(
        [rms, zcr, float(np.abs(samples).max()), n / rate / 60.0, *seg_e, *hist]
    )


def media_decoder(payload: bytes) -> np.ndarray:
    """Real decode+featurize for stdlib-decodable formats, sniffed from
    magic bytes: ``P6`` → PPM image, PNG signature → PNG image, JPEG
    SOI → baseline JPEG image, ``RIFF…WAVE`` → PCM WAV. Externally-
    coded formats (MP4/MP3) raise — the honest answer in a
    codec-less container."""
    if payload is None or len(payload) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float64)
    if (
        payload.startswith(b"P6")
        or payload.startswith(PNG_SIG)
        or payload.startswith(JPEG_SIG)
    ):
        return image_features(decode_image(payload))
    if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
        return audio_features(*decode_wav(payload))
    return real_decoder_unavailable(payload)


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = default_fake_decoder,
    batch_limit: int = 256,
) -> DataFrame:
    """binary content → FEATURE_DIM feature vector via mapInPandas.

    Arrow streams the binary column in bounded batches (``batch_limit``
    guards memory when payloads are large); the blob is dropped on
    output so downstream ops shuffle only features + metadata.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                feats = [decoder(p).tolist() for p in chunk["content"]]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "kind": chunk["kind"].values,
                        "features": feats,
                    }
                )

    return media.mapInPandas(
        run, "media_id string, kind string, features array<double>"
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing for formats without a real decoder (MP4 frames):
    passes payloads through untouched but rewrites the metadata the way
    a real resize kernel would — keeps pipelines runnable end-to-end
    without codecs. For PPM/PNG/JPEG use :func:`resize_images`."""
    return media.withColumn("width", F.lit(width)).withColumn("height", F.lit(height))


def resize_bilinear(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Pure-numpy bilinear resample, half-pixel-center convention (the
    OpenCV/Pillow ``align_corners=False`` geometry — each target pixel
    samples the source at ``(i + 0.5) * scale - 0.5``, clamped at the
    borders). (h, w, c) uint8 in, (height, width, c) uint8 out; rounding
    is floor(x + 0.5) so results are platform-deterministic."""
    h, w, _ = img.shape
    ys = (np.arange(height, dtype=np.float64) + 0.5) * (h / height) - 0.5
    xs = (np.arange(width, dtype=np.float64) + 0.5) * (w / width) - 0.5
    fy = ys - np.floor(ys)
    fx = xs - np.floor(xs)
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    f = img.astype(np.float64)
    wy = fy[:, None, None]
    wx = fx[None, :, None]
    top = f[y0][:, x0] * (1 - wx) + f[y0][:, x1] * wx
    bot = f[y1][:, x0] * (1 - wx) + f[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.floor(out + 0.5).astype(np.uint8)


def resize_images(
    media: DataFrame, width: int, height: int, batch_limit: int = 256
) -> DataFrame:
    """REAL image resize over binary payloads: magic-sniffed decode
    (PPM / PNG / baseline JPEG), :func:`resize_bilinear`, PPM re-encode
    — the standard normalize-resolution stage of a multimodal training
    pipeline, with the same Arrow-batched bounded-memory shape as
    :func:`extract_features` (payloads never shuffle wider than the
    resized output)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start: start + batch_limit]
                out = [
                    encode_ppm(resize_bilinear(decode_image(p), width, height))
                    for p in chunk["content"]
                ]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "content": out,
                        "width": np.full(len(chunk), width, dtype=np.int32),
                        "height": np.full(len(chunk), height, dtype=np.int32),
                        "format": np.full(len(chunk), "ppm", dtype=object),
                    }
                )

    id_type = dict(media.dtypes)["media_id"]
    return media.filter(F.col("kind") == "image").mapInPandas(
        run,
        f"media_id {id_type}, content binary, width int, height int, format string",
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp
    (the decode of each frame is the stubbed kernel). Demonstrates the
    explode-based fan-out shape used for real frame extraction."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "frame_ts_ms", "format")
    )


def phash63(img: np.ndarray) -> int:
    """(h, w, 3) uint8 → 63-bit perceptual average-hash.

    Rec.601 luminance, block-averaged onto an 8×8 grid (integer block
    boundaries (k·h)//8 work for any image size), each of the first 63
    cells contributes a bit: 1 iff its mean exceeds the grid mean. Two
    images that differ by a few pixels land within a small Hamming
    distance; 63 bits keeps the value positive in a signed BIGINT (the
    SimHash convention — see operators/dedup.py).
    """
    luma = (
        0.299 * img[:, :, 0].astype(np.float64)
        + 0.587 * img[:, :, 1].astype(np.float64)
        + 0.114 * img[:, :, 2].astype(np.float64)
    )
    h, w = luma.shape
    rb = (np.arange(9) * h) // 8
    cb = (np.arange(9) * w) // 8
    cells = np.empty((8, 8), dtype=np.float64)
    for i in range(8):
        for j in range(8):
            block = luma[rb[i]: max(rb[i + 1], rb[i] + 1),
                         cb[j]: max(cb[j + 1], cb[j] + 1)]
            cells[i, j] = block.mean()
    flat = cells.ravel()
    mean = flat.mean()
    out = 0
    for k in range(63):
        if flat[k] > mean:
            out |= 1 << k
    return out


def phash_images(media: DataFrame, batch_limit: int = 256) -> DataFrame:
    """Image payloads (PPM, PNG, or baseline JPEG — magic-sniffed) →
    (media_id, phash BIGINT) via mapInPandas.

    The decode stays per-partition (Arrow batches, blob dropped on
    output); the hash column is what shuffles — 8 bytes per image, so
    downstream near-dup blocking (operators/dedup.hamming_near_pairs)
    costs the same as text SimHash no matter how large the payloads
    were.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start: start + batch_limit]
                hashes = [phash63(decode_image(p)) for p in chunk["content"]]
                yield pd.DataFrame(
                    {"media_id": chunk["media_id"].values, "phash": hashes}
                )

    # media_id keeps its incoming type (a hardcoded `string` would
    # Arrow-fail on integer ids — same fix as similarity._pairwise_cosine)
    id_type = dict(media.dtypes)["media_id"]
    return media.filter(F.col("kind") == "image").mapInPandas(
        run, f"media_id {id_type}, phash long"
    )


# --------------------------------------- motion-JPEG video (real codec)


def encode_mjpeg(frames: list[np.ndarray], quality: int = 85) -> bytes:
    """Frame list → raw motion-JPEG stream: baseline JPEGs back to back,
    the container-less MJPEG form IP cameras / multipart HTTP streams
    emit. Completes the multimodal family with a REAL compressed-video
    path (r6 verdict task 8) on top of :func:`encode_jpeg`; container
    formats (MP4/WebM) stay behind :func:`real_decoder_unavailable`."""
    assert frames, "empty clip"
    return b"".join(encode_jpeg(f, quality=quality) for f in frames)


def _jpeg_frame_end(payload: bytes, start: int) -> int:
    """Offset one past the EOI of the baseline JPEG starting at
    ``start``. Walks segment length headers and the entropy-coded scan
    (FF00 byte stuffing + RSTn) — a naive EOI byte-scan is wrong
    because a DQT/APPn segment payload may legally contain FF D9."""
    pos = start
    if payload[pos:pos + 2] != JPEG_SIG:
        raise ValueError("frame does not start with SOI")
    pos += 2
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        m = payload[pos + 1]
        if m == 0xD9:  # EOI
            return pos + 2
        if m == 0xDA:  # SOS header, then entropy-coded data
            pos += 2 + int.from_bytes(payload[pos + 2:pos + 4], "big")
            while pos + 1 < n:
                if payload[pos] != 0xFF:
                    pos += 1
                elif payload[pos + 1] == 0x00 or 0xD0 <= payload[pos + 1] <= 0xD7:
                    pos += 2  # stuffed FF / restart marker
                else:
                    break  # real marker ends the scan (EOI for baseline)
            continue
        if 0xD0 <= m <= 0xD7 or m in (0x01,):  # standalone markers
            pos += 2
            continue
        pos += 2 + int.from_bytes(payload[pos + 2:pos + 4], "big")
    raise ValueError("truncated JPEG frame")


def decode_mjpeg(payload: bytes) -> list[np.ndarray]:
    """Raw MJPEG stream → list of (h, w, 3) uint8 frames (each frame a
    full :func:`decode_jpeg` decode)."""
    frames, pos = [], 0
    while pos < len(payload):
        end = _jpeg_frame_end(payload, pos)
        frames.append(decode_jpeg(payload[pos:end]))
        pos = end
    return frames


def video_frame_phashes(media: DataFrame, batch_limit: int = 64) -> DataFrame:
    """MJPEG payloads → ``(media_id, frame_idx, phash)``: clips decode
    inside their partition (Arrow batches), and only 12 bytes per FRAME
    shuffle — the same blob-never-moves shape as :func:`phash_images`,
    fanned out one row per frame."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start: start + batch_limit]
                ids, idxs, hs = [], [], []
                for mid, p in zip(chunk["media_id"], chunk["content"]):
                    for i, fr in enumerate(decode_mjpeg(bytes(p))):
                        ids.append(mid)
                        idxs.append(i)
                        hs.append(phash63(fr))
                yield pd.DataFrame(
                    {"media_id": ids, "frame_idx": np.array(idxs, dtype=np.int32),
                     "phash": np.array(hs, dtype=np.int64)}
                )

    id_type = dict(media.dtypes)["media_id"]
    return media.filter(F.col("kind") == "video").mapInPandas(
        run, f"media_id {id_type}, frame_idx int, phash long"
    )


def crossclip_segment_pairs(
    keyframes: DataFrame,
    max_hamming: int = 6,
    min_aligned: int = 2,
) -> DataFrame:
    """Cross-clip temporal near-duplicate detection — the video
    copy-detection stage (re-uploads, edits, compilations) over keyframe
    perceptual hashes, bucketed end to end:

      1. keyframes get a per-clip sequence number (window per media_id);
      2. each 63-bit phash splits into four 16-bit BLOCKS — candidates
         are an EQUI-join on (block_idx, block_value), never all-pairs,
         with per-key fan-in bounded by corpus block frequency (the
         simhash hamming_near_pairs discipline). Plain block equality
         only guarantees recall for <= 3 flipped bits (pigeonhole over
         4 blocks); for ``max_hamming`` in 4..7 the PROBE side also
         emits every single-bit FLIP of each block value (<= 6 flips
         over 4 blocks leave some block with <= 1 flip, so the flipped
         probe still collides) — a bounded 17x fan-out on one side that
         keeps the 16-bit join selectivity instead of shrinking blocks
         to 9 bits (2^7x more collisions per bucket). ``max_hamming``
         > 7 raises: the 1-flip neighborhood can't guarantee it — use
         more/narrower blocks explicitly if that radius is ever needed;
      3. candidate keyframe matches verify with the exact JVM
         ``bit_count(xor)`` distance, then group by (clip_a, clip_b,
         seq_offset): a real shared SEGMENT shows up as >= ``min_aligned``
         matched keyframes at ONE consistent temporal offset — random
         block collisions don't align.

    Input: ``(media_id, frame_idx, phash)`` (the :func:`video_keyframes`
    output). Returns one row per detected directed-free pair segment::

        media_a, media_b, seq_offset, aligned_keyframes, mean_hamming

    with ``media_a < media_b``. 100-TB shape: only 12-byte hash rows
    shuffle; the block join is the single corpus-scale exchange and the
    alignment groupBy rides candidate matches only.
    """
    from pyspark.sql import Window

    if max_hamming > 7:
        raise ValueError(
            f"max_hamming={max_hamming} > 7: the 4x16-bit block scheme "
            "with 1-flip probe expansion guarantees candidate recall "
            "only to radius 7 (pigeonhole: ceil((7+1)/4) - 1 = 1 flip "
            "in the best block); widen the radius by re-blocking, not "
            "by silently losing pairs"
        )

    w = Window.partitionBy("media_id").orderBy("frame_idx")
    # blocks fans into BOTH sides of the candidate join (probe + build),
    # and everything upstream — typically the per-clip video decode +
    # phash Python chain — would re-run once per side (the CTE-inlining
    # recompute class). Lazy-checkpoint the tiny (media_id, phash, seq)
    # frame at the fan-out frontier; the first caller action pays for
    # the one materialization inside its own timing.
    seq = keyframes.select(
        "media_id", "phash", F.row_number().over(w).alias("seq")
    ).localCheckpoint(eager=False)
    blocks = seq.select(
        "media_id",
        "seq",
        "phash",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), i -> "
                "struct(i AS bi, shiftright(phash, 16 * i) & 65535 AS bv))"
            )
        ).alias("b"),
    ).select("media_id", "seq", "phash", F.col("b.bi").alias("bi"), F.col("b.bv").alias("bv"))

    if max_hamming <= 3:
        probe = blocks
    else:
        # 1-flip neighborhood on the probe side only (symmetric relation:
        # hamming(bv_a, bv_b) <= 1  <=>  bv_b ∈ {bv_a} ∪ flips(bv_a)).
        # Top block holds 15 payload bits (63-bit hash), the rest 16.
        probe = blocks.select(
            "media_id",
            "seq",
            "phash",
            "bi",
            F.explode(
                F.expr(
                    "concat(array(bv), transform("
                    "sequence(0, CASE WHEN bi = 3 THEN 14 ELSE 15 END), "
                    "j -> bv ^ shiftleft(1L, j)))"
                )
            ).alias("bv"),
        )

    a, b = probe.alias("a"), blocks.alias("b")
    matches = (
        a.join(
            b,
            [
                F.col("a.bi") == F.col("b.bi"),
                F.col("a.bv") == F.col("b.bv"),
                F.col("a.media_id") < F.col("b.media_id"),
            ],
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            (F.col("b.seq") - F.col("a.seq")).alias("seq_offset"),
            F.col("a.seq").alias("seq_a"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).alias("hd"),
        )
        .filter(F.col("hd") <= max_hamming)
        # one row per matched keyframe pair (a hash pair can collide on
        # several blocks; hd is a function of the pair, so distinct is safe)
        .distinct()
    )
    return (
        matches.groupBy("media_a", "media_b", "seq_offset")
        .agg(
            F.count("*").cast("long").alias("aligned_keyframes"),
            F.avg("hd").alias("mean_hamming"),
        )
        .filter(F.col("aligned_keyframes") >= min_aligned)
    )


def video_keyframes(frame_hashes: DataFrame, max_hamming: int = 2) -> DataFrame:
    """Shot-boundary keyframes: frame 0 plus every frame whose phash
    moves more than ``max_hamming`` bits from its predecessor (lag
    window per video — partitioned by media_id, so the sort is
    per-clip, never global)."""
    from pyspark.sql import Window

    w = Window.partitionBy("media_id").orderBy("frame_idx")
    prev = F.lag("phash").over(w)
    return (
        frame_hashes.withColumn("__prev", prev)
        .filter(
            F.col("__prev").isNull()
            | (F.bit_count(F.col("phash").bitwiseXOR(F.col("__prev"))) > max_hamming)
        )
        .drop("__prev")
    )
