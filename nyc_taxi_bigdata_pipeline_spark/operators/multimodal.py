"""Multimodal column plumbing (training-data pipeline extension).

Images/audio/video ride through the engine as opaque ``binary`` columns
with typed metadata structs. The Spark-side machinery — schema,
partition-size-aware batching, Arrow-batched Pandas UDF signatures —
is real and tested. Decode is real for the stdlib-decodable formats:
PPM (P6) images and PCM WAV audio go payload → numpy array → feature
vector with no external codec (``media_decoder`` sniffs the magic
bytes); compressed formats (JPEG/MP4) still require PIL/ffmpeg, which
this container lacks, and stay behind ``real_decoder_unavailable``.

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
    (JPEG/MP4/MP3) this container doesn't ship. PPM/WAV/PNG payloads
    decode for real via :func:`media_decoder`."""
    raise NotImplementedError(
        "compressed-media codecs (PIL/librosa/ffmpeg) are not installed "
        "in this environment; PPM/WAV/PNG decode for real via "
        "media_decoder, otherwise inject a decoder or use "
        "default_fake_decoder"
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


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-byte-sniffed image decode: P6 PPM or PNG → (h, w, 3) uint8.
    Anything else (JPEG &c.) raises via :func:`real_decoder_unavailable`."""
    if payload.startswith(b"P6"):
        return decode_ppm(payload)
    if payload.startswith(PNG_SIG):
        return decode_png(payload)
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
    magic bytes: ``P6`` → PPM image, PNG signature → PNG image,
    ``RIFF…WAVE`` → PCM WAV. Externally-coded formats (JPEG/MP4) raise —
    the honest answer in a codec-less container."""
    if payload is None or len(payload) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float64)
    if payload.startswith(b"P6") or payload.startswith(PNG_SIG):
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
    """Resize plumbing: passes payloads through untouched but rewrites
    the metadata the way a real resize kernel would — keeps pipelines
    runnable end-to-end without codecs."""
    return media.withColumn("width", F.lit(width)).withColumn("height", F.lit(height))


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
    """Image payloads (PPM or PNG, magic-sniffed per payload) →
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
