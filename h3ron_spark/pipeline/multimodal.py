"""Multimodal (image/audio/video) column pipeline.

Beyond-reference capability (per the build brief): treat media as
opaque ``binary`` columns with typed metadata, and run decode /
feature-extract / resize / frame-sample as Arrow-batched kernels over
``mapInPandas``. The Spark-side plumbing — schemas, batch iteration,
partition sizing — is real and tested; the actual codec calls are
STUBBED (this container ships no image/audio libraries): decode
raises NotImplementedError unless ``fake=True`` installs a
deterministic fake decoder (bytes -> pseudo-pixels) so the dataflow is
testable end-to-end.

Schema conventions:
  media(asset_id long, kind string, payload binary,
        meta struct<width int, height int, sample_rate int,
                    n_frames int, codec string>)
  features(asset_id long, kind string, feature array<float>, dim int)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("n_frames", IntegerType()),
                    StructField("codec", StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("dim", IntegerType()),
    ]
)


# ------------------------------------------------------------------
# REAL decoders needing no codec libraries: RIFF/WAVE PCM, binary
# PPM/PGM, and baseline PNG (stdlib zlib). Entropy-coded formats
# (JPEG/MP3/H264...) remain stubbed by design; the magic-byte
# dispatch below routes them to NotImplementedError.
# ------------------------------------------------------------------


def wav_bytes(samples, sample_rate: int) -> bytes:
    """Minimal mono PCM16 RIFF/WAVE writer (deterministic fixture)."""
    import struct

    import numpy as np

    s = np.asarray(samples, dtype=np.int16)
    data = s.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, sample_rate, sample_rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes):
    """Parse a PCM RIFF/WAVE payload -> (sample_rate, int16 samples of
    channel-interleaved data, n_channels). Supports PCM 8/16-bit, any
    channel count; walks RIFF chunks (fmt before data not assumed)."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, ch, rate, _bps, _align, bits = fmt
    if audio_fmt != 1:
        raise NotImplementedError(f"non-PCM WAVE format {audio_fmt}")
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2")
    elif bits == 8:
        samples = (
            np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128
        ) * 256
    else:
        raise NotImplementedError(f"{bits}-bit PCM")
    return rate, samples, max(1, ch)


def ppm_bytes(pixels) -> bytes:
    """Binary PPM (P6) writer for a (h, w, 3) uint8 array."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def decode_ppm(payload: bytes):
    """Parse binary PPM (P6) / PGM (P5) -> (h, w, channels) uint8."""
    import numpy as np

    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    # header tokens: magic, width, height, maxval (with # comments)
    toks, pos = [], 2
    while len(toks) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while payload[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        toks.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, _maxval = toks
    ch = 3 if magic == b"P6" else 1
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=pos)
    return px.reshape(h, w, ch)


# ------------------------------------------------------------------
# PNG (ISO/IEC 15948, a public spec): REAL baseline decoder on stdlib
# zlib — 8-bit gray/RGB/RGBA, non-interlaced. The formerly-stubbed
# "compressed" boundary now starts at palette/16-bit/Adam7 PNG and
# the entropy-coded formats (JPEG/MP3/H264).
# ------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a, b, c):
    """Paeth predictor (PNG spec 9.4) over uint8 vectors."""
    import numpy as np

    a16, b16, c16 = (x.astype(np.int16) for x in (a, b, c))
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    return np.where(
        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
    ).astype(np.uint8)


def png_bytes(pixels, filter_cycle: bool = True) -> bytes:
    """Encode an (h, w) or (h, w, ch) uint8 array as PNG — bit depth
    8, color type 0/2/6 by channel count, no interlace. With
    ``filter_cycle`` each scanline uses filter (row % 5), so a
    round-trip exercises every unfilter path in :func:`decode_png`."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    ctype = {1: 0, 3: 2, 4: 6}[ch]
    raw = bytearray()
    prev = np.zeros((w * ch,), dtype=np.uint8)
    for y in range(h):
        cur = px[y].reshape(-1)
        f = (y % 5) if filter_cycle else 0
        left = np.concatenate([np.zeros(ch, np.uint8), cur[:-ch]])
        upleft = np.concatenate([np.zeros(ch, np.uint8), prev[:-ch]])
        if f == 0:
            out = cur
        elif f == 1:
            out = cur - left  # uint8 wraps mod 256 (spec arithmetic)
        elif f == 2:
            out = cur - prev
        elif f == 3:
            out = cur - (
                (left.astype(np.uint16) + prev) // 2
            ).astype(np.uint8)
        else:
            out = cur - _paeth(left, prev, upleft)
        raw.append(f)
        raw.extend(out.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """Parse a baseline PNG -> (h, w, ch) uint8: 8-bit gray/RGB/RGBA
    (color types 0/2/6), non-interlaced; concatenated IDAT inflated by
    stdlib zlib, scanlines reconstructed per the five spec filters,
    every chunk CRC-verified (corrupt payloads fail loudly, not as
    garbage pixels). Palette/16-bit/Adam7 raise NotImplementedError —
    the documented remaining stub boundary."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w, h, ctype = 8, None, None, None
    idat = bytearray()
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", payload[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or ctype not in (0, 2, 6) or interlace != 0:
                raise NotImplementedError(
                    f"PNG variant unsupported (depth={depth}, "
                    f"color_type={ctype}, interlace={interlace}); "
                    "baseline 8-bit gray/RGB/RGBA only"
                )
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros((stride,), dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if f == 0:
            cur = line
        elif f == 2:
            cur = line + prev
        elif f == 1:
            cur = line
            for x in range(ch, stride):
                cur[x] = (int(cur[x]) + int(cur[x - ch])) & 0xFF
        elif f == 3:
            cur = line
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                cur[x] = (int(cur[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif f == 4:
            cur = line
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter {f} invalid")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, ch)


def real_decode_features(payload: bytes) -> list[float]:
    """Magic-byte dispatch: WAV -> [1, rate/48k, duration_s, mean_abs,
    rms, zero-cross rate]; PPM/PGM -> [2, w, h, mean/255, std/255,
    channels]. Unknown/compressed magics raise NotImplementedError
    (the documented stub boundary)."""
    import numpy as np

    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        fr = decode_avi(bytes(payload)).astype(np.float64)
        return [
            6.0,
            float(fr.shape[2]),
            float(fr.shape[1]),
            float(fr.mean() / 255.0),
            float(fr.std() / 255.0),
            float(fr.shape[0]),  # n_frames in the channel slot
        ]
    if payload[:4] == b"RIFF":
        rate, s, ch = decode_wav(bytes(payload))
        # duration counts FRAMES; per-sample stats use channel 0 so
        # multi-channel files don't mix interleaved channels
        c0 = s[::ch].astype(np.float64) / 32768.0
        zc = (
            float(np.mean(np.signbit(c0[1:]) != np.signbit(c0[:-1])))
            if c0.size > 1
            else 0.0
        )
        return [
            1.0,
            rate / 48000.0,
            (s.size // ch) / rate,
            float(np.mean(np.abs(c0))),
            float(np.sqrt(np.mean(c0 * c0))),
            zc,
        ]
    if payload[:2] == b"BM":
        px = decode_bmp(bytes(payload)).astype(np.float64)
        return [
            2.0,
            float(px.shape[1]),
            float(px.shape[0]),
            float(px.mean() / 255.0),
            float(px.std() / 255.0),
            float(px.shape[2]),
        ]
    if payload[:2] in (b"P6", b"P5"):
        px = decode_ppm(bytes(payload)).astype(np.float64)
        return [
            2.0,
            float(px.shape[1]),
            float(px.shape[0]),
            float(px.mean() / 255.0),
            float(px.std() / 255.0),
            float(px.shape[2]),
        ]
    if payload[:8] == _PNG_SIG:
        px = decode_png(bytes(payload)).astype(np.float64)
        return [
            3.0,
            float(px.shape[1]),
            float(px.shape[0]),
            float(px.mean() / 255.0),
            float(px.std() / 255.0),
            float(px.shape[2]),
        ]
    if payload[:6] in _GIF_SIGS:
        px = decode_gif(bytes(payload)).astype(np.float64)
        return [
            4.0,
            float(px.shape[1]),
            float(px.shape[0]),
            float(px.mean() / 255.0),
            float(px.std() / 255.0),
            float(px.shape[2]),
        ]
    if payload[:2] == b"\xff\xd8":
        from h3ron_spark.pipeline.jpeg import decode_jpeg

        px = decode_jpeg(bytes(payload)).astype(np.float64)
        return [
            5.0,
            float(px.shape[1]),
            float(px.shape[0]),
            float(px.mean() / 255.0),
            float(px.std() / 255.0),
            float(px.shape[2]),
        ]
    raise NotImplementedError(
        "no codec for this payload (only MP3/H264-class formats remain "
        "stubbed in this environment); RIFF/WAVE PCM, binary PPM/PGM, "
        "baseline 8-bit PNG, GIF, baseline JPEG, and raw-frame AVI "
        "decode natively"
    )


def _fake_decode(payload: bytes, meta) -> list[float]:
    """Deterministic fake 'decode': a rolling byte histogram — stands in
    for a real image/audio decoder with the same batch shape."""
    if payload is None:
        return []
    acc = [0.0] * 16
    for i, b in enumerate(payload):
        acc[b % 16] += 1.0
    n = max(1, len(payload))
    return [v / n for v in acc]


def extract_features(
    media: DataFrame,
    fake: bool = False,
    dim: int = 16,
) -> DataFrame:
    """Decode + featurize each asset via mapInPandas (one Arrow batch
    of payloads per call — the batch shape a real codec needs).
    fake=True uses the deterministic byte-histogram decoder; otherwise
    payloads dispatch on magic bytes to the REAL pure-Python decoders
    (RIFF/WAVE PCM, binary PPM/PGM) and unknown/compressed formats
    raise NotImplementedError at execution time — the documented stub
    boundary where a codec-backed decoder plugs in."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, kind, payload, meta in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                feat = (
                    _fake_decode(payload, meta)
                    if fake
                    else real_decode_features(payload)
                )
                rows.append((int(aid), kind, feat, len(feat)))
            yield pd.DataFrame(
                rows, columns=["asset_id", "kind", "feature", "dim"]
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    fake: bool = False,
) -> DataFrame:
    """Resize each image/video asset to (width, height) via mapInPandas
    — same stub contract as extract_features: the Arrow batch plumbing
    and output schema are real; the pixel resample is a deterministic
    fake (byte stream truncated/padded to w*h) unless a codec-backed
    resampler replaces it. Audio rows pass through untouched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        target = width * height
        for pdf in batches:
            rows = []
            for aid, kind, payload, meta in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                meta = dict(meta) if meta is not None else {}
                if kind != "audio" and payload is not None:
                    buf = bytes(payload)
                    if not fake and buf[:2] == b"P6":
                        # REAL nearest-neighbor resample of binary PPM
                        px = decode_ppm(buf)
                        ys = (np.arange(height) * px.shape[0]) // height
                        xs = (np.arange(width) * px.shape[1]) // width
                        payload = ppm_bytes(px[ys][:, xs])
                    elif not fake and buf[:8] == _PNG_SIG:
                        # REAL nearest-neighbor resample of baseline PNG
                        px = decode_png(buf)
                        ys = (np.arange(height) * px.shape[0]) // height
                        xs = (np.arange(width) * px.shape[1]) // width
                        payload = png_bytes(px[ys][:, xs], filter_cycle=False)
                    elif not fake and buf[:6] in _GIF_SIGS:
                        # REAL nearest-neighbor resample of GIF; the
                        # result re-encodes as PNG (resampled RGB has
                        # no palette to re-quantize into)
                        px = decode_gif(buf)
                        ys = (np.arange(height) * px.shape[0]) // height
                        xs = (np.arange(width) * px.shape[1]) // width
                        payload = png_bytes(px[ys][:, xs], filter_cycle=False)
                        meta["codec"] = "png"
                    elif not fake and buf[:2] == b"\xff\xd8":
                        # REAL nearest-neighbor resample of baseline
                        # JPEG, re-encoded as JPEG (q=90, 4:4:4)
                        from h3ron_spark.pipeline.jpeg import (
                            decode_jpeg,
                            jpeg_bytes,
                        )

                        px = decode_jpeg(buf)
                        ys = (np.arange(height) * px.shape[0]) // height
                        xs = (np.arange(width) * px.shape[1]) // width
                        payload = jpeg_bytes(px[ys][:, xs], quality=90)
                    elif not fake:
                        raise NotImplementedError(
                            "no codec for this payload; binary PPM, "
                            "baseline PNG, GIF, and baseline JPEG "
                            "resample natively (pass fake=True for "
                            "the deterministic test resampler)"
                        )
                    else:
                        payload = (
                            buf * (target // max(1, len(buf)) + 1)
                        )[:target]
                    meta["width"] = width
                    meta["height"] = height
                rows.append((int(aid), kind, payload, meta))
            yield pd.DataFrame(
                rows, columns=["asset_id", "kind", "payload", "meta"]
            )

    return media.mapInPandas(run, MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame,
    every_n: int = 10,
) -> DataFrame:
    """Frame sampling plan: one output row per sampled frame index,
    derived from meta.n_frames — pure SQL (sequence + explode), no
    decode. The downstream decode of individual frames would plug into
    extract_features."""
    return media.select(
        "asset_id",
        "kind",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_index"),
    )


def synthetic_media_real(spark: SparkSession, n: int = 32) -> DataFrame:
    """Fixture media table whose payloads are REAL uncompressed
    containers: even ids get a PCM16 WAV (440*(1+id%3) Hz sine-ish
    integer wave at 8 kHz), odd ids a binary PPM gradient image —
    both fully decodable by the pure-Python decoders."""
    import numpy as np

    rows = []
    for i in range(n):
        if i % 2 == 0:
            rate = 8000
            t = np.arange(rate // 4)  # 0.25 s
            freq = 440 * (1 + i % 3)
            s = (
                10000.0
                * np.sin(2.0 * np.pi * freq * t / rate)
            ).astype(np.int16)
            payload = wav_bytes(s, rate)
            rows.append(
                (i, "audio", payload, (None, None, rate, None, "pcm16"))
            )
        else:
            w, h = 32 + (i % 5) * 8, 24 + (i % 3) * 8
            yy, xx = np.mgrid[0:h, 0:w]
            px = np.stack(
                [
                    (xx * 255 // max(1, w - 1)),
                    (yy * 255 // max(1, h - 1)),
                    ((xx + yy + i) % 256),
                ],
                axis=-1,
            ).astype(np.uint8)
            payload = ppm_bytes(px)
            rows.append((i, "image", payload, (w, h, None, None, "ppm")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_media_png(spark: SparkSession, n: int = 24) -> DataFrame:
    """Fixture media table of REAL baseline PNGs: ids cycle through
    gray / RGB / RGBA gradients at varying sizes, encoded with the
    per-row filter cycle so every spec filter (None/Sub/Up/Average/
    Paeth) appears in the payloads the decoder must reconstruct."""
    import numpy as np

    rows = []
    for i in range(n):
        w, h = 20 + (i % 4) * 6, 16 + (i % 3) * 5
        yy, xx = np.mgrid[0:h, 0:w]
        ch = (1, 3, 4)[i % 3]
        planes = [
            (xx * 255 // max(1, w - 1)),
            (yy * 255 // max(1, h - 1)),
            ((xx * yy + i * 17) % 256),
            ((xx + yy * 3 + i) % 256),
        ][:ch]
        px = np.stack(planes, axis=-1).astype(np.uint8)
        payload = png_bytes(px if ch > 1 else px[:, :, 0])
        rows.append((i, "image", payload, (w, h, None, None, "png")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fixture media table (binary payloads derived from
    the asset id)."""
    rows = []
    for i in range(n):
        payload = bytes((i * 7 + j * 13) % 256 for j in range(64 + (i % 32)))
        kind = ["image", "audio", "video"][i % 3]
        meta = (64, 48, 16000, 30 + i % 60, "fake")
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------------
# GIF (LZW) — second real compressed codec after PNG.
# Public spec: GIF89a specification (CompuServe 1990, W3C mirror).
# ---------------------------------------------------------------------

_GIF_SIGS = (b"GIF87a", b"GIF89a")


def gif_bytes(indices, palette) -> bytes:
    """Minimal single-frame GIF87a encoder: ``indices`` (h, w) uint8
    into ``palette`` [(r, g, b), ...] whose length must be a power of
    two >= 4. LZW output uses the fixed-width literal technique (a
    CLEAR code before the dynamic table would force a width change),
    which every conforming decoder accepts."""
    import numpy as np

    idx = np.asarray(indices, dtype=np.uint8)
    h, w = idx.shape
    n = len(palette)
    assert n >= 4 and (n & (n - 1)) == 0
    depth = n.bit_length() - 1
    out = bytearray()
    out += b"GIF87a"
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (depth - 1), 0, 0])  # GCT present, 2^depth
    for r, g, b in palette:
        out += bytes([r, g, b])
    out += b"\x2c" + b"\x00\x00\x00\x00"  # image at (0,0)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += b"\x00"  # no local table, not interlaced
    mcs = max(2, depth)  # LZW minimum code size
    out += bytes([mcs])
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    # bit packer, LSB first
    acc, nbits, data = 0, 0, bytearray()

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    # decoder table grows by one entry per emitted code (after the
    # first); re-CLEAR before the width would change
    budget = (1 << width) - eoi - 2
    for v in idx.ravel():
        if budget == 0:
            emit(clear)
            budget = (1 << width) - eoi - 2
        emit(int(v))
        budget -= 1
    emit(eoi)
    if nbits:
        data.append(acc & 0xFF)
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(payload: bytes):
    """Decode the FIRST frame of a GIF87a/89a to (h, w, 3) uint8 RGB:
    full dynamic-table LZW (variable code width up to 12 bits,
    CLEAR/EOI handling), global/local color tables, interlace
    reordering. Animation beyond frame one and transparency
    compositing are out of scope (first-frame decode is the feature
    path)."""
    import numpy as np

    if payload[:6] not in _GIF_SIGS:
        raise NotImplementedError("not a GIF payload")
    pos = 6
    sw = int.from_bytes(payload[pos : pos + 2], "little")
    sh = int.from_bytes(payload[pos + 2 : pos + 4], "little")
    flags = payload[pos + 4]
    pos += 7
    gct = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        gct = np.frombuffer(
            payload[pos : pos + 3 * size], dtype=np.uint8
        ).reshape(size, 3)
        pos += 3 * size
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise NotImplementedError(f"unknown GIF block 0x{block:02x}")
        left = int.from_bytes(payload[pos : pos + 2], "little")
        top = int.from_bytes(payload[pos + 2 : pos + 4], "little")
        w = int.from_bytes(payload[pos + 4 : pos + 6], "little")
        h = int.from_bytes(payload[pos + 6 : pos + 8], "little")
        iflags = payload[pos + 8]
        pos += 9
        table = gct
        if iflags & 0x80:
            size = 2 << (iflags & 0x07)
            table = np.frombuffer(
                payload[pos : pos + 3 * size], dtype=np.uint8
            ).reshape(size, 3)
            pos += 3 * size
        if table is None:
            raise NotImplementedError("GIF image without a color table")
        mcs = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos]:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        # LZW decode (LSB-first variable width)
        clear, eoi = 1 << mcs, (1 << mcs) + 1
        width = mcs + 1
        dict_ = {i: (i,) for i in range(clear)}
        next_code = eoi + 1
        acc = nbits = 0
        prev = None
        out_idx = []
        for byte in data:
            acc |= byte << nbits
            nbits += 8
            while nbits >= width:
                code = acc & ((1 << width) - 1)
                acc >>= width
                nbits -= width
                if code == clear:
                    dict_ = {i: (i,) for i in range(clear)}
                    next_code = eoi + 1
                    width = mcs + 1
                    prev = None
                    continue
                if code == eoi:
                    nbits = 0
                    acc = 0
                    break
                if prev is None:
                    entry = dict_[code]
                else:
                    if code in dict_:
                        entry = dict_[code]
                        dict_[next_code] = prev + (entry[0],)
                    elif code == next_code:  # KwKwK case
                        entry = prev + (prev[0],)
                        dict_[next_code] = entry
                    else:
                        raise ValueError("corrupt LZW stream")
                    next_code += 1
                    if next_code == (1 << width) and width < 12:
                        width += 1
                out_idx.extend(entry)
                prev = entry
        idx = np.array(out_idx[: w * h], dtype=np.uint8).reshape(h, w)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            order = (
                list(range(0, h, 8))
                + list(range(4, h, 8))
                + list(range(2, h, 4))
                + list(range(1, h, 2))
            )
            de = np.empty_like(idx)
            de[order, :] = idx
            idx = de
        rgb = table[idx]
        # compose onto the logical screen only when the frame is a
        # sub-rectangle; the common single-image case returns directly
        if (left, top, w, h) == (0, 0, sw, sh):
            return rgb
        screen = np.zeros((sh, sw, 3), dtype=np.uint8)
        screen[top : top + h, left : left + w] = rgb
        return screen
    raise ValueError("GIF contains no image block")


def synthetic_media_gif(spark: SparkSession, n: int = 18) -> DataFrame:
    """Fixture media table of REAL GIFs: deterministic index patterns
    over 16- and 256-color palettes at varying sizes (multi-CLEAR LZW
    streams for the larger frames)."""
    import numpy as np

    rows = []
    for i in range(n):
        w, h = 21 + (i % 5) * 9, 17 + (i % 4) * 7
        yy, xx = np.mgrid[0:h, 0:w]
        if i % 2:
            ncol = 256
            idx = ((xx * 5 + yy * 11 + i * 29) % 256).astype(np.uint8)
        else:
            ncol = 16
            idx = ((xx + yy * 2 + i) % 16).astype(np.uint8)
        pal = [
            ((k * 37 + i) % 256, (k * 91) % 256, (k * 13 + 7 * i) % 256)
            for k in range(ncol)
        ]
        payload = gif_bytes(idx, pal)
        rows.append((i, "image", payload, (w, h, None, None, "gif")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_media_jpeg(spark: SparkSession, n: int = 18) -> DataFrame:
    """Fixture media table of REAL baseline JPEGs: ids cycle through
    RGB 4:4:4, RGB 4:2:0 with restart markers, and grayscale, over
    smooth deterministic gradients at varying sizes/qualities — every
    decoder path (subsampling, DRI/RSTn resync, single-component
    scans) appears in the payloads."""
    import numpy as np

    from h3ron_spark.pipeline.jpeg import jpeg_bytes

    rows = []
    for i in range(n):
        w, h = 24 + (i % 5) * 10, 20 + (i % 4) * 9
        yy, xx = np.mgrid[0:h, 0:w]
        quality = 80 + (i % 3) * 8  # 80 / 88 / 96
        if i % 3 == 2:
            px = (
                (xx * 200) // max(1, w - 1) + (yy * 55) // max(1, h - 1)
            ).astype(np.uint8)
            payload = jpeg_bytes(px, quality=quality)
        else:
            # smooth ramps only (no mod-256 wrap): a step edge would
            # ring under the DCT and the error bound in tests is tight
            px = np.stack(
                [
                    (xx * 255) // max(1, w - 1),
                    (yy * 255) // max(1, h - 1),
                    (xx * 120) // max(1, w - 1)
                    + (yy * 110) // max(1, h - 1)
                    + i,
                ],
                axis=-1,
            ).astype(np.uint8)
            payload = jpeg_bytes(
                px,
                quality=quality,
                subsample=(i % 3 == 1),
                restart_interval=2 if i % 3 == 1 else 0,
            )
        rows.append((i, "image", payload, (w, h, None, None, "jpeg")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------------
# AVI (RIFF) with raw BI_RGB frames — the video modality goes real.
# Public spec: Microsoft AVI RIFF File Reference + BITMAPINFOHEADER
# (both publicly documented); frames are uncompressed DIBs, so the
# round-trip is LOSSLESS and pinned exactly in tests.
# ---------------------------------------------------------------------


def avi_bytes(frames, fps: int = 10) -> bytes:
    """Encode (n, h, w, 3) uint8 RGB frames as an uncompressed AVI:
    RIFF('AVI ') -> LIST hdrl (avih + LIST strl(strh 'vids'/BI_RGB +
    strf BITMAPINFOHEADER)) -> LIST movi ('00db' raw DIB frames,
    bottom-up BGR rows padded to 4 bytes) -> idx1."""
    import struct

    import numpy as np

    fr = np.asarray(frames, dtype=np.uint8)
    n, h, w = fr.shape[:3]
    row = w * 3
    pad = (4 - row % 4) % 4
    frame_bytes = (row + pad) * h

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b""
        )

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        frame_bytes * fps,  # max bytes per sec
        0, 0x10,  # flags: HASINDEX
        n, 0, 1, frame_bytes, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"\x00\x00\x00\x00", 0, 0, 0, 0,
        1, fps, 0, n, frame_bytes, 0xFFFFFFFF, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_frames = []
    for i in range(n):
        # DIB: bottom-up rows, BGR order, rows padded to 4 bytes
        bgr = fr[i, ::-1, :, ::-1]
        if pad:
            padded = bytearray()
            for r in range(h):
                padded += bgr[r].tobytes() + b"\x00" * pad
            body = bytes(padded)
        else:
            body = bgr.tobytes()
        movi_frames.append(chunk(b"00db", body))
    movi = lst(b"movi", b"".join(movi_frames))
    idx_entries = []
    off = 4
    for i in range(n):
        idx_entries.append(
            struct.pack("<4sIII", b"00db", 0x10, off, frame_bytes)
        )
        off += 8 + frame_bytes + (frame_bytes % 2)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + len(riff_body).to_bytes(4, "little") + riff_body


def decode_avi(payload: bytes):
    """Decode an uncompressed (BI_RGB 24-bit) AVI to (n, h, w, 3)
    uint8 RGB. Walks RIFF chunks for the BITMAPINFOHEADER dims and
    the movi '00db'/'00dc' frames; bottom-up DIB rows are flipped and
    BGR swapped back. Compressed codecs raise NotImplementedError
    (the documented stub boundary: H264-class streams)."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise NotImplementedError("not an AVI payload")
    w = h = None
    compression = None
    frames = []

    def walk(buf: bytes):
        nonlocal w, h, compression
        pos = 0
        while pos + 8 <= len(buf):
            tag = buf[pos : pos + 4]
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            body = buf[pos + 8 : pos + 8 + size]
            if tag == b"LIST":
                walk(body[4:])
            elif tag == b"strf" and len(body) >= 40:
                _, bw, bh, _, bits, comp = struct.unpack_from(
                    "<IiiHHI", body, 0
                )
                w, h = bw, abs(bh)
                compression = comp
                if bits != 24 or comp != 0:
                    raise NotImplementedError(
                        f"AVI codec {comp:#x}/{bits}bpp (only raw "
                        "BI_RGB 24-bit decodes; H264-class streams "
                        "are the stub boundary)"
                    )
            elif tag[2:4] in (b"db", b"dc") and size:
                frames.append(bytes(body))
            pos += 8 + size + (size & 1)

    walk(payload[12:])
    if w is None or not frames:
        raise ValueError("AVI missing strf header or frames")
    row = w * 3
    pad = (4 - row % 4) % 4
    out = []
    for body in frames:
        arr = np.frombuffer(body, np.uint8)
        arr = arr.reshape(h, row + pad)[:, :row].reshape(h, w, 3)
        out.append(arr[::-1, :, ::-1])  # flip bottom-up, BGR -> RGB
    return np.stack(out)


def synthetic_media_avi(spark: SparkSession, n: int = 12) -> DataFrame:
    """Fixture media table of REAL uncompressed AVIs: deterministic
    moving-gradient frames at varying sizes (odd widths exercise DIB
    row padding) and frame counts."""
    import numpy as np

    rows = []
    for i in range(n):
        w, h = 17 + (i % 4) * 7, 12 + (i % 3) * 6
        nf = 4 + i % 5
        yy, xx = np.mgrid[0:h, 0:w]
        frames = np.stack(
            [
                np.stack(
                    [
                        (xx * 9 + t * 11 + i) % 256,
                        (yy * 13 + t * 5) % 256,
                        (xx + yy + t * 17) % 256,
                    ],
                    axis=-1,
                )
                for t in range(nf)
            ]
        ).astype(np.uint8)
        payload = avi_bytes(frames, fps=8)
        rows.append((i, "video", payload, (w, h, None, nf, "avi")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


FRAME_FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def extract_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame extraction: decode each video payload (raw-frame
    AVI) inside the Arrow batch kernel and emit one feature row per
    SAMPLED frame (index 0, n, 2n, ...): [w, h, mean/255, std/255].
    The plan-only :func:`sample_frames` stays as the metadata path;
    this is its decode-side realization now that the video codec is
    real. Non-video rows pass through with no frames."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for aid, kind, payload in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video" or payload is None:
                    continue
                fr = decode_avi(bytes(payload)).astype(np.float64)
                for idx in range(0, fr.shape[0], every_n):
                    f = fr[idx]
                    rows.append(
                        (
                            int(aid),
                            idx,
                            [
                                float(f.shape[1]),
                                float(f.shape[0]),
                                float(f.mean() / 255.0),
                                float(f.std() / 255.0),
                            ],
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_index", "feature"]
            )

    return media.mapInPandas(run, FRAME_FEATURE_SCHEMA)


def bmp_bytes(pixels) -> bytes:
    """Encode (h, w, 3) uint8 RGB as an uncompressed 24-bit BMP
    (BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up padded BGR rows
    — the same DIB layout the AVI frames use)."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[:2]
    row = w * 3
    pad = (4 - row % 4) % 4
    body_len = (row + pad) * h
    bgr = px[::-1, :, ::-1]
    if pad:
        body = b"".join(bgr[r].tobytes() + b"\x00" * pad for r in range(h))
    else:
        body = bgr.tobytes()
    hdr = struct.pack("<2sIHHI", b"BM", 54 + body_len, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, body_len, 0, 0, 0, 0)
    return hdr + info + body


def decode_bmp(payload: bytes):
    """Decode an uncompressed 24-bit BMP to (h, w, 3) uint8 RGB.
    Top-down bitmaps (negative height) are handled; palettized,
    16/32-bit, and RLE variants raise NotImplementedError."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise NotImplementedError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    size, w, h, _planes, bits, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bits != 24 or comp != 0:
        raise NotImplementedError(f"BMP {bits}bpp/compression {comp}")
    topdown = h < 0
    h = abs(h)
    row = w * 3
    pad = (4 - row % 4) % 4
    arr = np.frombuffer(
        payload, np.uint8, count=(row + pad) * h, offset=data_off
    )
    px = arr.reshape(h, row + pad)[:, :row].reshape(h, w, 3)
    if not topdown:
        px = px[::-1]
    return px[:, :, ::-1]  # BGR -> RGB
