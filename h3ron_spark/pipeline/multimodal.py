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
# REAL decoders for uncompressed container formats (pure Python/numpy
# — no codec libraries needed): RIFF/WAVE PCM and binary PPM/PGM.
# Compressed formats (JPEG/PNG/MP3/H264...) remain stubbed by design;
# the magic-byte dispatch below routes them to NotImplementedError.
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


def real_decode_features(payload: bytes) -> list[float]:
    """Magic-byte dispatch: WAV -> [1, rate/48k, duration_s, mean_abs,
    rms, zero-cross rate]; PPM/PGM -> [2, w, h, mean/255, std/255,
    channels]. Unknown/compressed magics raise NotImplementedError
    (the documented stub boundary)."""
    import numpy as np

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
    raise NotImplementedError(
        "no codec for this payload (compressed formats are stubbed in "
        "this environment); only RIFF/WAVE PCM and binary PPM/PGM "
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
                    elif not fake:
                        raise NotImplementedError(
                            "no codec for this payload; only binary PPM "
                            "resamples natively (pass fake=True for the "
                            "deterministic test resampler)"
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
