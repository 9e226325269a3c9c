"""Baseline JPEG (ITU-T T.81) codec in pure Python + numpy.

Third real compressed codec after PNG (DEFLATE) and GIF (LZW) — this
one closes the entropy-coding arm of the multimodal stub boundary:
sequential baseline DCT JPEG, the format every real corpus is full of.

Everything here derives from the public spec:
  * ITU-T Recommendation T.81 (1992): marker syntax, huffman canonical
    code construction (F.2.2), magnitude categories / EXTEND (F.2.2.1),
    zigzag order, restart-interval semantics (E.2.4).
  * T.81 Annex K: the example quantization tables (K.1/K.2) and the
    "typical" huffman tables (K.3) that libjpeg ships as defaults.
  * JFIF 1.02 (ECMA TR/98): APP0 header and the BT.601 full-range
    YCbCr <-> RGB transform constants.

The encoder and decoder share only those spec constants — the encoder
exists so tests can cross-validate decode against independently
produced streams (same strategy as the GIF codec: an encoder bug and a
decoder bug would have to cancel exactly to go unseen, and the
flat-DC / quality-100 cases bound reconstruction error analytically).

Reference parity note: the reference engine (nmandery/h3ron) has no
raster codec at all — it ingests pre-decoded raster arrays
(h3ron-ndarray/src/array.rs). This module is beyond-reference surface
for the multimodal pipeline (SURVEY §2 "multimodal columns").

Scale design: decode runs inside ``mapInPandas`` Arrow batches (see
``multimodal.extract_features``) — one Python call per batch of
payloads, embarrassingly parallel across executors, no shuffle. A
100-TB image corpus decodes at scan parallelism; the pure-Python
huffman loop is the single-node throughput bound and is exactly the
piece you'd swap for a native codec wheel in production (the dispatch,
schema and batch shape stay identical).
"""
from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------
# Spec constants (T.81 Annex K; public).
# --------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# K.1 / K.2 example quantization tables (natural row-major order).
Q_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
Q_CHR = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# K.3 "typical" huffman tables: (BITS[1..16], HUFFVAL).
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHR_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Orthonormal 8-point DCT-II matrix: forward F = C @ x @ C.T,
# inverse x = C.T @ F @ C. Both codec halves use it, which keeps the
# decode deterministic (float64 matmul + round) on a given platform.
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = np.sqrt(0.5) if _u == 0 else 1.0
        _C[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def quality_scaled(table: np.ndarray, quality: int) -> np.ndarray:
    """Scale an Annex-K table by quality 1..100 (the widely published
    IJG mapping: scale=5000/q below 50, 200-2q above)."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


def _build_huff_codes(bits, vals):
    """Canonical code assignment (T.81 C.2): symbol -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_huff_decoder(bits, vals):
    """(length, code) -> symbol lookup for the bit-at-a-time decoder."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _magnitude(v: int) -> tuple[int, int]:
    """T.81 F.1.2.1: value -> (category, appended bits)."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _extend(bits: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND."""
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


class _BitWriter:
    """MSB-first bit writer with 0xFF byte stuffing (B.1.1.5)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.n -= 8
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-fill (F.1.2.3)


class _BitReader:
    """MSB-first reader over an UNSTUFFED entropy segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code in JPEG stream")


# --------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------


def _encode_block(bw, coeffs, dc_pred, dc_codes, ac_codes) -> int:
    """Huffman-encode one zigzagged, quantized 64-vector. Returns the
    block's DC value (the next block's predictor)."""
    dc = int(coeffs[0])
    s, bits = _magnitude(dc - dc_pred)
    code, ln = dc_codes[s]
    bw.put(code, ln)
    if s:
        bw.put(bits, s)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if coeffs[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(coeffs[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        s, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.put(code, ln)
        bw.put(bits, s)
        run = 0
    if last_nz != 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.put(code, ln)
    return dc


def _plane_blocks(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Forward DCT + quantize a (h8, w8) plane already padded to
    multiples of 8; returns (n_blocks_y, n_blocks_x, 64) zigzagged
    int32 coefficients. Vectorized: one einsum for every block."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    blocks = (
        plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).astype(np.float64)
        - 128.0
    )
    f = np.einsum("ux,abxy,vy->abuv", _C, blocks, _C)
    q = np.round(f / qtab.reshape(8, 8)).astype(np.int64)
    return q.reshape(by, bx, 64)[:, :, ZIGZAG]


def _pad_to(plane: np.ndarray, my: int, mx: int) -> np.ndarray:
    """Edge-replicate pad to multiples of (my, mx) (T.81 A.2.4 leaves
    the fill to the encoder; replication minimizes ringing)."""
    h, w = plane.shape
    ph = (my - h % my) % my
    pw = (mx - w % mx) % mx
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    """JFIF full-range BT.601."""
    px = px.astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _marker(tag: int, payload: bytes) -> bytes:
    return bytes([0xFF, tag]) + (len(payload) + 2).to_bytes(2, "big") + payload


def jpeg_bytes(
    pixels,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode (h, w, 3) RGB or (h, w) grayscale uint8 to a baseline
    sequential JFIF JPEG. ``subsample=True`` emits 4:2:0 chroma;
    ``restart_interval`` > 0 emits DRI + RSTn every N MCUs (exercises
    the decoder's restart resync path)."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    qy = quality_scaled(Q_LUM, quality)
    qc = quality_scaled(Q_CHR, quality)

    if gray:
        planes = [px.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        ycc = _rgb_to_ycbcr(px)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample:
            # 2x2 box average; pad odd dims first so the mean window
            # never crosses the image edge asymmetrically
            yp = _pad_to(y, 2, 2)
            cbp = _pad_to(cb, 2, 2)
            crp = _pad_to(cr, 2, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
            y = yp
            planes = [y, cb, cr]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    coeff = []
    for plane, (sh, sv), qi in zip(planes, samp, qsel):
        padded = _pad_to(plane, 8 * sv, 8 * sh)
        coeff.append(_plane_blocks(padded, qy if qi == 0 else qc))

    out = bytearray(b"\xff\xd8")  # SOI
    out += _marker(
        0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    )  # APP0
    zz_qy = qy[ZIGZAG]
    zz_qc = qc[ZIGZAG]
    out += _marker(0xDB, bytes([0]) + bytes(int(v) for v in zz_qy))
    if not gray:
        out += _marker(0xDB, bytes([1]) + bytes(int(v) for v in zz_qc))
    if restart_interval:
        out += _marker(0xDD, int(restart_interval).to_bytes(2, "big"))
    # SOF0
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qsel[ci]])
    out += _marker(0xC0, sof)
    # DHT (class<<4 | id)
    for cls, tid, bits, vals in (
        (0, 0, DC_LUM_BITS, DC_LUM_VALS),
        (1, 0, AC_LUM_BITS, AC_LUM_VALS),
        (0, 1, DC_CHR_BITS, DC_CHR_VALS),
        (1, 1, AC_CHR_BITS, AC_CHR_VALS),
    )[: 2 if gray else 4]:
        out += _marker(
            0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        )
    # SOS
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += _marker(0xDA, sos)

    dc_codes = [
        _build_huff_codes(DC_LUM_BITS, DC_LUM_VALS),
        _build_huff_codes(DC_CHR_BITS, DC_CHR_VALS),
    ]
    ac_codes = [
        _build_huff_codes(AC_LUM_BITS, AC_LUM_VALS),
        _build_huff_codes(AC_CHR_BITS, AC_CHR_VALS),
    ]

    mcu_w = 8 * hmax
    mcu_h = 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    bw = _BitWriter()
    dc_pred = [0] * ncomp
    rst = 0
    since_rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and since_rst == restart_interval:
                bw.flush()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                since_rst = 0
                dc_pred = [0] * ncomp
            for ci in range(ncomp):
                sh, sv = samp[ci]
                t = 0 if ci == 0 else 1
                for by in range(sv):
                    for bx in range(sh):
                        row = my * sv + by
                        col = mx * sh + bx
                        cb = coeff[ci]
                        # edge MCUs may index past the component's
                        # block grid when dims aren't MCU-aligned;
                        # clamp = re-encode the edge block (A.2.4)
                        row = min(row, cb.shape[0] - 1)
                        col = min(col, cb.shape[1] - 1)
                        dc_pred[ci] = _encode_block(
                            bw, cb[row, col], dc_pred[ci],
                            dc_codes[t], ac_codes[t],
                        )
            since_rst += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential DCT JPEG to (h, w, 3) RGB uint8
    (grayscale streams are replicated to 3 channels so the feature
    kernel sees one shape). Supports multi-table DQT/DHT segments,
    4:4:4 / 4:2:2 / 4:2:0 sampling, restart intervals, and skips
    APPn/COM. Progressive (SOF2), arithmetic coding, and 12-bit
    precision raise NotImplementedError."""
    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    restart_interval = 0
    frame = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # standalone
            continue
        seg_len = int.from_bytes(payload[pos : pos + 2], "big")
        seg = payload[pos + 2 : pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                prec = seg[i] >> 4
                tid = seg[i] & 0x0F
                i += 1
                if prec:
                    vals = np.frombuffer(
                        seg[i : i + 128], dtype=">u2"
                    ).astype(np.int64)
                    i += 128
                else:
                    vals = np.frombuffer(
                        seg[i : i + 64], dtype=np.uint8
                    ).astype(np.int64)
                    i += 64
                tab = np.empty(64, dtype=np.int64)
                tab[ZIGZAG] = vals  # DQT stores zigzag order
                qtabs[tid] = tab
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                cls = seg[i] >> 4
                tid = seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                htabs[(cls, tid)] = _build_huff_decoder(bits, vals)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG precision")
            fh = int.from_bytes(seg[1:3], "big")
            fw = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for ci in range(ncomp):
                cid, sf, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, sf >> 4, sf & 0x0F, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, *range(0xC5, 0xC8), *range(0xC9, 0xCC)):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02x})"
            )
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_sel = {}
            for si in range(ns):
                cid, tt = seg[1 + 2 * si : 3 + 2 * si]
                scan_sel[cid] = (tt >> 4, tt & 0x0F)
            return _decode_scan(
                payload, pos, frame, scan_sel, qtabs, htabs, restart_interval
            )
        # APPn / COM / everything else: skip
    raise ValueError("JPEG contains no scan")


def _decode_scan(payload, pos, frame, scan_sel, qtabs, htabs, ri):
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))

    # split entropy data into restart segments, unstuffing 0xFF00
    segments = []
    cur = bytearray()
    i = pos
    end = len(payload)
    while i < end:
        b = payload[i]
        if b == 0xFF:
            nxt = payload[i + 1] if i + 1 < end else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next marker ends the scan
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    planes = []
    for cid, sh, sv, tq in comps:
        planes.append(
            np.zeros((mcus_y * sv * 8, mcus_x * sh * 8), dtype=np.float64)
        )

    n_mcus = mcus_x * mcus_y
    per_seg = ri if ri else n_mcus
    mcu = 0
    for seg_data in segments:
        if mcu >= n_mcus:
            break
        br = _BitReader(seg_data)
        dc_pred = {cid: 0 for cid, *_ in comps}
        for _ in range(min(per_seg, n_mcus - mcu)):
            my, mx = divmod(mcu, mcus_x)
            for ci, (cid, sh, sv, tq) in enumerate(comps):
                dct, act = scan_sel[cid]
                dc_tab = htabs[(0, dct)]
                ac_tab = htabs[(1, act)]
                for by in range(sv):
                    for bx in range(sh):
                        zz = np.zeros(64, dtype=np.int64)
                        s = br.read_symbol(dc_tab)
                        diff = _extend(br.read_bits(s), s) if s else 0
                        dc_pred[cid] += diff
                        zz[0] = dc_pred[cid]
                        k = 1
                        while k < 64:
                            rs = br.read_symbol(ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run overflow")
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[ZIGZAG] = zz  # de-zigzag first...
                        blk = blk * qtabs[tq]  # ...dequant in natural order
                        px = _C.T @ blk.reshape(8, 8) @ _C + 128.0
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu += 1

    out_planes = []
    for (cid, sh, sv, tq), plane in zip(comps, planes):
        up = np.repeat(np.repeat(plane, vmax // sv, axis=0), hmax // sh, axis=1)
        out_planes.append(up[:fh, :fw])
    if len(out_planes) == 1:
        y = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
