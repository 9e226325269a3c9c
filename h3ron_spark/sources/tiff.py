"""Minimal pure-Python GeoTIFF reader (no GDAL/rasterio in this
container).

Covers the classic-TIFF subset the reference's committed fixtures use
(`/root/reference/data/r.tiff`, `europe-and-north-africa.tif`,
`land_shallow_topo_1024.tif` — h3ron-ndarray/examples/
h3ify_r_tiff.rs:13-19 reads the first via GDAL):

- little/big endian classic TIFF (magic 42)
- strip and tile layouts
- Compression: 1 (none), 5 (TIFF LZW, MSB-first codes with the
  TIFF early-change convention), 8 / 32946 (zlib deflate)
- Predictor 1 (none) and 2 (horizontal differencing)
- BitsPerSample 8/16/32/64, SampleFormat unsigned/signed/float
- GeoTIFF geotransform from ModelPixelScaleTag + ModelTiepointTag
  (33550/33922) or ModelTransformationTag (34264)
- GDAL_NODATA (42113)

Everything here is parsed from the public TIFF 6.0 and GeoTIFF
specifications. The reader returns numpy arrays + a
``raster.Transform`` so the whole R4 pipeline
(``raster.raster_to_cells``) runs on real files end-to-end.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

import numpy as np

# TIFF field types -> (struct fmt, size)
_FIELD = {
    1: ("B", 1),  # BYTE
    2: ("s", 1),  # ASCII
    3: ("H", 2),  # SHORT
    4: ("I", 4),  # LONG
    5: ("I", 4),  # RATIONAL (2 LONGs per value)
    6: ("b", 1),
    7: ("B", 1),
    8: ("h", 2),
    9: ("i", 4),
    10: ("i", 4),  # SRATIONAL (2 SLONGs per value)
    11: ("f", 4),
    12: ("d", 8),
}

_TAG_WIDTH = 256
_TAG_LENGTH = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PREDICTOR = 317
_TAG_TILE_WIDTH = 322
_TAG_TILE_LENGTH = 323
_TAG_TILE_OFFSETS = 324
_TAG_TILE_COUNTS = 325
_TAG_SAMPLE_FORMAT = 339
_TAG_MODEL_PIXEL_SCALE = 33550
_TAG_MODEL_TIEPOINT = 33922
_TAG_MODEL_TRANSFORM = 34264
_TAG_GDAL_NODATA = 42113


def _read_tags(data: bytes):
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF file (missing II/MM byte order)")
    magic, ifd_off = struct.unpack(bo + "HI", data[2:8])
    if magic != 42:
        raise ValueError(f"unsupported TIFF magic {magic} (BigTIFF?)")
    tags: dict[int, tuple] = {}
    (n,) = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])
    for t in range(n):
        e = ifd_off + 2 + 12 * t
        tag, typ, cnt = struct.unpack(bo + "HHI", data[e : e + 8])
        if typ not in _FIELD:
            continue
        fmt, size = _FIELD[typ]
        total = size * cnt * (2 if typ in (5, 10) else 1)
        if total <= 4:
            raw = data[e + 8 : e + 8 + total]
        else:
            (off,) = struct.unpack(bo + "I", data[e + 8 : e + 12])
            raw = data[off : off + total]
        if typ == 2:
            vals = (raw.split(b"\0")[0].decode("ascii", "replace"),)
        elif typ in (5, 10):
            parts = struct.unpack(bo + fmt[0] * 2 * cnt, raw)
            vals = tuple(
                parts[2 * u] / (parts[2 * u + 1] or 1) for u in range(cnt)
            )
        else:
            vals = struct.unpack(bo + fmt * cnt, raw)
        tags[tag] = vals
    return bo, tags


def _lzw_decode(buf: bytes) -> bytes:
    """TIFF-flavor LZW (MSB-first bit packing, early code-width
    change): public TIFF 6.0 §13 algorithm."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        table.clear()
        table.extend(bytes((u,)) for u in range(256))
        table.append(b"")  # 256 clear
        table.append(b"")  # 257 eoi

    reset()
    bitpos = 0
    nbits = 9
    prev: bytes | None = None
    total_bits = len(buf) * 8
    while bitpos + nbits <= total_bits:
        byte = bitpos >> 3
        chunk = int.from_bytes(buf[byte : byte + 4].ljust(4, b"\0"), "big")
        code = (chunk >> (32 - nbits - (bitpos & 7))) & ((1 << nbits) - 1)
        bitpos += nbits
        if code == EOI:
            break
        if code == CLEAR:
            reset()
            nbits = 9
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        # TIFF early change: bump width when the NEXT append would
        # overflow the current width
        if len(table) + 1 >= (1 << nbits) and nbits < 12:
            nbits += 1
    return bytes(out)


def _decompress(raw: bytes, compression: int) -> bytes:
    if compression == 1:
        return raw
    if compression in (8, 32946):
        return zlib.decompress(raw)
    if compression == 5:
        return _lzw_decode(raw)
    if compression == 32773:  # PackBits
        out = bytearray()
        u = 0
        while u < len(raw):
            nv = raw[u]
            n = nv - 256 if nv > 127 else nv
            u += 1
            if n >= 0:
                out += raw[u : u + n + 1]
                u += n + 1
            elif n != -128:
                out += raw[u : u + 1] * (1 - n)
                u += 1
        return bytes(out)
    raise ValueError(f"unsupported TIFF compression {compression}")


@dataclass
class GeoTiff:
    """Decoded raster: ``bands`` is (samples, height, width)."""

    bands: np.ndarray
    transform: "object"  # raster.Transform (import cycle avoidance)
    nodata: float | None
    crs_wkt: str | None = None

    @property
    def band(self) -> np.ndarray:
        return self.bands[0]


def read_geotiff(path: str) -> GeoTiff:
    with open(path, "rb") as f:
        data = f.read()
    bo, tags = _read_tags(data)

    width = tags[_TAG_WIDTH][0]
    height = tags[_TAG_LENGTH][0]
    spp = tags.get(_TAG_SPP, (1,))[0]
    bits = tags.get(_TAG_BITS, (8,) * spp)
    sfmt = tags.get(_TAG_SAMPLE_FORMAT, (1,) * spp)
    compression = tags.get(_TAG_COMPRESSION, (1,))[0]
    predictor = tags.get(_TAG_PREDICTOR, (1,))[0]
    if len(set(bits)) != 1 or len(set(sfmt)) != 1:
        raise ValueError("mixed per-sample bit depths not supported")
    b0, f0 = bits[0], sfmt[0]
    kind = {1: "u", 2: "i", 3: "f"}.get(f0)
    if kind is None or b0 not in (8, 16, 32, 64):
        raise ValueError(f"unsupported sample format {f0}/{b0}")
    dt = np.dtype(f"{bo}{kind}{b0 // 8}")

    arr = np.zeros((height, width, spp), dtype=dt)
    if _TAG_TILE_OFFSETS in tags:
        tw = tags[_TAG_TILE_WIDTH][0]
        th = tags[_TAG_TILE_LENGTH][0]
        offs = tags[_TAG_TILE_OFFSETS]
        cnts = tags[_TAG_TILE_COUNTS]
        tiles_x = (width + tw - 1) // tw
        for idx, (off, cnt) in enumerate(zip(offs, cnts)):
            ty, tx = divmod(idx, tiles_x)
            raw = _decompress(data[off : off + cnt], compression)
            tile = np.frombuffer(raw, dtype=dt, count=th * tw * spp)
            tile = tile.reshape(th, tw, spp)
            if predictor == 2:
                tile = np.cumsum(
                    tile.astype(np.int64), axis=1, dtype=np.int64
                ).astype(dt)
            y0, x0 = ty * th, tx * tw
            ys, xs = min(th, height - y0), min(tw, width - x0)
            arr[y0 : y0 + ys, x0 : x0 + xs] = tile[:ys, :xs]
    else:
        offs = tags[_TAG_STRIP_OFFSETS]
        cnts = tags[_TAG_STRIP_COUNTS]
        rps = tags.get(_TAG_ROWS_PER_STRIP, (height,))[0]
        row = 0
        for off, cnt in zip(offs, cnts):
            raw = _decompress(data[off : off + cnt], compression)
            rows = min(rps, height - row)
            strip = np.frombuffer(raw, dtype=dt, count=rows * width * spp)
            strip = strip.reshape(rows, width, spp)
            if predictor == 2:
                strip = np.cumsum(
                    strip.astype(np.int64), axis=1, dtype=np.int64
                ).astype(dt)
            arr[row : row + rows] = strip
            row += rows
    bands = np.ascontiguousarray(np.moveaxis(arr, 2, 0))

    from h3ron_spark.raster import Transform

    if _TAG_MODEL_TRANSFORM in tags:
        m = tags[_TAG_MODEL_TRANSFORM]
        transform = Transform(m[0], m[1], m[4], m[5], m[3], m[7])
    elif _TAG_MODEL_PIXEL_SCALE in tags and _TAG_MODEL_TIEPOINT in tags:
        sx, sy = tags[_TAG_MODEL_PIXEL_SCALE][:2]
        tp = tags[_TAG_MODEL_TIEPOINT]
        # tiepoint: raster (I,J,K) -> model (X,Y,Z); GeoTIFF Y scale
        # is positive for north-up rasters, applied negatively
        i0, j0, _k, x0, y0, _z = tp[:6]
        transform = Transform(
            sx, 0.0, 0.0, -sy, x0 - i0 * sx, y0 + j0 * sy
        )
    else:
        transform = Transform(1.0, 0.0, 0.0, 1.0, 0.0, 0.0)

    nodata = None
    nd = tags.get(_TAG_GDAL_NODATA)
    if nd:
        try:
            nodata = float(nd[0].strip().split()[0])
        except (ValueError, IndexError):
            nodata = None
    crs = tags.get(34737)
    return GeoTiff(
        bands=bands,
        transform=transform,
        nodata=nodata,
        crs_wkt=crs[0] if crs else None,
    )


def write_geotiff_uncompressed(
    path: str,
    band: np.ndarray,
    transform,
    nodata: float | None = None,
) -> None:
    """Write a minimal single-band uncompressed little-endian GeoTIFF
    (fixture generator for tests/registry queries — NOT a general
    writer). Axis-aligned transforms only."""
    band = np.asarray(band)
    h, w = band.shape
    dt = band.dtype
    kind = {"u": 1, "i": 2, "f": 3}[dt.kind]
    bits = dt.itemsize * 8
    pixels = band.astype(np.dtype(f"<{dt.kind}{dt.itemsize}")).tobytes()

    entries = []

    def entry(tag, typ, cnt, val_bytes):
        entries.append((tag, typ, cnt, val_bytes))

    extra = bytearray()
    header_size = 8
    # layout: header | IFD (written later) | extra | pixels
    nd_ascii = None
    if nodata is not None:
        txt = (
            f"{int(nodata)}" if float(nodata).is_integer() else f"{nodata}"
        )
        # pad past 4 bytes so the value always lives at an offset
        # (our entry encoder always writes a pointer for ASCII)
        nd_ascii = txt.ljust(4).encode() + b"\0"

    n_entries = 12 + (1 if nd_ascii else 0)
    ifd_off = header_size
    extra_off = ifd_off + 2 + 12 * n_entries + 4
    scale_off = extra_off
    extra += struct.pack(
        "<3d", abs(transform.a), abs(transform.e), 0.0
    )
    tie_off = extra_off + 24
    extra += struct.pack(
        "<6d", 0.0, 0.0, 0.0, transform.xoff, transform.yoff, 0.0
    )
    nd_off = extra_off + len(extra)
    if nd_ascii:
        extra += nd_ascii
        if len(extra) % 2:
            extra += b"\0"
    pix_off = extra_off + len(extra)

    def short(v):
        return struct.pack("<HH", v, 0)

    def long_(v):
        return struct.pack("<I", v)

    entry(_TAG_WIDTH, 3, 1, short(w))
    entry(_TAG_LENGTH, 3, 1, short(h))
    entry(_TAG_BITS, 3, 1, short(bits))
    entry(_TAG_COMPRESSION, 3, 1, short(1))
    entry(262, 3, 1, short(1))  # BlackIsZero
    entry(_TAG_STRIP_OFFSETS, 4, 1, long_(pix_off))
    entry(_TAG_SPP, 3, 1, short(1))
    entry(_TAG_ROWS_PER_STRIP, 3, 1, short(h))
    entry(_TAG_STRIP_COUNTS, 4, 1, long_(len(pixels)))
    entry(_TAG_SAMPLE_FORMAT, 3, 1, short(kind))
    entry(_TAG_MODEL_PIXEL_SCALE, 12, 3, long_(scale_off))
    entry(_TAG_MODEL_TIEPOINT, 12, 6, long_(tie_off))
    if nd_ascii:
        entry(_TAG_GDAL_NODATA, 2, len(nd_ascii), long_(nd_off))
    entries.sort(key=lambda e: e[0])

    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_off)
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, vb in entries:
        out += struct.pack("<HHI", tag, typ, cnt) + vb.ljust(4, b"\0")[:4]
    out += struct.pack("<I", 0)  # next IFD
    out += extra
    out += pixels
    with open(path, "wb") as f:
        f.write(bytes(out))
