"""Minimal pure-Python OSM .pbf reader (P13 front-end).

The reference ingests `.osm.pbf` through the `osmpbfreader` crate
(h3ron-graph/src/io/osm.rs:30-121: stream ways, apply a WayAnalyzer,
trace coordinates into H3 edges). This module implements the public
OSM PBF wire format (https://wiki.openstreetmap.org/wiki/PBF_Format)
with nothing but the stdlib + numpy:

- file framing: [int32 BE header length][BlobHeader][Blob]
- BlobHeader {1: type, 3: datasize}; Blob {1: raw, 2: raw_size,
  3: zlib_data}
- PrimitiveBlock {1: stringtable, 2: primitivegroup*,
  17: granularity, 19: lat_offset, 20: lon_offset}
- DenseNodes {1: ids sint64 packed delta, 8: lat, 9: lon,
  10: keys_vals}; Way {1: id, 2: keys, 3: vals, 8: refs packed
  delta}

Scale model: the driver scans ONLY the blob directory (offset/size
pairs — cheap sequential read of framing headers, no decompression),
then blobs decode in parallel on executors via ``mapInPandas``;
nodes join to way refs as a plain Spark equi-join, so a planet file
never materializes on one machine. A fixture WRITER
(``write_osm_pbf``) producing the same subset keeps tests
self-contained (no .pbf ships in either repo).
"""

from __future__ import annotations

import struct
import zlib

# ------------------------------------------------------- protobuf core


def _uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _fields(buf: bytes):
    """Yield (field_no, wire_type, value) — value is int for varint,
    bytes for length-delimited, raw int for fixed32/64."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _uvarint(buf, pos)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, pos = _uvarint(buf, pos)
        elif wt == 2:
            ln, pos = _uvarint(buf, pos)
            v = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:
            v = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        elif wt == 1:
            v = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, v


def _packed_varints(buf: bytes, signed: bool = False) -> list[int]:
    out = []
    pos = 0
    n = len(buf)
    while pos < n:
        v, pos = _uvarint(buf, pos)
        out.append(_zigzag(v) if signed else v)
    return out


def _enc_uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_zigzag(v: int) -> bytes:
    return _enc_uvarint((v << 1) ^ (v >> 63) if v < 0 else v << 1)


def _enc_field(fno: int, wt: int, payload: bytes | int) -> bytes:
    key = _enc_uvarint((fno << 3) | wt)
    if wt == 0:
        return key + _enc_uvarint(payload)
    return key + _enc_uvarint(len(payload)) + payload


# ------------------------------------------------------- blob framing


def scan_blobs(path: str) -> list[tuple[str, int, int]]:
    """Sequentially read ONLY the framing headers: returns
    (blob_type, payload_offset, payload_size) per blob. No blob
    payload is decompressed — this is the cheap driver-side pass."""
    out = []
    with open(path, "rb") as f:
        while True:
            head = f.read(4)
            if len(head) < 4:
                break
            (hlen,) = struct.unpack(">I", head)
            hdr = f.read(hlen)
            btype = "?"
            dsize = 0
            for fno, _wt, v in _fields(hdr):
                if fno == 1:
                    btype = v.decode("utf-8", "replace")
                elif fno == 3:
                    dsize = v
            off = f.tell()
            out.append((btype, off, dsize))
            f.seek(off + dsize)
    return out


def _read_blob(path: str, offset: int, size: int) -> bytes:
    with open(path, "rb") as f:
        f.seek(offset)
        raw = f.read(size)
    data = None
    for fno, _wt, v in _fields(raw):
        if fno == 1:  # raw
            data = v
        elif fno == 3:  # zlib_data
            data = zlib.decompress(v)
    if data is None:
        raise ValueError("blob has no raw/zlib payload (lzma unsupported)")
    return data


# -------------------------------------------------- primitive blocks


def parse_primitive_block(data: bytes) -> dict:
    """Decode one PrimitiveBlock into plain Python structures:
    {"nodes": [(id, lat, lon)], "ways": [(id, [refs], {tags})]}."""
    strings: list[str] = []
    groups: list[bytes] = []
    granularity = 100
    lat_off = 0
    lon_off = 0
    for fno, _wt, v in _fields(data):
        if fno == 1:
            strings = [
                s.decode("utf-8", "replace")
                for f2, _w2, s in _fields(v)
                if f2 == 1
            ]
        elif fno == 2:
            groups.append(v)
        elif fno == 17:
            granularity = v
        elif fno == 19:
            lat_off = v - (1 << 64) if v >= (1 << 63) else v
        elif fno == 20:
            lon_off = v - (1 << 64) if v >= (1 << 63) else v

    nodes: list[tuple[int, float, float]] = []
    ways: list[tuple[int, list[int], dict]] = []
    scale = 1e-9

    for g in groups:
        for fno, _wt, v in _fields(g):
            if fno == 2:  # DenseNodes
                ids = lats = lons = None
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        ids = _packed_varints(v2, signed=True)
                    elif f2 == 8:
                        lats = _packed_varints(v2, signed=True)
                    elif f2 == 9:
                        lons = _packed_varints(v2, signed=True)
                if ids:
                    ci = cla = clo = 0
                    for di, dla, dlo in zip(ids, lats, lons):
                        ci += di
                        cla += dla
                        clo += dlo
                        nodes.append(
                            (
                                ci,
                                scale * (lat_off + granularity * cla),
                                scale * (lon_off + granularity * clo),
                            )
                        )
            elif fno == 1:  # plain Node
                nid = 0
                la = lo = 0
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        nid = _zigzag(v2)
                    elif f2 == 8:
                        la = _zigzag(v2)
                    elif f2 == 9:
                        lo = _zigzag(v2)
                nodes.append(
                    (
                        nid,
                        scale * (lat_off + granularity * la),
                        scale * (lon_off + granularity * lo),
                    )
                )
            elif fno == 3:  # Way
                wid = 0
                keys: list[int] = []
                vals: list[int] = []
                refs: list[int] = []
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        wid = v2
                    elif f2 == 2:
                        keys = _packed_varints(v2)
                    elif f2 == 3:
                        vals = _packed_varints(v2)
                    elif f2 == 8:
                        deltas = _packed_varints(v2, signed=True)
                        cur = 0
                        for d in deltas:
                            cur += d
                            refs.append(cur)
                tags = {
                    strings[k]: strings[x]
                    for k, x in zip(keys, vals)
                    if k < len(strings) and x < len(strings)
                }
                ways.append((wid, refs, tags))
    return {"nodes": nodes, "ways": ways}


# ----------------------------------------------------- fixture writer


def write_osm_pbf(
    path: str,
    nodes: list[tuple[int, float, float]],
    ways: list[tuple[int, list[int], dict]],
) -> None:
    """Write a minimal valid .osm.pbf (one OSMHeader + one OSMData
    blob, DenseNodes + Ways, zlib-compressed) — fixture generator for
    tests; not a general-purpose writer."""
    # --- stringtable (index 0 must be the empty string)
    strings: list[str] = [""]
    sidx: dict[str, int] = {"": 0}

    def intern(s: str) -> int:
        if s not in sidx:
            sidx[s] = len(strings)
            strings.append(s)
        return sidx[s]

    way_msgs = []
    for wid, refs, tags in ways:
        body = _enc_field(1, 0, wid)
        if tags:
            keys = b"".join(_enc_uvarint(intern(k)) for k in tags)
            vals = b"".join(_enc_uvarint(intern(v)) for v in tags.values())
            body += _enc_field(2, 2, keys) + _enc_field(3, 2, vals)
        deltas = bytearray()
        prev = 0
        for r in refs:
            deltas += _enc_zigzag(r - prev)
            prev = r
        body += _enc_field(8, 2, bytes(deltas))
        way_msgs.append(_enc_field(3, 2, body))

    ids = bytearray()
    lats = bytearray()
    lons = bytearray()
    pi = pla = plo = 0
    for nid, lat, lon in nodes:
        ila = round(lat * 1e9 / 100)
        ilo = round(lon * 1e9 / 100)
        ids += _enc_zigzag(nid - pi)
        lats += _enc_zigzag(ila - pla)
        lons += _enc_zigzag(ilo - plo)
        pi, pla, plo = nid, ila, ilo
    dense = (
        _enc_field(1, 2, bytes(ids))
        + _enc_field(8, 2, bytes(lats))
        + _enc_field(9, 2, bytes(lons))
    )

    group = _enc_field(2, 2, dense) + b"".join(way_msgs)
    st = b"".join(_enc_field(1, 2, s.encode()) for s in strings)
    block = (
        _enc_field(1, 2, st)
        + _enc_field(2, 2, group)
        + _enc_field(17, 0, 100)
    )

    def blob(btype: str, payload: bytes) -> bytes:
        z = zlib.compress(payload)
        b = _enc_field(2, 0, len(payload)) + _enc_field(3, 2, z)
        hdr = _enc_field(1, 2, btype.encode()) + _enc_field(3, 0, len(b))
        return struct.pack(">I", len(hdr)) + hdr + b

    header_block = _enc_field(4, 2, b"OsmSchema-V0.6") + _enc_field(
        4, 2, b"DenseNodes"
    )
    with open(path, "wb") as f:
        f.write(blob("OSMHeader", header_block))
        f.write(blob("OSMData", block))


# ------------------------------------------------------- Spark reader


def osm_pbf_to_dataframes(spark, path: str):
    """Decode a .pbf into (nodes_df, ways_df):

    - nodes: (node_id long, lat double, lng double)
    - ways: (way_id long, seq int, ref long, tags map<string,string>)

    Blob payloads decode on EXECUTORS (mapInPandas over the blob
    directory), so decompression + varint work parallelizes across
    the cluster and scales to planet-size files; the driver reads
    only framing headers."""
    import pandas as pd

    blobs = [
        (off, size)
        for btype, off, size in scan_blobs(path)
        if btype == "OSMData"
    ]
    if not blobs:
        empty_n = spark.createDataFrame(
            [], "node_id long, lat double, lng double"
        )
        empty_w = spark.createDataFrame(
            [], "way_id long, seq int, ref long, tags map<string,string>"
        )
        return empty_n, empty_w
    bdf = spark.createDataFrame(
        blobs, "offset long, size long"
    ).repartition(min(len(blobs), 64))

    def decode_nodes(batches):
        for pdf in batches:
            rows = []
            for off, size in zip(pdf["offset"], pdf["size"]):
                blk = parse_primitive_block(
                    _read_blob(path, int(off), int(size))
                )
                rows.extend(blk["nodes"])
            if rows:
                yield pd.DataFrame(rows, columns=["node_id", "lat", "lng"])
            else:
                yield pd.DataFrame(
                    {
                        "node_id": pd.Series(dtype="int64"),
                        "lat": pd.Series(dtype="float64"),
                        "lng": pd.Series(dtype="float64"),
                    }
                )

    def decode_ways(batches):
        for pdf in batches:
            rows = []
            for off, size in zip(pdf["offset"], pdf["size"]):
                blk = parse_primitive_block(
                    _read_blob(path, int(off), int(size))
                )
                for wid, refs, tags in blk["ways"]:
                    for seq, ref in enumerate(refs):
                        rows.append((wid, seq, ref, tags))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["way_id", "seq", "ref", "tags"]
                )
            else:
                yield pd.DataFrame(
                    {
                        "way_id": pd.Series(dtype="int64"),
                        "seq": pd.Series(dtype="int32"),
                        "ref": pd.Series(dtype="int64"),
                        "tags": pd.Series(dtype="object"),
                    }
                )

    nodes_df = bdf.mapInPandas(
        decode_nodes, "node_id long, lat double, lng double"
    )
    ways_df = bdf.mapInPandas(
        decode_ways,
        "way_id long, seq int, ref long, tags map<string,string>",
    )
    return nodes_df, ways_df
