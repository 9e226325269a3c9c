"""Minimal WKT parsing/formatting for geometry <-> cells dispatch.

Supports POINT, MULTIPOINT, LINESTRING, MULTILINESTRING, POLYGON,
MULTIPOLYGON, GEOMETRYCOLLECTION — the geo-types the reference's
ToH3Cells dispatches over (h3ron/src/to_h3.rs:24-127). Coordinates
are WKT order (lng lat, i.e. x y); the cell kernels take (lat, lng).
"""

from __future__ import annotations

import re

_NUM = r"[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?"


def _parse_coords(body: str):
    """'x y, x y, ...' -> [(lat, lng), ...] (swapping to lat-first)."""
    pts = []
    for pair in body.split(","):
        nums = re.findall(_NUM, pair)
        if len(nums) < 2:
            raise ValueError(f"bad WKT coordinate: {pair!r}")
        x, y = float(nums[0]), float(nums[1])
        pts.append((y, x))
    return pts


def _split_rings(body: str):
    """'(r1), (r2), ...' -> list of ring strings."""
    rings = []
    depth = 0
    start = None
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                rings.append(body[start:i])
    return rings


def parse_wkt(wkt: str):
    """Parse WKT into (kind, payload):
    - ('point', (lat, lng))
    - ('multipoint', [(lat, lng), ...])
    - ('linestring', [(lat, lng), ...])
    - ('multilinestring', [[(lat, lng), ...], ...])
    - ('polygon', (outer, [holes...]))
    - ('multipolygon', [(outer, [holes...]), ...])
    - ('geometrycollection', [parsed, ...])
    """
    s = wkt.strip()
    m = re.match(r"^\s*([A-Za-z]+)\s*(.*)$", s, re.S)
    if not m:
        raise ValueError(f"bad WKT: {wkt[:50]!r}")
    kind = m.group(1).upper()
    rest = m.group(2).strip()
    if rest.upper() == "EMPTY":
        return (kind.lower(), [])
    inner = rest[1:-1] if rest.startswith("(") and rest.endswith(")") else rest

    if kind == "POINT":
        return ("point", _parse_coords(inner)[0])
    if kind == "MULTIPOINT":
        if "(" in inner:
            return ("multipoint", [_parse_coords(r)[0] for r in _split_rings(inner)])
        return ("multipoint", _parse_coords(inner))
    if kind == "LINESTRING":
        return ("linestring", _parse_coords(inner))
    if kind == "MULTILINESTRING":
        return ("multilinestring", [_parse_coords(r) for r in _split_rings(inner)])
    if kind == "POLYGON":
        rings = [_parse_coords(r) for r in _split_rings(inner)]
        return ("polygon", (rings[0], rings[1:]))
    if kind == "MULTIPOLYGON":
        polys = []
        for poly in _split_polys(rest):
            rings = [_parse_coords(r) for r in _split_rings(poly)]
            polys.append((rings[0], rings[1:]))
        return ("multipolygon", polys)
    if kind == "GEOMETRYCOLLECTION":
        return ("geometrycollection", [parse_wkt(p) for p in _split_top(inner)])
    raise ValueError(f"unsupported WKT kind: {kind}")


def _split_polys(body: str):
    """Top-level '((...)), ((...))' -> ['(...)','(...)'] per polygon."""
    out = []
    depth = 0
    start = None
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 1:
                start = i
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 1 and start is not None:
                out.append(body[start : i + 1])
                start = None
    return out


def _split_top(body: str):
    """Split a geometrycollection body on top-level commas."""
    parts = []
    depth = 0
    cur = []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def geometry_to_cells(wkt: str, res: int) -> list[int]:
    """ToH3Cells dispatch (to_h3.rs:24-127): any supported geometry ->
    sorted, deduped cells at ``res``."""
    from h3ron_spark.h3core.cells import latlng_to_cell
    from h3ron_spark.h3core.regions import line_to_cells, polygon_to_cells

    kind, payload = parse_wkt(wkt)
    out: set[int] = set()
    if kind == "point":
        out.add(latlng_to_cell(payload[0], payload[1], res))
    elif kind == "multipoint":
        out.update(latlng_to_cell(la, ln, res) for la, ln in payload)
    elif kind == "linestring":
        out.update(line_to_cells(payload, res))
    elif kind == "multilinestring":
        for line in payload:
            out.update(line_to_cells(line, res))
    elif kind == "polygon":
        outer, holes = payload
        out.update(polygon_to_cells(outer, res, holes))
    elif kind == "multipolygon":
        for outer, holes in payload:
            out.update(polygon_to_cells(outer, res, holes))
    elif kind == "geometrycollection":
        for sub in _collection_wkts(wkt):
            out.update(geometry_to_cells(sub, res))
    else:
        raise ValueError(f"unsupported geometry kind {kind}")
    return sorted(out)


def _collection_wkts(wkt: str) -> list[str]:
    s = wkt.strip()
    inner = re.match(r"^\s*GEOMETRYCOLLECTION\s*\((.*)\)\s*$", s, re.S | re.I)
    if not inner:
        return []
    return _split_top(inner.group(1))
