"""Region <-> cell conversions: polyfill, line trace, dissolve.

Parity targets (re-expressed, not ported):
- polygon_to_cells / ToH3Cells:  h3ron/src/to_h3.rs:213-247 (centroid-in
  containment semantics, same as libh3 polygonToCells)
- intersecting cells:            h3ron/src/to_h3.rs:136-178
- linestring trace:              h3ron/src/lib.rs:112-132
- to_linked_polygons (dissolve): h3ron/src/to_geo.rs:176-244

Implementation notes:
- point-in-polygon is planar ray casting over (lng, lat), matching
  libh3's planar treatment of polygon containment for non-antimeridian
  polygons. Polygons crossing the antimeridian are not supported
  (documented divergence; the reference inherits the same caveat from
  libh3's loop semantics).
- polyfill = boundary trace (grid paths between consecutive vertex
  cells) + BFS flood over neighbors keeping centroid-in cells. This
  visits O(result + perimeter) cells; no bbox scan.
- dissolve stitches the directed edges whose reverse neighbor is
  outside the set into closed rings; outer rings are CCW in (lng,lat),
  holes CW, matching the usual GeoJSON winding.
"""

from __future__ import annotations

from h3ron_spark.h3core.cells import (
    cell_to_boundary,
    cell_to_latlng,
    cells_to_directed_edge,
    edge_boundary,
    edge_destination,
    get_resolution,
    grid_disk,
    grid_path_cells,
    latlng_to_cell,
    neighbors,
    origin_to_directed_edges,
)


def point_in_ring(lat: float, lng: float, ring) -> bool:
    """Ray-cast containment of (lat,lng) in a ring of (lat,lng) pairs."""
    inside = False
    n = len(ring)
    for i in range(n):
        la1, ln1 = ring[i]
        la2, ln2 = ring[(i + 1) % n]
        if (la1 > lat) != (la2 > lat):
            x = ln1 + (lat - la1) / (la2 - la1) * (ln2 - ln1)
            if x > lng:
                inside = not inside
    return inside


def point_in_polygon(lat: float, lng: float, ring, holes=()) -> bool:
    if not point_in_ring(lat, lng, ring):
        return False
    return not any(point_in_ring(lat, lng, h) for h in holes)


def line_to_cells(coords, res: int) -> list[int]:
    """Ordered, deduped cells along a linestring (h3ron/src/lib.rs:112-132)."""
    verts = [latlng_to_cell(la, ln, res) for la, ln in coords]
    out: list[int] = []
    for a, b in zip(verts, verts[1:]):
        path = grid_path_cells(a, b)
        if path is None:  # unroutable segment (pentagon distortion):
            path = [a, b]  # keep endpoints, degrade gracefully
        for c in path:
            if not out or out[-1] != c:  # consecutive dedup, as lib.rs:129
                out.append(c)
    if not out and verts:
        out.append(verts[0])
    return out


def polygon_to_cells(ring, res: int, holes=()) -> list[int]:
    """All cells at ``res`` whose centroid lies inside the polygon
    (libh3 polygonToCells containment mode 0; to_h3.rs:213-247)."""
    if len(ring) < 3:
        return []
    # 1. trace the boundary (always connected, covers narrow necks)
    boundary = set(line_to_cells(list(ring) + [ring[0]], res))
    for h in holes:
        if len(h) >= 3:
            boundary |= set(line_to_cells(list(h) + [h[0]], res))

    def centroid_in(c: int) -> bool:
        la, ln = cell_to_latlng(c)
        return point_in_polygon(la, ln, ring, holes)

    result = {c for c in boundary if centroid_in(c)}
    # 2. BFS inward from the boundary through centroid-in cells
    frontier = list(boundary)
    visited = set(boundary)
    while frontier:
        nxt = []
        for c in frontier:
            for n in neighbors(c):
                if n in visited:
                    continue
                visited.add(n)
                if centroid_in(n):
                    result.add(n)
                    nxt.append(n)
        frontier = nxt
    return sorted(result)


def polygon_to_intersecting_cells(ring, res: int, holes=()) -> list[int]:
    """Superset polyfill: centroid-in cells plus boundary-trace cells and
    their immediate neighbors whose hexagon intersects the polygon
    (to_h3.rs:136-178). Intersection test: any boundary vertex of the
    cell inside the polygon, or cell centroid inside, or any polygon
    vertex inside the cell (approximated by centroid-in-disk test)."""
    core = set(polygon_to_cells(ring, res, holes))
    cand = set()
    for c in set(line_to_cells(list(ring) + [ring[0]], res)):
        cand |= set(grid_disk(c, 1))
    out = set(core)
    for c in cand - core:
        verts = cell_to_boundary(c)
        la, ln = cell_to_latlng(c)
        if point_in_polygon(la, ln, ring, holes) or any(
            point_in_polygon(va, vn, ring, holes) for va, vn in verts
        ):
            out.add(c)
            continue
        # polygon vertex inside this cell?
        if any(latlng_to_cell(pa, pn, get_resolution(c)) == c for pa, pn in ring):
            out.add(c)
    return sorted(out)


def _neighbors_ccw(cell: int):
    """Neighbors of a cell ordered counter-clockwise by bearing from
    the cell centroid (bearing increases clockwise, so sort desc)."""
    import math

    la0, ln0 = cell_to_latlng(cell)
    la1 = math.radians(la0)

    def bearing(c):
        la, ln = cell_to_latlng(c)
        dlng = math.radians(ln - ln0)
        la2 = math.radians(la)
        return math.atan2(
            math.sin(dlng) * math.cos(la2),
            math.cos(la1) * math.sin(la2)
            - math.sin(la1) * math.cos(la2) * math.cos(dlng),
        )

    return sorted(neighbors(cell), key=bearing, reverse=True)


def _ring_area(ring) -> float:
    """Signed shoelace area in (lng, lat) plane: >0 = CCW."""
    s = 0.0
    n = len(ring)
    for i in range(n):
        la1, ln1 = ring[i]
        la2, ln2 = ring[(i + 1) % n]
        s += ln1 * la2 - ln2 * la1
    return s / 2.0


def cells_to_polygons(cells) -> list[tuple[list, list]]:
    """Dissolve a cell set into (outer_ring, holes) multipolygon parts
    (to_linked_polygons, h3ron/src/to_geo.rs:176-244).

    Boundary = directed edges whose destination is not in the set.
    """
    cellset = set(cells)
    # boundary half-edges (origin in set, destination out), walked by
    # integer cell topology — no floating-point endpoint matching.
    boundary = set()
    ccw = {}
    for c in cellset:
        ns = None
        for e in origin_to_directed_edges(c):
            d = edge_destination(e)
            if d not in cellset:
                if ns is None:
                    ns = _neighbors_ccw(c)
                    ccw[c] = ns
                boundary.add((c, d))

    def next_edge(o, d):
        ns = ccw[o]
        y = ns[(ns.index(d) + 1) % len(ns)]
        if y not in cellset:
            return (o, y)
        return (y, d)

    rings = []
    used = set()
    for start in boundary:
        if start in used:
            continue
        ring_pts = []
        cur = start
        guard = 0
        while guard < 4 * len(boundary) + 8:
            guard += 1
            used.add(cur)
            seg = edge_boundary(cells_to_directed_edge(cur[0], cur[1]))
            if not ring_pts or seg[0] != ring_pts[-1]:
                ring_pts.extend(seg)
            else:
                ring_pts.append(seg[1])
            cur = next_edge(*cur)
            if cur == start:
                break
        if len(ring_pts) > 3:
            rings.append(ring_pts)
    outers = [(r, _ring_area(r)) for r in rings]
    shells = [r for r, a in outers if a > 0]
    holes = [r for r, a in outers if a <= 0]
    out = []
    for sh in shells:
        my_holes = [
            h for h in holes if point_in_ring(h[0][0], h[0][1], sh)
        ]
        out.append((sh, my_holes))
    if not shells and holes:
        # degenerate: winding ambiguity, return as shells
        out = [(h, []) for h in holes]
    return out


def _triangle_area(a, b, c) -> float:
    """Unsigned area of the (lat,lng)-plane triangle a-b-c."""
    return abs(
        (b[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (b[1] - a[1])
    ) / 2.0


def visvalingam_ring(ring, epsilon: float):
    """Visvalingam-Whyatt simplification, cyclic (ring) variant
    (smoothen.rs:53-60 uses geo's SimplifyVw after the midpoint pass).

    Iteratively drops the vertex whose effective triangle area
    (formed with its cyclic neighbors) is smallest, while that area is
    below ``epsilon``; never reduces below 3 vertices. O(n^2) scan per
    ring — rings here are per-dissolve-group small, and the operator
    runs inside a grouped Arrow batch, so the quadratic constant never
    meets full-table n.
    """
    pts = list(ring)
    while len(pts) > 3:
        n = len(pts)
        best_i = 0
        best_a = None
        for i in range(n):
            a = _triangle_area(pts[i - 1], pts[i], pts[(i + 1) % n])
            if best_a is None or a < best_a:
                best_i, best_a = i, a
        if best_a is not None and best_a < epsilon:
            pts.pop(best_i)
        else:
            break
    return pts


def smoothen_ring(ring, iterations: int = 1, simplify: bool = True):
    """Smoothen a dissolved-hexagon ring
    (smoothen_h3_coordinates, h3ron/src/algorithm/smoothen.rs:17-63).

    The reference exploits equal hexagon edge lengths: one midpoint per
    edge per pass (a Chaikin variant without vertex duplication), then
    Visvalingam-Whyatt simplification with
    ``epsilon = 0.75 * area(triangle(ring[0..3]))`` — three consecutive
    boundary vertices of a hexagon — to drop near-collinear vertices.
    Divergence recorded: the reference keeps the original closing
    coordinate and rotates the ring by 4 before simplifying (an
    endpoint artifact of its open-linestring VW); we treat the ring as
    cyclic, which is the documented intent.
    """
    pts = list(ring)
    for _ in range(max(0, iterations)):
        n = len(pts)
        if n < 3:
            break
        pts = [
            (
                0.5 * pts[i][0] + 0.5 * pts[(i + 1) % n][0],
                0.5 * pts[i][1] + 0.5 * pts[(i + 1) % n][1],
            )
            for i in range(n)
        ]
    if simplify and len(ring) >= 3:
        eps = 0.75 * _triangle_area(ring[0], ring[1], ring[2])
        pts = visvalingam_ring(pts, eps)
    return pts


def find_cell_clusters(cells, values=None) -> dict[int, int]:
    """Connected components of neighboring cells, optionally requiring
    equal values (h3ron/src/algorithm/cell_clusters.rs:12-116). Returns
    cell -> cluster label (min cell id in the cluster). Scalar oracle
    for the distributed operator in operators.clusters."""
    cellset = set(cells)
    val = dict(zip(cells, values)) if values is not None else None
    label = {c: c for c in cellset}

    def find(c):
        root = c
        while label[root] != root:
            root = label[root]
        while label[c] != root:
            label[c], c = root, label[c]
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            label[rb] = ra

    for c in cellset:
        for n in neighbors(c):
            if n in cellset and (val is None or val[n] == val[c]):
                union(c, n)
    return {c: find(c) for c in cellset}
