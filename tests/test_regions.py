"""Region <-> cell kernels: polyfill vs brute-force centroid test,
line trace connectivity, dissolve shapes (disk -> 1 shell, donut ->
shell+hole, as in h3ron/src/to_geo.rs:252-263 tests), clusters."""

from __future__ import annotations

import h3ron_spark.h3core as h3c
from h3ron_spark.h3core import regions as R

RING = [(37.70, -122.50), (37.70, -122.38), (37.82, -122.38), (37.82, -122.50)]
SEED = h3c.latlng_to_cell(37.76, -122.44, 8)


def test_polyfill_matches_bruteforce_centroid_test():
    cells = R.polygon_to_cells(RING, 8)
    assert len(cells) > 100
    want = {
        c
        for c in h3c.grid_disk(SEED, 20)
        if R.point_in_polygon(*h3c.cell_to_latlng(c), RING)
    }
    assert set(cells) == want


def test_polyfill_with_hole():
    hole = [(37.74, -122.46), (37.74, -122.42), (37.78, -122.42), (37.78, -122.46)]
    outer = set(R.polygon_to_cells(RING, 8))
    holed = set(R.polygon_to_cells(RING, 8, holes=[hole]))
    assert holed < outer
    removed = outer - holed
    for c in removed:
        la, ln = h3c.cell_to_latlng(c)
        assert R.point_in_ring(la, ln, hole)


def test_intersecting_cells_superset():
    core = set(R.polygon_to_cells(RING, 8))
    inter = set(R.polygon_to_intersecting_cells(RING, 8))
    assert core <= inter
    assert len(inter) > len(core)


def test_line_trace_connected_and_endpoints():
    line = R.line_to_cells([(37.70, -122.50), (37.82, -122.38)], 8)
    assert line[0] == h3c.latlng_to_cell(37.70, -122.50, 8)
    assert line[-1] == h3c.latlng_to_cell(37.82, -122.38, 8)
    assert all(h3c.are_neighbor_cells(a, b) for a, b in zip(line, line[1:]))


def test_grid_path_long_distance_adjacency():
    a = h3c.latlng_to_cell(37.70, -122.50, 8)
    b = h3c.latlng_to_cell(37.82, -122.38, 8)
    p = h3c.grid_path_cells(a, b)
    assert len(p) == h3c.grid_distance(a, b) + 1
    assert all(h3c.are_neighbor_cells(x, y) for x, y in zip(p, p[1:]))


def test_dissolve_disk_single_shell():
    polys = R.cells_to_polygons(h3c.grid_disk(SEED, 3))
    assert len(polys) == 1
    shell, holes = polys[0]
    assert holes == []
    # k=3 disk perimeter has 6*(2k+1)=42 edges
    assert len(shell) >= 42


def test_dissolve_donut_has_hole():
    donut = [c for c in h3c.grid_disk(SEED, 3) if h3c.grid_distance(SEED, c) >= 2]
    polys = R.cells_to_polygons(donut)
    assert len(polys) == 1
    _, holes = polys[0]
    assert len(holes) == 1


def test_dissolve_two_components():
    far = h3c.grid_disk(SEED, 8)[-1]
    cells = list(h3c.grid_disk(SEED, 1)) + list(h3c.grid_disk(far, 1))
    assert len(R.cells_to_polygons(cells)) == 2


def test_clusters_scalar():
    far = h3c.grid_disk(SEED, 8)[-1]
    cells = list(h3c.grid_disk(SEED, 1)) + list(h3c.grid_disk(far, 1))
    lab = R.find_cell_clusters(cells)
    assert len(set(lab.values())) == 2
    # eq-value variant splits one disk into two clusters
    vals = [0 if h3c.grid_distance(SEED, c) <= 0 else 1 for c in h3c.grid_disk(SEED, 1)]
    lab2 = R.find_cell_clusters(list(h3c.grid_disk(SEED, 1)), vals)
    assert len(set(lab2.values())) == 2


def test_smoothen_midpoint_pass_preserves_count():
    polys = R.cells_to_polygons(h3c.grid_disk(SEED, 1))
    shell = polys[0][0]
    # one midpoint per edge, no vertex duplication (smoothen.rs:36-51)
    assert len(R.smoothen_ring(shell, 1, simplify=False)) == len(shell)


def test_smoothen_simplify_drops_near_collinear():
    polys = R.cells_to_polygons(h3c.grid_disk(SEED, 1))
    shell = polys[0][0]
    out = R.smoothen_ring(shell, 1)
    assert 3 <= len(out) <= len(shell)
    # smoothed+simplified outline stays inside the bbox of the original
    lats = [p[0] for p in shell]
    lngs = [p[1] for p in shell]
    for la, ln in out:
        assert min(lats) - 1e-9 <= la <= max(lats) + 1e-9
        assert min(lngs) - 1e-9 <= ln <= max(lngs) + 1e-9


def test_visvalingam_square_unchanged():
    # a square has no small-area vertices at epsilon below its corner area
    sq = [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0)]
    assert R.visvalingam_ring(sq, 1e-6) == sq
    # with a midpoint inserted on one edge (zero-area vertex) it gets dropped
    sq_mid = [(0.0, 0.0), (0.0, 0.5), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0)]
    assert R.visvalingam_ring(sq_mid, 1e-6) == sq
