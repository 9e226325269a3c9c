"""Validation of the pure-Python H3 kernel against *public* H3 test
vectors (from Uber's H3 documentation and test suite, Apache-2.0) and
against self-consistency/roundtrip properties.

Reference parity targets: h3ron/src/cell.rs, h3ron/src/directed_edge.rs,
h3ron/src/lib.rs (scalar API inventory in SURVEY.md §2.1).
"""

from __future__ import annotations

import math
import random

import pytest

import h3ron_spark.h3core as h3c

# The canonical public example cell (H3 docs): latLngToCell of downtown SF.
SF_LAT, SF_LNG = 37.7752702151959257, -122.4187776995656666
SF_CELL_9 = 0x8928308280FFFFF


# ---------------------------------------------------------------- encode/decode

def test_latlng_to_cell_known_vector():
    assert h3c.latlng_to_cell(SF_LAT, SF_LNG, 9) == SF_CELL_9


def test_cell_to_latlng_known_vector():
    lat, lng = h3c.cell_to_latlng(SF_CELL_9)
    # Public value from H3 docs: (37.77670234943567, -122.41845932318311)
    assert abs(lat - 37.77670234943567) < 1e-9
    assert abs(lng - -122.41845932318311) < 1e-7


def test_parent_known_vector():
    assert h3c.cell_to_parent(SF_CELL_9, 8) == 0x8828308281FFFFF


@pytest.mark.parametrize("res", range(16))
def test_roundtrip_random_points(res):
    rng = random.Random(17 + res)
    for _ in range(40):
        # uniform on sphere
        lat = math.degrees(math.asin(rng.uniform(-1, 1)))
        lng = rng.uniform(-180.0, 180.0)
        cell = h3c.latlng_to_cell(lat, lng, res)
        assert h3c.is_valid_cell(cell)
        assert h3c.get_resolution(cell) == res
        clat, clng = h3c.cell_to_latlng(cell)
        # re-encoding the centroid must return the same cell
        assert h3c.latlng_to_cell(clat, clng, res) == cell


# ---------------------------------------------------------------- global counts

def test_res0_is_122_cells_with_12_pentagons():
    cells = h3c.res0_cells()
    assert len(cells) == 122
    assert sum(1 for c in cells if h3c.is_pentagon(c)) == 12
    assert all(h3c.is_valid_cell(c) for c in cells)


@pytest.mark.parametrize("res,want", [(0, 122), (1, 842), (2, 5882)])
def test_num_cells_formula(res, want):
    # public closed form: 2 + 120 * 7^res
    assert h3c.get_num_cells(res) == want


def test_children_counts():
    assert len(h3c.cell_to_children(SF_CELL_9, 10)) == 7
    assert len(h3c.cell_to_children(SF_CELL_9, 11)) == 49
    # pentagon has 6 children
    pent = next(c for c in h3c.res0_cells() if h3c.is_pentagon(c))
    assert len(h3c.cell_to_children(pent, 1)) == 6


# ---------------------------------------------------------------- hierarchy

def test_parent_child_containment():
    for child in h3c.cell_to_children(SF_CELL_9, 11):
        assert h3c.cell_to_parent(child, 9) == SF_CELL_9
    assert h3c.cell_to_center_child(SF_CELL_9, 11) in h3c.cell_to_children(
        SF_CELL_9, 11
    )


# ---------------------------------------------------------------- traversal

@pytest.mark.parametrize("k", [0, 1, 2, 3, 5])
def test_grid_disk_size_hexagon(k):
    # away from pentagons: |disk(k)| = 1 + 3k(k+1)
    assert len(h3c.grid_disk(SF_CELL_9, k)) == 1 + 3 * k * (k + 1)


def test_grid_ring_size():
    assert len(h3c.grid_ring(SF_CELL_9, 1)) == 6
    assert len(h3c.grid_ring(SF_CELL_9, 3)) == 18


def test_grid_disk_distances_consistent():
    pairs = h3c.grid_disk_distances(SF_CELL_9, 2)
    byk: dict[int, int] = {}
    for cell, k in pairs:
        byk[k] = byk.get(k, 0) + 1
        assert h3c.grid_distance(SF_CELL_9, cell) == k
    assert byk == {0: 1, 1: 6, 2: 12}


def test_grid_disk_fast_matches_bfs():
    """The single-decompose offset fast path must agree with the BFS
    everywhere it claims validity — probe random cells globally (face
    interiors + edges) and the full neighborhoods of every res-2
    pentagon (fallback territory: the fast path must *decline*, not
    mis-answer)."""
    from h3ron_spark.h3core.cells import _grid_disk_fast

    rng = random.Random(7)

    def bfs(h, k):
        seen = {h: 0}
        frontier = [h]
        for dist in range(1, k + 1):
            nxt = []
            for c in frontier:
                for n in h3c.neighbors(c):
                    if n not in seen:
                        seen[n] = dist
                        nxt.append(n)
            frontier = nxt
        return seen

    probes = []
    for _ in range(150):
        lat = math.degrees(math.asin(rng.uniform(-1, 1)))
        lng = rng.uniform(-180, 180)
        probes.append(h3c.latlng_to_cell(lat, lng, rng.choice([1, 2, 5, 8])))
    pents = [c for c in h3c.res0_cells() if h3c.is_pentagon(c)]
    for p in pents[:6]:
        p2 = h3c.cell_to_center_child(p, 2)
        probes.append(p2)
        probes.extend(h3c.neighbors(p2))
    for h in probes:
        for k in (1, 2, 3):
            fast = _grid_disk_fast(h, k)
            if fast is not None:
                assert dict(fast) == bfs(h, k), (hex(h), k)


def test_grid_path_endpoints_and_adjacency():
    target = h3c.grid_disk(SF_CELL_9, 3)[-1]
    path = h3c.grid_path_cells(SF_CELL_9, target)
    assert path[0] == SF_CELL_9 and path[-1] == target
    assert len(path) == h3c.grid_distance(SF_CELL_9, target) + 1
    for a, b in zip(path, path[1:]):
        assert h3c.are_neighbor_cells(a, b)


def test_neighbors_are_mutual():
    for n in h3c.grid_ring(SF_CELL_9, 1):
        assert h3c.are_neighbor_cells(SF_CELL_9, n)
        assert h3c.are_neighbor_cells(n, SF_CELL_9)
    assert not h3c.are_neighbor_cells(SF_CELL_9, SF_CELL_9)


# ---------------------------------------------------------------- compaction

def test_compact_uncompact_roundtrip():
    kids = h3c.cell_to_children(SF_CELL_9, 12)
    assert h3c.compact_cells(kids) == [SF_CELL_9]
    unc = h3c.uncompact_cells([SF_CELL_9], 12)
    assert sorted(unc) == sorted(kids)


def test_compact_partial():
    kids = h3c.cell_to_children(SF_CELL_9, 10)
    mixed = [c for c in kids[1:]]  # drop one child -> cannot compact
    assert sorted(h3c.compact_cells(mixed)) == sorted(mixed)


# ---------------------------------------------------------------- boundary/area

def test_boundary_vertex_count():
    b = h3c.cell_to_boundary(SF_CELL_9)
    assert len(b) in (6, 7)  # hexagon (7 when crossing icosa edge)
    pent = next(c for c in h3c.res0_cells() if h3c.is_pentagon(c))
    assert len(h3c.cell_to_boundary(pent)) in (5, 10)


def test_cell_area_positive_and_ordered():
    a9 = h3c.cell_area_km2(SF_CELL_9)
    a8 = h3c.cell_area_km2(h3c.cell_to_parent(SF_CELL_9, 8))
    assert 0 < a9 < a8
    # res9 hexagon ~0.105 km^2 (public average)
    assert 0.05 < a9 < 0.2
    assert abs(h3c.cell_area_m2(SF_CELL_9) - a9 * 1e6) < 1e-3 * a9 * 1e6


def test_average_area_table():
    # public H3 table: res 0 avg hexagon area ~ 4,357,449.41 km^2
    assert abs(h3c.average_hexagon_area_km2(0) - 4357449.4161) / 4357449.4161 < 0.01


# ---------------------------------------------------------------- edges

def test_directed_edges_roundtrip():
    edges = h3c.origin_to_directed_edges(SF_CELL_9)
    assert len(edges) == 6
    for e in edges:
        assert h3c.is_valid_directed_edge(e)
        assert h3c.edge_origin(e) == SF_CELL_9
        d = h3c.edge_destination(e)
        assert h3c.are_neighbor_cells(SF_CELL_9, d)
        assert h3c.cells_to_directed_edge(SF_CELL_9, d) == e
        r = h3c.edge_reverse(e)
        assert h3c.edge_origin(r) == d and h3c.edge_destination(r) == SF_CELL_9
        o2, d2 = h3c.directed_edge_to_cells(e)
        assert (o2, d2) == (SF_CELL_9, d)


def test_edge_length_sane():
    e = h3c.origin_to_directed_edges(SF_CELL_9)[0]
    km = h3c.edge_length_km(e)
    assert 0.1 < km < 0.4  # res-9 edge ~0.17-0.21 km
    assert abs(h3c.edge_length_m(e) - km * 1000) < 1e-6 * km * 1000


# ---------------------------------------------------------------- local ij

def test_local_ij_roundtrip():
    for n in h3c.grid_disk(SF_CELL_9, 3):
        i, j = h3c.cell_to_local_ij(SF_CELL_9, n)
        assert h3c.local_ij_to_cell(SF_CELL_9, i, j) == n


# ---------------------------------------------------------------- validity

def test_invalid_cells_rejected():
    assert not h3c.is_valid_cell(0)
    assert not h3c.is_valid_cell(SF_CELL_9 | (7 << 39))  # digit 7 above res
    assert not h3c.is_valid_cell(SF_CELL_9 & ~(1 << 59))  # wrong mode
    assert not h3c.is_valid_directed_edge(SF_CELL_9)  # cell is not an edge
