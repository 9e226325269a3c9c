"""Golden vectors harvested from the reference's own unit tests —
kernel-level pins (the Spark-level equivalents live in
h3ron_spark/queries_golden.py and are hash-checked against DuckDB
VALUES oracles by test_oracle_parity).

Each constant cites the reference test that commits it.
"""

from __future__ import annotations

import h3ron_spark.h3core as h3c
from h3ron_spark.h3core.regions import (
    cells_to_polygons,
    find_cell_clusters,
    line_to_cells,
    smoothen_ring,
)

CELL = 0x89283080DDBFFFF  # h3ron/src/cell.rs:485-707 canonical SF cell
EDGE = 0x149283080DDBFFFF  # h3ron/src/directed_edge.rs:351-400


def test_directed_edges_hex_strings():
    # h3ron/src/cell.rs:634-654 can_retrieve_edges
    edges = h3c.origin_to_directed_edges(CELL)
    assert [format(e, "x") for e in edges] == [
        "119283080ddbffff",
        "129283080ddbffff",
        "139283080ddbffff",
        "149283080ddbffff",
        "159283080ddbffff",
        "169283080ddbffff",
    ]
    assert all(h3c.is_valid_directed_edge(e) for e in edges)
    assert all(h3c.get_resolution(e) == 9 for e in edges)


def test_direction_sequences():
    # h3ron/src/direction.rs:227-240 / 246-268
    def digits(h, res):
        return [(h >> (3 * (15 - r))) & 7 for r in range(1, res + 1)]

    assert digits(0x861EA54F7FFFFFF, 6) == [2, 4, 5, 2, 3, 6]
    assert digits(EDGE, 9) == [0, 6, 0, 4, 0, 1, 5, 6, 6]
    # direction.rs:164-182: direction()=6, direction_to_parent()=3
    # (digit AT res-1), direction_to_parent_resolution(1)=1
    c5 = 0x8518607BFFFFFFF
    assert h3c.get_resolution(c5) == 5
    d = digits(c5, 5)
    assert d[4] == 6 and d[3] == 3 and d[0] == 1


def test_cross_face_line_error_parity():
    # h3ron/src/lib.rs:152-160 (testH3Line.c): the pair crosses
    # multiple icosa faces; libh3 errors. Distance honours that
    # (None); our documented path superset still returns a connected
    # path with the right endpoints.
    a, b = 0x85285AA7FFFFFFF, 0x851D9B1BFFFFFFF
    assert h3c.grid_distance(a, b) is None
    p = h3c.grid_path_cells(a, b)
    assert p is not None and p[0] == a and p[-1] == b
    assert all(
        h3c.are_neighbor_cells(x, y) for x, y in zip(p, p[1:])
    )
    assert len(p) == len(set(p))


def test_neighbor_res_mismatch_is_error():
    # h3ron/src/cell.rs:608-617 test_is_neighbor
    ring = h3c.grid_ring(CELL, 1)
    assert h3c.are_neighbor_cells(CELL, ring[0]) is True
    assert h3c.are_neighbor_cells(CELL, 0x8A2A1072B59FFFF) is None
    assert h3c.are_neighbor_cells(CELL, CELL) is False


def test_grid_distance_ring_anchors():
    # h3ron/src/cell.rs:620-630 test_distance_to
    assert h3c.grid_distance(CELL, CELL) == 0
    assert h3c.grid_distance(CELL, h3c.grid_ring(CELL, 1)[0]) == 1
    assert h3c.grid_distance(CELL, h3c.grid_ring(CELL, 3)[0]) == 3


def test_localij_disk_roundtrip():
    # h3ron/src/localij.rs:106-128 test_local_ij
    oi, oj = h3c.cell_to_local_ij(CELL, CELL)
    for c in h3c.grid_disk(CELL, 1):
        i, j = h3c.cell_to_local_ij(CELL, c)
        assert abs(oi - i) <= 1 and abs(oj - j) <= 1
        assert h3c.local_ij_to_cell(CELL, i, j) == c


def test_donut_linked_polygon():
    # h3ron/src/to_geo.rs:252-263 donut_linked_polygon
    # Coord (23.3, 12.3) is (lng, lat)
    center = h3c.latlng_to_cell(12.3, 23.3, 6)
    parts = cells_to_polygons(h3c.grid_ring(center, 1))
    assert len(parts) == 1
    shell, holes = parts[0]
    assert len(shell) == 19  # closed-ring convention, 18 + closing
    assert len(holes) == 1
    assert len(holes[0]) == 7


def test_smoothen_donut():
    # h3ron/src/algorithm/smoothen.rs:85-105 smooth_donut_linked_polygon
    center = h3c.latlng_to_cell(12.3, 23.3, 6)
    parts = cells_to_polygons(h3c.grid_ring(center, 4))
    assert len(parts) == 1
    shell, holes = parts[0]
    assert len(holes) == 1
    sm_shell = smoothen_ring(shell[:-1])
    sm_hole = smoothen_ring(holes[0][:-1])
    # closed-convention counts below 10, as the reference asserts
    assert len(sm_shell) + 1 < 10
    assert len(sm_hole) + 1 < 10


def test_find_cell_clusters_disks():
    # h3ron/src/algorithm/cell_clusters.rs:123-150
    d1 = h3c.grid_disk(h3c.latlng_to_cell(14.5, 12.2, 6), 3)
    d2 = h3c.grid_disk(h3c.latlng_to_cell(45.5, 42.2, 6), 2)
    assert len(d1) == 37 and len(d2) == 19
    labels = find_cell_clusters(d1 + d2)
    groups: dict[int, set[int]] = {}
    for cell, lab in labels.items():
        groups.setdefault(lab, set()).add(cell)
    assert len(groups) == 2
    assert sorted(map(frozenset, groups.values()), key=len) == sorted(
        [frozenset(d1), frozenset(d2)], key=len
    )


def test_isochrone_line_graph_histograms():
    # h3ron-graph/src/algorithm/within_weight_threshold.rs:104-184:
    # directed line graph, weight 10/edge; threshold 30 from seq[0]
    # reaches 4 cells at weights {0,10,20,30}; min-merged over
    # [seq0, seq1, seq10] reaches 9 cells, freq {0:3,10:2,20:2,30:2}.
    seq = line_to_cells([(20.0, 10.0), (20.0, 20.0)], 4)
    assert len(seq) > 14 and len(seq) == len(set(seq))
    adj: dict[int, list[tuple[int, float]]] = {}
    for a, b in zip(seq, seq[1:]):
        adj.setdefault(a, []).append((b, 10.0))

    def flood(origin, thr):
        out = {origin: 0.0}
        frontier = [origin]
        while frontier:
            nxt = []
            for c in frontier:
                for d, w in adj.get(c, ()):
                    nw = out[c] + w
                    if nw <= thr and (d not in out or nw < out[d]):
                        out[d] = nw
                        nxt.append(d)
            frontier = nxt
        return out

    single = flood(seq[0], 30.0)
    assert sorted(single.values()) == [0.0, 10.0, 20.0, 30.0]
    merged: dict[int, float] = {}
    for o in (seq[0], seq[1], seq[10]):
        for c, w in flood(o, 30.0).items():
            merged[c] = min(w, merged.get(c, w))
    assert len(merged) == 9
    freq: dict[float, int] = {}
    for w in merged.values():
        freq[w] = freq.get(w, 0) + 1
    assert freq == {0.0: 3, 10.0: 2, 20.0: 2, 30.0: 2}
