"""Numeric derivation of the large H3 lookup tables.

libh3 ships two large generated tables: the face-neighbor coordinate
transforms (faceijk.c ``faceNeighbors``) and the face/ijk -> base cell
mapping with per-position rotation counts (``faceIjkBaseCells``).
Instead of transcribing ~600 generated entries, this module derives
them at import time from the three small hand tables in constants.py:

1. **Face neighbors**: adjacent faces share two icosahedron vertices;
   on the shared edge both faces' gnomonic lattices coincide exactly,
   so matching the two shared corners in both faces' Class II grids
   determines the lattice isomorphism (ccw rotation count + translate)
   uniquely. A third on-edge lattice point verifies each solve.

2. **face/ijk -> base cell**: every res-0 position in the 3^3 lookup
   cube coincides (to gnomonic-extension accuracy) with some base cell
   center, found by nearest-center search. The per-position rotation
   count is *calibrated*: for each candidate rotation 0..5 the real
   ``face_ijk_to_h3``/``cell_to_latlng`` round trip runs on probe
   lattice points around the position; exactly one rotation makes the
   computed cell center coincide with the probe point, and the build
   asserts that uniqueness. This guarantees the table is
   self-consistent with the production conversion code by
   construction, and any error in the hand tables surfaces as a
   failed derivation, not a silent wrong answer.

The derived tables are cached in-process (and the derivation costs
only a few hundred ms once per interpreter, i.e. once per Spark
executor worker).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from h3ron_spark.h3core.constants import (
    BASE_CELL_DATA,
    NUM_ICOSA_FACES,
    UNIT_VECS,
)
from h3ron_spark.h3core.coords import (
    geo_distance_rads,
    hex2d_to_geo,
    ijk_normalize,
    ijk_to_hex2d,
    up_ap7,
    up_ap7r,
)


@dataclass(frozen=True)
class FaceOrient:
    face: int
    translate: tuple[int, int, int]
    ccw_rot60: int


_FACE_NEIGHBORS: dict[tuple[int, str], FaceOrient] | None = None
_FACE_IJK_BC: dict[tuple[int, tuple[int, int, int]], tuple[int, int]] | None = None
_BASE_CELL_GEO: list[tuple[float, float]] | None = None

_RES2_CORNERS = {
    "i": (14, 0, 0),
    "j": (0, 14, 0),
    "k": (0, 0, 14),
}
_EDGE_CORNERS = {"ij": ("i", "j"), "ki": ("k", "i"), "jk": ("j", "k")}
_EDGE_MIDPOINTS = {"ij": (7, 7, 0), "ki": (7, 0, 7), "jk": (0, 7, 7)}


def _axial(ijk) -> tuple[int, int]:
    return ijk[0] - ijk[2], ijk[1] - ijk[2]


def _axial_rot_ccw(a: int, b: int) -> tuple[int, int]:
    return a - b, a


def _axial_rot_n(a: int, b: int, n: int) -> tuple[int, int]:
    for _ in range(n % 6):
        a, b = _axial_rot_ccw(a, b)
    return a, b


def base_cell_geo() -> list[tuple[float, float]]:
    global _BASE_CELL_GEO
    if _BASE_CELL_GEO is None:
        out = []
        for home_face, home_ijk, _pent, _offs in BASE_CELL_DATA:
            x, y = ijk_to_hex2d(*home_ijk)
            out.append(hex2d_to_geo(home_face, x, y, 0))
        _BASE_CELL_GEO = out
    return _BASE_CELL_GEO


def _corner_geos() -> list[dict[str, tuple[float, float]]]:
    out = []
    for f in range(NUM_ICOSA_FACES):
        d = {}
        for name, c in _RES2_CORNERS.items():
            x, y = ijk_to_hex2d(*c)
            d[name] = hex2d_to_geo(f, x, y, 2)
        out.append(d)
    return out


def _build_face_neighbors() -> dict[tuple[int, str], FaceOrient]:
    corners = _corner_geos()
    table: dict[tuple[int, str], FaceOrient] = {}
    for f in range(NUM_ICOSA_FACES):
        for edge, (na, nb) in _EDGE_CORNERS.items():
            ga = corners[f][na]
            gb = corners[f][nb]
            # the adjacent face shares both corners
            gface = None
            for g in range(NUM_ICOSA_FACES):
                if g == f:
                    continue
                da = min(geo_distance_rads(*ga, *c) for c in corners[g].values())
                db = min(geo_distance_rads(*gb, *c) for c in corners[g].values())
                if da < 1e-9 and db < 1e-9:
                    gface = g
                    break
            assert gface is not None, f"no neighbor across {edge} of face {f}"
            # corner names in the neighbor's grid
            gA = min(
                _RES2_CORNERS.values(),
                key=lambda c: geo_distance_rads(
                    *hex2d_to_geo(gface, *ijk_to_hex2d(*c), 2), *ga
                ),
            )
            gB = min(
                _RES2_CORNERS.values(),
                key=lambda c: geo_distance_rads(
                    *hex2d_to_geo(gface, *ijk_to_hex2d(*c), 2), *gb
                ),
            )
            fA = _axial(_RES2_CORNERS[na])
            fB = _axial(_RES2_CORNERS[nb])
            aA = _axial(gA)
            aB = _axial(gB)
            solved = None
            for rot in range(6):
                ra = _axial_rot_n(*fA, rot)
                rb = _axial_rot_n(*fB, rot)
                t = (aA[0] - ra[0], aA[1] - ra[1])
                if (rb[0] + t[0], rb[1] + t[1]) == aB:
                    solved = (rot, t)
                    break
            assert solved is not None, f"no lattice map for face {f} edge {edge}"
            rot, t = solved
            assert t[0] % 7 == 0 and t[1] % 7 == 0, (f, edge, t)
            translate = ijk_normalize(t[0] // 7, t[1] // 7, 0)
            # verify with the edge midpoint lattice point
            m = _EDGE_MIDPOINTS[edge]
            rm = _axial_rot_n(*_axial(m), rot)
            gm_ax = (rm[0] + t[0], rm[1] + t[1])
            gm = ijk_normalize(gm_ax[0], gm_ax[1], 0)
            geo_f = hex2d_to_geo(f, *ijk_to_hex2d(*m), 2)
            geo_g = hex2d_to_geo(gface, *ijk_to_hex2d(*gm), 2)
            assert geo_distance_rads(*geo_f, *geo_g) < 1e-9, (f, edge)
            table[(f, edge)] = FaceOrient(gface, translate, rot)
    return table


def face_neighbor(face: int, edge: str) -> FaceOrient:
    global _FACE_NEIGHBORS
    if _FACE_NEIGHBORS is None:
        _FACE_NEIGHBORS = _build_face_neighbors()
    return _FACE_NEIGHBORS[(face, edge)]


# ------------------------------------------------------------------
# face/ijk -> (base cell, ccw rotations), calibrated
# ------------------------------------------------------------------


def _cube_positions():
    seen = []
    for i in range(3):
        for j in range(3):
            for k in range(3):
                c = ijk_normalize(i, j, k)
                if max(c) <= 2 and c not in seen:
                    seen.append(c)
    return seen


def _res2_scaled(c):
    """res-0 ijk -> res-2 ijk of the same grid position (two aperture-7
    substitutions; res0->1 is Class III ccw, res1->2 Class II cw)."""
    from h3ron_spark.h3core.coords import down_ap7, down_ap7r

    return down_ap7r(*down_ap7(*c))


def _build_face_ijk_bc() -> dict:
    # import deferred: index.py imports this module
    from h3ron_spark.h3core import index as ix

    centers = base_cell_geo()
    table: dict[tuple[int, tuple[int, int, int]], tuple[int, int]] = {}
    positions = _cube_positions()

    for f in range(NUM_ICOSA_FACES):
        for c in positions:
            x, y = ijk_to_hex2d(*c)
            geo = hex2d_to_geo(f, x, y, 0)
            dists = [geo_distance_rads(*geo, *cg) for cg in centers]
            bc = min(range(122), key=lambda b: dists[b])
            on_face = sum(c) <= 2
            # on-face positions coincide exactly with a base cell
            # center; beyond-face cube positions carry gnomonic
            # extension error but stay well within the nearest cell
            assert dists[bc] < (1e-9 if on_face else 0.13), (f, c, bc, dists[bc])
            table[(f, c)] = (bc, 0)  # rotation calibrated below

    # calibrate on-face positions (sum <= 2) through the production
    # conversion round trip: pick the rotation whose probe cells'
    # computed centers coincide with the probe lattice points
    global _FACE_IJK_BC
    _FACE_IJK_BC = table
    deltas = []
    for u in UNIT_VECS[1:]:
        for v in [(0, 0, 0)] + list(UNIT_VECS[1:]):
            for su in (1, -1):
                for sv in (1, -1):
                    deltas.append(
                        (su * u[0] + sv * v[0], su * u[1] + sv * v[1], su * u[2] + sv * v[2])
                    )
    for (f, c), (bc, _) in list(table.items()):
        if sum(c) > 2:
            continue  # beyond-face: composed below
        scaled = _res2_scaled(c)
        probes = set()
        for d in deltas:
            p = ijk_normalize(scaled[0] + d[0], scaled[1] + d[1], scaled[2] + d[2])
            if sum(p) > 14:  # off the face: gnomonic extension distorts
                continue
            if up_ap7r(*up_ap7(*p)) != c:
                continue
            probes.add(p)
        assert len(probes) >= 3, (f, c, probes)
        maxd = []
        results = []
        for rot in range(6):
            table[(f, c)] = (bc, rot)
            worst = 0.0
            hs = []
            for p in sorted(probes):
                geo_p = hex2d_to_geo(f, *ijk_to_hex2d(*p), 2)
                h = ix.face_ijk_to_h3(f, p, 2)
                hs.append(h)
                # a wrong rotation can emit a non-canonical encoding
                # (e.g. pentagon K-lead) that still decodes to the
                # right center — canonicity is part of correctness
                if h == 0 or not ix.is_valid_cell(h):
                    worst = math.inf
                    break
                center = ix.cell_to_latlng(h)
                worst = max(worst, geo_distance_rads(*center, *geo_p))
            maxd.append(worst)
            results.append(tuple(hs))
        best = min(range(6), key=lambda r: maxd[r])
        # any tie must be an identical-index alias (pentagon 5-fold
        # symmetry makes some rotations equivalent)
        for r in range(6):
            if r != best and maxd[r] < 2.0 * maxd[best] + 0.01:
                assert results[r] == results[best], (
                    f"ambiguous rotation for face {f} pos {c}: "
                    f"{best}({maxd[best]:.4f}) vs {r}({maxd[r]:.4f})"
                )
        assert maxd[best] < 0.012, (f, c, maxd)
        table[(f, c)] = (bc, best)

    # beyond-face cube positions: compose the face-edge lattice map
    # with the neighbor face's calibrated entry
    for (f, c), (bc, _) in list(table.items()):
        if sum(c) <= 2:
            continue
        i, j, k = c
        if k > 0:
            edge = "jk" if j > 0 else "ki"
        else:
            edge = "ij"
        fo = face_neighbor(f, edge)
        a, b = _axial_rot_n(*_axial(c), fo.ccw_rot60)
        ta, tb = _axial(fo.translate)  # unit scale at res 0
        c2 = ijk_normalize(a + ta, b + tb, 0)
        bc2, rot2 = table[(fo.face, c2)]
        assert bc2 == bc, (f, c, bc, fo.face, c2, bc2)
        table[(f, c)] = (bc, (fo.ccw_rot60 + rot2) % 6)
    return table


def precompute() -> None:
    """Force-build all derived tables (call once per worker if the
    few-hundred-ms lazy build should happen eagerly)."""
    face_neighbor(0, "ij")
    face_ijk_base_cell(0, (0, 0, 0))


def face_ijk_base_cell(face: int, coord: tuple[int, int, int]) -> tuple[int, int]:
    if _FACE_IJK_BC is None:
        _build_face_ijk_bc()
    return _FACE_IJK_BC[(face, ijk_normalize(*coord))]
