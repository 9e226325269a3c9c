"""Bit-exactness of the numpy batch encoder vs the scalar reference."""

import numpy as np
import pytest

from h3ron_spark.h3core import cells as C
from h3ron_spark.h3core.vectorized import (
    cell_to_latlng_batch,
    latlng_to_cell_batch,
)


@pytest.mark.parametrize("res", [0, 1, 2, 7, 8, 9, 15])
def test_batch_encode_matches_scalar(res):
    rng = np.random.default_rng(1234 + res)
    lat = rng.uniform(-90, 90, 3000)
    lng = rng.uniform(-180, 180, 3000)
    vec = latlng_to_cell_batch(lat, lng, res)
    ref = np.array(
        [C.latlng_to_cell(a, b, res) for a, b in zip(lat, lng)],
        dtype=np.int64,
    )
    assert (vec == ref).all()


def test_batch_encode_pentagon_vertices():
    # points on/near pentagon centers force the scalar fallback path
    from h3ron_spark.h3core.constants import PENTAGON_BASE_CELLS
    from h3ron_spark.h3core.derive import base_cell_geo

    geos = base_cell_geo()
    lat = np.degrees([geos[p][0] for p in PENTAGON_BASE_CELLS])
    lng = np.degrees([geos[p][1] for p in PENTAGON_BASE_CELLS])
    for res in (0, 3, 8):
        vec = latlng_to_cell_batch(lat, lng, res)
        ref = np.array(
            [C.latlng_to_cell(a, b, res) for a, b in zip(lat, lng)],
            dtype=np.int64,
        )
        assert (vec == ref).all()


def test_batch_encode_mixed_res_and_invalid():
    lat = np.array([37.0, np.nan, 91.0, -45.0])
    lng = np.array([-122.0, 10.0, 10.0, 170.0])
    res = np.array([8, 8, 8, 12])
    out = latlng_to_cell_batch(lat, lng, res)
    assert out[1] == 0 and out[2] == 0
    assert out[0] == C.latlng_to_cell(37.0, -122.0, 8)
    assert out[3] == C.latlng_to_cell(-45.0, 170.0, 12)


def test_batch_decode_roundtrip():
    rng = np.random.default_rng(7)
    lat = rng.uniform(-85, 85, 500)
    lng = rng.uniform(-180, 180, 500)
    cells = latlng_to_cell_batch(lat, lng, 9)
    la, ln = cell_to_latlng_batch(cells)
    ref = [C.cell_to_latlng(int(c)) for c in cells]
    assert np.allclose(la, [r[0] for r in ref], atol=1e-12)
    assert np.allclose(ln, [r[1] for r in ref], atol=1e-12)


def test_vector_decode_integer_parity_and_tolerance():
    """The vector decode's integer stage (cell -> face/ijk) is
    bit-exact vs the scalar kernel; the float stage (face/ijk ->
    latlng) is the CANONICAL path and agrees with the scalar libm path
    within transcendental-ulp tolerance (the round-1 bit-exact
    cross-kernel contract is retired per the tolerance contract)."""

    import h3ron_spark.h3core.index as ix
    from h3ron_spark.h3core import vectorized as V

    rng = np.random.default_rng(1234)
    lats = np.degrees(np.arcsin(rng.uniform(-1, 1, 3000)))
    lngs = rng.uniform(-180, 180, 3000)
    ress = rng.integers(0, 16, 3000)
    cells = latlng_to_cell_batch(lats, lngs, ress)
    cells = cells[cells != 0]

    face, i, j, k, fb = V.decode_face_ijk_np(cells)
    # pentagon BASE cells decode vectorized too now (leading-5 index
    # rotation + looped substrate overage with the deleted-K corner
    # rotation): no scalar fallback remains anywhere in the decode
    assert not fb.any()
    has_pent_base = False
    for t, c in enumerate(cells):
        f_s, coord = ix.h3_to_face_ijk(int(c))
        assert (f_s, coord) == (
            int(face[t]),
            (int(i[t]), int(j[t]), int(k[t])),
        ), hex(int(c))
        has_pent_base = has_pent_base or ix.get_base_cell(int(c)) in ix._PENT_SET
    assert len(cells) > 2000 and has_pent_base

    la, ln = V.cell_to_latlng_np(cells)
    for t, c in enumerate(cells):
        a, b = ix.cell_to_latlng(int(c))
        assert abs(a - la[t]) < 1e-12, hex(int(c))
        assert abs(b - ln[t]) < 1e-12, hex(int(c))


def test_vector_decode_invalid_rows_nan():
    la, ln = cell_to_latlng_batch(
        np.array([0, -5, 123456, 0x89283080DDBFFFF], dtype=np.int64)
    )
    assert np.isnan(la[:3]).all() and np.isnan(ln[:3]).all()
    assert np.isfinite(la[3]) and np.isfinite(ln[3])


def test_pentagon_base_decode_exhaustive_parity():
    """Every res-3 descendant of all 12 pentagon base cells (covers
    leading digits 0/4/5, the deleted-K corner rotation, and the
    looped substrate overage) plus sampled res-5 children decode
    bit-identically to the scalar h3_to_face_ijk."""
    import h3ron_spark.h3core.index as ix
    from h3ron_spark.h3core import cells as CM
    from h3ron_spark.h3core import vectorized as V
    from h3ron_spark.h3core.constants import PENTAGON_BASE_CELLS

    battery = []
    for pb in PENTAGON_BASE_CELLS:
        pent0 = ix.init_cell(0) | (pb << 45)
        kids = CM.cell_to_children(pent0, 3)
        battery.extend(kids)
        for c in kids[::97]:
            battery.extend(CM.cell_to_children(c, 5)[::13])
    arr = np.array(sorted(set(battery)), dtype=np.int64)
    face, i, j, k, fb = V.decode_face_ijk_np(arr)
    assert not fb.any()
    for t in range(arr.size):
        f_s, coord = ix.h3_to_face_ijk(int(arr[t]))
        assert (f_s, coord) == (
            int(face[t]),
            (int(i[t]), int(j[t]), int(k[t])),
        ), hex(int(arr[t]))
