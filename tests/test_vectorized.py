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
