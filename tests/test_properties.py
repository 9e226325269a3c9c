"""Property-based tests (hypothesis): roundtrip and algebraic laws the
reference pins with hand-picked cases (SURVEY §5) — generalized to
generated inputs. Strategies build structurally valid cells directly
(base cell + digit path, pentagon rules respected), so every law is
exercised across the whole index space, pentagons included.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

import h3ron_spark.h3core as h3c
from h3ron_spark.h3core import cells as C
from h3ron_spark.h3core import index as ix
from h3ron_spark.h3core import vectorized as V
from h3ron_spark.h3core.constants import PENTAGON_BASE_CELLS

_PENT = set(PENTAGON_BASE_CELLS)


@st.composite
def valid_cells(draw, max_res: int = 9):
    base = draw(st.integers(0, 121))
    res = draw(st.integers(0, max_res))
    h = ix.set_base_cell(ix.init_cell(res), base)
    lead = True
    for d in range(1, res + 1):
        if base in _PENT and lead:
            dig = draw(st.sampled_from([0, 2, 3, 4, 5, 6]))
        else:
            dig = draw(st.integers(0, 6))
        if dig != 0:
            lead = False
        h = ix.set_digit(h, d, dig)
    return h


@settings(max_examples=200, deadline=None)
@given(valid_cells())
def test_string_roundtrip(cell):
    assert int(f"{cell:x}", 16) == cell
    assert C.is_valid_cell(cell)


@settings(max_examples=200, deadline=None)
@given(valid_cells())
def test_parent_child_containment(cell):
    res = ix.get_resolution(cell)
    if res == 0:
        return
    parent = C.cell_to_parent(cell, res - 1)
    assert C.is_valid_cell(parent)
    assert cell in C.cell_to_children(parent, res)
    assert C.cell_to_parent(C.cell_to_center_child(cell, res + 1), res) == cell


@settings(max_examples=100, deadline=None)
@given(valid_cells(max_res=6))
def test_compact_uncompact_roundtrip(cell):
    """uncompact(x, r) then compact == [x] (CompactedCellVec law,
    frame/compact.rs:309-355 generalized)."""
    res = ix.get_resolution(cell)
    target = min(res + 2, 15)
    kids = C.uncompact_cells([cell], target)
    assert C.compact_cells(kids) == [cell]
    assert V.compact_cells_np(np.array(kids, dtype=np.int64)).tolist() == [cell]


@settings(max_examples=100, deadline=None)
@given(valid_cells(max_res=8), st.integers(0, 3))
def test_disk_contains_ring_and_origin(cell, k):
    disk = C.grid_disk(cell, k)
    assert cell in disk
    ring = C.grid_ring(cell, k)
    assert set(ring) <= set(disk)
    batch_c, batch_d, counts = V.grid_disk_distances_batch(
        np.array([cell], dtype=np.int64), k
    )
    assert counts[0] == len(disk)
    assert sorted(batch_c.tolist()) == sorted(disk)


@settings(max_examples=150, deadline=None)
@given(valid_cells(max_res=9))
def test_vectorized_validity_matches_scalar(cell):
    corrupt = cell | (7 << 39)
    arr = np.array([cell, corrupt, 0, -cell], dtype=np.int64)
    got = V.is_valid_cell_np(arr).tolist()
    exp = [C.is_valid_cell(int(x)) for x in arr]
    assert got == exp


# ------------------------------------------------- file-format roundtrips


@given(
    data=st.data(),
    dtype=st.sampled_from(["u1", "u2", "i2", "f8"]),
    h=st.integers(1, 12),
    w=st.integers(1, 12),
)
@settings(max_examples=25, deadline=None)
def test_geotiff_roundtrip_property(data, dtype, h, w):
    """write_geotiff_uncompressed -> read_geotiff is the identity on
    pixels/dtype/transform for every supported dtype and shape."""
    import os
    import tempfile

    from h3ron_spark.raster import Transform
    from h3ron_spark.sources.tiff import (
        read_geotiff,
        write_geotiff_uncompressed,
    )

    dt = np.dtype(dtype)
    if dt.kind == "f":
        band = data.draw(
            st.lists(
                st.floats(-1e6, 1e6, allow_nan=False),
                min_size=h * w,
                max_size=h * w,
            )
        )
        arr = np.array(band, dtype=dt).reshape(h, w)
    else:
        info = np.iinfo(dt)
        band = data.draw(
            st.lists(
                st.integers(int(info.min), int(info.max)),
                min_size=h * w,
                max_size=h * w,
            )
        )
        arr = np.array(band, dtype=dt).reshape(h, w)
    tr = Transform(0.25, 0.0, 0.0, -0.5, -10.0, 20.0)
    fd, path = tempfile.mkstemp(suffix=".tiff")
    os.close(fd)
    try:
        write_geotiff_uncompressed(path, arr, tr)
        g = read_geotiff(path)
        assert g.band.dtype == dt
        assert (g.band == arr).all()
        assert abs(g.transform.a - 0.25) < 1e-12
        assert abs(g.transform.e + 0.5) < 1e-12
    finally:
        os.unlink(path)


@given(data=st.data())
@settings(max_examples=25, deadline=None)
def test_osmpbf_roundtrip_property(data):
    """write_osm_pbf -> parse is the identity on ids/refs/tags and
    coordinates to the 100-nanodegree PBF granularity."""
    import os
    import tempfile

    from h3ron_spark.sources.osmpbf import (
        _read_blob,
        parse_primitive_block,
        scan_blobs,
        write_osm_pbf,
    )

    ids = data.draw(
        st.lists(
            st.integers(0, 2**40), min_size=1, max_size=12, unique=True
        )
    )
    nodes = []
    for nid in ids:
        lat = data.draw(st.floats(-85, 85))
        lng = data.draw(st.floats(-180, 180))
        nodes.append((nid, lat, lng))
    n_ways = data.draw(st.integers(0, 3))
    ways = []
    for wi in range(n_ways):
        refs = data.draw(
            st.lists(st.sampled_from(ids), min_size=1, max_size=6)
        )
        tags = data.draw(
            st.dictionaries(
                st.text(
                    alphabet="abcdef_", min_size=1, max_size=6
                ),
                st.text(alphabet="xyz123", min_size=0, max_size=6),
                max_size=3,
            )
        )
        ways.append((1000 + wi, refs, tags))
    fd, path = tempfile.mkstemp(suffix=".osm.pbf")
    os.close(fd)
    try:
        write_osm_pbf(path, nodes, ways)
        blobs = scan_blobs(path)
        blk = parse_primitive_block(_read_blob(path, blobs[1][1], blobs[1][2]))
        assert [n[0] for n in blk["nodes"]] == [n[0] for n in nodes]
        for (nid, lat, lng), (gid, glat, glng) in zip(nodes, blk["nodes"]):
            assert abs(lat - glat) < 1e-7
            assert abs(lng - glng) < 1e-7
        assert [(w[0], w[1], w[2]) for w in blk["ways"]] == ways
    finally:
        os.unlink(path)
