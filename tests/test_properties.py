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


# ---------------------------------------------------------------------
# Codec properties (round 4): lossless codecs roundtrip EXACTLY on
# arbitrary generated inputs; lossy JPEG is bounded on flat-tile
# images (only DC energy -> error is pure quantization rounding).
# ---------------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(
    st.integers(2, 24),
    st.integers(2, 24),
    st.integers(1, 4).filter(lambda c: c != 2),
    st.randoms(use_true_random=False),
)
def test_png_roundtrip_property(w, h, ch, rnd):
    from h3ron_spark.pipeline.multimodal import decode_png, png_bytes

    px = np.array(
        [rnd.randrange(256) for _ in range(w * h * ch)], np.uint8
    ).reshape(h, w, ch)
    out = decode_png(png_bytes(px if ch > 1 else px[:, :, 0]))
    assert np.array_equal(out, px)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(2, 20),
    st.integers(2, 20),
    st.integers(1, 6),
    st.randoms(use_true_random=False),
)
def test_avi_roundtrip_property(w, h, nf, rnd):
    from h3ron_spark.pipeline.multimodal import avi_bytes, decode_avi

    fr = np.array(
        [rnd.randrange(256) for _ in range(nf * h * w * 3)], np.uint8
    ).reshape(nf, h, w, 3)
    assert np.array_equal(decode_avi(avi_bytes(fr)), fr)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(2, 20), st.integers(2, 20), st.randoms(use_true_random=False)
)
def test_gif_roundtrip_property(w, h, rnd):
    from h3ron_spark.pipeline.multimodal import decode_gif, gif_bytes

    idx = np.array(
        [rnd.randrange(16) for _ in range(w * h)], np.uint8
    ).reshape(h, w)
    pal = [(rnd.randrange(256),) * 3 for _ in range(16)]
    assert np.array_equal(
        decode_gif(gif_bytes(idx, pal)), np.array(pal, np.uint8)[idx]
    )


@settings(max_examples=15, deadline=None)
@given(st.integers(1, 3), st.integers(1, 3), st.randoms(use_true_random=False))
def test_jpeg_flat_tiles_bounded_property(bw, bh, rnd):
    """Images made of flat 8x8 tiles carry only DC coefficients, so
    q=97 reconstruction error is bounded by DC quantization rounding
    (a few levels) for ARBITRARY tile values."""
    from h3ron_spark.pipeline.jpeg import decode_jpeg, jpeg_bytes

    tiles = np.array(
        [rnd.randrange(256) for _ in range(bh * bw)], np.uint8
    ).reshape(bh, bw)
    img = np.kron(tiles, np.ones((8, 8), np.uint8))
    img3 = np.stack([img] * 3, axis=-1)
    out = decode_jpeg(jpeg_bytes(img3, quality=97))
    assert np.abs(out.astype(int) - img3.astype(int)).max() <= 3


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 2**62))
def test_hdr_bucket_property(v):
    """Python mirror of the shared HDR bucket arithmetic: monotone,
    inverse lower bound within one bucket width (<2^-5 relative)."""
    sb, m = 5, 32

    def bucket(x):
        if x < m:
            return x
        e = x.bit_length() - 1
        return (e - sb) * m + (x >> (e - sb))

    def low(b):
        return b if b < m else (m + b % m) << (b // m - 1)

    b = bucket(v)
    assert low(b) <= v
    assert bucket(v + 1) >= b
    if v >= m:
        assert (v - low(b)) / v < 2 ** -5


@settings(max_examples=30, deadline=None)
@given(st.randoms(use_true_random=False))
def test_longedge_contraction_equivalence_property(rnd):
    """On random integer-weighted digraphs the contracted Dijkstra
    reaches the same destinations at the same costs as the plain one
    (integer weights -> chain sums are float-exact, so equality is
    exact, not approximate)."""
    from h3ron_spark.graph.algorithms import (
        _contract_chains,
        _csr_from_arrays,
        _dijkstra_csr,
    )

    n_nodes = rnd.randrange(8, 40)
    edges = set()
    # random base edges + a few long chains grafted on
    for _ in range(rnd.randrange(10, 60)):
        a, b = rnd.randrange(n_nodes), rnd.randrange(n_nodes)
        if a != b:
            edges.add((a, b))
    nxt = n_nodes
    for _ in range(rnd.randrange(0, 4)):
        start = rnd.randrange(n_nodes)
        prev = start
        for _ in range(rnd.randrange(3, 8)):
            edges.add((prev, nxt))
            if rnd.random() < 0.5:
                edges.add((nxt, prev))
            prev = nxt
            nxt += 1
        edges.add((prev, rnd.randrange(n_nodes)))
    edges.add((0, 1 % n_nodes if n_nodes > 1 else 1))  # never empty
    el = sorted(edges)
    u = np.array([a for a, _ in el], np.int64)
    v = np.array([b for _, b in el], np.int64)
    w = np.array([float(rnd.randrange(1, 9)) for _ in el], np.float64)
    csr = _csr_from_arrays(u, v, np.arange(len(el), dtype=np.int64), w)
    contraction = _contract_chains(*csr[:6])
    src = int(u[0])
    dests = {int(x) for x in rnd.sample(range(nxt), min(5, nxt))}
    d_p, _, _, r_p = _dijkstra_csr(csr + (None,), src, dests=dests)
    d_c, _, _, r_c = _dijkstra_csr(csr + (contraction,), src, dests=dests)
    assert sorted(r_p) == sorted(r_c)
    for t in r_p:
        assert d_p[t] == d_c[t], (t, d_p[t], d_c[t])


@settings(max_examples=25, deadline=None)
@given(
    st.integers(2, 24), st.integers(2, 24), st.randoms(use_true_random=False)
)
def test_bmp_roundtrip_property(w, h, rnd):
    from h3ron_spark.pipeline.multimodal import bmp_bytes, decode_bmp

    px = np.array(
        [rnd.randrange(256) for _ in range(w * h * 3)], np.uint8
    ).reshape(h, w, 3)
    assert np.array_equal(decode_bmp(bmp_bytes(px)), px)
