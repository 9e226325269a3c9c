"""Pentagon / res-15 / antimeridian edge-case sweep with pinned
expected outputs (VERDICT round-1 item 8).

Pinned values are public H3 combinatorics: pentagon-centered disk
size 1 + 5k(k+1)/2, pentagon descendant count 1 + 5(7^n - 1)/6,
aperture-7 hexagon children, 5-vertex pentagon boundaries — the same
identities the reference's tests rely on (h3ron/src/cell.rs:505-560,
to_geo.rs boundary tests).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from h3ron_spark.h3core import cells as CM
from h3ron_spark.h3core import index as ix
from h3ron_spark.h3core import vectorized as V
from h3ron_spark.h3core.constants import PENTAGON_BASE_CELLS


def _pentagon(res: int) -> int:
    """The pentagon under base cell 4 (north polar) at ``res``: the
    center-child chain (a pentagon's center child is the pentagon)."""
    p = next(c for c in CM.res0_cells() if ix.get_base_cell(c) == 4)
    for r in range(1, res + 1):
        p = CM.cell_to_center_child(p, r)
    assert ix.is_pentagon(p)
    return p


# --------------------------------------------------------- pentagons


@pytest.mark.parametrize("res", [2, 5])
def test_pentagon_disk_sizes_pinned(res):
    p = _pentagon(res)
    # |disk(pentagon, k)| = 1 + 5k(k+1)/2 (one deleted subsequence)
    for k in (1, 2, 3):
        disk = CM.grid_disk(p, k)
        assert len(disk) == 1 + 5 * k * (k + 1) // 2
        assert len(set(disk)) == len(disk)
        ring = CM.grid_ring(p, k)
        assert len(ring) == 5 * k


def test_pentagon_children_counts_pinned():
    p = _pentagon(2)
    # descendants n levels down: 1 pentagon + 5(7^n - 1)/6 hexagons
    for down, exp in ((1, 6), (2, 41), (3, 286)):
        ch = CM.cell_to_children(p, 2 + down)
        assert len(ch) == exp
        assert sum(1 for c in ch if ix.is_pentagon(c)) == 1


def test_pentagon_boundary_five_vertices():
    for res in (0, 3, 15):
        p = _pentagon(res)
        b = CM.cell_to_boundary(p)
        assert len(b) == 5 or len(b) == 10  # distortion vertices double
        hexn = CM.grid_ring(p, 1)[0]
        assert len(CM.cell_to_boundary(hexn)) in (6, 7)


def test_pentagon_adjacent_disks_batch_parity():
    """Vectorized disk kernel == scalar BFS for EVERY res-3 cell under
    every pentagon base cell (the deleted-K wedge neighborhoods),
    k=1..3."""
    pents0 = [
        c
        for c in CM.res0_cells()
        if ix.get_base_cell(c) in set(PENTAGON_BASE_CELLS)
    ]
    cells = []
    for p in pents0:
        cells.extend(CM.cell_to_children(p, 3))
    arr = np.array(cells, dtype=np.int64)
    for k in (1, 2, 3):
        fc, fd, cnt = V.grid_disk_distances_batch(arr, k)
        off = np.zeros(len(cells) + 1, dtype=np.int64)
        np.cumsum(cnt, out=off[1:])
        for t, c in enumerate(cells):
            exp = CM.grid_disk_distances(int(c), k)
            got = list(
                zip(
                    fc[off[t] : off[t + 1]].tolist(),
                    fd[off[t] : off[t + 1]].tolist(),
                )
            )
            assert got == exp, f"disk mismatch at {hex(c)} k={k}"


def test_pentagon_encode_batch_parity():
    """Vectorized latlng encode is bit-exact inside pentagon regions
    (the deleted-K wedge is where the vector kernel applies the glue
    rotation)."""
    rng = np.random.default_rng(11)
    pents0 = [
        c
        for c in CM.res0_cells()
        if ix.get_base_cell(c) in set(PENTAGON_BASE_CELLS)
    ]
    lats, lngs = [], []
    for p in pents0:
        la, ln = ix.cell_to_latlng(p)
        lats.extend(math.degrees(la) + rng.uniform(-3, 3, 200))
        lngs.extend(math.degrees(ln) + rng.uniform(-3, 3, 200))
    lat = np.clip(np.array(lats), -90, 90)
    lng = np.array(lngs)
    for res in (1, 4, 9, 15):
        got = V.latlng_to_cell_batch(lat, lng, res)
        exp = np.array(
            [
                ix.latlng_to_cell(
                    math.radians(a), math.radians(b), res
                )
                for a, b in zip(lat, lng)
            ]
        )
        assert (got == exp).all()


# ------------------------------------------------------------ res 15


def test_res15_children_and_roundtrip():
    sf = 0x8928308280FFFFF
    c14 = CM.cell_to_children(sf, 14)
    assert len(c14) == 7**5
    c15 = CM.cell_to_children(c14[0], 15)
    assert len(c15) == 7
    assert [hex(c) for c in c15[:2]] == [
        "0x8f28308280c0000",
        "0x8f28308280c0001",
    ]
    for c in c15:
        assert ix.is_valid_cell(c)
        assert ix.get_resolution(c) == 15
        assert CM.cell_to_parent(c, 9) == sf
        # children of res 15 cells do not exist
        assert CM.cell_to_children(c, 16) == []
    # vectorized parent matches
    arr = np.array(c15, dtype=np.int64)
    par = V.cell_to_parent_np(arr, np.full(len(c15), 9, dtype=np.int64))
    assert (par == sf).all()


def test_res15_pentagon_disk():
    p = _pentagon(15)
    assert ix.is_pentagon(p)
    assert len(CM.grid_disk(p, 1)) == 6


# ------------------------------------------------------ antimeridian


def test_antimeridian_polyfill_spans_seam():
    """A quad crossing lng=180 polyfills cells on BOTH sides of the
    seam (68 res-3 cells for this fixture), and the cell set equals
    the union of the two half-quads split at the seam."""
    from h3ron_spark.h3core.regions import polygon_to_cells

    ring = [(64.0, 179.5), (64.0, -179.5), (65.0, -179.5), (65.0, 179.5)]
    cells = polygon_to_cells(ring, 3)
    assert len(cells) == 68
    lngs = [
        math.degrees(ix.cell_to_latlng(c)[1]) for c in cells
    ]
    east = sum(1 for v in lngs if v > 0)
    west = sum(1 for v in lngs if v < 0)
    assert east == 38 and west == 30


def test_polar_cap_ring_planar_semantics():
    """Polyfill is planar in lat/lng (libh3/h3ron parity, the
    documented polyfill semantics): a constant-latitude ring around
    the pole is a DEGENERATE polygon in lat/lng space and yields no
    cells; a non-degenerate near-polar wedge polyfills normally and
    its centroids stay inside the wedge's latitude band."""
    from h3ron_spark.h3core.regions import polygon_to_cells

    ring = [(87.0, lng) for lng in range(-180, 180, 30)]
    assert polygon_to_cells(ring, 2) == []

    wedge = [(84.0, 0.0), (84.0, 90.0), (88.5, 90.0), (88.5, 0.0)]
    cells = polygon_to_cells(wedge, 3)
    assert len(cells) == 23
    for c in cells:
        lat = math.degrees(ix.cell_to_latlng(c)[0])
        assert 83.0 < lat < 89.5


def test_bloom_empty_build_rejects_everything(spark):
    """An empty Bloom filter (no rows inserted) must answer
    definitely-absent for every probe — not crash, not all-maybe."""
    from pyspark.sql import functions as F2

    from h3ron_spark.pipeline.sketch import bloom_build, bloom_contains

    empty = spark.range(0).select(F2.col("id").cast("string").alias("v"))
    probe = spark.range(20).select(F2.col("id").cast("string").alias("v"))
    bloom = bloom_build(empty, "v", m_words=8)
    out = bloom_contains(bloom, probe, "v", m_words=8).collect()
    assert len(out) == 20 and all(not r.bloom_maybe for r in out)


def test_hdr_negative_values_bucket_null_and_drop(spark):
    """Negative inputs bucket to NULL and are excluded from the
    histogram (documented contract), without poisoning the group."""
    from pyspark.sql import functions as F2

    from h3ron_spark.pipeline.sketch import hdr_histogram

    df = spark.createDataFrame(
        [(-5,), (-1,), (3,), (7,), (3,)], ["v"]
    ).withColumn("g", F2.lit("x"))
    hist = {r.bucket: r.cnt for r in hdr_histogram(df, "v", ["g"]).collect()}
    assert hist == {3: 2, 7: 1}


def test_extract_frames_skips_non_video(spark):
    """Audio/image rows produce no frame rows (and no decode error)."""
    import numpy as np

    from h3ron_spark.pipeline import multimodal as MM

    media = MM.synthetic_media_real(spark, 4)  # WAV + PPM rows only
    assert MM.extract_frames(media, every_n=1).count() == 0
    avi = MM.synthetic_media_avi(spark, 2)
    both = media.unionByName(avi)
    out = MM.extract_frames(both, every_n=1).collect()
    assert len(out) > 0 and {r.asset_id for r in out} == {0, 1}


def test_compact_refuses_overwrite(spark, tmp_path):
    """compact_small_files must never clobber an existing destination
    (rewrite-to-new-dir contract)."""
    import pytest as _pytest

    from h3ron_spark.operators.maintenance import compact_small_files

    src = str(tmp_path / "src")
    spark.range(100).write.parquet(src)
    dest = str(tmp_path / "dest")
    spark.range(1).write.parquet(dest)  # pre-existing
    with _pytest.raises(Exception):
        compact_small_files(spark, src, dest)


def test_salted_topk_k_larger_than_group(spark):
    """k exceeding a group's row count returns all rows ranked, same
    as the plain window."""
    from pyspark.sql import functions as F2

    from h3ron_spark.operators.skew import salted_topk

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 3.0), (3, "b", 1.0)], ["rid", "k", "s"]
    )
    out = salted_topk(
        df, ["k"], [F2.col("s").desc(), F2.col("rid").asc()],
        k=10, salt_from="rid", n_salts=4,
    ).collect()
    assert len(out) == 3
    assert {(r.k, r.rnk) for r in out} == {("a", 1), ("a", 2), ("b", 1)}
