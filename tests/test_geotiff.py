"""Pure-Python GeoTIFF reader/writer + real-file R4 ingestion.

The reference ships committed raster fixtures
(`/root/reference/data/r.tiff` — ingested by GDAL in
h3ron-ndarray/examples/h3ify_r_tiff.rs:13-49 — plus two RGB tifs used
by h3ron docs). Tests against those files pin the reader to
GDAL-published characteristics; they skip when the reference checkout
is absent. The writer-roundtrip and fixture-ingest tests are
self-contained.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from h3ron_spark.raster import Transform, nearest_h3_resolution
from h3ron_spark.sources.tiff import (
    read_geotiff,
    write_geotiff_uncompressed,
)

R_TIFF = "/root/reference/data/r.tiff"
EUROPE_TIF = "/root/reference/data/europe-and-north-africa.tif"
LAND_TIF = "/root/reference/data/land_shallow_topo_1024.tif"

needs_ref = pytest.mark.skipif(
    not os.path.exists(R_TIFF), reason="reference data not available"
)


# ------------------------------------------------------------- reader


@needs_ref
def test_r_tiff_decode_pinned():
    """r.tiff: 2000x2000 LZW u8 single band, GDAL_NODATA=0, and the
    exact value histogram + geotransform GDAL reports."""
    g = read_geotiff(R_TIFF)
    assert g.bands.shape == (1, 2000, 2000)
    assert g.bands.dtype == np.uint8
    assert g.nodata == 0.0
    vals, counts = np.unique(g.band, return_counts=True)
    assert vals.tolist() == [0, 1]
    assert counts.tolist() == [3637056, 362944]
    t = g.transform
    assert abs(t.a - 0.001196505) < 1e-9
    assert abs(t.e + 0.001215135) < 1e-9
    assert abs(t.xoff - 8.11377) < 1e-9
    assert abs(t.yoff - 49.40792) < 1e-9
    assert t.b == 0.0 and t.d == 0.0


@needs_ref
def test_rgb_fixtures_decode():
    g = read_geotiff(EUROPE_TIF)  # uncompressed RGB strips
    assert g.bands.shape == (3, 284, 327)
    assert abs(g.transform.a - 0.3515625) < 1e-12
    g2 = read_geotiff(LAND_TIF)  # LZW RGB strips
    assert g2.bands.shape == (3, 512, 1024)
    assert 0 < g2.bands.mean() < 255


# ------------------------------------------------------------- writer


@pytest.mark.parametrize(
    "dtype,nodata",
    [(np.uint8, 0), (np.int16, -999), (np.float64, None), (np.uint16, 7)],
)
def test_writer_roundtrip(tmp_path, dtype, nodata):
    rng = np.random.default_rng(5)
    if np.issubdtype(dtype, np.floating):
        band = rng.normal(0.0, 1.0, (11, 7)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        band = rng.integers(
            max(info.min, -500), min(info.max, 500), (11, 7)
        ).astype(dtype)
    tr = Transform(0.1, 0.0, 0.0, -0.1, 10.0, 55.0)
    p = str(tmp_path / "rt.tiff")
    write_geotiff_uncompressed(p, band, tr, nodata=nodata)
    rb = read_geotiff(p)
    assert (rb.band == band).all()
    assert rb.band.dtype == dtype
    if nodata is None:
        assert rb.nodata is None
    else:
        assert rb.nodata == float(nodata)
    assert abs(rb.transform.a - 0.1) < 1e-12
    assert abs(rb.transform.e + 0.1) < 1e-12
    assert rb.transform.xoff == 10.0
    assert rb.transform.yoff == 55.0


# ------------------------------------------- R4 file pipeline (Spark)


def test_raster_file_to_cells_matches_array_path(spark, tmp_path):
    """File front-end == in-memory array pipeline on the same band."""
    from h3ron_spark.raster import raster_to_cells
    from h3ron_spark.sources import raster_file_to_cells

    rows, cols = np.indices((24, 36))
    band = (((rows // 6) + (cols // 9)) % 4).astype(np.uint8)
    tr = Transform(0.02, 0.0, 0.0, -0.02, 8.0, 49.6)
    p = str(tmp_path / "fix.tiff")
    write_geotiff_uncompressed(p, band, tr, nodata=0)

    res = nearest_h3_resolution(tr, band.shape)
    via_file = raster_file_to_cells(spark, p)
    via_array = raster_to_cells(spark, band, tr, res, nodata=0)
    a = sorted(map(tuple, via_file.collect()))
    b = sorted(map(tuple, via_array.collect()))
    assert a == b
    assert len(a) > 0


@needs_ref
def test_r_tiff_ingest_pinned(spark):
    """End-to-end ingest of the reference's committed r.tiff: 362944
    data pixels -> 6709 distinct res-8 cells, all carrying value 1."""
    import pyspark.sql.functions as F

    from h3ron_spark.sources import raster_file_to_cells

    df = raster_file_to_cells(
        spark, R_TIFF, h3_resolution=8, mode="pixel_center"
    )
    out = df.groupBy("value").agg(
        F.countDistinct("cell").alias("n")
    ).collect()
    assert [(int(r["value"]), r["n"]) for r in out] == [(1, 6709)]
