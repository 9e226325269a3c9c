"""Ingestion sources.

The engine's storage model is plain Parquet (graph/cell tables need no
custom format — SURVEY §2.6 P14); these helpers cover the reference's
ingestion surfaces:

- generator tables (res0 cells, average-area lookup)
- OSM .pbf ways -> linestring table (P13) — the pbf PARSER is gated
  behind an import-try (no pyrosm/pyosmium in this container); the
  downstream pipeline (linestrings -> traced cells -> edge graph) is
  fully implemented and tested via graph.graph_from_linestrings.
- raster files (R4 front-end) — rasterio gated the same way; the
  numpy-array pipeline in h3ron_spark.raster is the real dataflow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from h3ron_spark.util import local_df


def res0_cells_table(spark: SparkSession) -> DataFrame:
    """S27: the 122 base cells as a one-column table
    (h3ron/src/lib.rs:134-144)."""
    from h3ron_spark.h3core import res0_cells

    return local_df(spark, [(c,) for c in res0_cells()], "cell long")


def average_hexagon_areas_table(spark: SparkSession) -> DataFrame:
    """S18 area_avg_km2: the public 16-row resolution/area lookup —
    join or element_at against it instead of calling a UDF."""
    from h3ron_spark.h3core import average_hexagon_area_km2

    rows = [(r, average_hexagon_area_km2(r)) for r in range(16)]
    return local_df(spark, rows, "res int, avg_hexagon_area_km2 double")


def osm_ways_to_linestrings(
    spark: SparkSession, pbf_path: str, highway_filter=None
) -> DataFrame:
    """P13 front-end: parse an .osm.pbf into (way_id long, coords
    array<struct<lat,lng>>, tags map<string,string>). Requires a pbf
    parser library; this container ships none, so this raises with
    instructions. The rest of the P13 pipeline (WayAnalyzer weighting
    -> trace -> consecutive edges -> min-weight graph,
    io/osm.rs:30-121) is graph.graph_from_linestrings.
    """
    try:
        import pyrosm  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "OSM pbf parsing needs the 'pyrosm' (or 'pyosmium') package, "
            "which is not installed in this environment. Stage ways as a "
            "parquet table of (way_id, coords array<struct<lat,lng>>, "
            "weight) and feed graph.graph_from_linestrings instead."
        ) from e
    raise NotImplementedError("pyrosm backend not wired in this build")


def raster_file_to_cells(
    spark: SparkSession,
    path: str,
    h3_resolution: int | None = None,
    band: int = 0,
    nodata=None,
    **kw,
):
    """R4 front-end for raster files (h3ify_r_tiff.rs:13-49 reads the
    GeoTIFF via GDAL, picks ``nearest_h3_resolution``, then converts):
    decode the band + geotransform with the built-in pure-Python
    GeoTIFF reader (sources.tiff — classic TIFF, strips/tiles,
    none/LZW/deflate/PackBits) and run ``raster.raster_to_cells``.
    If ``h3_resolution`` is None it is chosen by
    ``nearest_h3_resolution`` like the reference example. ``nodata``
    defaults to the file's GDAL_NODATA tag."""
    from h3ron_spark.raster import nearest_h3_resolution, raster_to_cells
    from h3ron_spark.sources.tiff import read_geotiff

    g = read_geotiff(path)
    arr = g.bands[band]
    if nodata is None:
        nodata = g.nodata
    if h3_resolution is None:
        h3_resolution = nearest_h3_resolution(g.transform, arr.shape)
    return raster_to_cells(
        spark, arr, g.transform, h3_resolution, nodata=nodata, **kw
    )
