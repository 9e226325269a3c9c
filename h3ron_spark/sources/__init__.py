"""Ingestion sources.

The engine's storage model is plain Parquet (graph/cell tables need no
custom format — SURVEY §2.6 P14); these helpers cover the reference's
ingestion surfaces:

- generator tables (res0 cells, average-area lookup)
- OSM .pbf ways -> linestring table (P13) via the built-in
  pure-Python PBF decoder (sources.osmpbf); downstream
  (linestrings -> traced cells -> edge graph) is
  graph.graph_from_linestrings.
- raster files (R4 front-end) via the built-in pure-Python GeoTIFF
  reader (sources.tiff); the array pipeline is h3ron_spark.raster.
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
    array<struct<lat double, lng double>>, tags map<string,string>)
    using the built-in pure-Python PBF decoder (sources.osmpbf — no
    external parser needed). ``highway_filter``: optional list of
    ``highway=`` tag values to keep (the reference's WayAnalyzer
    filter hook, io/osm.rs:30-42). The rest of the P13 pipeline
    (weighting -> trace -> consecutive edges -> min-weight graph,
    io/osm.rs:43-121) is graph.graph_from_linestrings.

    Scale: blob decode runs on executors; way refs join to node
    coordinates as a Spark equi-join on node_id (shuffle on a
    well-distributed key), then reassemble ordered coords with
    collect_list over a (way_id, seq) sort — planet files never
    materialize driver-side."""
    from pyspark.sql import functions as F

    from h3ron_spark.sources.osmpbf import osm_pbf_to_dataframes

    nodes, ways = osm_pbf_to_dataframes(spark, pbf_path)
    if highway_filter is not None:
        vals = [str(v) for v in highway_filter]
        ways = ways.filter(F.col("tags").getItem("highway").isin(vals))
    joined = ways.join(nodes, ways.ref == nodes.node_id, "inner")
    return (
        joined.groupBy("way_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("seq", "lat", "lng"))
            ).alias("pts"),
            F.first("tags").alias("tags"),
        )
        .select(
            "way_id",
            F.transform(
                "pts", lambda p: F.struct(p["lat"], p["lng"])
            ).alias("coords"),
            "tags",
        )
    )


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
