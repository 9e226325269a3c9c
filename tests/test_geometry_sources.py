"""WKT geometry dispatch (G1-G3), generator tables (S27/S18), path
linestring (P8), covered area (P12), source stubs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import h3ron_spark.h3core as h3c
from h3ron_spark import sources as SRC
from h3ron_spark.functions import geo as G
from h3ron_spark.h3core import regions as R
from h3ron_spark.h3core.wkt import geometry_to_cells, parse_wkt

POLY = (
    "POLYGON ((-122.5 37.70, -122.38 37.70, -122.38 37.82, "
    "-122.5 37.82, -122.5 37.70))"
)
LINE = "LINESTRING (-122.5 37.70, -122.38 37.82)"


def test_wkt_parse_kinds():
    assert parse_wkt("POINT (-122.44 37.76)") == ("point", (37.76, -122.44))
    k, pts = parse_wkt("MULTIPOINT ((-122.44 37.76), (45 45))")
    assert k == "multipoint" and len(pts) == 2
    k, (outer, holes) = parse_wkt(POLY)
    assert k == "polygon" and len(outer) == 5 and holes == []


def test_geometry_to_cells_scalar_dispatch():
    ring = [(37.70, -122.50), (37.70, -122.38), (37.82, -122.38), (37.82, -122.50)]
    assert geometry_to_cells(POLY, 8) == R.polygon_to_cells(ring, 8)
    assert geometry_to_cells(LINE, 8) == sorted(
        set(R.line_to_cells([(37.70, -122.50), (37.82, -122.38)], 8))
    )
    pt = geometry_to_cells("POINT (-122.44 37.76)", 9)
    assert pt == [h3c.latlng_to_cell(37.76, -122.44, 9)]
    gc = geometry_to_cells(
        f"GEOMETRYCOLLECTION (POINT (-122.44 37.76), {LINE})", 8
    )
    assert set(gc) >= set(geometry_to_cells(LINE, 8))


def test_geometry_udfs(spark):
    df = spark.range(1, numPartitions=1).select(
        F.lit(POLY).alias("poly"), F.lit(LINE).alias("line"),
        F.lit("POINT (-122.44 37.76)").alias("pt"),
        F.lit("not wkt").alias("bad"),
    )
    r = df.select(
        F.size(G.h3_geometry_to_cells("poly", F.lit(8))).alias("np"),
        F.size(G.h3_polygon_to_cells("poly", F.lit(8))).alias("np2"),
        F.size(G.h3_line_to_cells("line", F.lit(8))).alias("nl"),
        G.h3_geometry_to_cells("pt", F.lit(9)).alias("ptc"),
        G.h3_geometry_to_cells("bad", F.lit(8)).alias("badc"),
    ).collect()[0]
    want = len(geometry_to_cells(POLY, 8))
    assert r.np == want and r.np2 == want
    assert r.nl == len(geometry_to_cells(LINE, 8))
    assert r.ptc == [h3c.latlng_to_cell(37.76, -122.44, 9)]
    assert r.badc is None


def test_cells_to_linestring_wkt(spark):
    a = h3c.latlng_to_cell(37.76, -122.44, 8)
    path = h3c.grid_path_cells(a, h3c.grid_disk(a, 3)[-1])
    df = spark.range(1, numPartitions=1).select(
        F.array(*[F.lit(c) for c in path]).alias("cells")
    )
    wkt = df.select(G.h3_cells_to_linestring_wkt("cells")).collect()[0][0]
    assert wkt.startswith("LINESTRING (")
    assert wkt.count(",") == len(path) - 1


def test_res0_table(spark):
    t = SRC.res0_cells_table(spark)
    assert t.count() == 122
    assert t.filter(~F.col("cell").isNull()).count() == 122


def test_avg_area_table(spark):
    t = SRC.average_hexagon_areas_table(spark)
    rows = {r.res: r.avg_hexagon_area_km2 for r in t.collect()}
    assert len(rows) == 16
    assert abs(rows[0] - 4357449.416078381) < 1e-6
    assert rows[15] < rows[0]


def test_file_sources_error_on_missing_path(spark):
    """The former import-gated stubs are now real built-in readers
    (sources.osmpbf / sources.tiff); a missing file surfaces as a
    normal I/O error, not NotImplementedError."""
    with pytest.raises(FileNotFoundError):
        SRC.osm_ways_to_linestrings(spark, "/nope.osm.pbf")
    with pytest.raises(FileNotFoundError):
        SRC.raster_file_to_cells(spark, "/nope.tif")


def test_covered_area(spark):
    from h3ron_spark.graph import covered_area, edge_graph_from_cell_pairs

    seed = h3c.latlng_to_cell(37.76, -122.44, 8)
    disk = h3c.grid_disk(seed, 2)
    pairs = [
        (a, b, 1.0)
        for a in disk
        for b in h3c.neighbors(a)
        if b in set(disk)
    ]
    from h3ron_spark.util import local_df

    edges = edge_graph_from_cell_pairs(
        local_df(spark, pairs, "origin long, destination long, weight double")
    )
    out = covered_area(edges, 6).collect()
    assert len(out) >= 1
    assert all(r.geometry_wkt.startswith("MULTIPOLYGON") for r in out)
