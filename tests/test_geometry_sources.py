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


# ------------------------------------------------------------------
# GeoPackage sink (sources/gpkg.py) — the reference's GPKG vector
# write (h3ify_r_tiff.rs:32-58) without GDAL
# ------------------------------------------------------------------


def test_gpkg_write_readback_wkb_exact(spark, tmp_path):
    """Write cell polygons + values to a .gpkg, read back via sqlite3
    and independently re-parse the WKB: coordinates, ring counts, and
    properties must round-trip exactly; required GPKG metadata tables
    must validate."""
    import sqlite3
    import struct

    from pyspark.sql import functions as F2

    import h3ron_spark.h3core as h3c
    from h3ron_spark.sources.gpkg import read_gpkg_layer, write_gpkg

    cells = [h3c.latlng_to_cell(37.0 + i * 0.01, -122.0, 8) for i in range(5)]
    rows = []
    for i, c in enumerate(cells):
        bnd = h3c.cell_to_boundary(c)
        wkt = (
            "POLYGON (("
            + ", ".join(f"{lng} {lat}" for lat, lng in list(bnd) + [bnd[0]])
            + "))"
        )
        rows.append((int(c), float(i * 2.5), wkt))
    df = spark.createDataFrame(rows, "cell long, value double, wkt string")
    path = str(tmp_path / "cells.gpkg")
    assert write_gpkg(df, path, "cells", wkt_col="wkt") == 5

    # required metadata (GPKG spec core tables + pragmas)
    con = sqlite3.connect(path)
    app_id = con.execute("PRAGMA application_id").fetchone()[0]
    assert app_id == 1196444487  # 'GPKG'
    assert con.execute(
        "SELECT data_type, srs_id FROM gpkg_contents WHERE table_name='cells'"
    ).fetchone() == ("features", 4326)
    assert con.execute(
        "SELECT geometry_type_name FROM gpkg_geometry_columns "
        "WHERE table_name='cells'"
    ).fetchone()[0] == "GEOMETRY"
    con.close()

    back = read_gpkg_layer(spark, path, "cells").collect()
    assert len(back) == 5
    by_cell = {r.cell: r for r in back}
    for i, c in enumerate(cells):
        r = by_cell[int(c)]
        assert r.value == i * 2.5
        wkb = r.geom_wkb
        byte_order, geom_type, n_rings = struct.unpack_from("<BII", wkb, 0)
        assert (byte_order, geom_type, n_rings) == (1, 3, 1)
        (n_pts,) = struct.unpack_from("<I", wkb, 9)
        bnd = h3c.cell_to_boundary(c)
        assert n_pts == len(bnd) + 1  # closed ring
        for p in range(n_pts - 1):
            x, y = struct.unpack_from("<dd", wkb, 13 + 16 * p)
            assert abs(x - bnd[p][1]) < 1e-12
            assert abs(y - bnd[p][0]) < 1e-12


def test_gpkg_multipolygon_and_guard(spark, tmp_path):
    """Multipolygon layers (the dissolve output shape) encode as WKB
    type 6; the summarized-layer row guard refuses fact-table sizes."""
    import struct

    from h3ron_spark.sources import gpkg as G

    wkt = (
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
        "((5 5, 6 5, 6 6, 5 6, 5 5), (5.2 5.2, 5.8 5.2, 5.5 5.8, 5.2 5.2)))"
    )
    blob = G.wkt_to_gpkg_blob(wkt)
    assert blob[:2] == b"GP"
    env = struct.unpack("<4d", blob[8:40])
    assert env == (0.0, 6.0, 0.0, 6.0)  # minx maxx miny maxy
    wkb = blob[40:]
    bo, t, n = struct.unpack_from("<BII", wkb, 0)
    assert (bo, t, n) == (1, 6, 2)

    import pytest as _pytest

    G_MAX = G._MAX_FEATURES
    G._MAX_FEATURES = 10
    try:
        df = spark.range(50).selectExpr(
            "'POINT (1 2)' AS wkt", "id AS v"
        )
        with _pytest.raises(ValueError):
            G.write_gpkg(df, str(tmp_path / "x.gpkg"), "pts")
    finally:
        G._MAX_FEATURES = G_MAX
