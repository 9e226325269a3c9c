"""Geo pandas-UDF layer: Spark results must equal the scalar h3core
oracle on the same inputs (the reference's cross-implementation test
idiom, e.g. grid_disk list column == scalar grid_disk in
h3ron-polars/src/algorithm/chunkedarray/grid_disk.rs:76-101), and
invalid inputs must become SQL NULL (h3ron-polars/src/from.rs:102-112).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

import h3ron_spark.h3core as h3c
from h3ron_spark.functions import geo as G

SF_CELL = 0x8928308280FFFFF


@pytest.fixture(scope="module")
def cells_df(spark):
    base = h3c.grid_disk(SF_CELL, 2)
    rows = [(c,) for c in base] + [(0,), (None,), (123456,)]
    return spark.createDataFrame(
        rows, StructType([StructField("cell", LongType(), True)])
    )


def test_latlng_to_cell_matches_core(spark):
    pts = [
        (37.7752702151959257, -122.4187776995656666, 9),
        (0.0, 0.0, 5),
        (-41.3, 174.8, 7),
        (64.1, -21.9, 11),
        (None, 10.0, 5),
        (95.0, 0.0, 5),   # out-of-range lat -> NULL
        (10.0, 20.0, 16),  # bad res -> NULL
    ]
    df = spark.createDataFrame(pts, "lat double, lng double, res int")
    got = [
        r.cell
        for r in df.select(
            G.h3_latlng_to_cell("lat", "lng", "res").alias("cell")
        ).collect()
    ]
    want = [
        h3c.latlng_to_cell(la, ln, r)
        if la is not None and -90 <= la <= 90 and 0 <= r <= 15
        else None
        for la, ln, r in pts
    ]
    assert got == want
    assert got[0] == SF_CELL


def test_cell_to_latlng_and_null_contract(cells_df):
    rows = cells_df.select(
        "cell", G.h3_cell_to_latlng("cell").alias("ll")
    ).collect()
    for r in rows:
        c = r.cell
        if c is None or not h3c.is_valid_cell(c):
            assert r.ll is None or (r.ll.lat is None and r.ll.lng is None)
        else:
            lat, lng = h3c.cell_to_latlng(c)
            assert abs(r.ll.lat - lat) < 1e-12
            assert abs(r.ll.lng - lng) < 1e-12


def test_grid_disk_matches_core(cells_df):
    rows = cells_df.select(
        "cell", G.h3_grid_disk("cell", F.lit(2)).alias("disk")
    ).collect()
    for r in rows:
        if r.cell is None or not h3c.is_valid_cell(r.cell):
            assert r.disk is None
        else:
            assert sorted(r.disk) == sorted(h3c.grid_disk(r.cell, 2))


def test_grid_disk_explode_count(spark, cells_df):
    valid = cells_df.filter(G.h3_grid_disk("cell", F.lit(1)).isNotNull())
    n = (
        valid.select(F.explode(G.h3_grid_disk("cell", F.lit(1))).alias("n"))
        .count()
    )
    assert n == 19 * 7  # 19 valid cells x disk(1)=7 (no pentagons here)


def test_children_and_change_resolution(cells_df):
    rows = (
        cells_df.filter(F.col("cell") == SF_CELL)
        .select(
            G.h3_cell_to_children("cell", F.lit(10)).alias("kids"),
            G.h3_change_resolution("cell", F.lit(8)).alias("up"),
            G.h3_change_resolution("cell", F.lit(9)).alias("same"),
        )
        .collect()[0]
    )
    assert sorted(rows.kids) == sorted(h3c.cell_to_children(SF_CELL, 10))
    assert rows.up == [h3c.cell_to_parent(SF_CELL, 8)]
    assert rows.same == [SF_CELL]


def test_distance_path_neighbors(spark):
    target = h3c.grid_disk(SF_CELL, 3)[-1]
    df = spark.createDataFrame([(SF_CELL, target)], "a long, b long")
    r = df.select(
        G.h3_grid_distance("a", "b").alias("d"),
        G.h3_grid_path("a", "b").alias("p"),
        G.h3_are_neighbor_cells("a", "b").alias("n"),
    ).collect()[0]
    assert r.d == h3c.grid_distance(SF_CELL, target)
    assert r.p == h3c.grid_path_cells(SF_CELL, target)
    assert r.n == h3c.are_neighbor_cells(SF_CELL, target)


def test_edges_roundtrip_via_spark(spark):
    df = spark.createDataFrame([(SF_CELL,)], "cell long")
    edges = df.select(
        F.explode(G.h3_cell_to_directed_edges("cell")).alias("edge")
    )
    rows = edges.select(
        "edge",
        G.h3_directed_edge_to_cells("edge").alias("oc"),
        G.h3_edge_reverse("edge").alias("rev"),
        G.h3_edge_length_m("edge").alias("len_m"),
    ).collect()
    assert len(rows) == 6
    for r in rows:
        assert r.oc.origin == SF_CELL
        assert h3c.edge_origin(r.rev) == r.oc.destination
        assert abs(r.len_m - h3c.edge_length_m(r.edge)) < 1e-9


def test_area_and_boundary(cells_df):
    r = (
        cells_df.filter(F.col("cell") == SF_CELL)
        .select(
            G.h3_cell_area_km2("cell").alias("a"),
            G.h3_cell_to_boundary_wkt("cell").alias("wkt"),
        )
        .collect()[0]
    )
    assert abs(r.a - h3c.cell_area_km2(SF_CELL)) < 1e-12
    assert r.wkt.startswith("POLYGON ((")


def test_local_ij_roundtrip_spark(spark):
    neigh = h3c.grid_disk(SF_CELL, 2)
    df = spark.createDataFrame([(SF_CELL, n) for n in neigh], "o long, c long")
    out = df.select(
        "o", "c", G.h3_cell_to_local_ij("o", "c").alias("ij")
    ).withColumn("back", G.h3_local_ij_to_cell("o", F.col("ij.i"), F.col("ij.j")))
    for r in out.collect():
        assert r.back == r.c


def test_compact_uncompact_arrays(spark):
    kids = h3c.cell_to_children(SF_CELL, 11)
    df = spark.createDataFrame([(kids,)], "cells array<long>")
    r = df.select(
        G.h3_compact_cells("cells").alias("comp"),
        G.h3_uncompact_cells(G.h3_compact_cells("cells"), F.lit(11)).alias("back"),
    ).collect()[0]
    assert r.comp == [SF_CELL]
    assert sorted(r.back) == sorted(kids)


def test_following_and_previous_edges_reference_invariants(spark):
    """iter/edge.rs:104-158 (from_origin_cell /
    following_edges_leading_from_destination /
    previous_edges_leading_to_origin): 6 out-edges at the reference's
    (34.2, 30.5) res-7 cell; 5 following edges all originating at the
    input's destination, reverse excluded; 5 previous edges all ending
    at the input's origin, reverse excluded."""
    from pyspark.sql import functions as F

    import h3ron_spark.h3core as h3c
    from h3ron_spark.functions import geo as G

    cell = h3c.latlng_to_cell(30.5, 34.2, 7)  # Coord (x=lng 34.2, y=lat 30.5)
    edges = h3c.origin_to_directed_edges(cell)
    assert len(edges) == 6
    df = spark.createDataFrame([(e,) for e in edges], "edge long")
    rows = df.select(
        "edge",
        G.h3_following_edges("edge").alias("following"),
        G.h3_previous_edges("edge").alias("previous"),
        G.h3_edge_destination("edge").alias("dest"),
        G.h3_edge_reverse("edge").alias("rev"),
    ).collect()
    for r in rows:
        assert len(r["following"]) == 5
        assert r["rev"] not in r["following"]
        assert r["edge"] not in r["following"]
        for f in r["following"]:
            assert h3c.directed_edge_to_cells(f)[0] == r["dest"]
        assert len(r["previous"]) == 5
        assert r["rev"] not in r["previous"]
        for p in r["previous"]:
            assert h3c.directed_edge_to_cells(p)[1] == cell
