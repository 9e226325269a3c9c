"""Pure-Python OSM .pbf decode + P13 ingestion pipeline.

The reference streams `.osm.pbf` via the osmpbfreader crate
(h3ron-graph/src/io/osm.rs:30-121). No .pbf ships in either repo, so
the fixture writer (sources.osmpbf.write_osm_pbf) generates a small
synthetic road grid and the tests close the loop: write -> scan ->
decode -> Spark linestrings -> traced H3 graph -> routing.
"""

from __future__ import annotations

import pytest

from h3ron_spark.sources.osmpbf import (
    _read_blob,
    parse_primitive_block,
    scan_blobs,
    write_osm_pbf,
)


def _fixture(tmp_path):
    nodes = []
    grid = {}
    nid = 100
    for r in range(5):
        for c in range(6):
            grid[(r, c)] = nid
            nodes.append((nid, 49.40 + 0.004 * r, 8.66 + 0.004 * c))
            nid += 3  # ids deliberately non-contiguous
    ways = []
    wid = 5000
    for r in range(5):
        ways.append(
            (
                wid,
                [grid[(r, c)] for c in range(6)],
                {"highway": "residential", "name": f"r{r}"},
            )
        )
        wid += 7
    for c in range(6):
        ways.append((wid, [grid[(r, c)] for r in range(5)], {"highway": "primary"}))
        wid += 7
    p = str(tmp_path / "grid.osm.pbf")
    write_osm_pbf(p, nodes, ways)
    return p, nodes, ways


def test_pbf_roundtrip(tmp_path):
    p, nodes, ways = _fixture(tmp_path)
    blobs = scan_blobs(p)
    assert [b[0] for b in blobs] == ["OSMHeader", "OSMData"]
    blk = parse_primitive_block(_read_blob(p, blobs[1][1], blobs[1][2]))
    assert len(blk["nodes"]) == len(nodes)
    assert len(blk["ways"]) == len(ways)
    # node coords survive the 100-nanodegree granularity roundtrip
    for (nid, lat, lng), (gid, glat, glng) in zip(nodes, blk["nodes"]):
        assert nid == gid
        assert abs(lat - glat) < 1e-7
        assert abs(lng - glng) < 1e-7
    wid, refs, tags = blk["ways"][0]
    assert wid == 5000
    assert tags == {"highway": "residential", "name": "r0"}
    assert refs == [w for w in ways[0][1]]


def test_osm_ways_to_linestrings(spark, tmp_path):
    from h3ron_spark.sources import osm_ways_to_linestrings

    p, nodes, ways = _fixture(tmp_path)
    ls = osm_ways_to_linestrings(spark, p)
    rows = {r["way_id"]: r for r in ls.collect()}
    assert len(rows) == 11
    r0 = rows[5000]
    assert dict(r0["tags"]) == {"highway": "residential", "name": "r0"}
    # ordered coords match the ref sequence
    assert [
        (round(c["lat"], 7), round(c["lng"], 7)) for c in r0["coords"]
    ] == [(49.40, round(8.66 + 0.004 * c, 7)) for c in range(6)]

    primary = osm_ways_to_linestrings(spark, p, highway_filter=["primary"])
    assert primary.count() == 6


def test_pbf_to_graph_and_route(spark, tmp_path):
    """P13 end-to-end: pbf -> linestrings -> res-10 edge graph that
    routing can traverse between two grid corners."""
    import math

    from h3ron_spark.graph.algorithms import shortest_path_many_to_many
    from h3ron_spark.graph.build import graph_from_linestrings
    from h3ron_spark.h3core import index as ix
    from h3ron_spark.sources import osm_ways_to_linestrings

    p, _n, _w = _fixture(tmp_path)
    ls = osm_ways_to_linestrings(spark, p)
    g = graph_from_linestrings(ls, 10)
    assert g.count() > 0
    a = ix.latlng_to_cell(math.radians(49.40), math.radians(8.66), 10)
    b = ix.latlng_to_cell(math.radians(49.416), math.radians(8.68), 10)
    paths = shortest_path_many_to_many(
        g, [a], [b], max_distance_to_graph=2
    )
    got = paths.collect()
    assert len(got) == 1
    assert got[0]["cost"] > 0


def test_empty_pbf(spark, tmp_path):
    from h3ron_spark.sources.osmpbf import osm_pbf_to_dataframes

    p = str(tmp_path / "empty.osm.pbf")
    write_osm_pbf(p, [], [])
    nodes, ways = osm_pbf_to_dataframes(spark, p)
    assert nodes.count() == 0
    assert ways.count() == 0
