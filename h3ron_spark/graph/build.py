"""Graph construction: edges tables from cell pairs / linestrings.

Parity targets:
- H3EdgeGraph build w/ min-weight duplicate rule:
  h3ron-graph/src/graph/h3edge.rs:18-139 (rule at :96-109)
- nodes() + NodeType algebra: h3edge.rs:128-157, graph/node.rs:6-48
- downsample_graph: h3edge.rs:215-260
- linestring ingestion (the non-OSM core of P13):
  h3ron-graph/src/io/osm.rs:30-121 maps ways -> linestrings -> cells ->
  consecutive-cell edges; we take linestrings directly (pyrosm/pbf
  parsing is an ingestion concern outside the engine; see sources/).

Graph model: an ordinary DataFrame
    (edge long, origin long, destination long, weight double)
stored/bucketed by origin for adjacency locality. No custom formats
(P14): Parquet is the serialization.

Scale: build is groupBy(edge).agg(min(weight)) — one shuffle, partial
agg map-side. Downsample is a projection + the same agg at coarser
res. Nodes is a union of two projections + bit_or agg.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import arrow_udf
from pyspark.sql.types import ArrayType, LongType

from h3ron_spark.functions import geo as G

NODE_ORIGIN = 1
NODE_DESTINATION = 2
NODE_ORIGIN_AND_DESTINATION = 3


def edge_graph_from_cell_pairs(
    df: DataFrame,
    origin_col: str = "origin",
    dest_col: str = "destination",
    weight_col: str = "weight",
    bidirectional: bool = False,
) -> DataFrame:
    """Build the edges table from neighboring cell pairs; duplicate
    edges keep the MINIMUM weight (h3edge.rs:96-109 'lower weight takes
    precedence'). Non-neighbor pairs yield NULL edges and are dropped
    (invalid->NULL contract)."""
    pairs = df.select(
        F.col(origin_col).alias("origin"),
        F.col(dest_col).alias("destination"),
        F.col(weight_col).cast("double").alias("weight"),
    )
    if bidirectional:
        pairs = pairs.unionByName(
            pairs.select(
                F.col("destination").alias("origin"),
                F.col("origin").alias("destination"),
                "weight",
            )
        )
    withe = pairs.withColumn(
        "edge", G.h3_cells_to_directed_edge("origin", "destination")
    ).filter(F.col("edge").isNotNull())
    return withe.groupBy("edge", "origin", "destination").agg(
        F.min("weight").alias("weight")
    )


def graph_from_linestrings(
    df: DataFrame,
    res: int,
    coords_col: str = "coords",
    weight_per_cell_col: str | None = None,
    bidirectional: bool = True,
) -> DataFrame:
    """Trace each linestring (array<struct<lat,lng>> or
    array<array<double>> [lat,lng]) into cells at ``res`` (G3), pair
    consecutive cells (P15), and build the graph. Weight per edge =
    weight_per_cell_col (default 1.0) — the reference's WayAnalyzer
    weight hook (io/osm.rs:30-42) is this column."""
    @arrow_udf(ArrayType(LongType()))
    def trace(coords: pa.Array) -> pa.Array:
        from h3ron_spark.h3core.regions import line_to_cells

        out = []
        for arr in coords.to_pylist():
            if arr is None or len(arr) == 0:
                out.append(None)
                continue
            pts = [
                (p["lat"], p["lng"]) if isinstance(p, dict) else (p[0], p[1])
                for p in arr
            ]
            out.append(line_to_cells(pts, res))
        return pa.array(out, pa.list_(pa.int64()))

    w = (
        F.col(weight_per_cell_col).cast("double")
        if weight_per_cell_col
        else F.lit(1.0)
    )
    traced = df.select(trace(coords_col).alias("_cells"), w.alias("_w")).filter(
        F.col("_cells").isNotNull()
    )
    pairs = traced.select(
        F.posexplode("_cells").alias("_pos", "origin"), "_cells", "_w"
    ).select(
        "origin",
        F.get("_cells", F.col("_pos") + 1).alias("destination"),
        "_w",
    ).filter(F.col("destination").isNotNull())
    if bidirectional:
        # the bidirectional union reads pairs twice — persist so the
        # (Python) trace kernel isn't re-evaluated per branch
        pairs = pairs.persist()
    return edge_graph_from_cell_pairs(
        pairs, "origin", "destination", "_w", bidirectional=bidirectional
    )


def save_graph(edges: DataFrame, path: str, partitions: int | None = None) -> None:
    """Persist a graph (P14; the reference serializes the prepared
    graph with bincode+LZ4, io/serde_util.rs:29-60 — here a graph IS a
    plain edges DataFrame, so persistence is a Parquet table: columnar
    compression replaces the custom format, and predicate
    pushdown/partition pruning come free on re-read). Bucketing by
    origin would additionally pre-co-locate the adjacency build at
    cluster scale; plain Parquet keeps the artifact engine-neutral."""
    out = edges
    if partitions is not None:
        out = out.repartition(partitions, "origin")
    out.write.mode("overwrite").parquet(path)


def load_graph(spark, path: str) -> DataFrame:
    """Re-open a persisted graph (P14 counterpart of save_graph)."""
    return spark.read.parquet(path)


def graph_nodes(edges: DataFrame) -> DataFrame:
    """(cell, node_type) with the reference's NodeType algebra
    (node.rs:6-48): Origin=1, Destination=2, both=3 via bit_or."""
    o = edges.select(F.col("origin").alias("cell"), F.lit(NODE_ORIGIN).alias("t"))
    d = edges.select(
        F.col("destination").alias("cell"), F.lit(NODE_DESTINATION).alias("t")
    )
    return (
        o.unionByName(d)
        .groupBy("cell")
        .agg(F.bit_or("t").alias("node_type"))
    )


def downsample_graph(
    edges: DataFrame, target_res: int, weight_agg: str = "min"
) -> DataFrame:
    """Re-express the graph at a coarser resolution (h3edge.rs:215-260):
    project endpoints to parents, drop self-edges, aggregate duplicate
    edges with ``weight_agg`` (the reference's weight_selector_fn)."""
    from h3ron_spark.functions import bits as B

    proj = edges.select(
        B.h3_to_parent("origin", target_res).alias("origin"),
        B.h3_to_parent("destination", target_res).alias("destination"),
        "weight",
    ).filter(F.col("origin") != F.col("destination"))
    withe = proj.withColumn(
        "edge", G.h3_cells_to_directed_edge("origin", "destination")
    ).filter(F.col("edge").isNotNull())
    agg = getattr(F, weight_agg)
    return withe.groupBy("edge", "origin", "destination").agg(
        agg("weight").alias("weight")
    )
