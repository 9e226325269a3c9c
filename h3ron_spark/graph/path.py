"""Path / DirectedEdgePath value-object helpers (P8).

Parity target: `h3ron-graph/src/algorithm/path.rs:12-220` — the
reference's path value object (origin, destination, cost, consecutive
edge sequence) with `cells()`, `to_linestring()`, `length_m()`, and
the deterministic `(cost, origin, destination)` ordering
(path.rs:194-206).

Spark shape: a path is a row `struct<origin, destination, cost,
path_cells array<long>, path_edges array<long>>` as produced by
:func:`h3ron_spark.graph.algorithms.shortest_path_many_to_many`.
The helpers here are column functions over the edge-sequence array:

- ``path_edge_count`` / ``path_is_empty`` are pure JVM expressions.
- ``path_cells_col`` / ``path_linestring_wkt`` / ``path_length_m``
  need the geodesic neighbor step (edge destination), so they run as
  Arrow-batched UDFs over the array column — one Python batch per
  Arrow chunk, never per row.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import arrow_udf

import h3ron_spark.h3core as h3c

_ARR_I64 = pa.list_(pa.int64())
_ARR_I64_SPARK = T.ArrayType(T.LongType())


def path_edge_count(edges) -> Column:
    """Number of edges in the path (path.rs ``len``); JVM-side."""
    e = F.col(edges) if isinstance(edges, str) else edges
    return F.coalesce(F.size(e), F.lit(0))


def path_is_empty(edges) -> Column:
    """True for an origin-is-destination path (path.rs ``is_empty``)."""
    return path_edge_count(edges) == 0


def _edge_cells(seq: list) -> list[int]:
    """Cells the edge sequence passes through, consecutive-deduped
    (path.rs ``cells``, :105-120)."""
    out: list[int] = []
    for e in seq:
        o = h3c.edge_origin(e)
        d = h3c.edge_destination(e)
        for c in (o, d):
            if c is not None and (not out or out[-1] != c):
                out.append(c)
    return out


@arrow_udf(_ARR_I64_SPARK)
def path_cells_col(edges: pa.Array) -> pa.Array:
    out = []
    for seq in edges.to_pylist():
        out.append(None if seq is None else _edge_cells(seq))
    return pa.array(out, _ARR_I64)


@arrow_udf(T.StringType())
def path_linestring_wkt(edges: pa.Array) -> pa.Array:
    """Merged centroid linestring of a consecutive edge sequence
    (path.rs ``to_linestring``, :69-85; per-edge semantics
    directed_edge.rs:241-259 — origin centroid to destination
    centroid). Returns NULL for empty or segmented (non-consecutive)
    sequences, where the reference errors."""
    out = []
    for seq in edges.to_pylist():
        if not seq:
            out.append(None)
            continue
        coords = []
        segmented = False
        prev_dest = None
        for e in seq:
            o = h3c.edge_origin(e)
            d = h3c.edge_destination(e)
            if d is None or (prev_dest is not None and o != prev_dest):
                segmented = True
                break
            if prev_dest is None:
                coords.append(h3c.cell_to_latlng(o))
            coords.append(h3c.cell_to_latlng(d))
            prev_dest = d
        if segmented or len(coords) < 2:
            out.append(None)
        else:
            out.append(
                "LINESTRING ("
                + ", ".join(f"{ln:.9f} {la:.9f}" for la, ln in coords)
                + ")"
            )
    return pa.array(out, pa.string())


@arrow_udf(T.DoubleType())
def path_length_m(edges: pa.Array) -> pa.Array:
    """Exact path length: sum of the edges' cell-boundary segment
    lengths (path.rs ``length_m``, :122-135; edge length semantics
    directed_edge.rs:154-170). 0.0 for the empty path."""
    out = []
    for seq in edges.to_pylist():
        if seq is None:
            out.append(None)
            continue
        total = 0.0
        for e in seq:
            m = h3c.edge_length_m(e)
            if m is not None:
                total += m
        out.append(total)
    return pa.array(out, pa.float64())


def order_paths(df: DataFrame) -> DataFrame:
    """Deterministic path ordering (path.rs:194-206):
    (cost, origin, destination) ascending."""
    return df.orderBy("cost", "origin", "destination")
