"""Synthetic graph generators (pure Spark, no Python row work).

Used by the beyond-broadcast SSSP bench/parity workloads: a driver
dict for a multi-million-edge graph would be several GiB (the exact
regime where ``prepare_routing_graph``'s guarded broadcast refuses and
``sssp_frontier`` is the right plan), while the generator itself is
three ``spark.range`` projections — nothing ships driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def torus_grid_graph(
    spark: SparkSession,
    n: int,
    directions: int = 4,
    weight_expr=None,
) -> DataFrame:
    """Directed graph on the n x n torus: node id = x*n + y, edges to
    the right/down (and left/up when ``directions=4``) neighbors with
    wraparound. ``weight_expr``: optional Column of the edge weight as
    a function of columns (x, y, dx, dy); defaults to 1.0.

    Size: n*n nodes, directions*n*n edges — all generated as Spark
    column expressions over ``spark.range(n*n)``, so a 5M+-edge graph
    materializes on executors only.
    """
    if directions not in (2, 4):
        raise ValueError("directions must be 2 or 4")
    base = spark.range(n * n).select(
        (F.col("id") / n).cast("long").alias("x"),
        (F.col("id") % n).alias("y"),
    )
    deltas = [(1, 0), (0, 1)] + ([(-1, 0), (0, -1)] if directions == 4 else [])
    parts = []
    for d_idx, (dx, dy) in enumerate(deltas):
        w = (
            weight_expr(F.col("x"), F.col("y"), dx, dy)
            if weight_expr is not None
            else F.lit(1.0)
        )
        origin = F.col("x") * n + F.col("y")
        parts.append(
            base.select(
                # synthetic directed-edge id (graph schema parity)
                (origin * 8 + F.lit(d_idx)).alias("edge"),
                origin.alias("origin"),
                (
                    ((F.col("x") + dx + n) % n) * n
                    + ((F.col("y") + dy + n) % n)
                ).alias("destination"),
                w.cast("double").alias("weight"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
