"""Triangle counting by degree-ordered edge orientation.

Beyond-reference graph analytics (the reference stack is routing-only)
using the MapReduce-friendly algorithm of Suri & Vassilvitskii (WWW'11)
/ Schank's forward algorithm: orient every undirected edge from its
lower-(degree, id) endpoint to its higher one, enumerate wedges only
at each edge's LOW endpoint, and close them with one more equi-join.

Why this is the 100-TB shape: a hub with degree d contributes d^2
wedges if wedges are built at arbitrary endpoints, but after
orientation every node's out-degree is O(sqrt(m)) — the wedge join's
fan-out is bounded and skew-resistant without salting. Everything is
equi-joins + hash aggregates on integer keys; no windows, no driver
state, fully deterministic (ties broken by node id), so a DuckDB
oracle replays it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirected_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Canonical undirected edge set ``(a < b)``, self-loops dropped,
    duplicates (including reverse pairs) collapsed."""
    return (
        edges.select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def triangle_counts(und: DataFrame) -> DataFrame:
    """Per-node triangle participation counts from a canonical
    undirected edge frame (see :func:`undirected_edges`).

    Returns ``(node, n_triangles)`` — every triangle increments all
    three of its corners. Total triangles = sum / 3.
    """
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ann = und.join(
        deg.select(F.col("node").alias("a"), F.col("d").alias("da")), "a"
    ).join(deg.select(F.col("node").alias("b"), F.col("d").alias("db")), "b")
    # orient low (degree, id) -> high; carry the head's (degree, id)
    # so wedge endpoints can be ordered by the SAME total order
    # without re-joining degrees (struct compare is lexicographic in
    # both engines)
    low_first = F.struct("da", "a") < F.struct("db", "b")
    o = ann.select(
        F.when(low_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(low_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(low_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    # materialize the oriented edge list ONCE: the three-way self-join
    # below would otherwise re-derive the whole scan+degree pipeline
    # per alias (9 upstream copies — measured 109 exchanges in the
    # unchecked plan vs 7 after)
    o = o.localCheckpoint()
    e1, e2, e3 = o.alias("e1"), o.alias("e2"), o.alias("e3")
    tri = (
        e1.join(
            e2,
            (F.col("e1.u") == F.col("e2.u"))
            & (
                F.struct(F.col("e1.dv"), F.col("e1.v"))
                < F.struct(F.col("e2.dv"), F.col("e2.v"))
            ),
        )
        # the closing edge is oriented e1.v -> e2.v by construction:
        # both wedges' heads are ordered by the orientation order
        .join(
            e3,
            (F.col("e1.v") == F.col("e3.u")) & (F.col("e2.v") == F.col("e3.v")),
        )
        .select(
            F.col("e1.u").alias("x"),
            F.col("e1.v").alias("y"),
            F.col("e2.v").alias("z"),
        )
    )
    # one pass over the triangle set (explode, not 3 unions — a union
    # of three selects would run the join cascade three times)
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
