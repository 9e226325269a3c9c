"""Connected-component clustering of cell sets (G8 / D9).

Parity target: h3ron/src/algorithm/cell_clusters.rs:12-116 and the
DataFrame wrapper h3ron-polars/src/algorithm/chunkedarray/
cell_clusters.rs:31-86 — components of mutually-neighboring cells,
optionally constrained to equal values; cluster label = component id.

Spark-first design: iterative label propagation.
  label(c) := min(label(c), min(label(n)) for n in neighbors(c) ∩ set)
repeated to fixpoint. Each iteration is one self-join on the exploded
neighbor edge list + a min aggregation — both shuffle on `cell`, so
co-partitioning is reused across iterations. The edge list is built
ONCE (grid-ring UDF + join), not per iteration. Iterations are
O(graph diameter); localCheckpoint truncates the growing plan.

At 100 TB: the alternative 'min over grid_disk window' converges in
the same iterations but rebuilds neighbor lists every round; this
shape keeps the per-round work to a pure join+agg that AQE can
re-plan, and the label frame shrinks to |cells| rows regardless of k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from h3ron_spark.functions import geo as G


def cell_clusters(
    df: DataFrame,
    cell_col: str = "cell",
    value_col: str | None = None,
    max_iter: int = 50,
) -> DataFrame:
    """Return (cell[, value], cluster) with cluster = min cell id of the
    connected component (deterministic label, unlike the reference's
    arbitrary u32 counter — documented divergence: labels are stable
    cell ids, cluster *membership* is identical)."""
    cols = [cell_col] + ([value_col] if value_col else [])
    nodes = df.select(*cols).distinct()

    # undirected neighbor edges within the set, built once
    ring = nodes.withColumn("_n", F.explode(G.h3_grid_ring(cell_col, F.lit(1))))
    other = nodes.select(
        F.col(cell_col).alias("_n"),
        *([F.col(value_col).alias("_nv")] if value_col else []),
    )
    cond = [ring["_n"] == other["_n"]]
    edges = ring.join(other, on="_n", how="inner")
    if value_col:
        edges = edges.filter(F.col(value_col) == F.col("_nv"))
    edges = edges.select(
        F.col(cell_col).alias("src"), F.col("_n").alias("dst")
    )
    edges = edges.localCheckpoint(eager=True)

    labels = nodes.select(
        F.col(cell_col), F.col(cell_col).alias("cluster"),
        *([F.col(value_col)] if value_col else []),
    )
    for _ in range(max_iter):
        # propagate: min label over self + neighbors
        prop = (
            edges.join(
                labels.select(F.col(cell_col).alias("dst"), "cluster"), "dst"
            )
            .select(F.col("src").alias(cell_col), "cluster")
            .unionByName(labels.select(cell_col, "cluster"))
            .groupBy(cell_col)
            .agg(F.min("cluster").alias("_new"))
        )
        joined = labels.join(prop, cell_col).localCheckpoint(eager=True)
        changed = joined.filter(F.col("_new") != F.col("cluster")).limit(1).count()
        labels = joined.withColumn("cluster", F.col("_new")).drop("_new")
        if changed == 0:
            break
    return labels
