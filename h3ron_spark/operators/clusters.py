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
    broadcast_limit: int = 2_000_000,
) -> DataFrame:
    """Return (cell[, value], cluster) with cluster = min cell id of the
    connected component (deterministic label, unlike the reference's
    arbitrary u32 counter — documented divergence: labels are stable
    cell ids, cluster *membership* is identical).

    Node sets up to ``broadcast_limit`` run a driver-side union-find
    over the Arrow-collected edge list (the reference's own
    single-node execution model, same guarded-bounded pattern as the
    broadcast Dijkstra) — identical labels, none of the per-round
    Spark job overhead. Larger sets use iterative min-label
    propagation WITH pointer jumping (label-of-label each round), so
    rounds are O(log diameter) instead of O(diameter)."""
    cols = [cell_col] + ([value_col] if value_col else [])
    nodes = df.select(*cols).distinct()
    # guarded-bounded probe (same trick as prepare_routing_graph): pull
    # up to limit+1 node rows in ONE action — if under the limit we
    # already hold the node set for the union-find path
    npdf = nodes.limit(broadcast_limit + 1).toPandas()
    n_nodes = len(npdf)

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

    if n_nodes <= broadcast_limit:
        spark = df.sparkSession
        epdf = edges.toPandas()
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        keys = (
            list(
                zip(npdf[cell_col].tolist(), npdf[value_col].tolist())
            )
            if value_col
            else npdf[cell_col].tolist()
        )
        for c in npdf[cell_col].tolist():
            parent.setdefault(c, c)
        for a, b in zip(epdf["src"].tolist(), epdf["dst"].tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN id keeps the deterministic label rule
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        from h3ron_spark.util import local_df

        if value_col:
            rows = [(c, v, find(c)) for c, v in keys]
            vdt = dict(nodes.dtypes)[value_col]
            schema = f"{cell_col} long, {value_col} {vdt}, cluster long"
        else:
            rows = [(c, find(c)) for c in keys]
            schema = f"{cell_col} long, cluster long"
        return local_df(spark, rows, schema)

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
        # pointer jumping: also take the label OF my label (labels are
        # member cell ids, so the target row exists). Halving the
        # label-tree height per round turns O(diameter) rounds into
        # O(log diameter) — the difference between 1000 and ~10 rounds
        # on a snake-shaped component at scale.
        tgt = prop.select(
            F.col(cell_col).alias("_t"), F.col("_new").alias("_tn")
        )
        jump = (
            prop.join(tgt, prop["_new"] == tgt["_t"], "left")
            .select(
                cell_col,
                F.least(
                    F.col("_new"), F.coalesce("_tn", "_new")
                ).alias("_new"),
            )
        )
        joined = labels.join(jump, cell_col).localCheckpoint(eager=True)
        changed = joined.filter(F.col("_new") != F.col("cluster")).limit(1).count()
        labels = joined.withColumn("cluster", F.col("_new")).drop("_new")
        if changed == 0:
            break
    return labels
