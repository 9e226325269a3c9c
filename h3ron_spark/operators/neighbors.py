"""Sequence/neighborhood operators.

Parity targets:
- continuous_cells_to_edges (P15): h3ron/src/iter/edge.rs:87-140 —
  consecutive cells of an ordered path -> directed edges. Spark: a
  lag window + the edge-construction UDF (the §2.7 'window functions'
  modernization the survey calls out).
- neighbors_within_distance (P16): h3ron/src/iter/neighbor.rs:96-152 —
  for each cell, visit neighbors-with-values in a k-disk, with a
  default fill for value-less neighbors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from h3ron_spark.functions import geo as G


def continuous_cells_to_edges(
    df: DataFrame,
    cell_col: str = "cell",
    order_col: str = "pos",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """One row per consecutive (cell, next_cell) pair with its directed
    edge; non-neighbor gaps produce NULL edges (the reference errors —
    we surface NULL so callers can filter/assert, invalid->NULL
    contract)."""
    parts = partition_cols or []
    w = (
        Window.partitionBy(*parts).orderBy(order_col)
        if parts
        else Window.orderBy(order_col)
    )
    nxt = df.withColumn("_next", F.lead(cell_col).over(w)).filter(
        F.col("_next").isNotNull()
    )
    return nxt.withColumn(
        "edge", G.h3_cells_to_directed_edge(cell_col, "_next")
    ).withColumnRenamed("_next", "next_cell")


def neighbors_within_distance_window(
    cells_df: DataFrame,
    values_df: DataFrame,
    k_min: int,
    k_max: int,
    cell_col: str = "cell",
    value_col: str = "value",
    default=None,
) -> DataFrame:
    """Exact semantics of the reference's
    ``neighbors_within_distance_window[_or_default]``
    (h3ron/src/iter/neighbor.rs:96-152): for each input cell that has
    its own value in ``values_df``, one row per neighbor in the
    k-window [k_min, k_max]. Without ``default``, neighbors lacking a
    value are dropped (window variant); with it, they emit filled
    (or_default variant). Cells with no value of their own emit
    nothing.

    Returns (cell, cell_value, neighbor, k, neighbor_value). Both
    joins key on the cell id; the values side is dropDuplicated so a
    broadcast hint applies when it is dimension-sized."""
    vals = values_df.select(
        F.col(cell_col).alias("_vc"), F.col(value_col).alias("_vv")
    ).dropDuplicates(["_vc"])
    base = (
        cells_df.select(cell_col)
        .join(vals, F.col(cell_col) == F.col("_vc"), "inner")
        .select(cell_col, F.col("_vv").alias("cell_value"))
    )
    disks = base.select(
        cell_col,
        "cell_value",
        F.explode(
            G.h3_grid_disk_distances(cell_col, F.lit(int(k_max)))
        ).alias("_nk"),
    ).select(
        cell_col,
        "cell_value",
        F.col("_nk.cell").alias("neighbor"),
        F.col("_nk.k").alias("k"),
    ).filter(F.col("k") >= int(k_min))
    out = disks.join(
        vals.withColumnRenamed("_vc", "neighbor"), "neighbor", "left"
    )
    if default is None:
        out = out.filter(F.col("_vv").isNotNull())
        nv = F.col("_vv")
    else:
        nv = F.coalesce(F.col("_vv"), F.lit(default))
    return out.select(
        cell_col, "cell_value", "neighbor", "k", nv.alias("neighbor_value")
    )


def neighbors_within_distance(
    df: DataFrame,
    k: int,
    cell_col: str = "cell",
    value_col: str = "value",
    default=None,
    include_center: bool = True,
) -> DataFrame:
    """For every input cell, one row per neighbor within k steps, with
    the neighbor's value (left join against the same frame) or the
    default. Explode(grid_disk) + left join on cell — both sides
    shuffle on the cell key once; at scale, pre-bucketing the value
    table by cell makes this a one-sided shuffle."""
    values = df.select(
        F.col(cell_col).alias("neighbor"), F.col(value_col).alias("_nv")
    ).dropDuplicates(["neighbor"])
    disks = df.select(
        F.col(cell_col),
        F.explode(G.h3_grid_disk(cell_col, F.lit(k))).alias("neighbor"),
    )
    if not include_center:
        disks = disks.filter(F.col(cell_col) != F.col("neighbor"))
    out = disks.join(values, "neighbor", "left")
    fill = F.lit(default)
    return out.select(
        cell_col,
        "neighbor",
        F.coalesce(F.col("_nv"), fill).alias("neighbor_value"),
    )
