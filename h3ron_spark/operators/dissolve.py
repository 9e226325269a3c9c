"""Grouped dissolve: cell sets -> multipolygon WKT (G5/G6/G7).

Parity targets:
- to_linked_polygons:            h3ron/src/to_geo.rs:176-244
- smoothen_h3_linked_polygon:    h3ron/src/algorithm/smoothen.rs:17-75
- to_aligned_linked_polygons:    h3ron/src/to_geo.rs:100-174

Spark shape (SURVEY §2.2 G5): groupBy(keys) -> collect_set(cell) ->
per-group dissolve kernel in applyInPandas. One shuffle; the kernel is
Arrow-batched per group. ``align_res`` groups by the parent cell at a
coarser resolution first (G7), which also bounds per-group memory at
scale — a group is never larger than one parent's coverage.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import arrow_udf
from pyspark.sql.types import StringType

from h3ron_spark.functions import bits as B


def _multipolygon_wkt(parts, smooth_iterations: int) -> str:
    from h3ron_spark.h3core.regions import smoothen_ring

    def fmt_ring(r):
        pts = list(r) + [r[0]]
        return "(" + ", ".join(f"{ln:.9f} {la:.9f}" for la, ln in pts) + ")"

    polys = []
    for shell, holes in parts:
        if smooth_iterations > 0:
            shell = smoothen_ring(shell, smooth_iterations)
            holes = [smoothen_ring(h, smooth_iterations) for h in holes]
        rings = [fmt_ring(shell)] + [fmt_ring(h) for h in holes]
        polys.append("(" + ", ".join(rings) + ")")
    return "MULTIPOLYGON (" + ", ".join(polys) + ")" if polys else "MULTIPOLYGON EMPTY"


def cells_to_polygons_df(
    df: DataFrame,
    cell_col: str = "cell",
    group_cols: list[str] | None = None,
    align_res: int | None = None,
    smooth_iterations: int = 0,
) -> DataFrame:
    """Dissolve cells into multipolygon outlines per group.

    Returns (group_cols..., [align_cell,] geometry_wkt, n_cells).
    ``align_res``: additionally group by the parent cell at this res
    (to_aligned_linked_polygons); ``smooth_iterations``: Chaikin
    smoothing passes (smoothen_h3_linked_polygon).
    """
    group_cols = list(group_cols or [])
    work = df
    keys = group_cols.copy()
    if align_res is not None:
        work = work.withColumn("align_cell", B.h3_to_parent(cell_col, align_res))
        keys.append("align_cell")

    @arrow_udf(StringType())
    def dissolve_kernel(cells: pa.Array) -> pa.Array:
        from h3ron_spark.h3core.regions import cells_to_polygons

        out = []
        for arr in cells.to_pylist():
            if not arr:
                out.append(None)
                continue
            out.append(
                _multipolygon_wkt(cells_to_polygons(arr), smooth_iterations)
            )
        return pa.array(out, pa.string())

    if keys:
        agg = work.groupBy(*keys).agg(
            F.collect_set(cell_col).alias("_cells")
        )
    else:
        agg = work.agg(F.collect_set(cell_col).alias("_cells"))
    return agg.select(
        *keys,
        dissolve_kernel("_cells").alias("geometry_wkt"),
        F.size("_cells").alias("n_cells"),
    )
