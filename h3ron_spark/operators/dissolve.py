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


def _open_ring(r):
    """Drop the closing duplicate (cells_to_polygons returns closed
    rings); smoothen_ring treats its input as cyclic, so the duplicate
    would inject a zero-length segment into the midpoint pass."""
    return list(r[:-1]) if len(r) > 1 and r[0] == r[-1] else list(r)


def _smoothed_parts(parts, smooth_iterations: int):
    """(shell, holes) parts as OPEN rings, smoothed if requested."""
    from h3ron_spark.h3core.regions import smoothen_ring

    out = []
    for shell, holes in parts:
        sh = _open_ring(shell)
        hs = [_open_ring(h) for h in holes]
        if smooth_iterations > 0:
            sh = smoothen_ring(sh, smooth_iterations)
            hs = [smoothen_ring(h, smooth_iterations) for h in hs]
        out.append((sh, hs))
    return out


def _multipolygon_wkt(parts, smooth_iterations: int) -> str:
    def fmt_ring(r):
        pts = list(r) + [r[0]]
        return "(" + ", ".join(f"{ln:.9f} {la:.9f}" for la, ln in pts) + ")"

    polys = []
    for shell, holes in _smoothed_parts(parts, smooth_iterations):
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


def dissolve_ring_stats_df(
    df: DataFrame,
    cell_col: str = "cell",
    group_cols: list[str] | None = None,
    smooth_iterations: int = 0,
) -> DataFrame:
    """Dissolve and report ring shape statistics per group:
    (n_polygons, exterior_coords, n_interiors, interior_coords), with
    coordinate counts in the CLOSED-ring convention (first point
    repeated — geo-types' LineString counts, matching the reference's
    donut_linked_polygon assertions at h3ron/src/to_geo.rs:252-263:
    exterior 19, hole 7). For multi-part output the reported exterior
    is the largest part's; interior_coords is that part's first hole
    (0 when there is none).
    """
    from pyspark.sql.types import LongType, StructField, StructType

    group_cols = list(group_cols or [])
    stats_type = StructType(
        [
            StructField("n_polygons", LongType()),
            StructField("exterior_coords", LongType()),
            StructField("n_interiors", LongType()),
            StructField("interior_coords", LongType()),
        ]
    )

    @arrow_udf(stats_type)
    def stats_kernel(cells: pa.Array) -> pa.Array:
        from h3ron_spark.h3core.regions import cells_to_polygons

        rows = []
        for arr in cells.to_pylist():
            if not arr:
                rows.append(None)
                continue
            parts = _smoothed_parts(cells_to_polygons(arr), smooth_iterations)
            best = max(parts, key=lambda p: len(p[0]), default=([], []))
            shell, holes = best
            rows.append(
                {
                    "n_polygons": len(parts),
                    # open rings -> closed-convention count = len + 1
                    "exterior_coords": len(shell) + 1 if shell else 0,
                    "n_interiors": len(holes),
                    "interior_coords": len(holes[0]) + 1 if holes else 0,
                }
            )
        return pa.array(rows, pa.struct(
            [
                ("n_polygons", pa.int64()),
                ("exterior_coords", pa.int64()),
                ("n_interiors", pa.int64()),
                ("interior_coords", pa.int64()),
            ]
        ))

    if group_cols:
        agg = df.groupBy(*group_cols).agg(
            F.collect_set(cell_col).alias("_cells")
        )
    else:
        agg = df.agg(F.collect_set(cell_col).alias("_cells"))
    return agg.select(
        *group_cols,
        stats_kernel("_cells").alias("_s"),
    ).select(*group_cols, "_s.*")
