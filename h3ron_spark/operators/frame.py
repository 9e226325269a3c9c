"""Frame-level helpers: validity filter, resolution ops, bounding rect.

Parity targets:
- filter_h3_is_valid:        h3ron-polars/src/algorithm/frame/valid.rs:6-52
- h3_resolution column (D1): .../chunkedarray/resolution.rs:11-26
- change_resolution (D2):    .../chunkedarray/resolution.rs:29-49
- partition_by_resolution:   .../frame/resolution.rs:35-89
- bounding_rect agg (D8):    h3ron-polars/src/algorithm/bounding_rect.rs:7-56

All pure-SQL where possible (resolution is bit math -> whole-stage
codegen; no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from h3ron_spark.functions import bits as B
from h3ron_spark.functions import geo as G


def filter_h3_is_valid(df: DataFrame, cell_col: str = "cell") -> DataFrame:
    """Keep rows whose index is a valid H3 cell (D6). NULL-safe: nulls
    are dropped, like the reference's validity mask."""
    return df.filter(B.h3_is_valid_cell(cell_col))


def with_resolution(
    df: DataFrame, cell_col: str = "cell", out_col: str = "res"
) -> DataFrame:
    """D1: per-row resolution, NULL where the index is invalid."""
    return df.withColumn(
        out_col,
        F.when(B.h3_is_valid_cell(cell_col), B.h3_get_resolution(cell_col)),
    )


def change_resolution_dataframe(
    df: DataFrame, target_res: int, cell_col: str = "cell"
) -> DataFrame:
    """D2 frame-level: replace the cell column with cells at target_res
    (parents collapse, children explode; other columns replicated)."""
    return (
        df.withColumn("_cr", G.h3_change_resolution(cell_col, F.lit(target_res)))
        .filter(F.col("_cr").isNotNull())
        .withColumn(cell_col, F.explode("_cr"))
        .drop("_cr")
    )


def partition_by_resolution(
    df: DataFrame, cell_col: str = "cell", repartition: bool = True
) -> DataFrame:
    """D7: tag rows with their resolution and (optionally) repartition
    so each resolution is processed/written res-homogeneously. The
    writer-side equivalent is ``.write.partitionBy('h3_res')``."""
    out = with_resolution(df, cell_col, "h3_res")
    if repartition:
        out = out.repartition("h3_res")
    return out


def purge_children(df: DataFrame, cell_col: str = "cell") -> DataFrame:
    """CompactedCellVec.purge_children parity (parents swallow
    children, h3ron/src/collections/compactedcellvec.rs:244-276):
    drop every row whose cell has ANY coarser ancestor present in the
    frame's own cell set.

    Scale shape: ancestors are <=15 pure-bit-math values per row
    (h3_ancestors), membership is one semi-join of the exploded
    ancestors against the distinct cell set, and the final anti-join
    removes the swallowed rows — no geodesic kernel, no Python,
    shuffles keyed on well-spread cell ids at any scale."""
    cells = df.select(F.col(cell_col).alias("_pc")).distinct()
    ancs = df.select(
        F.col(cell_col),
        F.explode(B.h3_ancestors(cell_col)).alias("_pc"),
    )
    doomed = ancs.join(cells, "_pc", "semi").select(cell_col).distinct()
    return df.join(doomed, cell_col, "left_anti")


def bounding_rect(df: DataFrame, cell_col: str = "cell", use: str = "boundary"):
    """D8: aggregate bbox over the frame. One partial+final agg, no
    shuffle of data rows.

    ``use="boundary"`` (default) merges per-cell *polygon* bboxes —
    min/max over every boundary vertex — matching the reference's
    ``to_polygon().bounding_rect()`` merge
    (h3ron-polars/src/algorithm/bounding_rect.rs:11-40).
    ``use="centroid"`` is the cheaper centroid min/max (one decode
    instead of a 6-vertex boundary per cell); both are single-pass.
    """
    if use == "centroid":
        # single UDF evaluation, then cheap field extraction
        return df.select(
            G.h3_cell_to_latlng(cell_col).alias("_ll")
        ).select(
            F.col("_ll.lat").alias("_lat"), F.col("_ll.lng").alias("_lng")
        ).agg(
            F.min("_lat").alias("min_lat"),
            F.max("_lat").alias("max_lat"),
            F.min("_lng").alias("min_lng"),
            F.max("_lng").alias("max_lng"),
        )
    if use != "boundary":
        raise ValueError(f"use must be 'boundary' or 'centroid', got {use!r}")
    # one boundary UDF evaluation per row; per-cell vertex min/max via
    # JVM array HOFs, so the aggregate input stays one row per cell
    b = df.select(G.h3_cell_to_boundary(cell_col).alias("_b")).filter(
        F.col("_b").isNotNull()
    )
    lats = F.transform("_b", lambda p: p["lat"])
    lngs = F.transform("_b", lambda p: p["lng"])
    return b.select(
        F.array_min(lats).alias("_lo_lat"),
        F.array_max(lats).alias("_hi_lat"),
        F.array_min(lngs).alias("_lo_lng"),
        F.array_max(lngs).alias("_hi_lng"),
    ).agg(
        F.min("_lo_lat").alias("min_lat"),
        F.max("_hi_lat").alias("max_lat"),
        F.min("_lo_lng").alias("min_lng"),
        F.max("_hi_lng").alias("max_lng"),
    )
