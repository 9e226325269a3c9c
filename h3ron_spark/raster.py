"""Raster -> H3 dataflow (h3ron-ndarray re-expressed for Spark).

Parity targets:
- Transform (affine px<->world, GDAL/rasterio orderings, invert):
  h3ron-ndarray/src/transform.rs:27-133
- nearest_h3_resolution (MinDiff / SmallerThanPixel):
  h3ron-ndarray/src/resolution.rs:12-87 (+ sphere.rs:13-50 ring area)
- H3Converter::to_h3 window pipeline: h3ron-ndarray/src/array.rs:246-370

Spark shape (SURVEY §3.2): the reference tiles the array and, per
window, polyfills the window bbox then probes pixels (cell->pixel
inverse transform). Our row model goes pixel->cell directly:
  (row, col, value) DF -> filter nodata -> affine transform in pure
  SQL (linear arithmetic, whole-stage codegen) -> latlng_to_cell UDF
  -> optional per-value compaction (D4 operator).
Same result set under the SmallerThanPixel resolution rule (each
pixel's centroid cell), with rayon windows replaced by partitions.
Nodata pruning (find_boxes_containing_data, array.rs:44-125) becomes a
plain filter + parquet predicate pushdown when staged.

Known divergence (SURVEY §7): the reference applies the affine
transform only to rect corners (transform.rs:127-133), which is wrong
under rotation; we transform every pixel exactly.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import arrow_udf
from pyspark.sql.types import ArrayType, LongType

from h3ron_spark.functions import geo as G
from h3ron_spark.h3core.cells import _AVG_HEX_AREA_KM2


@dataclass(frozen=True)
class Transform:
    """2D affine geotransform: world = A * (col, row) + offset.

    (a, b, d, e, xoff, yoff) with
        x = a*col + b*row + xoff
        y = d*col + e*row + yoff
    matching rasterio's Affine ordering; ``from_gdal`` accepts GDAL's
    (xoff, a, b, yoff, d, e) ordering (transform.rs:44-76).
    """

    a: float
    b: float
    d: float
    e: float
    xoff: float
    yoff: float

    @classmethod
    def from_rasterio(cls, t) -> "Transform":
        return cls(t[0], t[1], t[3], t[4], t[2], t[5])

    @classmethod
    def from_gdal(cls, t) -> "Transform":
        return cls(t[1], t[2], t[4], t[5], t[0], t[3])

    def apply(self, col: float, row: float) -> tuple[float, float]:
        return (
            self.a * col + self.b * row + self.xoff,
            self.d * col + self.e * row + self.yoff,
        )

    def invert(self) -> "Transform":
        """Inverse affine (transform.rs:79-97)."""
        det = self.a * self.e - self.b * self.d
        if det == 0.0:
            raise ValueError("non-invertible transform")
        ia, ib = self.e / det, -self.b / det
        id_, ie = -self.d / det, self.a / det
        return Transform(
            ia,
            ib,
            id_,
            ie,
            -(ia * self.xoff + ib * self.yoff),
            -(id_ * self.xoff + ie * self.yoff),
        )


def pixel_area_km2(transform: Transform, shape: tuple[int, int]) -> float:
    """Approximate one pixel's spherical area at the raster center
    (resolution.rs uses the spherical ring area, sphere.rs:13-50)."""
    rows, cols = shape
    cx, cy = transform.apply(cols / 2.0, rows / 2.0)
    # pixel footprint in degrees
    dx = math.hypot(transform.a, transform.d)
    dy = math.hypot(transform.b, transform.e)
    km_per_deg = 2 * math.pi * 6371.0078 / 360.0
    return (dx * km_per_deg * math.cos(math.radians(cy))) * (dy * km_per_deg)


def nearest_h3_resolution(
    transform: Transform,
    shape: tuple[int, int],
    search_mode: str = "min_diff",
) -> int:
    """Choose the H3 resolution matching the pixel area
    (resolution.rs:12-87). 'min_diff': closest average hexagon area;
    'smaller_than_pixel': finest res whose hexagons are still >= ...
    i.e. the first res with avg area <= pixel area."""
    pa = pixel_area_km2(transform, shape)
    if search_mode == "min_diff":
        return min(range(16), key=lambda r: abs(_AVG_HEX_AREA_KM2[r] - pa))
    if search_mode == "smaller_than_pixel":
        for r in range(16):
            if _AVG_HEX_AREA_KM2[r] <= pa:
                return r
        return 15
    raise ValueError(f"unknown search_mode {search_mode!r}")


def raster_to_dataframe(
    spark: SparkSession,
    array,
    nodata=None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Stage a 2-D numpy array as a (row, col, value) DataFrame via one
    Arrow batch per row-band. Nodata pixels are dropped driver-side
    (cheap: numpy boolean mask) so only data pixels ship."""
    import numpy as np
    import pandas as pd

    arr = np.asarray(array)
    rows, cols = arr.shape
    rr, cc = np.nonzero(arr != nodata) if nodata is not None else np.indices(
        arr.shape
    ).reshape(2, -1)
    vals = arr[rr, cc] if nodata is not None else arr.reshape(-1)
    if vals.dtype.kind == "u":
        # unsigned dtypes (uint8 GeoTIFF bands) are unsupported by the
        # Arrow converter — createDataFrame would silently fall back to
        # slow row-wise serialization AND infer LongType anyway; cast
        # to int64 up front so the Arrow fast path keeps the exact
        # same output schema. uint64 values above int64.max would WRAP
        # under astype — refuse instead of silently corrupting pixels.
        if vals.size and vals.max() > np.iinfo(np.int64).max:
            raise ValueError(
                "band values exceed int64 range; rescale or cast the "
                "raster before staging (uint64 pixel "
                f"max={int(vals.max())})"
            )
        vals = vals.astype("int64")
    pdf = pd.DataFrame(
        {
            "row": rr.astype("int32"),
            "col": cc.astype("int32"),
            "value": vals,
        }
    )
    df = spark.createDataFrame(pdf)
    if num_partitions:
        df = df.repartition(num_partitions)
    return df


def raster_to_cells(
    spark: SparkSession,
    array,
    transform: Transform,
    h3_resolution: int,
    nodata=None,
    compact: bool = False,
    mode: str = "centroid",
    compact_partition_res: int | None = None,
    pixels_df: DataFrame | None = None,
) -> DataFrame:
    """R4 pipeline: pixels -> cells(, value), optionally compacted per
    value (array.rs:246-370; groupBy(value) + D4 compaction replaces
    the per-window CompactedCellVec merge).

    mode='centroid' (reference parity): every cell whose CENTROID lies
    inside a data pixel, carrying that pixel's value — each pixel's
    world-space quad is polyfilled in an Arrow batch (exact under
    rotation, unlike the reference's corner-only rect transform).
    mode='pixel_center': one cell per pixel (the cell containing the
    pixel center) — the cheap path when cells >= pixels.

    ``pixels_df``: pre-staged (row, col, value) frame (from
    :func:`raster_to_dataframe`, ideally repartitioned + checkpointed)
    — pass it to convert one loaded raster repeatedly without
    re-shipping the driver-side array per call, the way the
    reference's convert bench loads the tiff once outside its
    iteration loop (convert_dataset_r.rs:29-40).
    """
    df = (
        pixels_df
        if pixels_df is not None
        else raster_to_dataframe(spark, array, nodata=nodata)
    )
    if mode == "pixel_center":
        cx = F.col("col") + F.lit(0.5)
        cy = F.col("row") + F.lit(0.5)
        lng = (
            F.lit(transform.a) * cx + F.lit(transform.b) * cy
            + F.lit(transform.xoff)
        )
        lat = (
            F.lit(transform.d) * cx + F.lit(transform.e) * cy
            + F.lit(transform.yoff)
        )
        cells = df.select(
            G.h3_latlng_to_cell(lat, lng, F.lit(h3_resolution)).alias("cell"),
            "value",
        ).filter(F.col("cell").isNotNull())
    elif mode == "centroid":
        t = transform
        res = h3_resolution

        @arrow_udf(ArrayType(LongType()))
        def pixel_cells(row: pa.Array, col: pa.Array) -> pa.Array:
            from h3ron_spark.h3core.regions import polygon_to_cells

            out = []
            for r, c in zip(row.to_pylist(), col.to_pylist()):
                corners = [
                    t.apply(c, r),
                    t.apply(c + 1, r),
                    t.apply(c + 1, r + 1),
                    t.apply(c, r + 1),
                ]
                ring = [(y, x) for x, y in corners]  # world (x=lng, y=lat)
                out.append(polygon_to_cells(ring, res))
            return pa.array(out, pa.list_(pa.int64()))

        cells = df.select(
            F.explode(pixel_cells("row", "col")).alias("cell"), "value"
        )
    else:
        raise ValueError(f"unknown mode {mode!r}")
    cells = cells.dropDuplicates(["cell", "value"])
    if not compact:
        return cells
    from h3ron_spark.operators.compact import compact_dataframe

    # compact_partition_res opts into the keyed two-phase scale path:
    # group size bounded by the subtree under that ancestor res, so
    # one dominant raster value can't funnel the whole band into a
    # single compaction task. Default (None) single-phases per value —
    # faster while per-value cell counts fit one task comfortably.
    return compact_dataframe(
        cells, "cell", partition_res=compact_partition_res
    )
