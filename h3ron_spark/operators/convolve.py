"""Hexagonal kernel smoothing (H3 "hex convolution").

The standard H3 heat-map operator: each cell's value spreads to its
k-disk neighbors with a ring-distance-decaying weight, and every cell
aggregates what lands on it — a discrete convolution over the hexagon
grid (the shape popularized by Uber's H3 movement-smoothing posts;
equivalent to one step of graph diffusion on the k-disk adjacency).

Scale shape: ONE Arrow disk-kernel evaluation per input row (the same
vectorized ``h3_grid_disk_distances`` battery the geo suite uses) —
the disk array is materialized as a column and reused by both the
normalization sum and the explode, so there is no self-join and no
second kernel pass — then an explode bounded by ``3k(k+1)+1`` rows
per cell and ONE hash aggregate on the destination cell. At 100 TB
this is a map-side explode + a single shuffle keyed on well-spread
cell ids; k stays small (1-3) in practice, so the fan-out is a
constant factor.

Weights: ``weights[d]`` multiplies values arriving from ring distance
``d`` (length k+1). The default triangular kernel ``1/(d+1)`` is
normalized per SOURCE cell by its actual neighborhood weight sum, so
mass is conserved on pentagon-deficient disks too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from h3ron_spark.functions import geo as G


def hex_smooth(
    df: DataFrame,
    cell_col: str = "cell",
    value_col: str = "value",
    k: int = 1,
    weights: list[float] | None = None,
    normalize: bool = True,
    out_col: str = "smoothed",
) -> DataFrame:
    """Smooth ``value_col`` over each cell's k-disk; returns
    ``(cell, smoothed)`` with one row per cell receiving any mass.

    ``normalize=True`` (default) divides each source's outgoing
    weights by their sum, so total mass is exactly conserved
    (``sum(smoothed) == sum(value)`` up to float addition order);
    ``False`` applies raw kernel weights (sharpening / accumulation
    use cases).
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    if weights is None:
        weights = [1.0 / (d + 1) for d in range(k + 1)]
    if len(weights) != k + 1:
        raise ValueError(f"weights must have length k+1 = {k + 1}")
    warr = F.array(*[F.lit(float(w)) for w in weights])

    # disk computed ONCE per row, shared by the normalizer and explode
    base = df.select(
        F.col(value_col).alias("_v"),
        G.h3_grid_disk_distances(F.col(cell_col), F.lit(k)).alias("_disk"),
    )
    if normalize:
        base = base.withColumn(
            "_z",
            F.aggregate(
                F.transform(
                    "_disk",
                    lambda n: F.element_at(warr, n["k"].cast("int") + 1),
                ),
                F.lit(0.0),
                lambda acc, w: acc + w,
            ),
        )
    else:
        base = base.withColumn("_z", F.lit(1.0))
    return (
        base.select(
            "_v",
            "_z",
            F.explode("_disk").alias("_n"),
        )
        .select(
            F.col("_n.cell").alias("cell"),
            (
                F.col("_v")
                * F.element_at(warr, F.col("_n.k").cast("int") + 1)
                / F.col("_z")
            ).alias("_m"),
        )
        .groupBy("cell")
        .agg(F.sum("_m").alias(out_col))
    )
