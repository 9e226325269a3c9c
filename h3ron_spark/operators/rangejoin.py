"""Bucketized range join: points into intervals WITHOUT an equi key.

Spark executes a pure theta join (``p.ts BETWEEN s.lo AND s.hi`` with
no equality conjunct) as BroadcastNestedLoopJoin — O(|points| *
|spans|) work that only survives while one side fits in memory. The
standard scale rewrite (Databricks' range-join hint, Flink interval
join) buckets the value domain: points join their bucket, spans
explode to every bucket they overlap, the join becomes a plain hash
equi join on the bucket id, and the exact predicate filters within
the matched buckets. Work drops to sum over buckets of
|points_b| * |spans_b| — linear for bounded span length, and it
shuffles/partitions like any equi join at 100 TB.

Choose ``bucket_width`` >= the typical span length: each span then
explodes to at most 2 buckets (the operator handles arbitrary spans
by exploding the full covered range).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    spans: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    extra_keys: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every span row with
    ``lo <= point < hi`` (half-open), via bucket equi join.

    ``points`` and ``spans`` must not share column names apart from
    ``extra_keys`` (additional equality conjuncts, joined on
    alongside the bucket). Returns the joined frame with all columns
    from both sides.
    """
    extra = extra_keys or []
    p_b = points.withColumn(
        "_rj_bucket", F.floor(F.col(point_col) / bucket_width)
    )
    s_b = spans.withColumn(
        "_rj_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width),
                # hi is exclusive: a span ending exactly on a bucket
                # boundary does not reach into the next bucket
                F.floor((F.col(hi_col) - 1) / bucket_width),
            )
        ),
    )
    joined = p_b.join(s_b, ["_rj_bucket", *extra], how)
    return joined.filter(
        (F.col(point_col) >= F.col(lo_col))
        & (F.col(point_col) < F.col(hi_col))
    ).drop("_rj_bucket")
