"""Slowly-changing-dimension (type 2) history build.

Collapses a change-event stream into attribute validity intervals —
the dimension-history table every warehouse maintains. One sorted
window pass per key partition (change flags via null-safe lag,
version numbers via a running sum of the flags), one aggregate, one
more window for the half-open interval's ``valid_to``. Linear in
events, no self-join; at fleet scale each key hash-bucket sorts
independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FUTURE_SENTINEL = 253402300799  # 9999-12-31T23:59:59Z


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    order_col: str,
    time_col: str,
    future_sentinel: int = FUTURE_SENTINEL,
) -> DataFrame:
    """``(key, version, attr, valid_from, valid_to, n_events,
    is_current)`` validity intervals of ``attr_col`` per ``key_col``.

    ``order_col`` must be a unique per-key ordering (an event id, not
    a timestamp that can tie); ``valid_from`` is the min ``time_col``
    of each run, ``valid_to`` the next run's start or the far-future
    sentinel on the open interval.
    """
    w = Window.partitionBy(key_col).orderBy(order_col)
    flagged = df.withColumn(
        "_chg",
        F.when(
            ~F.lag(attr_col).over(w).eqNullSafe(F.col(attr_col)), 1
        ).otherwise(0),
    )
    versioned = flagged.withColumn(
        "version",
        F.sum("_chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    intervals = versioned.groupBy(key_col, "version").agg(
        F.min(attr_col).alias(attr_col),
        F.min(time_col).alias("valid_from"),
        F.count(F.lit(1)).cast("int").alias("n_events"),
    )
    w_v = Window.partitionBy(key_col).orderBy("version")
    nxt = F.lead("valid_from").over(w_v)
    return intervals.select(
        key_col,
        F.col("version").cast("int").alias("version"),
        attr_col,
        "valid_from",
        F.coalesce(nxt, F.lit(future_sentinel)).alias("valid_to"),
        "n_events",
        nxt.isNull().cast("int").alias("is_current"),
    )
