"""Structured Streaming surface.

The reference has no streaming at all (SURVEY §1.8) — this is the
'free' extension the survey licenses: every stateless H3 projection
(cell functions, bit math, validity) works unchanged on a streaming
DataFrame because Arrow UDFs and SQL expressions are row-local, and
stateful rollups use standard watermark + window aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from h3ron_spark.functions import bits as B
from h3ron_spark.functions import geo as G


def index_stream(
    df: DataFrame,
    lat_col: str = "lat",
    lng_col: str = "lng",
    res: int = 8,
    cell_col: str = "cell",
) -> DataFrame:
    """Attach the H3 cell (and its validity-guarded resolution) to a
    streaming or batch frame — pure projection, no state."""
    out = df.withColumn(
        cell_col, G.h3_latlng_to_cell(lat_col, lng_col, F.lit(res))
    )
    return out.withColumn(
        "cell_res",
        F.when(B.h3_is_valid_cell(cell_col), B.h3_get_resolution(cell_col)),
    )


def windowed_cell_counts(
    df: DataFrame,
    ts_col: str = "ts",
    cell_col: str = "cell",
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    parent_res: int | None = None,
) -> DataFrame:
    """Streaming rollup: events per (time window, cell[/parent]).
    Watermark bounds state for late data; parent_res coarsens the key
    with bit math before the shuffle (smaller state, same pattern as
    the batch h3_parent_rollup)."""
    key = (
        B.h3_to_parent(cell_col, parent_res).alias("cell")
        if parent_res is not None
        else F.col(cell_col)
    )
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration).alias("win"), key)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "cell",
            "n_events",
        )
    )


def session_windows(
    df: DataFrame,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("user_id",),
    gap: str = "30 seconds",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Streaming gap-based sessionization via native session windows:
    events within ``gap`` of each other merge into one variable-length
    window per key (window end = last event + gap; an event landing
    exactly on the window end still merges — a new session starts only
    when the inter-event gap exceeds the gap duration). The
    watermark bounds session state and, in append mode, finalizes a
    session once no in-horizon event can extend it — the streaming
    twin of the batch ``rel_event_sessions`` islands idiom, but with
    state that expires instead of a full-history window sort."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("win"),
            *[F.col(c) for c in key_cols],
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *key_cols,
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


from h3ron_spark.streaming.stateful import (  # noqa: E402,F401
    TRANSITIONS_SCHEMA,
    cell_transitions,
)


def dedup_stream(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact deduplication (training-pipeline op): keep the
    first arrival per key within the watermark horizon.
    ``dropDuplicatesWithinWatermark`` bounds state by event time — the
    100 TB-stream shape, where an unbounded dropDuplicates would
    accumulate every key ever seen. Keys are usually content hashes
    (``F.md5(text)``), so late exact copies inside the horizon are
    suppressed and state expires with the watermark."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
