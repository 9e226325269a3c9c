"""HMM map-matching of GPS traces onto an H3 cell graph.

The Newson & Krumm (2009) shape on H3: each observed point gets a set
of candidate graph cells (disk-distance snap — the same candidate
machinery as ``nearest_graph_nodes``), emission cost grows with the
snap distance, transition cost grows with the grid distance between
consecutive candidates, and a per-trace Viterbi pass picks the
jointly-cheapest cell sequence — which rides through noise that a
pointwise nearest-snap follows into the weeds (pinned by the test).

Scale shape: candidate generation is one vectorized disk explode +
one broadcast semi-join against the node set — corpus-sized, fully
distributed. The Viterbi recursion is inherently sequential PER TRACE
but embarrassingly parallel ACROSS traces, so it runs as
``applyInPandas`` over ``trace_col`` — bounded state (|points| x k
candidates per trace), no driver involvement, the standard
keyed-sequence pattern this engine also uses for streaming state.
Transition cost uses the pure-python ``h3core.grid_distance`` inside
the kernel (local-IJ, no geodesics); swap in routed distances by
pre-joining a pair-cost table when road topology matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VITERBI_SCHEMA = (
    "trace string, seq int, matched_cell long, snap_k int, total_cost double"
)


def match_candidates(
    points: DataFrame,
    nodes: DataFrame,
    max_k: int,
    cell_col: str = "cell",
    trace_col: str = "trace",
    seq_col: str = "seq",
) -> DataFrame:
    """All candidate graph cells within ``max_k`` disk distance of
    each observed point (NOT just the nearest ring — Viterbi needs
    the full candidate set to trade snap cost against path cost)."""
    from h3ron_spark.functions import geo as G

    disks = points.select(
        F.col(trace_col).cast("string").alias("trace"),
        F.col(seq_col).cast("int").alias("seq"),
        F.explode(
            G.h3_grid_disk_distances(F.col(cell_col), F.lit(max_k))
        ).alias("_nk"),
    ).select(
        "trace",
        "seq",
        F.col("_nk.cell").alias("cand"),
        F.col("_nk.k").cast("int").alias("snap_k"),
    )
    return disks.join(
        F.broadcast(nodes.select(F.col("cell").alias("cand"))), "cand"
    )


def map_match(
    points: DataFrame,
    nodes: DataFrame,
    max_k: int = 2,
    cell_col: str = "cell",
    trace_col: str = "trace",
    seq_col: str = "seq",
    emission_weight: float = 1.0,
    transition_weight: float = 1.0,
) -> DataFrame:
    """Viterbi map-matching; returns one row per observed point:
    ``(trace, seq, matched_cell, snap_k, total_cost)`` where
    ``total_cost`` (repeated per trace) is the optimal joint cost.
    Points with no candidate within ``max_k`` are dropped from their
    trace's sequence (the Newson-Krumm gap convention)."""
    cands = match_candidates(
        points, nodes, max_k, cell_col, trace_col, seq_col
    )

    def viterbi(pdf):
        import pandas as pd

        from h3ron_spark.h3core import grid_distance

        out = []
        for trace, g in pdf.groupby("trace"):
            steps = [
                (int(seq), list(zip(sg["cand"], sg["snap_k"])))
                for seq, sg in sorted(g.groupby("seq"))
            ]
            if not steps:
                continue
            # cost[i][j] = best cost ending at candidate j of step i
            prev_cost = [
                emission_weight * float(k) for _, k in steps[0][1]
            ]
            back: list[list[int]] = []
            for i in range(1, len(steps)):
                row_cost, row_back = [], []
                for cand, k in steps[i][1]:
                    best, arg = None, 0
                    for j, (pcand, _) in enumerate(steps[i - 1][1]):
                        d = grid_distance(int(pcand), int(cand))
                        # cross-face IJ failure: finite but punitive
                        t = float(d) if d is not None else 1e6
                        c = prev_cost[j] + transition_weight * t
                        if best is None or c < best:
                            best, arg = c, j
                    row_cost.append(best + emission_weight * float(k))
                    row_back.append(arg)
                back.append(row_back)
                prev_cost = row_cost
            total = min(prev_cost)
            j = prev_cost.index(total)
            picks = [None] * len(steps)
            for i in range(len(steps) - 1, 0, -1):
                picks[i] = j
                j = back[i - 1][j]
            picks[0] = j
            for (seq, cl), p in zip(steps, picks):
                out.append(
                    (str(trace), seq, int(cl[p][0]), int(cl[p][1]), total)
                )
        return pd.DataFrame(
            out, columns=["trace", "seq", "matched_cell", "snap_k", "total_cost"]
        )

    return cands.groupBy("trace").applyInPandas(viterbi, VITERBI_SCHEMA)
