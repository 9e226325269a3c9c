"""Frame-level compaction / uncompaction.

Parity targets:
- h3_compact_dataframe:   h3ron-polars/src/algorithm/frame/compact.rs:43-97
  (groupby all non-cell columns -> agg unique cells -> per-group compact
  -> optional explode). The reference's one real query plan (SURVEY §3.1).
- h3_uncompact_dataframe: .../frame/compact.rs:236-295 (build
  original->child mapping over *distinct* cells, inner-join back).

Scale notes (100 TB):
- compact: exactly ONE shuffle (the groupBy); the compact kernel runs
  per group in Arrow batches. Map-side partial aggregation applies to
  collect_set. Skewed groups are handled by AQE.
- uncompact: the mapping side is |distinct cells| rows BEFORE the
  children explode; the join broadcasts when small (Catalyst decides;
  we hint when the distinct count is provably small). Joining on the
  original cell key means the fact table shuffles at most once, and
  not at all under broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from h3ron_spark.functions import geo as G


def compact_dataframe(
    df: DataFrame,
    cell_col: str = "cell",
    exploded: bool = True,
    partition_res: int | None = None,
    assume_partitioned: bool = False,
) -> DataFrame:
    """Compact the cell column per group of all other columns.

    Mirrors h3ron-polars frame/compact.rs:43-97: group keys are every
    non-cell column; each group's unique cells are compacted through
    the resolution hierarchy; ``exploded`` re-explodes to one row per
    compacted cell (else keeps an array column).

    ``partition_res`` (scale path): without it every group (or, with
    no keys, the whole frame) collect_sets into ONE array in one task
    — correct, but single-threaded per group and memory-bound at
    100 TB (a single hot group can hold billions of cells). With it,
    compaction runs distributed in two phases: (1) group by (keys +
    res-``partition_res`` ancestor) and compact each subtree in
    parallel (exact for every merge at res > partition_res — siblings
    at any finer res share that ancestor, so no merge crosses a group
    boundary); (2) the coarse remainder (res <= partition_res, at most
    one cell per subtree per group) is compacted per key group in a
    final bounded pass to finish merges above the partition roots.
    Identical results to the single-array path.

    NOTE: the two-phase path evaluates the input frame TWICE (the
    fine-subtree branch and the coarse-boundary branch are separate
    scans). If the input's lineage is expensive (an uncompact explode,
    a long transform chain), ``localCheckpoint()`` it first — the
    checkpoint preserves physical partitions, so it composes with
    ``assume_partitioned``.

    ``assume_partitioned`` (with ``partition_res``, keyless only):
    declare that the input is ALREADY partitioned so that no
    res-``partition_res`` subtree is split across partitions (e.g. it
    came from ``uncompact_dataframe(..., partition_res=...)`` over
    non-overlapping sources, or a bucketed cell-table layout). Phase 1
    then runs the kernel on the existing partitions and the big
    child-level shuffle disappears — the uncompact->transform->compact
    pipeline co-locates ONCE on the (tiny) parent set instead of
    re-shuffling every child row.
    """
    keys = [c for c in df.columns if c != cell_col]
    if partition_res is not None:
        return _compact_two_phase(
            df, cell_col, exploded, partition_res, keys,
            assume_partitioned=assume_partitioned,
        )
    if keys:
        agg = df.groupBy(*keys).agg(F.collect_set(cell_col).alias("_cells"))
    else:
        agg = df.agg(F.collect_set(cell_col).alias("_cells"))
    out = agg.withColumn("_compacted", G.h3_compact_cells("_cells")).drop("_cells")
    if exploded:
        out = out.withColumn(cell_col, F.explode("_compacted")).drop("_compacted")
    else:
        out = out.withColumnRenamed("_compacted", cell_col)
    return out


def _compact_two_phase(
    df: DataFrame,
    cell_col: str,
    exploded: bool,
    partition_res: int,
    keys: list[str],
    assume_partitioned: bool = False,
) -> DataFrame:
    """Distributed compact (see compact_dataframe). One shuffle keyed
    on (keys + coarse ancestor); per-subtree kernel work parallelizes
    across the cluster with group size bounded by the subtree width
    (<= 7^(input_res - partition_res) cells), so hot key groups can't
    OOM a task; the phase-2 input per key group is bounded by the
    number of res<=partition_res cells."""
    from h3ron_spark.functions import bits as B

    if keys:
        if assume_partitioned:
            raise ValueError(
                "assume_partitioned requires a keyless compact (the "
                "keyed path groups by (keys, subtree root) and cannot "
                "trust physical partitioning)"
            )
        return _compact_two_phase_keyed(
            df, cell_col, exploded, partition_res, keys
        )

    # cells coarser than the partition root can't group under an
    # ancestor — route them straight to phase 2
    res = B.h3_get_resolution(cell_col)
    fine = df.filter(res > partition_res)
    coarse_in = df.filter(res <= partition_res).select(cell_col)

    # explicit repartition on the res-partition_res ancestor (NOT a
    # groupBy+collect_set): hash co-location of each subtree is the
    # only requirement, and per-PARTITION numpy compaction over the
    # union of complete subtrees is exact (sibling merges never cross
    # a subtree root below partition_res). An explicit repartition
    # also pins the parallelism: AQE would coalesce this shuffle to a
    # couple of partitions by byte size (3.5M cells ~ 28 MB) and
    # serialize what is a CPU-bound kernel.
    n_part = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )

    def _compact_partition(batches):
        import numpy as np
        import pyarrow as pa

        from h3ron_spark.h3core.vectorized import compact_cells_np

        chunks = [
            b.column(0).to_numpy(zero_copy_only=False) for b in batches
        ]
        if not chunks:
            return
        out = compact_cells_np(np.concatenate(chunks).astype(np.int64))
        yield pa.RecordBatch.from_arrays(
            [pa.array(out, pa.int64())], [cell_col]
        )

    if assume_partitioned:
        # subtrees are whole within partitions already (declared by
        # the caller): the kernel runs in place, no child-level shuffle
        phase1_in = fine.select(F.col(cell_col))
    else:
        phase1_in = fine.repartition(
            n_part, B.h3_to_parent(cell_col, partition_res)
        ).select(F.col(cell_col))
    phase1 = phase1_in.mapInArrow(_compact_partition, f"{cell_col} long")
    # phase 2: finish merges at/above the partition root. Inputs:
    # phase-1 outputs that reached partition_res + pre-existing coarse
    # cells. Everything finer than partition_res is final.
    final_fine = phase1.filter(B.h3_get_resolution(cell_col) > partition_res)
    boundary = phase1.filter(
        B.h3_get_resolution(cell_col) <= partition_res
    ).unionByName(coarse_in)
    phase2 = (
        boundary.agg(F.collect_set(cell_col).alias("_cells"))
        .withColumn("_compacted", G.h3_compact_cells("_cells"))
        .select(F.explode("_compacted").alias(cell_col))
    )
    out = final_fine.unionByName(phase2)
    if exploded:
        return out
    return out.agg(F.collect_set(cell_col).alias(cell_col))


def _compact_two_phase_keyed(
    df: DataFrame,
    cell_col: str,
    exploded: bool,
    partition_res: int,
    keys: list[str],
) -> DataFrame:
    """Keyed two-phase compact: phase 1 groups by (keys, subtree
    root) — bounded arrays, full parallelism even for one hot key —
    phase 2 finishes the coarse merges per key group."""
    from h3ron_spark.functions import bits as B

    res = B.h3_get_resolution(cell_col)
    fine = df.filter(res > partition_res)
    coarse_in = df.filter(res <= partition_res).select(*keys, cell_col)

    phase1 = (
        fine.groupBy(
            *keys, B.h3_to_parent(cell_col, partition_res).alias("_root")
        )
        .agg(F.collect_set(cell_col).alias("_cells"))
        .withColumn("_compacted", G.h3_compact_cells("_cells"))
        .select(*keys, F.explode("_compacted").alias(cell_col))
    )
    out_res = B.h3_get_resolution(cell_col)
    final_fine = phase1.filter(out_res > partition_res)
    boundary = phase1.filter(out_res <= partition_res).unionByName(coarse_in)
    phase2 = (
        boundary.groupBy(*keys)
        .agg(F.collect_set(cell_col).alias("_cells"))
        .withColumn("_compacted", G.h3_compact_cells("_cells"))
        .select(*keys, F.explode("_compacted").alias(cell_col))
    )
    out = final_fine.unionByName(phase2)
    if exploded:
        return out
    # match the plain path's sorted-array contract
    return out.groupBy(*keys).agg(
        F.array_sort(F.collect_set(cell_col)).alias(cell_col)
    )


def uncompact_dataframe(
    df: DataFrame,
    target_res: int,
    cell_col: str = "cell",
    subset_parent: int | None = None,
    partition_res: int | None = None,
) -> DataFrame:
    """Uncompact every cell to ``target_res`` children, keeping all
    other columns (inner join on the original cell, as
    frame/compact.rs:279-292). Cells already at target res map to
    themselves; finer-than-target cells are dropped (reference
    semantics: change_resolution only descends).

    ``subset_parent``: optional parent cell — only children under it
    are produced (h3_uncompact_dataframe_subset).

    ``partition_res``: hash the (tiny) distinct source set by its
    res-``partition_res`` ancestor before exploding, so every emitted
    child stays co-located with its whole subtree. A downstream
    ``compact_dataframe(..., assume_partitioned=True)`` can then skip
    re-shuffling the (huge) child rows — the pipeline shuffles the
    parents once, never the children.

    PRECONDITION (``partition_res`` only): the *pre-explosion* source
    frame must be broadcastable — it is force-broadcast so the child
    mapping streams in place and the subtree co-location survives the
    join (a silent SortMergeJoin fallback would re-hash the children
    and break the ``assume_partitioned`` contract downstream). That is
    the regime where uncompacting a frame into a much larger child
    table makes sense; for a beyond-broadcast source leave
    ``partition_res`` unset and use the default compact path.
    """
    # re-spread after distinct: AQE coalesces the (tiny-in-bytes)
    # distinct shuffle to few partitions, which would serialize the
    # children-explode kernel — its cost is CPU per row (up to 7^k
    # children each), not bytes
    from h3ron_spark.functions import bits as B

    n_part = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    distinct = df.select(cell_col).distinct()
    if partition_res is not None:
        distinct = distinct.repartition(
            n_part, B.h3_to_parent(cell_col, partition_res)
        )
    else:
        distinct = distinct.repartition(n_part)
    join_hint_source = partition_res is not None
    mapping = distinct.withColumn(
        "_children", G.h3_change_resolution(cell_col, F.lit(target_res))
    ).filter(F.col("_children").isNotNull())
    mapping = mapping.select(
        F.col(cell_col).alias("_orig"), F.explode("_children").alias("_child")
    )
    # only descend/stay: drop rows where the child is coarser than the cell
    mapping = mapping.filter(
        B.h3_get_resolution("_child") >= B.h3_get_resolution("_orig")
    )
    if subset_parent is not None:
        # precise subset: child's ancestor at the parent's res == parent
        mapping = mapping.filter(
            B.h3_to_parent("_child", _res_of_literal(subset_parent))
            == F.lit(subset_parent)
        )
    # with partition_res the subtree co-location of the mapping side
    # MUST survive this join: force the source frame to broadcast so
    # the mapping streams in place. Without the hint the planner may
    # pick a SortMergeJoin once the source outgrows the auto-broadcast
    # threshold, re-hashing children by _orig and SILENTLY breaking
    # the assume_partitioned contract downstream. (Precondition: the
    # pre-explosion source is broadcastable — which is the regime
    # where uncompacting it into a huge child table makes sense; for
    # a beyond-broadcast source use the default compact path.)
    left = F.broadcast(df) if join_hint_source else df
    joined = left.join(
        mapping, df[cell_col] == mapping["_orig"], "inner"
    ).drop(cell_col, "_orig")
    return joined.withColumnRenamed("_child", cell_col)


def _res_of_literal(cell: int) -> int:
    return (cell >> 52) & 15
