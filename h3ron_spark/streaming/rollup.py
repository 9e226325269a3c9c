"""Streaming incremental rollup maintenance via ``foreachBatch``.

The streaming sibling of the batch pattern ``pipeline_incremental_rollup``
demonstrates: a per-group rollup (row counts, integer-scaled sums,
HLL user registers) kept up to date as micro-batches land, WITHOUT
ever rescanning history — each batch is partially aggregated and
merged algebraically into the persisted state (sums add, registers
max). Because every piece of state is a commutative monoid over rows
(the ``streaming/sketches.py`` rule), the state after any sequence of
micro-batches equals the batch rollup over the union of rows
bit-for-bit — pinned by unit test.

Exactly-once across restarts: state versions are keyed by the
``foreachBatch`` batch_id (``v{batch_id}/``). A retried batch reads
the latest version STRICTLY BELOW its own id (a half-written
``v{batch_id}`` from the crashed attempt is never read) and
idempotently overwrites its own version — the same
rewrite-to-a-new-dir reasoning as ``operators/maintenance.py``:
in-place mutation cannot be atomic on object stores, versioned
directories are.

Scale shape: per batch, one scan of the batch + one read of the
previous state (|groups| + |groups| * m tiny rows), one monoid
re-aggregate, one write. History is never touched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


_COMMIT_MARKER = "_COMMITTED"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def _state_versions(spark: SparkSession, base: str) -> list[int]:
    """COMMITTED version ids under ``base`` — a version counts only
    once its ``_COMMITTED`` marker exists (written after both tables),
    so a crash mid-write leaves a directory no reader ever selects."""
    fs, hpath = _fs(spark, base)
    if not fs.exists(hpath):
        return []
    jvm = spark._jvm
    out = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if (
            st.isDirectory()
            and name.startswith("v")
            and name[1:].isdigit()
            and fs.exists(
                jvm.org.apache.hadoop.fs.Path(f"{base}/{name}/{_COMMIT_MARKER}")
            )
        ):
            out.append(int(name[1:]))
    return sorted(out)


def _batch_state(df: DataFrame, keys: list[str], value_col: str,
                 user_col: str, p: int) -> tuple[DataFrame, DataFrame]:
    from h3ron_spark.pipeline import sketch as SK

    counts = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.expr(f"CAST(floor({value_col} * 100 + 0.5) AS BIGINT)")
        ).alias("s"),
    )
    regs = SK.hll_registers(df, user_col, keys, p=p)
    return counts, regs


def merge_rollup_batch(
    batch_df: DataFrame,
    base_path: str,
    batch_id: int,
    keys: list[str],
    value_col: str,
    user_col: str,
    p: int = 8,
) -> None:
    """The ``foreachBatch`` body: merge one micro-batch into the
    versioned state under ``base_path``."""
    spark = batch_df.sparkSession
    counts, regs = _batch_state(batch_df, keys, value_col, user_col, p)
    prev = [v for v in _state_versions(spark, base_path) if v < batch_id]
    if prev:
        pv = f"{base_path}/v{prev[-1]}"
        counts = counts.unionByName(spark.read.parquet(f"{pv}/counts"))
        regs = regs.unionByName(spark.read.parquet(f"{pv}/regs"))
    from h3ron_spark.pipeline import sketch as SK

    merged_counts = counts.groupBy(*keys).agg(
        F.sum("n").alias("n"), F.sum("s").alias("s")
    )
    merged_regs = SK.hll_merge(regs, keys)
    out = f"{base_path}/v{batch_id}"
    merged_counts.write.mode("overwrite").parquet(f"{out}/counts")
    merged_regs.write.mode("overwrite").parquet(f"{out}/regs")
    # commit marker LAST: only fully-written versions are readable
    fs, _ = _fs(spark, base_path)
    jvm = spark._jvm
    fs.create(
        jvm.org.apache.hadoop.fs.Path(f"{out}/{_COMMIT_MARKER}"), True
    ).close()
    # prune: a retry only ever re-runs the latest not-yet-checkpointed
    # batch, which reads the newest version strictly below its id —
    # keep that one, delete everything older (state is a snapshot, not
    # a log; without pruning storage grows one full copy per batch)
    for v in _state_versions(spark, base_path):
        if v < batch_id and prev and v < prev[-1]:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{base_path}/v{v}"), True)


def rollup_stream(
    stream_df: DataFrame,
    base_path: str,
    checkpoint: str,
    keys: list[str],
    value_col: str,
    user_col: str,
    p: int = 8,
    trigger: dict | None = None,
):
    """Attach the incremental-rollup maintenance to a stream; returns
    the started query (caller awaits / stops). ``trigger`` passes
    through to ``writeStream.trigger`` — default drain-and-stop
    (``availableNow``); pass ``{"processingTime": "..."}`` for a
    continuously running maintenance loop."""

    def _body(batch_df: DataFrame, batch_id: int) -> None:
        merge_rollup_batch(
            batch_df, base_path, batch_id, keys, value_col, user_col, p
        )

    return (
        stream_df.writeStream.foreachBatch(_body)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def rollup_result(
    spark: SparkSession, base_path: str, keys: list[str], p: int = 8
) -> DataFrame:
    """Finalize the latest state version into the rollup frame
    ``(keys..., n_events, sum_value_scaled, hll_est, regs_used)`` —
    the same finalization the batch query uses."""
    from h3ron_spark.pipeline import sketch as SK

    versions = _state_versions(spark, base_path)
    if not versions:
        raise FileNotFoundError(f"no rollup state under {base_path}")
    v = f"{base_path}/v{versions[-1]}"
    counts = spark.read.parquet(f"{v}/counts").select(
        *keys,
        F.col("n").alias("n_events"),
        F.col("s").alias("sum_value_scaled"),
    )
    est = SK.hll_estimate(spark.read.parquet(f"{v}/regs"), keys, p=p)
    return counts.join(est, keys)
