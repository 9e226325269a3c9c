"""Table maintenance: file statistics + small-file compaction.

The 100-TB operational problem this solves: streaming sinks, frequent
small appends, and over-parallel writers leave parquet tables as tens
of thousands of KB-sized files. Every query then pays per-file open
cost (driver listing, footer reads, task scheduling) that dwarfs the
actual scan — the "small files problem". The fix is periodic
compaction: rewrite each partition's files into ~target-sized outputs.

Design notes:
- File listing goes through the Hadoop FileSystem API (works for any
  supported scheme — local, HDFS, s3a — not just the local disk).
- Compaction sizes the output file count from the ACTUAL byte size of
  the input (ceil(bytes / target)), not a guessed repartition number.
- Hive-partitioned tables compact per partition directory so the
  partition layout (and pruning) is preserved.
- The rewrite lands in a fresh directory; the caller swaps it in
  (rename/catalog repoint). Compact-in-place cannot be atomic on
  object stores and silently corrupts readers mid-rewrite — refusing
  to do it is the correct behavior, same call every table format
  (Delta/Iceberg OPTIMIZE) makes by writing new files first.

Reference parity note: the reference engine is single-node and
file-layout-agnostic (SURVEY §4) — this is beyond-reference scale
machinery for operating the parquet tables every other operator here
reads.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _fs_for(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def table_file_stats(spark: SparkSession, path: str) -> DataFrame:
    """One row per data file under ``path`` (recursive):
    (file, bytes, partition) — ``partition`` is the hive-style
    relative directory ('' for unpartitioned). Small-file audits are
    a groupBy away: ``stats.groupBy('partition').agg(count, avg)``."""
    fs, root, jvm = _fs_for(spark, path)
    root_str = fs.makeQualified(root).toString()
    rows = []
    it = fs.listFiles(root, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        name = p.rsplit("/", 1)[-1]
        if name.startswith("_") or name.startswith("."):
            continue  # _SUCCESS, checksums, hidden
        rel = p[len(root_str) :].lstrip("/")
        part = rel.rsplit("/", 1)[0] if "/" in rel else ""
        rows.append((p, int(st.getLen()), part))
    return spark.createDataFrame(
        rows, "file string, bytes long, partition string"
    )


def compact_small_files(
    spark: SparkSession,
    path: str,
    dest: str,
    target_mb: int = 128,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Rewrite the parquet table at ``path`` into ``dest`` with
    ~``target_mb``-sized files; returns a one-row-per-partition
    summary (partition, files_before, bytes, files_target).

    Unpartitioned tables rewrite in one pass with
    ``ceil(total_bytes / target)`` output files. Hive-partitioned
    tables (``partition_cols``) preserve the partition directories via
    ``partitionBy`` and size the file count per partition with
    repartition on (partition columns + a within-partition slice id),
    so one giant partition still splits into multiple target-sized
    files while small partitions collapse to one."""
    stats = table_file_stats(spark, path).groupBy("partition").agg(
        F.count(F.lit(1)).alias("files_before"),
        F.sum("bytes").alias("bytes"),
    )
    target = target_mb * 1024 * 1024
    stats = stats.withColumn(
        "files_target",
        F.greatest(F.lit(1), F.ceil(F.col("bytes") / F.lit(target))).cast(
            "int"
        ),
    )
    per_part = {r["partition"]: r for r in stats.collect()}
    df = spark.read.parquet(path)
    if not partition_cols:
        total = sum(r["bytes"] for r in per_part.values())
        n_out = max(1, math.ceil(total / target))
        df.repartition(n_out).write.mode("errorifexists").parquet(dest)
    else:
        # per-partition slice id: reconstruct the hive dir string from
        # the partition columns, broadcast-join each partition's
        # files_target, and spread rows over exactly that many slices
        # with a deterministic hash — one shuffle total, every
        # partition gets its own output file count
        part_expr = F.concat_ws(
            "/",
            *[
                F.concat(F.lit(f"{c}="), F.col(c).cast("string"))
                for c in partition_cols
            ],
        )
        others = [c for c in df.columns if c not in partition_cols]
        tgt = stats.select(
            F.col("partition").alias("_part"),
            F.col("files_target").alias("_n"),
        )
        (
            df.withColumn("_part", part_expr)
            .join(F.broadcast(tgt), "_part", "left")
            .withColumn(
                "_slice",
                F.pmod(
                    F.hash(*[F.col(c) for c in others]),
                    F.coalesce(F.col("_n"), F.lit(1)),
                ),
            )
            .repartition(*partition_cols, "_slice")
            .drop("_slice", "_part", "_n")
            .write.mode("errorifexists")
            .partitionBy(*partition_cols)
            .parquet(dest)
        )
    return stats.orderBy("partition")
