"""Deterministic corpus sampling / mixing operators.

Training pipelines need splits and quotas that are (a) stable across
runs and engines (no RNG state), (b) content- or id-keyed so late
additions don't reshuffle earlier assignments, and (c) pure column
expressions so a 100 TB scan stays JVM-side. Everything here keys on
md5 of the id/content, which both Spark and DuckDB evaluate
bit-identically (the same trick the MinHash oracles use).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_u32(col) -> Column:
    """Deterministic uint32 from the first 8 md5 hex chars of the
    column — THE cross-engine hash recipe every oracle replicates
    (('0x' || substr(md5(x), 1, 8))::BIGINT in DuckDB). All derived
    hashes (buckets, fractions) must build on this one expression."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast(
        "long"
    )


def hash_bucket(col, buckets: int = 100) -> Column:
    """Deterministic [0, buckets) bucket — stable across engines/runs,
    unlike sample()/rand()."""
    return (hash_u32(col) % buckets).cast("int")


def hash_fraction(col) -> Column:
    """Deterministic uniform-ish [0, 1) from the same u32 recipe."""
    return hash_u32(col).cast("double") / float(0x100000000)


def train_test_split(
    df: DataFrame,
    key_col: str,
    test_pct: int = 10,
    buckets: int = 100,
) -> DataFrame:
    """Assign a stable 'train'/'test' split by hash bucket of the key:
    the lowest ``test_pct`` buckets are test. Deterministic, and a row
    keeps its split when the corpus grows."""
    b = hash_bucket(key_col, buckets)
    return df.withColumn(
        "split", F.when(b < test_pct, F.lit("test")).otherwise(F.lit("train"))
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    text_col: str = "text",
    key_col: str = "doc_id",
    shards: int = 64,
) -> DataFrame:
    """Sequence packing for pre-training batches: assign each document
    to a (shard, bin) so bins hold ~``max_tokens`` tokens.

    Docs hash deterministically into ``shards`` independent shards;
    within a shard they are taken in hash order and binned by their
    cumulative-token START offset (next-fit). A bin can overflow by at
    most one document's tokens — the standard scalable approximation
    (exact greedy packing is a sequential scan; per-shard windows keep
    the sort parallel and the assignment stable as the corpus grows,
    since a doc's shard and hash order never change).

    Returns (key, n_tokens, shard, bin). Docs longer than
    ``max_tokens`` still get a bin (they overflow alone — flag or
    truncate upstream)."""
    from h3ron_spark.pipeline.text import token_count

    h = F.md5(F.col(key_col).cast("string"))
    base = df.select(
        F.col(key_col).alias("key"),
        token_count(text_col).alias("n_tokens"),
        hash_bucket(key_col, shards).alias("shard"),
        h.alias("_h"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_h", "key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return base.withColumn(
        "bin", F.floor(start / max_tokens).cast("int")
    ).drop("_h")


def mixture_epoch(
    df: DataFrame,
    weights: dict,
    group_col: str = "source",
    key_col: str = "doc_id",
    default_weight: float = 1.0,
) -> DataFrame:
    """Materialize one training epoch under per-group mixture weights
    (DoReMi-style domain re-weighting): weight w repeats each row
    floor(w) times plus one more for the deterministic md5-fraction of
    rows selected by frac(w) — no RNG, so the epoch is reproducible
    and a row's multiplicity never changes as other groups grow.
    Rows from groups absent in ``weights`` get ``default_weight``.
    Output adds an ``epoch_copy`` index (0..copies-1)."""
    w_expr = F.lit(float(default_weight))
    for g, w in weights.items():
        w_expr = F.when(F.col(group_col) == g, F.lit(float(w))).otherwise(
            w_expr
        )
    base = F.floor(w_expr).cast("int")
    frac = w_expr - F.floor(w_expr)
    copies = base + (hash_fraction(key_col) < frac).cast("int")
    return df.withColumn("_copies", copies).filter(
        F.col("_copies") > 0
    ).withColumn(
        "epoch_copy",
        F.explode(F.sequence(F.lit(0), F.col("_copies") - 1)),
    ).drop("_copies")


def source_quota(
    df: DataFrame,
    source_col: str,
    max_per_source: int,
    key_col: str = "doc_id",
) -> DataFrame:
    """Data mixing: cap each source's contribution at
    ``max_per_source`` rows, keeping a deterministic hash-ordered
    prefix (so the kept subset is stable as the corpus grows, not
    'first N by ingestion order').

    Scale note: a row_number window per source is the natural plan and
    is safe here because the per-key state is a single counter and the
    sort key is a hash (uniform) — but a corpus-hot source still
    funnels through one task's sort. For quota << source size, a
    cheaper pre-filter on the hash bucket can shrink the window input
    first; that refinement keys off the same deterministic hash, so
    layering it later cannot change which rows are kept."""
    h = F.md5(F.col(key_col).cast("string"))
    w = Window.partitionBy(source_col).orderBy(h, key_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_per_source)
        .drop("_rn")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col,
    group_cols: list[str],
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weight-proportional sample of ``k`` rows per
    group — Efraimidis & Spirtakis (2006) A-ES keys, RNG replaced by
    the repo's md5 hash so the draw is reproducible across runs,
    engines, and corpus growth (a row's key never changes when other
    rows arrive).

    Key: ``-ln(u) / w`` with ``u = (hash_u32(key)+1) / 2^32`` in
    (0, 1]; the k SMALLEST keys per group win, which selects row i
    with probability proportional to ``w_i`` (without replacement).
    Weights are clamped to >= 1 so zero-weight rows degrade to uniform
    instead of dividing by zero.

    Scale note: one shuffle on the group key + a per-group sort for
    row_number — same shape as :func:`source_quota`. The A-ES
    construction is what makes the sample MERGEABLE: per-partition
    bottom-k by the same key can pre-shrink the window input to
    k rows per (partition, group) with no change to the result.

    Cross-engine caveat: ``ln`` agrees with DuckDB only to the last
    ulp (java.lang.Math.log vs glibc), so ``aes_key`` is safe to RANK
    on (distinct keys sit far above ulp distance) but should not be
    hash-compared raw across engines — ``sample_rank`` is the exact
    column.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (hash_u32(key_col) + 1).cast("double") / float(1 << 32)
    key = -F.log(u) / F.greatest(w.cast("double"), F.lit(1.0))
    win = Window.partitionBy(*group_cols).orderBy("aes_key", key_col)
    return (
        df.withColumn("aes_key", key)
        .withColumn("sample_rank", F.row_number().over(win))
        .filter(F.col("sample_rank") <= k)
    )
