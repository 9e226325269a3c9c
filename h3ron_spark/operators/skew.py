"""Skew-mitigation operators: deterministic salting for hot keys.

AQE's skew-join splitting (enabled in session.py) only rescues
shuffled JOINS whose oversized partitions it can split at runtime. It
cannot split a single hot KEY for stateful aggregation (collect_set /
exact distinct concentrate the key's whole state in one reducer) and
it never touches window functions (one hot partition key = one task
doing all the work). These operators are the manual tool for exactly
those cases — the 100-TB situations where "groupBy(event_type)" means
one task holding a billion-row group.

All salts are DETERMINISTIC (md5-derived, no rand()): results are
reproducible across runs, retries, and engines, and speculative task
re-execution cannot produce divergent outputs — rand()-salted shuffles
are a classic source of silent corruption under task retry.

The central trick: salting BY VALUE (not by row) makes distinct-style
state disjoint across salt buckets — every occurrence of value v lands
in bucket hash(v) % n, so per-(key, salt) distinct sets partition the
per-key distinct set and merge by concatenation/sum, never re-distinct.
That turns exact count-distinct and collect_set into fully algebraic
two-stage aggregations with n-way parallelism per hot key.

Reference parity note: the reference engine (nmandery/h3ron) is
single-node and has no shuffle, hence no skew surface; this module is
beyond-reference scale machinery (build brief: "skewed keys hurt...
salting for skew").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def deterministic_salt(col, n_salts: int) -> Column:
    """Stable salt in [0, n_salts): md5 of the column value, first 15
    hex chars as a 60-bit int, reduced mod n. Same value -> same salt
    on every run, engine, and retry."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    return ((h % n_salts) + n_salts) % n_salts


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    n_salts: int = 32,
    out_col: str = "n_distinct",
) -> DataFrame:
    """EXACT per-key count(DISTINCT value) as two algebraic stages:

      stage 1: groupBy(keys, salt(value)) -> count_distinct(value)
      stage 2: groupBy(keys)              -> sum(partial)

    Correct because the salt is a function of the VALUE: bucket b only
    ever sees values with hash(v) % n == b, so the per-bucket distinct
    sets partition the key's distinct set and their sizes ADD. A hot
    key's distinct-state now builds in n_salts parallel tasks instead
    of one; stage 2 merges n_salts small integers per key."""
    salt = deterministic_salt(value_col, n_salts)
    stage1 = (
        df.groupBy(*keys, salt.alias("_salt"))
        .agg(F.count_distinct(F.col(value_col)).alias("_part"))
    )
    return stage1.groupBy(*keys).agg(F.sum("_part").alias(out_col))


def salted_collect_set(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    n_salts: int = 32,
    out_col: str = "values",
) -> DataFrame:
    """Per-key collect_set with the hot key's set built across n_salts
    tasks. Value-salting again makes per-bucket sets disjoint, so the
    merge is flatten (concatenation), never a re-distinct over the full
    set; the result is sorted for a deterministic array order."""
    salt = deterministic_salt(value_col, n_salts)
    stage1 = (
        df.groupBy(*keys, salt.alias("_salt"))
        .agg(F.collect_set(F.col(value_col)).alias("_part"))
    )
    return stage1.groupBy(*keys).agg(
        F.array_sort(F.flatten(F.collect_list("_part"))).alias(out_col)
    )


def salted_topk(
    df: DataFrame,
    key_cols: list[str],
    order_by: list[Column],
    k: int,
    salt_from: str,
    n_salts: int = 16,
) -> DataFrame:
    """Exact per-key top-k without a single-task hot window: stage 1
    ranks within (key, salt) — n_salts parallel windows per hot key,
    each keeping k rows — stage 2 re-ranks the surviving n_salts*k
    rows per key. The salt comes from any row-identifying column
    (``salt_from``), spreading rows of the same key uniformly.

    Exactness: every true top-k row survives stage 1 (it is within the
    top k of whatever bucket it lands in). Output carries ``rnk``.
    AQE never splits a window's hot partition; this does."""
    salt = deterministic_salt(salt_from, n_salts)
    w1 = Window.partitionBy(*key_cols, "_salt").orderBy(*order_by)
    w2 = Window.partitionBy(*key_cols).orderBy(*order_by)
    return (
        df.withColumn("_salt", salt)
        .withColumn("_rk1", F.row_number().over(w1))
        .filter(F.col("_rk1") <= k)
        .withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
        .drop("_salt", "_rk1")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    salt_from: str | None = None,
) -> DataFrame:
    """Skew-safe inner equi-join: the fact side gets a deterministic
    salt from ``salt_from`` (default: the join key's row context needs
    a row-identifying column — pass one), the dim side is exploded
    n_salts ways, and the join runs on (key, salt) so a hot key's rows
    spread over n_salts tasks (each dim row is replicated n_salts
    times — use for moderate dims that are too big to broadcast but
    far smaller than the fact).

    Prefer AQE's skew-join when it applies (plain shuffled joins); use
    this when the join feeds a co-partitioned agg AQE won't re-split,
    or when the skew is known ahead of time and you want a stable
    plan. Null join keys drop (inner-join semantics), matching the
    unsalted join."""
    if salt_from is None:
        raise ValueError("salted_join needs salt_from (a fact column)")
    f = fact.withColumn("_salt", deterministic_salt(salt_from, n_salts))
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = f.join(d, [key, "_salt"], "inner")
    return joined.drop("_salt")
