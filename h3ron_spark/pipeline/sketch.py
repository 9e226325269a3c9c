"""Bounded-state cardinality sketches (deterministic HyperLogLog).

At 100 TB, ``count(DISTINCT x)`` is the expensive way to audit corpus
cardinality: it shuffles every distinct value. A register sketch
aggregates to FIXED state per group (2^p integers), is map-side
combinable (``max`` per register), and merges across corpora by
taking register-wise max — the standard warehouse pattern
(Flajolet et al. 2007, "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm").

This implementation is fully DETERMINISTIC and cross-engine exact:
the hash is the repo-wide md5 recipe (`sampling.hash_u32` family), the
register/rho split is integer bit math via ``bin()`` string length
(identical in Spark and DuckDB — no float log2 at the boundary), and
the estimator arithmetic is plain IEEE-double ops both engines round
identically (ln/pow precedent: text_unigram_logprob).

Everything is pure JVM column expressions — no UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_u60(col) -> Column:
    """60-bit deterministic hash: first 15 md5 hex chars, base-16.
    DuckDB replica: ('0x' || substr(md5(x), 1, 15))::BIGINT."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def _rho(w: Column, width: int) -> Column:
    """Position of the first 1-bit (leading-zero count + 1) of ``w``
    seen as a ``width``-bit integer. Integer-exact via the length of
    the binary string — bin() drops leading zeros in both engines, so
    bitlen(w) == length(bin(w)) for w > 0."""
    return F.when(w == 0, F.lit(width + 1)).otherwise(
        F.lit(width + 1) - F.length(F.bin(w))
    )


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    p: int = 8,
) -> DataFrame:
    """Per-group HLL cardinality estimate with 2^p registers.

    Register = low p bits of the 60-bit hash; rho = first-1-bit
    position of the remaining (60-p)-bit suffix. Two hash aggregates,
    both map-side combinable: (group, register) -> max(rho), then
    group -> harmonic sum. Unseen registers contribute 2^0 each
    (m - observed). Small-range (linear counting) correction applied
    per the paper when raw <= 2.5*m and empty registers exist; the
    large-range correction is a no-op at 60-bit hash width.

    Returns one row per group: ``hll_est`` (double), ``regs_used``.
    Output state per group is <= m rows pre-agg — at 100 TB the
    second aggregate touches at most |groups| * m tiny rows.
    """
    m = 1 << p
    width = 60 - p
    h = hash_u60(value_col)
    regs = (
        df.select(
            *group_cols,
            (h % m).alias("_reg"),
            # integer shift, NOT h/m float division — a double mantissa
            # (53 bits) cannot hold the 60-bit hash exactly
            _rho(F.shiftright(h, p), width).alias("_rho"),
        )
        .groupBy(*group_cols, "_reg")
        .agg(F.max("_rho").alias("_M"))
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("regs_used"),
        F.sum(F.pow(F.lit(2.0), -F.col("_M"))).alias("_sum_pow"),
    )
    sum_all = F.col("_sum_pow") + (m - F.col("regs_used"))
    raw = F.lit(alpha * m * m) / sum_all
    empty = F.lit(m) - F.col("regs_used")
    est = F.when(
        (raw <= 2.5 * m) & (empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / empty),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        est.alias("hll_est"),
        F.col("regs_used").cast("int").alias("regs_used"),
    )


def hll_oracle_sql(
    value_expr: str,
    group_cols: list[str],
    table: str,
    p: int = 8,
) -> str:
    """The DuckDB replica of :func:`hll_distinct` (shared so the query
    oracle and tests cannot drift from the implementation)."""
    m = 1 << p
    width = 60 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    g = ", ".join(group_cols)
    return f"""
  WITH hashes AS (
    SELECT {g},
           ('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, 15))::BIGINT AS hv
    FROM {table}
  ), regs AS (
    SELECT {g}, hv % {m} AS reg,
           max(CASE WHEN hv // {m} = 0 THEN {width + 1}
                    ELSE {width + 1} - length(bin(hv // {m})) END) AS M
    FROM hashes GROUP BY {g}, reg
  ), agg AS (
    SELECT {g}, count(*) AS regs_used, sum(pow(2.0, -M)) AS sum_pow
    FROM regs GROUP BY {g}
  )
  SELECT {g},
         -- alpha*m*m is pre-multiplied in Python: DuckDB would parse the
         -- bare literal as DECIMAL and overflow on *m; Spark builds the
         -- same product as one double literal
         CASE WHEN CAST({alpha * m * m!r} AS DOUBLE) / (sum_pow + ({m} - regs_used)) <= 2.5 * {m}
                   AND ({m} - regs_used) > 0
              THEN CAST({float(m)!r} AS DOUBLE) * ln(CAST({float(m)!r} AS DOUBLE) / ({m} - regs_used))
              ELSE CAST({alpha * m * m!r} AS DOUBLE) / (sum_pow + ({m} - regs_used))
         END AS hll_est,
         CAST(regs_used AS INTEGER) AS regs_used
  FROM agg
"""
