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
    DuckDB replica: ('0x' || substr(md5(x), 1, 15))::BIGINT.
    String input takes the one-parse generated-SQL path (sqlexpr);
    Column input keeps the classic builder, value-identical."""
    if isinstance(col, str):
        from h3ron_spark.pipeline.sqlexpr import hash_u60_sql

        return F.expr(hash_u60_sql(col))
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
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
    regs = hll_registers(df, value_col, group_cols, p)
    return hll_estimate(regs, group_cols, p)


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    p: int = 8,
) -> DataFrame:
    """The materialized sketch state: (group, register) -> max rho.
    This is the MERGEABLE representation — sketches of disjoint (or
    overlapping) shards combine by register-wise max, so a 100 TB
    corpus can be sketched per partition/day/source and rolled up
    without touching the data again."""
    m = 1 << p
    width = 60 - p
    h = hash_u60(value_col)
    return (
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


def hll_merge(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge register frames down to coarser groups (or to one global
    sketch with ``group_cols=[]``) by register-wise max."""
    return regs.groupBy(*group_cols, "_reg").agg(F.max("_M").alias("_M"))


def hll_estimate(
    regs: DataFrame,
    group_cols: list[str],
    p: int = 8,
) -> DataFrame:
    """Finalize a register frame into per-group estimates."""
    m = 1 << p
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


def hll_regs_sql(value_expr: str, group_cols: list[str], src: str, p: int = 8) -> str:
    """SELECT fragment producing the per-group register frame
    ``({groups}, reg, M)`` of :func:`hll_registers` for ``src`` —
    shared by every HLL-composing oracle so the SQL twin cannot drift
    from the implementation."""
    m = 1 << p
    width = 60 - p
    g = ", ".join(group_cols)
    gp = f"{g}, " if g else ""
    return f"""
    SELECT {gp}hv % {m} AS reg,
           max(CASE WHEN hv // {m} = 0 THEN {width + 1}
                    ELSE {width + 1} - length(bin(hv // {m})) END) AS M
    FROM (SELECT {gp}('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, 15))::BIGINT AS hv
          FROM {src}) GROUP BY {gp}reg"""


def hll_est_case_sql(p: int = 8) -> str:
    """The estimate CASE expression of :func:`hll_estimate` over a
    pre-aggregated ``(regs_used, sum_pow)`` row — the second shared
    fragment of the HLL SQL twin."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # alpha*m*m is pre-multiplied in Python: DuckDB would parse the
    # bare literal as DECIMAL and overflow on *m; Spark builds the
    # same product as one double literal
    return f"""CASE WHEN CAST({alpha * m * m!r} AS DOUBLE) / (sum_pow + ({m} - regs_used)) <= 2.5 * {m}
                   AND ({m} - regs_used) > 0
              THEN CAST({float(m)!r} AS DOUBLE) * ln(CAST({float(m)!r} AS DOUBLE) / ({m} - regs_used))
              ELSE CAST({alpha * m * m!r} AS DOUBLE) / (sum_pow + ({m} - regs_used))
         END"""


def hll_oracle_sql(
    value_expr: str,
    group_cols: list[str],
    table: str,
    p: int = 8,
) -> str:
    """The DuckDB replica of :func:`hll_distinct` (shared so the query
    oracle and tests cannot drift from the implementation)."""
    g = ", ".join(group_cols)
    return f"""
  WITH regs AS (
{hll_regs_sql(value_expr, group_cols, table, p)}
  ), agg AS (
    SELECT {g}, count(*) AS regs_used, sum(pow(2.0, -M)) AS sum_pow
    FROM regs GROUP BY {g}
  )
  SELECT {g},
         {hll_est_case_sql(p)} AS hll_est,
         CAST(regs_used AS INTEGER) AS regs_used
  FROM agg
"""


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group k-minimum-values sketch: the k smallest DISTINCT
    60-bit hashes of ``value_col`` (Bar-Yossef et al. 2002). Output is
    at most k rows per group — the fixed-size summary that makes
    cross-group set comparisons (union / intersection / Jaccard)
    independent of corpus size.

    Plan shape: one distinct aggregate on (group, hash) — map-side
    combinable — then a rank window whose rank<=k filter Catalyst
    rewrites to a pre-shuffle WindowGroupLimit bottom-k.
    """
    h = hash_u60(value_col)
    from pyspark.sql import Window

    distinct = (
        df.select(F.col(group_col).alias("g"), h.alias("h"))
        .groupBy("g", "h")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    win = Window.partitionBy("g").orderBy("h")
    return (
        distinct.withColumn("_rk", F.row_number().over(win))
        .filter(F.col("_rk") <= k)
        .select("g", "h")
    )


def kmv_pair_overlap(sketch: DataFrame, k: int = 64) -> DataFrame:
    """All-pairs group overlap from KMV sketches: for each unordered
    group pair, take the k smallest hashes of the UNION of the two
    sketches and count how many belong to both sides — the standard
    KMV Jaccard estimator (inter_k / union_k; exact when neither
    sketch is saturated, since the sketch then IS the distinct set).

    Everything past the sketches runs on |groups| * k rows — the
    100 TB cross-corpus contamination audit costs one scan plus a
    driver-sized join, never a data-scale cross join.
    """
    from pyspark.sql import Window

    # materialize the sketch ONCE (<= |groups| * k rows): this frame
    # is referenced three times below (both sides of the pair
    # self-join + the overlap join) and Catalyst does not CSE
    # subtrees, so without the checkpoint each reference re-runs the
    # full corpus scan + shingle explode + distinct — measured 3
    # parquet scans in dedup_source_overlap's plan, ~2x its runtime.
    # kmv_set_cardinalities has carried the same checkpoint since r9;
    # this brings the pair-overlap sibling in line. Dynamic-allocation
    # caveat: see the package docstring.
    sketch = sketch.localCheckpoint()
    groups = sketch.select(F.col("g")).distinct()
    pairs = (
        groups.alias("a")
        .join(groups.alias("b"), F.col("a.g") < F.col("b.g"))
        .select(F.col("a.g").alias("g1"), F.col("b.g").alias("g2"))
    )
    rows = pairs.join(
        sketch.alias("s"),
        (F.col("s.g") == F.col("g1")) | (F.col("s.g") == F.col("g2")),
    )
    merged = rows.groupBy("g1", "g2", "h").agg(
        F.max((F.col("s.g") == F.col("g1")).cast("int")).alias("in1"),
        F.max((F.col("s.g") == F.col("g2")).cast("int")).alias("in2"),
    )
    win = Window.partitionBy("g1", "g2").orderBy("h")
    kept = merged.withColumn("_rk", F.row_number().over(win)).filter(
        F.col("_rk") <= k
    )
    return kept.groupBy("g1", "g2").agg(
        F.sum((F.col("in1") * F.col("in2"))).cast("int").alias("inter_k"),
        F.count(F.lit(1)).cast("int").alias("union_k"),
        (
            F.sum(F.col("in1") * F.col("in2"))
            / F.count(F.lit(1))
        ).alias("jaccard_est"),
    )


def kmv_overlap_oracle_sql(
    value_expr: str,
    group_col: str,
    table: str,
    k: int = 64,
) -> str:
    """DuckDB replica of kmv_sketch + kmv_pair_overlap (shared with
    the query oracle so the two cannot drift). int/int division is
    IEEE-exact in both engines, so jaccard_est is hash-stable."""
    return f"""
  WITH distinct_h AS (
    SELECT {group_col} AS g,
           ('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, 15))::BIGINT AS h
    FROM {table} GROUP BY 1, 2
  ), sk AS (
    SELECT g, h FROM (
      SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rk
      FROM distinct_h
    ) WHERE rk <= {k}
  ), pairs AS (
    SELECT a.g AS g1, b.g AS g2
    FROM (SELECT DISTINCT g FROM sk) a
    JOIN (SELECT DISTINCT g FROM sk) b ON a.g < b.g
  ), merged AS (
    SELECT p.g1, p.g2, s.h,
           max(CASE WHEN s.g = p.g1 THEN 1 ELSE 0 END) AS in1,
           max(CASE WHEN s.g = p.g2 THEN 1 ELSE 0 END) AS in2
    FROM pairs p JOIN sk s ON s.g = p.g1 OR s.g = p.g2
    GROUP BY p.g1, p.g2, s.h
  ), kept AS (
    SELECT * FROM (
      SELECT g1, g2, in1, in2,
             row_number() OVER (PARTITION BY g1, g2 ORDER BY h) AS rk
      FROM merged
    ) WHERE rk <= {k}
  )
  SELECT g1, g2,
         CAST(sum(in1 * in2) AS INTEGER) AS inter_k,
         CAST(count(*) AS INTEGER) AS union_k,
         CAST(sum(in1 * in2) AS DOUBLE) / count(*) AS jaccard_est
  FROM kept GROUP BY g1, g2
"""


# ---------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — frequency estimates
# ---------------------------------------------------------------------

CMS_SEEDS = (101, 102, 103, 104)


def _cms_bucket(h: Column, seed: int, w: int) -> Column:
    """Row j's bucket for base hash ``h``: the repo's per-seed integer
    mix (dedup._mix_hash — DuckDB twin queries_h3._hash_sql) reduced
    mod w, made non-negative identically in both engines."""
    from h3ron_spark.pipeline.dedup import _mix_hash

    mixed = _mix_hash(h, seed)
    return ((mixed % w) + w) % w


def cms_build(
    df: DataFrame,
    value_col: str,
    w: int = 1024,
    seeds: tuple[int, ...] = CMS_SEEDS,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a d x w count-min sketch over ``value_col`` occurrences:
    one row per (row j, bucket) with its collision-summed count —
    at most d*w rows of state regardless of corpus size, from ONE
    map-side-combinable aggregate. Sketches of shards merge by
    summing counters (same (j, bucket) grid).

    ``weight_col``: pre-aggregated input — each row counts as
    ``weight`` occurrences (identical counters to the per-occurrence
    build, since bucket counts are sums over the values mapping
    there). Feeding (value, count) pairs shrinks the explode domain
    from occurrences to DISTINCT values — the shape to use when a
    count table already exists."""
    from h3ron_spark.pipeline.sqlexpr import cms_probes_sql

    wcol = F.col(weight_col) if weight_col else F.lit(1)
    rows = df.select(
        wcol.alias("_w"),
        F.explode(F.expr(cms_probes_sql(value_col, w, seeds))).alias("jb"),
    )
    return rows.groupBy(
        F.col("jb.j").alias("j"), F.col("jb.bucket").alias("bucket")
    ).agg(F.sum("_w").alias("cnt"))


def cms_lookup(
    cms: DataFrame,
    items: DataFrame,
    value_col: str,
    w: int = 1024,
    seeds: tuple[int, ...] = CMS_SEEDS,
) -> DataFrame:
    """Point-query the sketch for each item: min over the d row
    counters — the classic one-sided estimate (cms_est >= true count,
    always). One broadcast join of the d*w-row sketch against the
    exploded (item, j, bucket) probes; never touches the corpus."""
    from h3ron_spark.pipeline.sqlexpr import cms_probes_sql

    probes = items.select(
        "*",
        F.explode(F.expr(cms_probes_sql(value_col, w, seeds))).alias("jb"),
    )
    joined = probes.join(
        F.broadcast(cms),
        (F.col("jb.j") == cms.j) & (F.col("jb.bucket") == cms.bucket),
    )
    item_cols = [c for c in items.columns]
    return joined.groupBy(*item_cols).agg(
        F.min("cnt").alias("cms_est")
    )


# ---------------------------------------------------------------------
# Bloom filter (Bloom 1970) — set membership, the fourth sketch:
# HLL = cardinality, KMV = overlap, CMS = frequency, Bloom = membership
# ---------------------------------------------------------------------

BLOOM_SEEDS = (201, 202, 203)


def _bloom_pos(value: Column, seed: int, m_bits: int) -> Column:
    """Bit position for one hash function: the repo's per-seed integer
    mix of the md5 base hash (dedup._shingle_hash — DuckDB twin
    queries_h3._hash_sql) reduced mod m, made non-negative identically
    in both engines."""
    from h3ron_spark.pipeline.dedup import _mix_hash, shingle_base_hash

    mixed = _mix_hash(shingle_base_hash(value), seed)
    return ((mixed % m_bits) + m_bits) % m_bits


def bloom_build(
    df: DataFrame,
    value_col: str,
    m_words: int = 256,
    seeds: tuple[int, ...] = BLOOM_SEEDS,
) -> DataFrame:
    """Build an m_words*64-bit Bloom filter over string ``value_col``:
    k = len(seeds) bit positions per value, OR-folded into words of
    63 usable bits (shift counts stay 0..62: DuckDB range-checks
    1 << 63 while Spark wraps — 63-bit words keep the two engines on
    arithmetic they agree on). ONE map-side-combinable aggregate (bit_or) producing at
    most m_words rows of state regardless of corpus size; filters of
    shards merge by bit_or on the same word grid (:func:`bloom_merge`).

    The 100-TB membership story: an exact broadcast set of eval-bench
    n-grams stops fitting in executor memory long before the corpus
    does; a Bloom filter is a fixed, tunable budget (m_words*8 bytes)
    with a one-sided guarantee — no false negatives, measurable false
    positives — which is the correct direction for decontamination
    (over-flagging is reviewable; under-flagging leaks eval data).
    """
    from h3ron_spark.pipeline.sqlexpr import bloom_pos_array_sql

    m_bits = m_words * 63
    pos = df.select(
        F.explode(
            F.expr(bloom_pos_array_sql(value_col, m_bits, seeds))
        ).alias("pos")
    )
    return (
        pos.groupBy(F.expr("pos div 63").alias("word"))
        .agg(
            F.expr("bit_or(shiftleft(1L, CAST(pos % 63 AS INT)))").alias(
                "bits"
            )
        )
    )


def bloom_merge(filters: DataFrame) -> DataFrame:
    """Merge per-shard filters (same m_words/seeds) by word-wise OR."""
    return filters.groupBy("word").agg(F.expr("bit_or(bits)").alias("bits"))


def bloom_contains(
    bloom: DataFrame,
    items: DataFrame,
    value_col: str,
    m_words: int = 256,
    seeds: tuple[int, ...] = BLOOM_SEEDS,
) -> DataFrame:
    """Probe each item against the filter: present iff ALL k probe
    bits are set. One broadcast join of the <=m_words-row filter
    against the exploded probes — the corpus-side scan never shuffles.
    Adds a boolean ``bloom_maybe`` column (true = possibly in the set,
    false = DEFINITELY not — the Bloom guarantee)."""
    from h3ron_spark.pipeline.sqlexpr import bloom_pos_array_sql

    m_bits = m_words * 63
    probes = items.select(
        "*",
        F.explode(
            F.expr(bloom_pos_array_sql(value_col, m_bits, seeds))
        ).alias("pos"),
    )
    joined = probes.join(
        F.broadcast(bloom),
        F.expr("pos div 63") == F.col("word"),
        "left",
    )
    # shiftright() takes a literal count in the classic API; the
    # variable-count shift is an SQL expression
    hit = (
        F.expr(
            "shiftright(coalesce(bits, 0L), CAST(pos % 63 AS INT)) & 1"
        )
        == 1
    )
    item_cols = list(items.columns)
    return joined.groupBy(*item_cols).agg(
        (F.min(hit.cast("int")) == 1).alias("bloom_maybe")
    )


def bloom_oracle_sql(
    build_values: str,
    probe_values: str,
    m_words: int = 256,
    seeds: tuple[int, ...] = BLOOM_SEEDS,
) -> str:
    """DuckDB replica of bloom_build + bloom_contains over two
    one-column subqueries ``build_values``/``probe_values`` (each must
    yield column ``v`` VARCHAR). Returns (v, bloom_maybe)."""
    from h3ron_spark.queries_h3 import _hash_sql

    m_bits = m_words * 63
    pos_exprs = ", ".join(
        f"(({_hash_sql('v', seed)} % {m_bits}) + {m_bits}) % {m_bits}"
        for seed in seeds
    )
    return f"""
  WITH bpos AS (
    SELECT unnest([{pos_exprs}]) AS pos FROM ({build_values})
  ), filt AS (
    SELECT pos // 63 AS word,
           bit_or(1::BIGINT << CAST(pos % 63 AS INTEGER)) AS bits
    FROM bpos GROUP BY 1
  ), probes AS (
    SELECT v, unnest([{pos_exprs}]) AS pos FROM ({probe_values})
  )
  SELECT p.v,
         min(CASE WHEN ((coalesce(f.bits, 0) >> CAST(p.pos % 63 AS INTEGER)) & 1) = 1
                  THEN 1 ELSE 0 END) = 1 AS bloom_maybe
  FROM probes p LEFT JOIN filt f ON p.pos // 63 = f.word
  GROUP BY p.v
"""


# ---------------------------------------------------------------------
# Log-scale (HDR-style) histogram — the fifth sketch: quantiles.
# HLL = cardinality, KMV = overlap, CMS = frequency, Bloom =
# membership, HDR histogram = distribution/quantiles.
# ---------------------------------------------------------------------


def hdr_bucket(value_name: str, sub_bits: int = 5) -> Column:
    """Deterministic log-scale bucket id for a non-negative value
    column (HDR-histogram layout, Gray & Tene's public design):
    values floor to integers; 0..2^sub_bits-1 map to themselves
    (exact); larger values split per power of two into 2^sub_bits
    linear sub-buckets:

      exp  = bitlen(floor(v)) - 1          (integer, via bin length)
      sub  = floor(v) >> (exp - sub_bits)  (top sub_bits+1 bits)
      id   = (exp - sub_bits) * 2^sub_bits + sub

    Monotone and contiguous across ranges; every step is integer bit
    math both engines compute identically — no float log2. Bucket
    width is < 2^-sub_bits relative (~3% at sub_bits=5). Negative
    values bucket to NULL (callers filter). Takes a column NAME (the
    variable-count shift is an SQL expression)."""
    m = 1 << sub_bits
    v = f"CAST(floor({value_name}) AS BIGINT)"
    nb = f"length(bin({v}))"
    return F.expr(
        f"CASE WHEN {v} < 0 THEN NULL "
        f"WHEN {v} < {m} THEN {v} "
        f"ELSE ({nb} - 1 - {sub_bits}) * {m} "
        f"     + shiftright({v}, CAST({nb} - 1 - {sub_bits} AS INT)) END"
    ).cast("long")


def hdr_bucket_low(bucket_name: str, sub_bits: int = 5) -> Column:
    """Inclusive lower bound of a bucket id (inverse of hdr_bucket):
    ids < 2^sub_bits are exact values; above, the id decomposes as
    e = id div 2^sub_bits, s = id mod 2^sub_bits with
    low = (2^sub_bits + s) << (e - 1)."""
    m = 1 << sub_bits
    b = bucket_name
    return F.expr(
        f"CASE WHEN {b} < {m} THEN CAST({b} AS BIGINT) "
        f"ELSE shiftleft(CAST({m} + {b} % {m} AS BIGINT), "
        f"               CAST({b} div {m} - 1 AS INT)) END"
    ).cast("long")


def hdr_histogram(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    sub_bits: int = 5,
) -> DataFrame:
    """Per-group log-scale histogram: (group, bucket) -> count, from
    ONE map-side-combinable aggregate. State per group is bounded by
    ~(bitwidth - sub_bits + 1) * 2^sub_bits buckets (~1.9k at 64-bit /
    sub_bits=5) no matter the row count — the fixed-budget shape that
    lets a 100-TB corpus keep per-source latency/size distributions as
    a tiny mergeable table (:func:`hdr_merge` sums shard counts)."""
    return (
        df.select(*group_cols, hdr_bucket(value_col, sub_bits).alias("bucket"))
        .filter(F.col("bucket").isNotNull())
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hdr_merge(hists: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge histograms to coarser groups by summing bucket counts."""
    return hists.groupBy(*group_cols, "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def hdr_quantiles(
    hist: DataFrame,
    group_cols: list[str],
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    sub_bits: int = 5,
) -> DataFrame:
    """Estimate quantiles from a histogram frame: rank r(q) =
    ceil(q * n) over the bucket-ordered cumulative counts; the answer
    is the LOWER BOUND of the first bucket whose cumulative count
    reaches r — a deterministic integer (within one bucket width,
    <2^-sub_bits relative, of the true quantile). All window + integer
    math on <=2k rows per group."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("bucket")
    # checkpoint the cumulative frame (<= 2k rows per group): the
    # per-quantile loop below references it once per q, and Catalyst
    # does not CSE subtrees, so without this every quantile re-ran
    # the caller's full histogram aggregation — 3 corpus scans for
    # the default (p50, p90, p99) in sketch_hdr_quantiles' and
    # pipeline_drift_report's plans. Dynamic-allocation caveat: see
    # the package docstring.
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy(*group_cols))
    ).localCheckpoint()
    out = None
    for q in qs:
        rank = F.ceil(F.lit(q) * F.col("n"))
        first = (
            cum.filter(F.col("cum") >= rank)
            .groupBy(*group_cols)
            .agg(F.min("bucket").alias("bucket"))
            .select(
                *group_cols,
                F.lit(q).alias("q"),
                hdr_bucket_low("bucket", sub_bits).alias("q_low"),
            )
        )
        out = first if out is None else out.unionByName(first)
    return out


def hdr_oracle_sql(
    value_expr: str,
    group_cols: list[str],
    table: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    sub_bits: int = 5,
) -> str:
    """DuckDB replica of hdr_histogram + hdr_quantiles (shared with
    the query oracle). Same integer bucket math via bin()-length."""
    m = 1 << sub_bits
    g = ", ".join(group_cols)
    q_rows = ", ".join(f"({q!r})" for q in qs)
    return f"""
  WITH vals AS (
    SELECT {g}, CAST(floor({value_expr}) AS BIGINT) AS v FROM {table}
    WHERE {value_expr} >= 0
  ), bucketed AS (
    SELECT {g},
           CASE WHEN v < {m} THEN v
                ELSE (length(bin(v)) - 1 - {sub_bits}) * {m}
                     + (v >> CAST(length(bin(v)) - 1 - {sub_bits} AS INTEGER))
           END AS bucket
    FROM vals
  ), hist AS (
    SELECT {g}, bucket, count(*) AS cnt FROM bucketed GROUP BY {g}, bucket
  ), cum AS (
    SELECT {g}, bucket, cnt,
           sum(cnt) OVER (PARTITION BY {g} ORDER BY bucket) AS cum,
           sum(cnt) OVER (PARTITION BY {g}) AS n
    FROM hist
  ), qs(q) AS (VALUES {q_rows})
  SELECT {g}, q,
         CAST(CASE WHEN b < {m} THEN b
              ELSE ({m} + (b % {m})) * CAST(pow(2.0, b // {m} - 1) AS BIGINT)
         END AS BIGINT) AS q_low
  FROM (
    SELECT {g}, q, min(bucket) AS b
    FROM cum CROSS JOIN qs
    WHERE cum >= ceil(q * n)
    GROUP BY {g}, q
  )
"""


def kmv_set_cardinalities(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Distinct-cardinality estimates for every group pair's UNION and
    INTERSECTION from the KMV sketches alone (Bar-Yossef et al. 2002;
    the theta-sketch set algebra): take the k smallest hashes of the
    merged pair, then

      |A u B| ~ (k-1) * 2^60 / kth_min_hash   (saturated)
      |A u B| = union_k                        (unsaturated: the
                                               sketch IS the set)
      |A n B| ~ jaccard_est * |A u B|

    Cross-engine determinism: the only float ops are one int->double
    conversion (IEEE round-nearest, identical in Spark and DuckDB),
    one multiply by an exact power of two, one divide, one multiply —
    each correctly rounded, no summation-order freedom — and the
    emitted columns are FLOORED to BIGINT. Everything runs on
    |groups|^2/2 * k sketch rows; the corpus is never rescanned."""
    from pyspark.sql import Window

    # ONE pass over the pair-merged sketch rows: inter/union counts,
    # the jaccard, AND the kth retained hash come from the same kept
    # frame (the sketch itself is materialized once by the caller or
    # recomputed once here — never per metric)
    sketch = sketch.localCheckpoint()
    groups = sketch.select(F.col("g")).distinct()
    pairs = (
        groups.alias("a")
        .join(groups.alias("b"), F.col("a.g") < F.col("b.g"))
        .select(F.col("a.g").alias("g1"), F.col("b.g").alias("g2"))
    )
    rows = pairs.join(
        sketch.alias("s"),
        (F.col("s.g") == F.col("g1")) | (F.col("s.g") == F.col("g2")),
    )
    merged = rows.groupBy("g1", "g2", "h").agg(
        F.max((F.col("s.g") == F.col("g1")).cast("int")).alias("in1"),
        F.max((F.col("s.g") == F.col("g2")).cast("int")).alias("in2"),
    )
    win = Window.partitionBy("g1", "g2").orderBy("h")
    kept = merged.withColumn("_rk", F.row_number().over(win)).filter(
        F.col("_rk") <= k
    )
    agg = kept.groupBy("g1", "g2").agg(
        F.sum(F.col("in1") * F.col("in2")).cast("int").alias("inter_k"),
        F.count(F.lit(1)).cast("int").alias("union_k"),
        (F.sum(F.col("in1") * F.col("in2")) / F.count(F.lit(1))).alias(
            "_jacc"
        ),
        F.max("h").alias("kth"),
    )
    est_u = F.when(
        F.col("union_k") < k, F.col("union_k").cast("double")
    ).otherwise(
        F.lit(float(k - 1))
        * F.lit(float(1 << 60))
        / F.col("kth").cast("double")
    )
    return agg.select(
        "g1",
        "g2",
        "inter_k",
        "union_k",
        F.floor(est_u).cast("long").alias("est_union"),
        F.floor(F.col("_jacc") * est_u).cast("long").alias("est_inter"),
    )


def kmv_setops_oracle_sql(
    value_expr: str,
    group_col: str,
    table: str,
    k: int = 64,
) -> str:
    """DuckDB replica of kmv_sketch + kmv_set_cardinalities, extended
    from kmv_overlap_oracle_sql with the kth-hash branch."""
    return f"""
  WITH distinct_h AS (
    SELECT {group_col} AS g,
           ('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, 15))::BIGINT AS h
    FROM {table} GROUP BY 1, 2
  ), sk AS (
    SELECT g, h FROM (
      SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rk
      FROM distinct_h
    ) WHERE rk <= {k}
  ), pairs AS (
    SELECT a.g AS g1, b.g AS g2
    FROM (SELECT DISTINCT g FROM sk) a
    JOIN (SELECT DISTINCT g FROM sk) b ON a.g < b.g
  ), merged AS (
    SELECT p.g1, p.g2, s.h,
           max(CASE WHEN s.g = p.g1 THEN 1 ELSE 0 END) AS in1,
           max(CASE WHEN s.g = p.g2 THEN 1 ELSE 0 END) AS in2
    FROM pairs p JOIN sk s ON s.g = p.g1 OR s.g = p.g2
    GROUP BY p.g1, p.g2, s.h
  ), kept AS (
    SELECT * FROM (
      SELECT g1, g2, h, in1, in2,
             row_number() OVER (PARTITION BY g1, g2 ORDER BY h) AS rk
      FROM merged
    ) WHERE rk <= {k}
  ), agg AS (
    SELECT g1, g2,
           CAST(sum(in1 * in2) AS INTEGER) AS inter_k,
           CAST(count(*) AS INTEGER) AS union_k,
           CAST(sum(in1 * in2) AS DOUBLE) / count(*) AS jacc,
           max(h) AS kth
    FROM kept GROUP BY g1, g2
  )
  SELECT g1, g2, inter_k, union_k,
         CAST(floor(CASE WHEN union_k < {k} THEN CAST(union_k AS DOUBLE)
              ELSE CAST({float(k - 1)!r} AS DOUBLE)
                   * CAST({float(1 << 60)!r} AS DOUBLE) / CAST(kth AS DOUBLE)
         END) AS BIGINT) AS est_union,
         CAST(floor(jacc * (CASE WHEN union_k < {k} THEN CAST(union_k AS DOUBLE)
              ELSE CAST({float(k - 1)!r} AS DOUBLE)
                   * CAST({float(1 << 60)!r} AS DOUBLE) / CAST(kth AS DOUBLE)
         END)) AS BIGINT) AS est_inter
  FROM agg
"""
