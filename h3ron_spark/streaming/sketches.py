"""Streaming sketches via ``applyInPandasWithState``: monoid state.

The design rule that makes a streaming sketch ORACLE-EXACT: keep only
state that is a commutative monoid over rows (HLL registers merge by
max, CMS counters by sum, Bloom words by OR). Then the state after any
sequence of micro-batches equals the batch computation over the union
of rows — ordering, batch boundaries, and restarts cannot change the
answer, so the existing BATCH DuckDB oracle pins the streaming result
bit-for-bit. (Contrast: order-dependent state like "first-seen wins
under a Bloom filter" has no batch-equivalent SQL and only gets
rows-only checks.)

The Python kernel replicates ``pipeline/sketch.py``'s exact integer
hash recipe (md5 first-15-hex 60-bit base, register = low p bits, rho
via bit length) so the streamed registers are bit-identical to the JVM
expressions — finalization reuses the SAME ``hll_estimate`` code path
the batch query uses, keeping one float pipeline for both.

Scale shape: state is one 2^p-long register array per key (2 KiB at
p=8), independent of row volume; each batch emits at most the nonzero
registers (<= 2^p rows per key). The shuffle is the standard keyed
state-store exchange.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

HLL_ROWS_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("_reg", IntegerType()),
        StructField("_M", LongType()),
    ]
)

_HLL_STATE_SCHEMA = StructType(
    [StructField("regs", ArrayType(LongType()))]
)


def _make_hll_fn(p: int):
    m = 1 << p
    width = 60 - p

    def fn(key, batches, state: GroupState):
        import numpy as np

        regs = np.array(state.get[0], np.int64) if state.exists else np.zeros(
            m, np.int64
        )
        for pdf in batches:
            h = pdf["value_hash"].to_numpy(np.int64)
            if len(h) == 0:
                continue
            reg = h % m
            w = h >> p
            # bit length via frexp's exponent: exact for w <= 2^52
            # (60-bit hash >> 8), so rho needs no float log2
            e = np.frexp(w.astype(np.float64))[1]
            rho = np.where(w == 0, width + 1, width + 1 - e).astype(np.int64)
            np.maximum.at(regs, reg, rho)
        state.update((regs.tolist(),))
        nz = np.nonzero(regs)[0]
        yield pd.DataFrame(
            {
                "key": str(key[0]),
                "_reg": nz.astype("int32"),
                "_M": regs[nz],
            }
        )

    return fn


def hll_stream(
    df: DataFrame,
    value_col: str,
    key_col: str,
    p: int = 8,
) -> DataFrame:
    """Per-key streaming HLL register state: after each micro-batch the
    group emits its CURRENT nonzero registers. Because register max is
    a monoid, max-merging all emissions per (key, register) — or just
    keeping the last batch's rows — reproduces exactly the batch
    ``hll_registers`` over every row seen; finalize with the batch
    ``hll_estimate``."""
    # hash JVM-side (a stateless projection is legal before the
    # stateful operator): the Python kernel then does only vectorized
    # numpy integer ops — no per-row hashlib.md5, ~10x per-batch.
    # sketch.hash_u60 is the exact md5 recipe the batch path and the
    # DuckDB oracle share, so registers stay bit-identical.
    from h3ron_spark.pipeline.sketch import hash_u60

    src = df.select(
        F.col(key_col).cast("string").alias("key"),
        hash_u60(value_col).alias("value_hash"),
    )
    return src.groupBy("key").applyInPandasWithState(
        _make_hll_fn(p),
        HLL_ROWS_SCHEMA,
        _HLL_STATE_SCHEMA,
        # append: every batch's yielded rows land in the sink; the
        # max-merge finalization is duplicate-tolerant by monoid-ness
        "append",
        GroupStateTimeout.NoTimeout,
    )


CMS_ROWS_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("j", IntegerType()),
        StructField("bucket", IntegerType()),
        StructField("cnt", LongType()),
    ]
)

_CMS_STATE_SCHEMA = StructType(
    [StructField("counters", ArrayType(LongType()))]
)


def _make_cms_fn(d: int, w: int):
    def fn(key, batches, state: GroupState):
        import numpy as np

        counters = (
            np.array(state.get[0], np.int64).reshape(d, w)
            if state.exists
            else np.zeros((d, w), np.int64)
        )
        for pdf in batches:
            for j in range(d):
                b = pdf[f"bucket_{j}"].to_numpy(np.int64)
                if len(b):
                    np.add.at(counters[j], b, 1)
        state.update((counters.reshape(-1).tolist(),))
        jj, bb = np.nonzero(counters)
        yield pd.DataFrame(
            {
                "key": str(key[0]),
                "j": jj.astype("int32"),
                "bucket": bb.astype("int32"),
                "cnt": counters[jj, bb],
            }
        )

    return fn


def cms_stream(
    df: DataFrame,
    value_col: str,
    key_col: str,
    w: int = 1024,
    seeds: tuple[int, ...] | None = None,
) -> DataFrame:
    """Per-key streaming count-min sketch — the sum-monoid sibling of
    :func:`hll_stream`: counters only grow, every emission is the
    cumulative grid, and max-merging emissions per (key, j, bucket)
    (or keeping the last) equals the batch ``cms_build`` over all
    rows, so the batch oracle pins the stream. Buckets are computed
    JVM-side with the exact ``sketch._cms_bucket`` mix expressions;
    the Python kernel is one vectorized ``np.add.at`` per row of the
    d x w grid (32 KiB state per key at the defaults)."""
    from h3ron_spark.pipeline.sketch import CMS_SEEDS, _cms_bucket, hash_u60

    seeds = CMS_SEEDS if seeds is None else seeds
    h = hash_u60(value_col)
    src = df.select(
        F.col(key_col).cast("string").alias("key"),
        *[
            _cms_bucket(h, seed, w).cast("int").alias(f"bucket_{j}")
            for j, seed in enumerate(seeds)
        ],
    )
    return src.groupBy("key").applyInPandasWithState(
        _make_cms_fn(len(seeds), w),
        CMS_ROWS_SCHEMA,
        _CMS_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
