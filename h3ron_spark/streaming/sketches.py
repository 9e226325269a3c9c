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

import hashlib

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


def _hash_u60_py(value) -> int:
    """Bit-exact twin of sketch.hash_u60 (Spark md5+conv, DuckDB
    substr(md5)::BIGINT): md5 of the value's string form, first 15
    hex chars, base 16."""
    return int(hashlib.md5(str(value).encode()).hexdigest()[:15], 16)


def _make_hll_fn(p: int):
    m = 1 << p
    width = 60 - p

    def fn(key, batches, state: GroupState):
        regs = list(state.get[0]) if state.exists else [0] * m
        for pdf in batches:
            for v in pdf["value"]:
                h = _hash_u60_py(v)
                reg = h % m
                w = h >> p
                rho = (width + 1) if w == 0 else (width + 1 - w.bit_length())
                if rho > regs[reg]:
                    regs[reg] = rho
        state.update((regs,))
        rows = [
            (str(key[0]), r, regs[r]) for r in range(m) if regs[r] > 0
        ]
        yield pd.DataFrame(rows, columns=["key", "_reg", "_M"])

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
    src = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("string").alias("value"),
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
