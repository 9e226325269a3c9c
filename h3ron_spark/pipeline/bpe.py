"""Distributed BPE tokenizer training (Sennrich et al. 2016).

The 100-TB formulation: byte-pair merges are a function of the WORD
FREQUENCY TABLE, not the corpus — so the corpus is scanned exactly
once (whitespace words -> groupBy count), and every merge iteration
runs over the vocab frame (|distinct words| rows, millions not
billions; Zipf guarantees the table is tiny next to the corpus).
Each iteration is:

1. explode adjacent symbol pairs of each vocab word, weighted by the
   word's corpus count — one Generate + one map-side-combinable agg;
2. take the argmax pair with a FULLY deterministic tie-break
   (count desc, then lexicographic pair) — one bounded driver row,
   the same bounded-model-state pattern as ``kmeans_fit``;
3. rewrite the vocab's symbol arrays, merging every adjacent
   occurrence of that pair (left-to-right, non-overlapping — the
   reference semantics) in an Arrow-batched kernel.

The vocab frame is localCheckpointed per iteration (bounded rows,
flat lineage). Encoding applies the learned merges greedily by rank —
the standard BPE encode — as an Arrow kernel over any text column.

Determinism: counts are integer sums, the tie-break is total, and the
merge rewrite is order-free across words — the merge list is
bit-identical across partitionings and retries, which the unit test
pins against an independent single-process reference implementation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

END = "▁"  # end-of-word sentinel (visible, never in test corpora)


def _merge_adjacent(syms: list, a: str, b: str) -> list:
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _apply_merge_udf(a: str, b: str):
    """Arrow kernel rewriting every adjacent (a, b) to the merged
    symbol. Factory (not a loop closure): binds a/b at creation."""

    @F.pandas_udf(ArrayType(StringType()))
    def apply_merge(col: pd.Series) -> pd.Series:
        return col.map(lambda s: _merge_adjacent(list(s), a, b))

    return apply_merge


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus scan: ``(symbols array<string>, n)`` word-frequency
    frame with each word split to characters + end sentinel."""

    @F.pandas_udf(ArrayType(StringType()))
    def chars(words: pd.Series) -> pd.Series:
        return words.map(lambda w: list(w) + [END])

    words = df.select(
        F.explode(F.split(F.trim(text_col), r"\s+")).alias("w")
    ).filter(F.length("w") > 0)
    return (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(chars("w").alias("symbols"), "n")
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 50,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merge rules from the corpus; returns the
    ordered merge list (the model — persist it anywhere)."""
    vocab = word_vocab(df, text_col).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = (
            vocab.select(
                "n",
                F.explode(
                    F.zip_with(
                        F.slice("symbols", 1, F.size("symbols") - 1),
                        F.slice("symbols", 2, F.size("symbols") - 1),
                        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                    )
                ).alias("p"),
            )
            .groupBy("p")
            .agg(F.sum("n").alias("cnt"))
        )
        top = pairs.orderBy(
            F.col("cnt").desc(), F.col("p.a"), F.col("p.b")
        ).limit(1).collect()
        if not top or top[0]["cnt"] < 2:
            break
        a, b = top[0]["p"]["a"], top[0]["p"]["b"]
        merges.append((a, b))

        vocab = vocab.select(
            _apply_merge_udf(a, b)("symbols").alias("symbols"), "n"
        ).localCheckpoint()
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply learned merges greedily by rank (standard BPE encode) to
    ``text_col``; merges broadcast inside the Arrow kernel closure."""
    rank = {tuple(m): i for i, m in enumerate(merges)}

    def encode_word(w: str) -> list:
        syms = list(w) + [END]
        while len(syms) > 1:
            best = None
            for i in range(len(syms) - 1):
                r = rank.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best[0]):
                    best = (r, i)
            if best is None:
                break
            a, b = merges[best[0]]
            syms = _merge_adjacent(syms, a, b)
        return syms

    @F.pandas_udf(ArrayType(StringType()))
    def encode(texts: pd.Series) -> pd.Series:
        import re

        return texts.map(
            lambda t: [
                s
                for w in re.split(r"\s+", t.strip())
                if w
                for s in encode_word(w)
            ]
        )

    return df.withColumn(out_col, encode(text_col))


def save_merges(
    spark, merges: list[tuple[str, str]], path: str
) -> None:
    """Persist the learned merge list as a rank-ordered parquet table
    (the model artifact — same pattern as similarity.save_quantizer)."""
    spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, a string, b string",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_merges(spark, path: str) -> list[tuple[str, str]]:
    """Load a merge list saved by :func:`save_merges`, rank order
    restored exactly."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r["a"], r["b"]) for r in rows]
