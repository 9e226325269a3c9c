"""Build the 10x scale-proof dataset (synthetic "sf1") from sf0.1.

The driver ships sf{0.001,0.01,0.1}; the scale-proof point in
BASELINE.md needs one decade more. This replicates the three
data-proportional tables 10x with shifted keys and decorrelated
payloads (suffixed text, epsilon-shifted embeddings) so dedup/ANN
workloads stay realistic instead of collapsing into giant duplicate
groups; the remaining tables are copied verbatim.

Usage: python scripts/build_scale_testdata.py [out_root]
Writes <out_root>/sf1/*.parquet (default /tmp/h3ron_scale).
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import duckdb

SRC = Path("/root/testdata/sf0.1")
REPLICAS = 10

EVENTS_TPL = """
    SELECT event_id + {i} * {n} AS event_id, ts,
           user_id + {i} * 1000000 AS user_id,
           event_type, value, props
    FROM read_parquet('{src}/events.parquet')
"""
DOCS_TPL = """
    SELECT doc_id + {i} * {n} AS doc_id,
           CASE WHEN {i} = 0 THEN text ELSE text || ' r{i}' END AS text,
           lang, source,
           CASE WHEN {i} = 0 THEN n_chars
                ELSE n_chars + {suffix_len} END AS n_chars
    FROM read_parquet('{src}/documents.parquet')
"""
VECS_TPL = """
    SELECT vec_id + {i} * {n} AS vec_id,
           list_transform(embedding,
               x -> (x + {i} * 0.0001)::FLOAT) AS embedding,
           label
    FROM read_parquet('{src}/embeddings.parquet')
"""


def _base26(i: int) -> str:
    """Rank -> word: 0='a', 25='z', 26='ba', ... Short words for
    common ranks (Zipf's law of abbreviation), so a 48-char key
    window holds ~10 words and ~9 cross-word gram boundaries."""
    s = ""
    while True:
        s = chr(ord("a") + i % 26) + s
        i //= 26
        if i == 0:
            return s


def build_zipf_documents(out_dir: Path, n_docs: int, seed: int = 8) -> None:
    """A Zipf-distributed documents table (BASELINE.md round 8): the
    uniform ~20-word vocabulary of the driver testdata makes every
    q-gram's doc frequency grow linearly with corpus size, which is
    the one property that breaks absolute df caps (see
    dedup_editdistance_join's docstring). Real corpora are Zipfian:
    word rank r has probability ~ r^-1.07 over a 30k vocabulary, so
    rare words — and rarer still, cross-word character 5-gram
    combinations — exist at EVERY corpus size. 22 words/doc keeps nearly every
    doc above the 48-char key window (so twins actually get
    planted) and the window dense in word boundaries. Deterministic
    (fixed seed + stable numpy generator): retries rebuild the same
    corpus bit-for-bit."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    vocab_n = 30_000
    words_per_doc = 22
    ranks = np.arange(1, vocab_n + 1, dtype=np.float64)
    p = ranks ** -1.07
    p /= p.sum()
    rng = np.random.default_rng(seed)
    draws = rng.choice(vocab_n, size=n_docs * words_per_doc, p=p).reshape(
        n_docs, words_per_doc
    )
    vocab = np.array([_base26(i) for i in range(vocab_n)])
    texts = [" ".join(row) for row in vocab[draws]]
    out_dir.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n_docs, pa.string()),
                "source": pa.array(
                    [f"zipf{i % 4}" for i in range(n_docs)], pa.string()
                ),
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
        out_dir / "documents.parquet",
    )
    print("zipf documents:", n_docs, "->", out_dir)


def main() -> None:
    # zipf mode: build_scale_testdata.py --zipf <out_dir> <n_docs>
    if len(sys.argv) > 1 and sys.argv[1] == "--zipf":
        build_zipf_documents(Path(sys.argv[2]), int(sys.argv[3]))
        return
    # usage: build_scale_testdata.py [out_root] [replicas] [label]
    # defaults reproduce the original sf1 decade (10 replicas); the
    # sf10 decade (VERDICT r5 #6) is `... /tmp/h3ron_scale 100 sf10`
    # -> 10M events / 500k docs / 200k embeddings.
    out_root = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/h3ron_scale")
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else REPLICAS
    label = sys.argv[3] if len(sys.argv) > 3 else "sf1"
    out = out_root / label
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    def count(table: str) -> int:
        return con.execute(
            f"SELECT count(*) FROM read_parquet('{SRC}/{table}.parquet')"
        ).fetchone()[0]

    for table, tpl in (
        ("events", EVENTS_TPL),
        ("documents", DOCS_TPL),
        ("embeddings", VECS_TPL),
    ):
        n = count(table)
        # suffix_len: DOCS_TPL appends ' r{i}' — 2 + len(str(i)) chars
        # (was a flat +3, which broke the n_chars == len(text)
        # invariant for replicas i >= 10 in multi-decade builds)
        union = " UNION ALL ".join(
            tpl.format(i=i, n=n, src=SRC, suffix_len=2 + len(str(i)))
            for i in range(replicas)
        )
        con.execute(
            f"COPY ({union}) TO '{out}/{table}.parquet' (FORMAT parquet)"
        )
        got = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet')"
        ).fetchone()[0]
        print(table, got)

    for t in "region nation customer supplier part orders lineitem".split():
        shutil.copyfile(SRC / f"{t}.parquet", out / f"{t}.parquet")
    print("wrote", out)


if __name__ == "__main__":
    main()
