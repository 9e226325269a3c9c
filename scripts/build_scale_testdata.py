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


def main() -> None:
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
