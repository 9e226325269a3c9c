"""Measure the editdistance-join scale claim on Zipfian text
(VERDICT r7 "Next round" #2 — the one argued-not-measured scale
statement in the repo).

Claim under test (dedup_editdistance_join docstring): on Zipfian
corpora an ABSOLUTE df cap keeps the q-gram inverted-index pair work
OUTPUT-BOUND — pair candidates grow ~linearly with corpus size (the
winnowing contract), unlike the uniform synthetic vocabulary where
every gram's df grows linearly and pair work grows ~quadratically
(measured r7: 13.2M pair rows at 5k docs -> 1.3B at 50k docs).

Method: build Zipf(1.07, 30k-vocab) documents at two sizes a decade
apart, run dedup_editdistance_join with the production absolute cap
(_df_cap_mode="absolute"), and record for each size:
  - pair_work: sum over capped grams of C(df, 2) — the exact row
    count of the inverted-index self-join before the shared-gram
    threshold (computed independently in DuckDB from the same
    base+planted gram recipe, so the metric cannot be distorted by
    Spark-side plan differences)
  - result rows + twin recall (planted twins recovered / planted)
  - wall seconds for the full Spark query

Usage: python scripts/measure_editdistance_zipf.py [n_small] [factor]
Defaults: 50_000 docs and 10x (one decade, matching the sf1->sf10
doc counts of the replica scale builds).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

# repo root (h3ron_spark imports) AND scripts/ (build_scale_testdata
# import — only resolved implicitly before because CPython prepends
# the script's own directory under `python scripts/...`; `python -m`
# or an import of this module needs it explicit, ADVICE r8)
_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from build_scale_testdata import build_zipf_documents  # noqa: E402

PAIR_WORK_SQL = """
  WITH base AS (
    SELECT doc_id, substr(trim(text), 1, 48) AS s
    FROM read_parquet('{path}')
    WHERE len(trim(text)) >= 24
  ), keys AS (
    SELECT doc_id, s FROM base
    UNION ALL
    SELECT doc_id + (1::BIGINT << 40),
           substr(s, 1, 8) || 'zq' || substr(s, 11, 20)
             || 'qz' || substr(s, 33, 16)
    FROM base WHERE doc_id % 10 = 0 AND len(s) = 48
  ), grams_all AS (
    SELECT DISTINCT doc_id, substr(s, t.i, 5) AS g
    FROM keys, range(1, 45) t(i)
    WHERE t.i + 4 <= len(s)
  ), dfs AS (
    SELECT g, count(*) AS df FROM grams_all GROUP BY g
  )
  SELECT count(*) FILTER (df <= 50)            AS capped_grams,
         count(*)                              AS total_grams,
         sum(df * (df - 1) // 2) FILTER (df <= 50) AS pair_work,
         sum(df * (df - 1) // 2)               AS pair_work_uncapped,
         (SELECT count(*) FROM base
          WHERE doc_id % 10 = 0 AND len(s) = 48) AS planted
  FROM dfs
"""


def measure(spark, path: Path, n_docs: int) -> dict:
    import duckdb

    import h3ron_spark.queries_h3 as QH

    stats = (
        duckdb.connect()
        .execute(PAIR_WORK_SQL.format(path=path / "documents.parquet"))
        .fetchone()
    )
    t0 = time.monotonic()
    res = QH.dedup_editdistance_join(
        spark, str(path), _df_cap_mode="absolute"
    ).collect()
    wall = time.monotonic() - t0
    # planted = the twins the query ACTUALLY derives (doc_id % 10 == 0
    # AND a full 48-char key), counted by the same SQL recipe — not
    # the naive n_docs/10, which overstates the denominator for docs
    # whose text is shorter than the key window
    planted = int(stats[4])
    twins = sum(1 for r in res if r["id_b"] - r["id_a"] == (1 << 40))
    return {
        "n_docs": n_docs,
        "capped_grams": stats[0],
        "total_grams": stats[1],
        "pair_work": int(stats[2]),
        "pair_work_uncapped": int(stats[3]),
        "result_rows": len(res),
        "twin_recall": f"{twins}/{planted}",
        "wall_sec": round(wall, 2),
    }


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    root = Path("/tmp/h3ron_zipf")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for n in (n_small, n_small * factor):
        d = root / f"docs{n}"
        if not (d / "documents.parquet").exists():
            build_zipf_documents(d, n)
        rows.append(measure(spark, d, n))
        print(rows[-1], flush=True)
    a, b = rows
    print(
        f"\npair_work growth for {factor}x docs: "
        f"{b['pair_work'] / max(a['pair_work'], 1):.1f}x "
        f"(output-bound/linear = ~{factor}x; quadratic = ~{factor**2}x)"
    )
    print(
        "uncapped pair_work (what the cap avoids): "
        f"{a['pair_work_uncapped']:,} -> {b['pair_work_uncapped']:,}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
