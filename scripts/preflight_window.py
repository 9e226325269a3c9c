"""Pre-flight the driver window: replay every _DRIVER_ORDER_FIRST
query at the driver's sf (default sf0.01) and compare Spark vs the
DuckDB oracle the way the driver does — row count, column names, and
an order-insensitive value hash (columns sorted by name, rows sorted
by all columns, floats rounded to 9 dp before hashing).

    python scripts/preflight_window.py [--parallel N] [sf_dir] [name ...]

Exit code 0 only if every compared query matches.
"""
from __future__ import annotations

import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_run(sf_dir: str, sql: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def value_hash(pdf) -> str:
    pdf = pdf[sorted(pdf.columns)].copy()
    rows = []
    for tup in pdf.itertuples(index=False):
        cells = []
        for x in tup:
            if isinstance(x, float):
                if math.isnan(x):
                    cells.append("NaN")
                else:
                    # + 0.0 normalizes -0.0 to 0.0 so a signed-zero
                    # difference between engines can't flip the hash
                    cells.append(f"{round(x, 9) + 0.0:.9f}")
            elif isinstance(x, bool):
                cells.append(str(int(x)))
            else:
                cells.append(str(x))
        rows.append("\x1f".join(cells))
    rows.sort()
    return hashlib.md5("\x1e".join(rows).encode()).hexdigest()


def main() -> None:
    argv = list(sys.argv[1:])
    # --parallel N (VERDICT r7 #6): replay N queries concurrently in
    # ONE shared SparkSession (Spark schedules concurrent jobs from
    # threads fine) with a DuckDB connection per task (duck_run
    # already connects per call). Halves the ~15 min 50-entry window
    # replay at N=2. The stream_* queries are thread-safe here by
    # construction (ADVICE r8/r9): their memory-sink names come from
    # an atomic itertools.count, and each streaming run executes on a
    # PRIVATE cloned session (queries_h3._stream_session) whose
    # SQLConf carries the shuffle-partitions pin — the shared
    # session's conf is never written, so a concurrently-replayed
    # NON-stream query can never observe the override either.
    # Default stays sequential: the driver's own harness is
    # sequential, and ordered [i/N] output is easier to diff.
    workers = 1
    if "--parallel" in argv:
        i = argv.index("--parallel")
        workers = max(1, int(argv[i + 1]))
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    from h3ron_spark import queries as Q
    from h3ron_spark.session import get_spark

    spark = get_spark("preflight_window")
    spark.sparkContext.setLogLevel("ERROR")
    registry = Q.queries()
    oracles = Q.oracles()
    if only:
        # explicit names: replay ANY oracled queries (e.g. a future
        # round's rotation cohort), not just the current window
        names = [n for n in registry if n in only and n in oracles]
        unknown = only - set(names)
        if unknown:
            raise SystemExit(f"unknown/unoracled names: {sorted(unknown)}")
    else:
        names = list(Q._DRIVER_ORDER_FIRST)

    n_ok = 0
    failures: list[str] = []

    def check(name: str) -> tuple[bool, str]:
        sdf = registry[name](spark, sf_dir).toPandas()
        ddf = duck_run(sf_dir, oracles[name])
        rows_ok = len(sdf) == len(ddf)
        cols_ok = sorted(sdf.columns) == sorted(ddf.columns)
        hash_ok = rows_ok and cols_ok and (
            value_hash(sdf) == value_hash(ddf)
        )
        status = "OK" if hash_ok else "FAIL"
        return hash_ok, (
            f"{status} {name} rows={len(sdf)}/{len(ddf)} cols_ok={cols_ok}"
        )

    if workers > 1:
        from concurrent.futures import ThreadPoolExecutor

        def safe(name: str) -> tuple[str, bool, str]:
            try:
                ok, line = check(name)
                return name, ok, line
            except Exception as exc:  # noqa: BLE001
                return name, False, f"ERROR {name}: {exc}"

        with ThreadPoolExecutor(max_workers=workers) as pool:
            for i, (name, ok, line) in enumerate(
                pool.map(safe, names), 1
            ):
                if ok:
                    n_ok += 1
                else:
                    failures.append(name)
                print(f"[{i}/{len(names)}] {line}", flush=True)
    else:
        for i, name in enumerate(names, 1):
            try:
                ok, line = check(name)
                if ok:
                    n_ok += 1
                else:
                    failures.append(name)
                print(f"[{i}/{len(names)}] {line}", flush=True)
            except Exception as exc:  # noqa: BLE001
                failures.append(name)
                print(f"[{i}/{len(names)}] ERROR {name}: {exc}", flush=True)
    print(f"\npreflight: {n_ok}/{len(names)} exact", flush=True)
    if failures:
        print("failures:", ", ".join(failures), flush=True)
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
