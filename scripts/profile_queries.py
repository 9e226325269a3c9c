"""Per-query profiling for the optimization rounds (guide §1): split
each bench query's wall time into DRIVER BUILD (registry fn call —
Column-tree assembly + py4j), ANALYSIS (schema touch forces the
analyzer), and EXECUTION (noop-sink writes, min of N — guide §1.4),
and optionally dump .explain("formatted") to a plans/ directory.

Usage:
  python scripts/profile_queries.py [--queries a,b,c] [--runs 3] \
      [--sf-dir /root/testdata/sf0.1] [--plans plans/r11 --suffix _before]

Prints one line per query: name, build_s, analyze_s, exec_best_s,
exec_all. Steal%% is stamped per query so a co-tenant window is
visible in the output itself (same signal as bench.py floors).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from h3ron_spark import queries as Q  # noqa: E402
from h3ron_spark.session import get_spark  # noqa: E402
from bench import _cpu_times, _steal_pct  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans", default="")
    ap.add_argument("--suffix", default="_before")
    args = ap.parse_args()

    spark = get_spark(app_name="h3ron_spark-profile")
    spark.sparkContext.setLogLevel("ERROR")
    registry = Q.queries()
    if args.queries:
        names = [q.strip() for q in args.queries.split(",") if q.strip()]
        unknown = [n for n in names if n not in registry]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
    else:
        from bench import BENCH_QUERIES
        names = [n for n in BENCH_QUERIES if n in registry]

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)

    print(f"{'query':34s} {'build':>7s} {'analyze':>7s} {'exec_best':>9s}"
          f"  runs (steal%)")
    for name in names:
        spark.sparkContext.setJobDescription(f"profile: {name}")
        cpu0 = _cpu_times()
        t0 = time.perf_counter()
        df = registry[name](spark, args.sf_dir)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = df.schema  # forces analysis
        t_analyze = time.perf_counter() - t0
        if args.plans:
            jmode = (spark._jvm.org.apache.spark.sql.execution
                     .ExplainMode.fromString("formatted"))
            plan = df._jdf.queryExecution().explainString(jmode)
            out = os.path.join(args.plans, f"{name}{args.suffix}.txt")
            with open(out, "w") as f:
                f.write(plan)
        execs = []
        for _ in range(max(1, args.runs)):
            t0 = time.perf_counter()
            # rebuild the DataFrame each run so a run measures the
            # full per-invocation cost path a fleet pays (build is
            # reported separately above from the first construction)
            registry[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite").save()
            execs.append(time.perf_counter() - t0)
        steal = _steal_pct(cpu0, _cpu_times())
        runs_s = "/".join(f"{e:.2f}" for e in execs)
        print(f"{name:34s} {t_build:7.3f} {t_analyze:7.3f} "
              f"{min(execs):9.3f}  {runs_s} ({steal})", flush=True)
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
