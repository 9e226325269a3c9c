"""Hunt a clean official bench capture on a co-tenant-bursty host.

The round-9-pinned adjudication protocol trusts hypervisor STEAL
ticks, not loadavg (the bench's own executors push loadavg to 5-16
on an otherwise idle box). This loop (r11 methodology — it took 13
captures to land one with every floor stamp <= 0.14%):

1. gates on two consecutive clean minutes (steal <= 0.25%),
2. runs ``bench.py`` with the driver's env contract,
3. adjudicates the full record (``BENCH_LAST.local.json``) by
   capture-wide steal + per-floor ``floor_steal`` + the
   ``floor_degraded`` flags bench.py stamps itself,
4. repeats until official-grade (capture steal <= 0.5%, every floor
   <= 0.5%) or the deadline.

Usage:
    python scripts/hunt_clean_capture.py [max_hours]

Each attempt's full record is preserved as
``/tmp/bench_attempt{N}.local.json`` so clean-stamped floors from
near-miss captures remain available as corroborating evidence.
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE_STEAL = 0.25
OK_STEAL = 0.5


def _cpu() -> tuple[int, int]:
    parts = open("/proc/stat").readline().split()
    vals = [int(x) for x in parts[1:]]
    return vals[7], sum(vals[:8])


def _steal_over(sec: float) -> float:
    s0, t0 = _cpu()
    time.sleep(sec)
    s1, t1 = _cpu()
    return 100.0 * (s1 - s0) / (t1 - t0)


def main() -> None:
    hours = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    deadline = time.time() + hours * 3600
    os.chdir(REPO)
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        ),
        SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"),
    )
    attempt = 0
    while time.time() < deadline:
        a = _steal_over(60)
        if a > GATE_STEAL:
            print(time.strftime("%H:%M:%S"), f"gate: steal {a:.2f} — wait",
                  flush=True)
            continue
        b = _steal_over(60)
        if b > GATE_STEAL:
            continue
        attempt += 1
        print(time.strftime("%H:%M:%S"),
              f"attempt {attempt}: launching (gate {a:.2f}/{b:.2f})",
              flush=True)
        t_launch = time.time()
        with open(f"/tmp/bench_attempt{attempt}.out", "w") as out, \
                open(f"/tmp/bench_attempt{attempt}.err", "w") as err:
            rc = subprocess.call(["python", "bench.py"], stdout=out,
                                 stderr=err, env=env)
        if rc != 0:
            print(f"attempt {attempt}: rc={rc}", flush=True)
            continue
        # rc=0 without a rewritten record (e.g. a future bench mode
        # that skips the full-record write) must not adjudicate a
        # STALE file from an earlier attempt as this attempt's result
        if os.path.getmtime("BENCH_LAST.local.json") < t_launch:
            print(f"attempt {attempt}: record not rewritten "
                  "(stale BENCH_LAST.local.json) — discarding",
                  flush=True)
            continue
        d = json.load(open("BENCH_LAST.local.json"))
        shutil.copy("BENCH_LAST.local.json",
                    f"/tmp/bench_attempt{attempt}.local.json")
        st = d["machine"].get("steal_pct", 99.0)
        fs = d.get("floor_steal", {})
        deg = d.get("floor_degraded", {})
        maxfs = max(fs.values()) if fs else 99.0
        print(time.strftime("%H:%M:%S"),
              f"attempt {attempt}: total={d['value']} steal={st} "
              f"max_floor_steal={maxfs} degraded={sorted(deg)}", flush=True)
        if st <= OK_STEAL and maxfs <= OK_STEAL:
            print(f"attempt {attempt}: OFFICIAL-GRADE "
                  f"(/tmp/bench_attempt{attempt}.local.json)", flush=True)
            return
    print("deadline reached without an official-grade capture", flush=True)


if __name__ == "__main__":
    main()
