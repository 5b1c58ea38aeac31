"""Interleaved same-session A/B of a runtime-settable SQL conf over named
queries, counterbalanced ABBA per query (box drift cancels to first order).

Reports BOTH wall clock and JVM CPU time per run.  On a host with steal-time
spikes (this round's box: 10-100x outliers on identical code), CPU time is
the robust efficiency signal — it counts work done, not hypervisor luck —
while wall still shows parallelism/barrier effects on quiet moments.

    python tools/ab_conf.py --conf spark.sql.join.preferSortMergeJoin \
        --a true --b false --names q21_waiting_suppliers,... [--reps 2]

`--reps` is per block; 4 blocks (ABBA) => 2*reps timed runs per arm.
Each block mirrors bench.py's per-query protocol: scoped caches cold at
entry, one untimed warm-up, then timed runs with the caches warm.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "0")

from map_reduce485_spark import get_spark
from map_reduce485_spark.queries import REGISTRY, _load_all, bench_queries
from map_reduce485_spark.queries._util import release_scoped_caches

_TICK = os.sysconf("SC_CLK_TCK")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", required=True)
    ap.add_argument("--a", required=True)
    ap.add_argument("--b", required=True)
    ap.add_argument("--names", default="")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    _load_all()
    names = (
        [n.strip() for n in args.names.split(",") if n.strip()]
        if args.names
        else list(bench_queries())
    )
    spark = get_spark("ab_conf")
    spark.range(1000).selectExpr("sum(id)").collect()
    jpid = int(spark._jvm.ProcessHandle.current().pid())
    stat_path = f"/proc/{jpid}/stat"

    def jvm_cpu() -> float:
        parts = open(stat_path).read().rsplit(")", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / _TICK  # utime + stime

    def run_once(name: str) -> tuple[float, float]:
        spec = REGISTRY[name]
        c0, t0 = jvm_cpu(), time.perf_counter()
        df = spec.fn(spark, args.sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0, jvm_cpu() - c0

    def block(name: str, value: str, reps: int) -> list[tuple[float, float]]:
        release_scoped_caches()
        spark.conf.set(args.conf, value)
        run_once(name)  # warm-up, untimed
        out = [run_once(name) for _ in range(reps)]
        release_scoped_caches()
        return out

    tot = {"A": [0.0, 0.0], "B": [0.0, 0.0]}
    for name in names:
        spark._jvm.System.gc()
        ra, rb = [], []
        ra += block(name, args.a, args.reps)   # A
        rb += block(name, args.b, args.reps)   # B
        rb += block(name, args.b, args.reps)   # B
        ra += block(name, args.a, args.reps)   # A
        wa, ca = min(r[0] for r in ra), min(r[1] for r in ra)
        wb, cb = min(r[0] for r in rb), min(r[1] for r in rb)
        tot["A"][0] += wa
        tot["A"][1] += ca
        tot["B"][0] += wb
        tot["B"][1] += cb
        print(
            f"{name}: wall A={wa:.3f} B={wb:.3f} ({wb / wa:.3f})  "
            f"cpu A={ca:.2f} B={cb:.2f} ({cb / ca:.3f})  "
            f"rawWallA={[round(r[0], 3) for r in ra]} rawWallB={[round(r[0], 3) for r in rb]} "
            f"rawCpuA={[round(r[1], 2) for r in ra]} rawCpuB={[round(r[1], 2) for r in rb]}",
            flush=True,
        )
    print(
        f"TOTAL: wall A={tot['A'][0]:.3f} B={tot['B'][0]:.3f} ({tot['B'][0] / tot['A'][0]:.3f})  "
        f"cpu A={tot['A'][1]:.2f} B={tot['B'][1]:.2f} ({tot['B'][1] / tot['A'][1]:.3f})"
    )


if __name__ == "__main__":
    main()
