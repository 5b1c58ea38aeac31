"""Isolate one (or a few) queries with the noop sink (guide §1.4): untimed
warm-up, then best-of-N timed runs of `df.write.format("noop")` so the
computation is measured, not the sink or a driver collect.

    python tools/bench_one.py name1,name2 [--runs 3] [--sf-dir ...] [--collect]

`--collect` times the bench.py action (collect / parquet sink) instead, for
apples-to-apples comparison with BENCH_r*.json numbers.
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
from map_reduce485_spark.queries import REGISTRY, _load_all
from map_reduce485_spark.queries._util import release_scoped_caches


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--collect", action="store_true")
    ap.add_argument(
        "--conf",
        action="append",
        default=[],
        help="k=v session-build conf (repeatable; for process-level confs "
        "like spark.io.compression.codec that cannot be set at runtime)",
    )
    args = ap.parse_args()

    _load_all()
    names = [n.strip() for n in args.names.split(",") if n.strip()]
    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark("bench_one", extra_conf=extra or None)
    spark.range(1000).selectExpr("sum(id)").collect()
    jpid = int(spark._jvm.ProcessHandle.current().pid())
    tick = os.sysconf("SC_CLK_TCK")

    def jvm_cpu() -> float:
        parts = open(f"/proc/{jpid}/stat").read().rsplit(")", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / tick

    import tempfile

    sink = os.path.join(tempfile.gettempdir(), "mr485_bench_one_sink")

    def run_once(spec) -> None:
        df = spec.fn(spark, args.sf_dir)
        if args.collect:
            if spec.bench_sink:
                df.write.mode("overwrite").parquet(sink)
            else:
                df.collect()
        else:
            df.write.format("noop").mode("overwrite").save()

    for name in names:
        spec = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"bench_one:{name}")
        run_once(spec)  # warm-up, untimed
        runs, cpus_ = [], []
        for _ in range(args.runs):
            c0, t0 = jvm_cpu(), time.perf_counter()
            run_once(spec)
            runs.append(time.perf_counter() - t0)
            cpus_.append(jvm_cpu() - c0)
        release_scoped_caches()
        spark._jvm.System.gc()
        print(
            f"{name}: wall best {min(runs):.3f}s all {[round(r, 3) for r in runs]} "
            f"cpu best {min(cpus_):.2f}s all {[round(c, 2) for c in cpus_]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
