"""Broadcast-vs-shuffle A/B for the iterative graph loops (round-11,
closing the round-10 verdict's "the 2M bound is a guess" item).

Protocol — the ONLY fair comparison on a shared box: both join shapes
run INTERLEAVED, best-of-N, in the SAME session against the same warm
cached layouts (the earlier cross-run smoke comparisons differed in
session, layout freshness, and box load — the round-10 verdict rightly
called them two-point guesswork).  The shape is forced through
`SPARK_GRAFT_GRAPH_BCAST_MAX` (read per call by `_graph_bcast_max`).

Round-11 result (quiet box, best-of-3, `NOTES_r11.md`):

    nodes (mult)    broadcast    shuffle     winner
    ~165k  (10x)    3.69 s       4.67 s      broadcast -21%
    ~1.65M (100x)   22.38 s      28.92 s     broadcast -23%

Run:  python tools/graph_join_ab.py <mult> [runs]
(expects the scale_smoke dataset at /tmp/mr485_scale/x<mult>; build it
with `python tools/scale_smoke.py --mult <mult> --names q1_pricing_summary`)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "0")

from map_reduce485_spark import get_spark
from map_reduce485_spark.queries import REGISTRY, _load_all


def main() -> int:
    _load_all()
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf = f"/tmp/mr485_scale/x{mult}"
    if not Path(sf).exists():
        print(f"dataset {sf} missing — build it via tools/scale_smoke.py", file=sys.stderr)
        return 2
    spark = get_spark("graph_ab")
    fn = REGISTRY["pagerank_trade_graph"].fn
    sink = "/tmp/mr485_scale/sink_ab"

    def run(mode: str) -> float:
        os.environ["SPARK_GRAFT_GRAPH_BCAST_MAX"] = (
            "2000000000" if mode == "bcast" else "1"
        )
        t0 = time.perf_counter()
        fn(spark, sf).write.mode("overwrite").parquet(sink)
        return time.perf_counter() - t0

    run("bcast")  # warm both shapes (codegen + layout cache)
    run("shuffle")
    res: dict[str, list[float]] = {"bcast": [], "shuffle": []}
    for _ in range(runs):  # interleaved so box load is shared fairly
        res["bcast"].append(round(run("bcast"), 2))
        res["shuffle"].append(round(run("shuffle"), 2))
    print(
        json.dumps(
            {
                "mult": mult,
                "loadavg": os.getloadavg()[0],
                "bcast_best": min(res["bcast"]),
                "shuffle_best": min(res["shuffle"]),
                "raw": res,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
