"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set = every registry query tagged ``bench=True`` (TPC-H-style
aggregation/join, wordcount, n-gram + MinHash dedup, cosine top-k,
event-time windowing) — one representative per operator family.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from map_reduce485_spark import get_spark
from map_reduce485_spark.queries import bench_queries


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    # JVM + codegen warm-up on a trivial action so query timings measure the
    # queries, not session bring-up.
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    total = 0.0
    for name, spec in bench_queries().items():
        t0 = time.perf_counter()
        n_rows = len(spec.fn(spark, sf_dir).collect())
        dt = round(time.perf_counter() - t0, 3)
        timings[name] = dt
        total += dt
        print(f"# {name}: {dt:.3f}s ({n_rows} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
