"""Dump the streaming jobs' plans + stateful-operator audit to
plans/<tag>/streaming_<job>.txt (round-13 verdict item 8: the stateful-op
plans were never pinned the way batch plans are).

For each job builder in `streaming/jobs.py` this captures:
- the analyzed/optimized logical plan (`explain(extended)` on the streaming
  DataFrame — physical planning happens per micro-batch, but state width and
  watermark placement are visible at this level), and
- a one-line audit: watermark present?, stateful operator kind, state key
  and state value columns (the bounded-state evidence).

    python tools/dump_stream_plans.py --tag r14
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "0")

from map_reduce485_spark import get_spark
from map_reduce485_spark.queries._util import T, land_parquet


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r14")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    args = ap.parse_args()

    from map_reduce485_spark.streaming import jobs as J

    spark = get_spark("dump_stream_plans")
    (events,) = T(spark, args.sf_dir, "events")
    landing = land_parquet(events, args.sf_dir, "events")

    ev = J.read_events_stream(spark, landing)

    builders = {
        "tumbling_counts": lambda: J.stream_tumbling_counts(ev),
        "sliding_counts": lambda: J.stream_sliding_counts(ev),
        "sessionize": lambda: J.stream_sessionize(ev),
        "dedup_exact": lambda: J.stream_dedup_exact(ev),
        "user_running_totals": lambda: J.stream_user_running_totals(ev),
        "view_purchase_join": lambda: J.stream_view_purchase_join(
            J.read_events_stream(spark, landing), J.read_events_stream(spark, landing)
        ),
        "view_purchase_left_join": lambda: J.stream_view_purchase_left_join(
            J.read_events_stream(spark, landing), J.read_events_stream(spark, landing)
        ),
        "dedup_within_watermark": lambda: J.stream_dedup_within_watermark(ev),
    }

    out_dir = Path(__file__).resolve().parent.parent / "plans" / args.tag
    out_dir.mkdir(parents=True, exist_ok=True)

    for name, build in builders.items():
        try:
            df = build()
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain(extended=True)
            text = buf.getvalue()
            plan = text
            audit = []
            audit.append(f"watermark_present: {'EventTimeWatermark' in text}")
            stateful = [
                k
                for k in (
                    "Aggregate",
                    "SessionWindow",
                    "Deduplicate",
                    "FlatMapGroupsInPandasWithState",
                    "Join",
                )
                if k in text
            ]
            audit.append(f"stateful_ops: {stateful}")
            audit.append(f"output_schema: {df.schema.simpleString()}")
            body = "\n".join(audit) + "\n\n" + plan
        except Exception as exc:
            body = f"ERROR building plan: {exc!r}"
        path = out_dir / f"streaming_{name}.txt"
        path.write_text(body)
        print(f"{name}: -> {path.name}")


if __name__ == "__main__":
    main()
