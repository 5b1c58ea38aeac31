"""Self-join vs map-side-array-explosion A/B for link_prediction_jaccard's
pair generation (round 12 — the suite's top 100x cost at ~135 s).

Protocol — the only fair comparison on a shared box (the
`tools/graph_join_ab.py` standard): both variants run INTERLEAVED,
best-of-N, in the SAME session against the same warm layouts, with the
top-{k} result sets asserted IDENTICAL before anything is timed.

Variant A (pre-round-12 shipped form): neighbor self-join on the shared
customer — `e JOIN e ON a.c = b.c AND a.s < b.s` — then groupBy (s1, s2).
Variant B (adopted): collect each customer's count-CAPPED supplier set
into one sorted array (cap join BEFORE the collect, so agg state is
<= cap values per group, never hub-sized) and explode the C(d,2) ordered
pairs with a row-local nested transform.  Same two exchanges (by c, by
(s1, s2)); B skips the join's second sort + probe machinery.

Round-12 result (interleaved best-of-2 at 100x, `NOTES_r12.md`):

    variant          round 0    round 1    best
    A self-join      211.5 s    182.5 s    182.5 s
    B array-explode  187.2 s    144.4 s    144.4 s   (~21% faster)

Run:  python tools/linkpred_pairgen_ab.py <mult> [runs]
(expects the scale_smoke dataset at /tmp/mr485_scale/x<mult>; build it
with `python tools/scale_smoke.py --mult <mult> --names q1_pricing_summary`)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from map_reduce485_spark import get_spark
from map_reduce485_spark.catalog import load_table
from map_reduce485_spark.queries.graph import _LP_MAX_DEG, _LP_TOP


def main() -> int:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf = f"/tmp/mr485_scale/x{mult}"
    spark = get_spark("linkpred_pairgen_ab")
    orders = load_table(spark, sf, "orders")
    lineitem = load_table(spark, sf, "lineitem")

    def capped_edges():
        e0 = (
            orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
            .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
            .distinct()
        )
        cdeg = e0.groupBy("c").agg(F.count("*").alias("d"))
        return e0.join(cdeg.filter(F.col("d") <= _LP_MAX_DEG).select("c"), "c")

    def score_topk(common, sdeg):
        scored = (
            common.join(
                sdeg.select(F.col("s").alias("s1"), F.col("d").alias("deg1")), "s1"
            )
            .join(
                sdeg.select(F.col("s").alias("s2"), F.col("d").alias("deg2")), "s2"
            )
            .select(
                "s1",
                "s2",
                "common",
                "deg1",
                "deg2",
                (
                    F.col("common").cast("double")
                    / (F.col("deg1") + F.col("deg2") - F.col("common"))
                ).alias("jaccard"),
            )
        )
        return scored.orderBy(F.col("jaccard").desc(), "s1", "s2").limit(_LP_TOP)

    def variant_a():
        e = capped_edges()
        sdeg = e.groupBy("s").agg(F.count("*").alias("d"))
        a, b = e.alias("a"), e.alias("b")
        common = (
            a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.s") < F.col("b.s")))
            .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
            .agg(F.count("*").alias("common"))
        )
        return score_topk(common, sdeg)

    def variant_b():
        e = capped_edges()
        sdeg = e.groupBy("s").agg(F.count("*").alias("d"))
        arrs = e.groupBy("c").agg(F.array_sort(F.collect_list("s")).alias("ss"))
        common = (
            arrs.select(
                F.explode(
                    F.expr(
                        "flatten(transform(ss, (x, i) -> transform("
                        "slice(ss, i + 2, size(ss)), y ->"
                        " struct(x AS s1, y AS s2))))"
                    )
                ).alias("p")
            )
            .select("p.s1", "p.s2")
            .groupBy("s1", "s2")
            .agg(F.count("*").alias("common"))
        )
        return score_topk(common, sdeg)

    ra = [tuple(r) for r in variant_a().collect()]
    rb = [tuple(r) for r in variant_b().collect()]
    assert ra == rb, "variants disagree — A/B aborted"
    print(json.dumps({"equal_topk": len(ra)}), flush=True)

    times: dict[str, list[float]] = {"A_selfjoin": [], "B_array": []}
    for rnd in range(runs):
        for name, fn in (("A_selfjoin", variant_a), ("B_array", variant_b)):
            t0 = time.perf_counter()
            fn().collect()
            dt = round(time.perf_counter() - t0, 2)
            times[name].append(dt)
            print(json.dumps({"round": rnd, "variant": name, "sec": dt}), flush=True)
    print(
        json.dumps(
            {"mult": mult, "best": {k: min(v) for k, v in times.items()}}
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
