"""Query registry: every Layer-B operator exposed as a named query.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with an
equivalent ANSI-SQL oracle string for DuckDB (or ``None`` for genuinely
non-SQL-expressible operators, which get a weaker rows-only check).

Hash-stability rules followed throughout (the driver compares row count +
schema + order-insensitive value hash, columns sorted by name):

- Every computed column is aliased identically on both sides.
- Money/quantity aggregates go through exact DECIMAL arithmetic and are cast
  back to DOUBLE at the end, so the result is independent of Spark's
  partial-aggregation order vs DuckDB's sequential sum (double addition is
  not associative; decimal addition is).
- Timestamp outputs are formatted to strings so timezone/display conventions
  cannot differ.
- Top-k orderings always include a unique tiebreaker column.
- Floating-point array reductions (similarity module) are sequential left
  folds on BOTH engines, so even unrounded doubles are bit-identical.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # headline query: included in bench.py
    # bench measures this query to a parquet sink instead of a driver
    # collect: set for queries whose output is a distributed intermediate
    # (e.g. pair-emitting dedup — millions of rows that no real pipeline
    # ever collects; at 10x they exceed spark.driver.maxResultSize)
    bench_sink: bool = False


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
    bench_sink: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Register a query. ``oracle=None`` → rows-only correctness check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags,
            bench=bench, bench_sink=bench_sink,
        )
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


def bench_queries() -> dict[str, QuerySpec]:
    _load_all()
    return {name: spec for name, spec in REGISTRY.items() if spec.bench}


_LOADED = False

# Gate-execution order, query-level (the driver iterates the registry dict
# and checks ~50 queries per round).  Round-3 rotation: every query that has
# never had a driver row, plus every fix awaiting a driver re-check, goes in
# the first 50; the filler slots go to round-1-checked queries so nothing is
# more than one round stale.
_GATE_FIRST = [
    # round-2 hash-fails / canonicalizer error — fixed, witness first
    "pack_sequences",
    "math_funcs",
    "apply_in_pandas_grouped",
    "sketch_approx_aggs",
    # never driver-checked after two rounds (sources/layout family)
    "csv_source_roundtrip",
    "json_source_roundtrip",
    "partition_pruned_scan",
    "compact_small_files",
    "zorder_multidim_filter",
    "bucketed_fact_join_revenue",
    "dedup_embedding_lsh",
    # never driver-checked (tpch_full remainder)
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_stock",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q19_disjunctive_predicates",
    "q20_potential_promotion",
    "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
    # round-1 fixes that never got a driver re-check
    "filter_project",
    "window_time_range_7d",
    "ann_lsh_buckets",
    "ann_ivf_kmeans_topk",
    # filler to 50: round-1-green queries, cheapest first (keeps the gate
    # inside the driver's wall-clock budget even with the heavy never-checked
    # queries above)
    "grep_filter",
    "wordcount",
    "distinct_values",
    "sort_limit",
    "having_filter",
    "agg_stats_per_event_type",
    "broadcast_dim_join",
    "case_bucketing",
    "date_funcs",
    "string_funcs",
    "json_funcs",
    "map_funcs",
    "set_ops_union",
    "set_ops_intersect",
    "set_ops_except",
    "window_lag_delta",
    "window_rank_suite",
    "window_running_sum",
    "window_frames",
    "window_topk_per_group",
    "rollup_agg",
    "cube_agg",
    "grouping_sets_agg",
    "pivot_agg",
    "unpivot_metrics",
]

# After the 50: the rest of the round-1-only queries (stale by one round),
# ahead of everything round-2 just verified.
_GATE_SECOND = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q18_large_volume_orders",
    "semi_join_customers_with_orders",
    "anti_join_customers_without_orders",
    "exists_subquery_parts",
    "embedding_norms",
    "inverted_index",
    "dedup_exact",
    "dedup_clusters",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_simhash_banded",
    "simhash_fingerprints",
    "dedup_embedding_cosine",
    "cosine_topk_bruteforce",
    "ann_ivf_topk",
]


def _last_verified_round() -> dict[str, int]:
    """Per-query latest driver-checked round, read from the CORRECTNESS_r*.json
    artifacts at the repo root.  Queries absent from every artifact have
    never been driver-witnessed and must lead the gate."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for name in data:
            last[name] = max(last.get(name, 0), int(m.group(1)))
    return last


def _load_all() -> None:
    """Import every query module exactly once (registration side effects),
    then reorder the registry to the round's gate order: `_GATE_FIRST`
    (fixes awaiting a driver re-witness + this round's hand-tuned 50),
    `_GATE_SECOND`, then everything else least-recently-driver-verified
    first (never-checked queries lead), ties in registration order.  The
    automatic tail self-heals across rounds — a new query or a stale one
    floats forward without editing the lists; next round the manual lists
    shrink to just the fix-re-witness entries."""
    global _LOADED
    if _LOADED:
        return
    from map_reduce485_spark.queries import (  # noqa: F401
        text_analysis,
        multimodal,
        events_batch,
        advanced,
        udf_surface,
        tpch_extra,
        tpch_full,
        bucketed,
        source_formats,
        relational,
        windows,
        functions_surface,
        dedup,
        similarity,
    )

    ordered: dict[str, QuerySpec] = {}
    for name in [*_GATE_FIRST, *_GATE_SECOND]:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    last = _last_verified_round()
    reg_index = {name: i for i, name in enumerate(REGISTRY)}
    rest = [n for n in REGISTRY if n not in ordered]
    rest.sort(key=lambda n: (last.get(n, -1), reg_index[n]))
    for name in rest:
        ordered[name] = REGISTRY[name]
    REGISTRY.clear()
    REGISTRY.update(ordered)

    _LOADED = True
