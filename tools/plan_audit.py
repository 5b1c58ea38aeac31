"""Whole-registry physical-plan audit: flags CartesianProduct (always a
bug) and BroadcastNestedLoopJoin (legitimate only for documented broadcast
patterns) across every query's plan.

    python tools/plan_audit.py

Known-intentional BNLJ queries (all-pairs test-SF baselines with banded/
bucketed scale twins, tiny broadcast fan-outs, 1-row scalar thresholds):
dedup_simhash_pairs, cosine_topk_bruteforce, dedup_embedding_cosine,
ann_ivf_topk, range_join_price_bands, q11_important_stock.
Exits non-zero on any CartesianProduct or any NEW BNLJ.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from map_reduce485_spark import get_spark
from map_reduce485_spark.plans import explain_str
from map_reduce485_spark.queries import REGISTRY, _load_all

KNOWN_BNLJ = {
    "dedup_simhash_pairs",
    "cosine_topk_bruteforce",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "ann_ivf_topk",
    "ann_ivf_kmeans_topk",
    "range_join_price_bands",
    "q11_important_stock",
    # 1-row broadcast of the scalar average threshold (crossJoin(broadcast))
    # — replaced a driver-side collect; a 1-row BNLJ probe is free
    "q22_global_sales_opportunity",
    # 5-row broadcast query fan-out against the PQ-encoded corpus
    # (similarity.py: F.broadcast(queries_df).crossJoin(enc)) — the same
    # documented-intentional shape as cosine_topk_bruteforce: the corpus
    # side never moves, the broadcast side is Q rows (Q=5)
    "ann_pq_topk",
    # IVF+PQ composition: the 16-row centroid table broadcast against the
    # corpus for cell assignment (emb.join(broadcast(cent)), same fan-out
    # as ann_ivf_topk) plus the 5-row query broadcast for scoring
    "ann_ivf_pq_topk",
    # 1-row scalar-stats broadcasts (threshold + report assembly) — the
    # q22_global_sales_opportunity class: free BNLJ probes of one row
    "key_skew_report",
    # 1-row broadcast of the grand total N onto the ~|types|x7 cell table
    # (crossJoin(broadcast(n))) — same free 1-row probe class
    "chi_square_independence",
    # 1-row x 1-row final assembly: harmonic-sum row x true-count row
    "hll_estimate_distinct",
    # same class: bottom-k aggregate row x true-count row
    "kmv_distinct_estimate",
    # same class: union-sketch aggregate row x three 1-row exact truths
    "kmv_set_ops_estimate",
    # 1-row stats broadcast onto the scan (bin math) and the 3-quantile x
    # 4096-bin rank probe — both deliberate small-side BNLJ
    "approx_percentile_binned",
    # 1-row vector count broadcast onto the d^2 cell table
    "embedding_covariance_matrix",
    "pca_power_iteration",
    # |groups| x m register grid: 5 x 64 deliberate small cross product
    "hll_grouped_distinct",
    # dense-spine generation IS a deliberate small x small cross product
    # (|event types| x |hours| = 5 x 720; the hour list is the broadcast
    # side) — the constant dummy join key folds away into a BNLJ
    "time_gapfill_interpolate",
    # 1-row broadcast of the basket grand total onto the brand-pair table
    # — the q22_global_sales_opportunity class: free 1-row BNLJ probe
    "basket_brand_lift",
    # 1-row scalar broadcasts (series totals / argmax peak / max key /
    # digit-count total) — the q22 free-probe class
    "cusum_changepoint",
    "zone_map_skipping_report",
    "benford_digit_audit",
    # 2-row lag list broadcast onto the bounded post-agg hourly series
    "autocorrelation_hourly",
    # 1-row pooled-N broadcast onto the ranked groups (the pooled-rank
    # LOOKUP itself is an equi-join — see the query's comment)
    "quantile_normalize_per_type",
    # 5-row query fan-out against the corpus, the cosine_topk class
    "rrf_fusion_topk",
    # L x L pairwise centroid comparison (L = |labels|, ~10 rows a side)
    "centroid_drift_matrix",
    # 1-row scalar broadcasts (session total / weekday grand total) — the
    # q22 free-probe class
    "peak_concurrency_sweep",
    "weekday_seasonal_index",
    # 5-row query fan-out against the corpus, the cosine_topk class
    "matryoshka_recall_eval",
    # 1-row × 1-row stats assembly (the hll/kmv report class)
    "join_cardinality_estimate",
    # 1-row data-end broadcast onto the per-user first-touch frame
    "survival_time_to_convert",
    # 5-row query fan-out against the corpus, the cosine_topk class
    "negative_sampling_pairs",
    # 1-row corpus-count / grand-total broadcasts — the q22 free-probe class
    "keyword_search_rank",
    "share_of_parent",
    # 1-row sample-size + argmax-peak broadcasts onto the bounded step table
    "ks_two_sample_test",
    # 1-row mean broadcast + broadcast replicate-index fan-out
    # (advanced.py: crossJoin(broadcast(reps)) and crossJoin(broadcast(mean)))
    # — the q22 free-probe class plus a deliberate B-row replicate table
    "poisson_bootstrap_ci",
    # 5-row query fan-out against the int8-quantized corpus — the
    # cosine_topk_bruteforce class (similarity.py: broadcast(queries))
    "sq_recall_eval",
    # per-round 1-row × 1-row survivor-stat assembly (the hll/kmv report
    # class — graph.py kcore loop crossJoins two single-row aggregates)
    "kcore_peeling",
    # 10-row decile-bounds broadcast fan-outs + the 1-row max-doc scalar
    # (text_analysis.py: crossJoin(broadcast(maxd)) and inequality joins
    # against broadcast(bounds)) — deliberate tiny-side BNLJ
    "vocabulary_growth",
}


def audit(spark, sf: str = "/root/testdata/sf0.001") -> list[str]:
    """Return failure strings for every registry query whose physical plan
    has a CartesianProduct or an unwhitelisted BroadcastNestedLoopJoin.
    Shared by the CLI below and `tests/test_plans.py::test_plan_audit_green`
    so a red audit cannot be committed (round-3 verdict item 2)."""
    from map_reduce485_spark.queries._util import release_scoped_caches

    _load_all()
    bad = []
    for name, spec in REGISTRY.items():
        try:
            txt = explain_str(spec.fn(spark, sf), "simple")
            release_scoped_caches()
        except Exception as exc:
            bad.append(f"{name}: plan error {exc!r:.80}")
            continue
        if "CartesianProduct" in txt:
            bad.append(f"{name}: CartesianProduct")
        elif "BroadcastNestedLoopJoin" in txt and name not in KNOWN_BNLJ:
            bad.append(f"{name}: unexpected BroadcastNestedLoopJoin")
    return bad


def main() -> int:
    spark = get_spark("plan_audit")
    bad = audit(spark)
    if bad:
        print("PLAN AUDIT FAILURES:")
        for b in bad:
            print(" ", b)
        return 1
    print(f"plan audit OK: {len(REGISTRY)} queries, no cartesians, no unexpected BNLJ")
    return 0


if __name__ == "__main__":
    sys.exit(main())
