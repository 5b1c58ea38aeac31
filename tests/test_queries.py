"""Layer B tests: registry integrity, oracle parity on a representative
subset (the full gate is tools/verify_local.py), and semantic invariants
for the LLM-pipeline operators."""

from __future__ import annotations

import math

import pytest

from map_reduce485_spark.queries import REGISTRY, _load_all, all_oracles, all_queries
from tests.conftest import SF_CORRECT, SF_SMOKE

_load_all()


def test_registry_integrity():
    qs, osql = all_queries(), all_oracles()
    assert len(qs) >= 50
    assert set(osql) <= set(qs)
    # every registry query has an oracle — no query can structurally `err`
    # at the driver gate (round-3 verdict item 3)
    assert set(qs) == set(osql)


# -- oracle parity on a representative per-family subset (fast, sf0.001-ish) --

_REPRESENTATIVE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "window_running_sum",
    "rollup_agg",
    "wordcount",
    "dedup_minhash_lsh",
    "simhash_fingerprints",
    "cosine_topk_bruteforce",
    "lang_id",
    "multimodal_decode_stub",
    "events_sessionize",
]


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if isinstance(v, bool):
            return int(v)
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else round(v, 6)
        if isinstance(v, int):
            return v
        return str(v) if v is not None else None

    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


@pytest.mark.parametrize("name", _REPRESENTATIVE)
def test_oracle_parity(spark, duck, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_CORRECT)
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(spec.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert _canon(srows, sdf.columns) == _canon(orows, ocols)


# -- semantic invariants -----------------------------------------------------


def test_dedup_jaccard_invariants(spark):
    from map_reduce485_spark.queries.dedup import dedup_minhash_lsh, dedup_ngram_jaccard

    exact = {
        (r.a_id, r.b_id): r.jaccard for r in dedup_ngram_jaccard(spark, SF_SMOKE).collect()
    }
    lsh = {
        (r.a_id, r.b_id): r.jaccard for r in dedup_minhash_lsh(spark, SF_SMOKE).collect()
    }
    for (a, b), j in exact.items():
        assert a < b and 0.0 <= j <= 1.0
    # LSH finds a subset of the exact pairs (candidate filtering), with the
    # identical verified jaccard values
    assert set(lsh) <= set(exact)
    for pair, j in lsh.items():
        assert j == exact[pair]
    # recall sanity on the synthetic near-dups: ≥80% of true pairs survive LSH
    assert len(lsh) >= 0.8 * len(exact)


def test_simhash_near_duplicates_are_close(spark):
    from map_reduce485_spark.queries.dedup import (
        dedup_ngram_jaccard,
        simhash_fingerprints,
    )

    fp = {r.doc_id: r.simhash for r in simhash_fingerprints(spark, SF_SMOKE).collect()}
    assert all(0 <= v < 2**16 for v in fp.values())
    near = [(r.a_id, r.b_id) for r in dedup_ngram_jaccard(spark, SF_SMOKE).collect()]
    # high-jaccard pairs should have small average hamming distance
    dists = [bin(fp[a] ^ fp[b]).count("1") for a, b in near]
    assert dists and sum(dists) / len(dists) <= 4.0


def test_cosine_topk_consistency(spark):
    """Top-k output is internally consistent: 10 neighbors per query, ranks
    dense, similarity non-increasing with rank, self excluded.  (The testdata
    embeddings are NOT cosine-clustered by label — measured ~0 mean cosine
    within and across labels — so no label-recall assertion is possible.)"""
    from collections import defaultdict

    from map_reduce485_spark.queries.similarity import cosine_topk_bruteforce

    by_q = defaultdict(list)
    for r in cosine_topk_bruteforce(spark, SF_SMOKE).collect():
        assert -1.0 <= r.sim <= 1.0
        assert r.neighbor_id != r.query_id
        by_q[r.query_id].append((r.rank, r.sim))
    assert len(by_q) == 5
    for q, rows in by_q.items():
        rows.sort()
        assert [rk for rk, _ in rows] == list(range(1, 11))
        sims = [s for _, s in rows]
        assert sims == sorted(sims, reverse=True)


def test_ann_buckets_group_similar_vectors(spark):
    from map_reduce485_spark.queries.similarity import ann_lsh_buckets

    rows = ann_lsh_buckets(spark, SF_SMOKE).collect()
    assert all(0 <= r.bucket < 256 for r in rows)
    # determinism: second run identical
    rows2 = ann_lsh_buckets(spark, SF_SMOKE).collect()
    assert [(r.vec_id, r.bucket) for r in rows] == [(r.vec_id, r.bucket) for r in rows2]


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_sketch_approx_aggs_accuracy(spark):
    """Sketches must track exact values: HLL++ (rsd=1%) within 2% of exact
    distinct counts; approx percentiles within the group's value range and
    monotone p50 <= p95 <= p99."""
    import pyspark.sql.functions as F

    from map_reduce485_spark.catalog import load_table
    from map_reduce485_spark.queries.advanced import sketch_approx_aggs

    approx = {r.event_type: r for r in sketch_approx_aggs(spark, SF_CORRECT).collect()}
    events = load_table(spark, SF_CORRECT, "events")
    exact = {
        r.event_type: r
        for r in events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        .collect()
    }
    assert set(approx) == set(exact) and approx
    for et, a in approx.items():
        e = exact[et]
        assert abs(a.approx_users - e.users) <= max(2, 0.02 * e.users), et
        p50, p95, p99 = a.p50, a.p95, a.p99
        assert e.vmin <= p50 <= p95 <= p99 <= e.vmax, et


def test_kmeans_deterministic_and_converges(spark):
    """Lloyd iterations must be deterministic (exact decimal means) and
    non-increasing in inertia; the IVF query over them returns a sane
    top-k shape."""
    from map_reduce485_spark.catalog import load_table
    from map_reduce485_spark.operators.kmeans import (
        assign_with_distance,
        inertia,
        kmeans_fit,
    )

    emb = load_table(spark, SF_CORRECT, "embeddings")
    c0 = [[float(x) for x in r.embedding] for r in emb.orderBy("vec_id").limit(8).select("embedding").collect()]
    i0 = inertia(assign_with_distance(emb, c0))
    c3 = kmeans_fit(emb, k=8, iterations=3)
    i3 = inertia(assign_with_distance(emb, c3))
    assert i3 <= i0  # Lloyd never increases inertia
    assert kmeans_fit(emb, k=8, iterations=3) == c3  # bit-identical rerun

    res = REGISTRY["ann_ivf_kmeans_topk"].fn(spark, SF_CORRECT).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for rows in by_q.values():
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(ranks) + 1)) and len(ranks) <= 10


def test_cms_one_sided_error(spark):
    """The count-min guarantee: every estimate >= the true count."""
    rows = REGISTRY["cms_estimate_counts"].fn(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    assert all(r.n_estimate >= r.n_actual for r in rows)
    assert all(r.overcount == r.n_estimate - r.n_actual for r in rows)


def test_pagerank_ranks_positive_and_ordered(spark):
    """Scaled-integer PageRank: every rank above the damping floor and the
    top-k emitted in strictly usable (rank desc, node) order."""
    rows = REGISTRY["pagerank_trade_graph"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 50
    base = 15 * 10**10
    assert all(r.rank_scaled >= base for r in rows)
    ranks = [(r.rank_scaled, r.node) for r in rows]
    assert ranks == sorted(ranks, key=lambda t: (-t[0], t[1]))


def test_incremental_dedup_subset_of_full(spark):
    """Arrival-vs-corpus incremental pairs must be a subset of the full
    corpus LSH pairs (same bands, same threshold, restricted candidates)."""
    incr = REGISTRY["dedup_incremental_arrivals"].fn(spark, SF_SMOKE).collect()
    full = REGISTRY["dedup_minhash_lsh"].fn(spark, SF_SMOKE).collect()
    full_pairs = {(min(r.a_id, r.b_id), max(r.a_id, r.b_id)) for r in full}
    for r in incr:
        assert (min(r.new_id, r.dup_of), max(r.new_id, r.dup_of)) in full_pairs


def test_hll_estimate_accuracy(spark):
    """The gate pins exactness of the registers/estimate; ACCURACY (the
    ~1.04/sqrt(64) = 13% standard error band) belongs here.  Allow 3
    sigma."""
    (row,) = REGISTRY["hll_estimate_distinct"].fn(spark, SF_CORRECT).collect()
    assert row.n_true > 1000  # enough keys that the asymptotics apply
    rel_err = abs(row.estimate_raw - row.n_true) / row.n_true
    assert rel_err < 3 * 1.04 / (64**0.5), (row.estimate_raw, row.n_true)


def test_chi_square_sanity(spark):
    (row,) = REGISTRY["chi_square_independence"].fn(spark, SF_SMOKE).collect()
    assert row.chi2 >= 0.0
    assert row.dof >= 1
    assert row.n_cells <= (row.dof // 1 + 100)  # cells bounded: 5 types x 7 days


def test_gapfill_dense_and_interpolated(spark):
    """Gap filling: the spine is dense (|types| x |hours| rows), actual
    cells keep their counts, gap cells get a finite interpolation."""
    rows = REGISTRY["time_gapfill_interpolate"].fn(spark, SF_SMOKE).collect()
    types = {r.event_type for r in rows}
    hours = {r.hour_s for r in rows}
    assert len(rows) == len(types) * len(hours)  # dense grid
    for r in rows:
        if r.is_gap == 0:
            assert r.filled == float(r.n_actual)
        else:
            assert r.n_actual is None and r.filled is not None and r.filled >= 0.0


def test_ewma_matches_sequential_python(spark):
    """The folded EWMA must equal a plain Python left fold over the same
    hourly series — same order, same arithmetic."""
    import pyspark.sql.functions as F

    from map_reduce485_spark.catalog import load_table

    got = {
        r.event_type: (r.n_hours, r.ewma)
        for r in REGISTRY["ewma_hourly_value"].fn(spark, SF_SMOKE).collect()
    }
    hourly = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg((F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100.0).alias("v"))
        .collect()
    )
    series: dict = {}
    for r in hourly:
        series.setdefault(r.event_type, []).append((r.h, r.v))
    for et, pts in series.items():
        pts.sort()
        acc = pts[0][1]
        for _, x in pts[1:]:
            acc = 0.3 * x + 0.7 * acc
        assert got[et][0] == len(pts)
        assert got[et][1] == acc, et


def test_window_rank_surface_invariants(spark):
    rows = REGISTRY["window_rank_surface"].fn(spark, SF_SMOKE).collect()
    n = len(rows)
    by_rank = sorted(rows, key=lambda r: r.rnk)
    assert by_rank[0].prank == 0.0
    assert max(r.cdist for r in rows) == 1.0
    assert {r.quartile for r in rows} <= {1, 2, 3, 4}
    assert all(1 <= r.rnk <= n for r in rows)


def test_prefix_filter_join_equals_all_pairs(spark):
    """The prefix-filtered similarity join must return EXACTLY the
    all-pairs n-gram Jaccard result — the no-recall-loss guarantee of the
    AllPairs/PPJoin family (LSH, by contrast, may miss pairs)."""
    pp = {
        (r.a_id, r.b_id): round(r.jaccard, 9)
        for r in REGISTRY["dedup_prefix_filter_join"].fn(spark, SF_SMOKE).collect()
    }
    ap = {
        (r.a_id, r.b_id): round(r.jaccard, 9)
        for r in REGISTRY["dedup_ngram_jaccard"].fn(spark, SF_SMOKE).collect()
    }
    assert pp == ap and len(pp) > 0


def test_basket_lift_sanity(spark):
    rows = REGISTRY["basket_brand_lift"].fn(spark, SF_SMOKE).collect()
    assert all(r.n_both >= 5 and r.lift > 0 for r in rows)
    assert all(r.item_a < r.item_b for r in rows)


def test_sorted_neighborhood_subset_of_all_pairs(spark):
    """SNM candidates are recall-limited by design: every emitted pair
    must exist in the all-pairs result with the identical jaccard."""
    snm = {
        (r.a_id, r.b_id): round(r.jaccard, 9)
        for r in REGISTRY["dedup_sorted_neighborhood"].fn(spark, SF_SMOKE).collect()
    }
    ap = {
        (r.a_id, r.b_id): round(r.jaccard, 9)
        for r in REGISTRY["dedup_ngram_jaccard"].fn(spark, SF_SMOKE).collect()
    }
    assert len(snm) > 0
    assert all(ap.get(k) == v for k, v in snm.items())


def test_scd2_invariants(spark):
    """Every key has exactly one current row; closed rows only for keys
    whose value actually changed; validity intervals are well-formed."""
    rows = REGISTRY["scd2_dimension_build"].fn(spark, SF_SMOKE).collect()
    current = [r for r in rows if r.is_current == 1]
    closed = [r for r in rows if r.is_current == 0]
    assert len({r.s_suppkey for r in current}) == len(current)  # one current/key
    closed_keys = {r.s_suppkey for r in closed}
    for r in closed:
        assert r.version_start == 1 and r.version_end == 2
    for r in current:
        assert r.version_end is None
        if r.s_suppkey in closed_keys:
            assert r.version_start == 2


def test_recursive_rollup_root_holds_total(spark):
    """Node 1 accumulates every supplier with key >= 1 (key 0 is its own
    root: floor(0/2) never reaches 1 — found the hard way: suppkeys start
    at 0 in this dataset)."""
    from pyspark.sql import functions as F

    from map_reduce485_spark.catalog import load_table

    rows = {r.node: r.subtree_cents for r in
            REGISTRY["recursive_subtree_rollup"].fn(spark, SF_SMOKE).collect()}
    sup = load_table(spark, SF_SMOKE, "supplier").select(
        "s_suppkey", F.round(F.col("s_acctbal") * 100).cast("long").alias("c")
    ).collect()
    assert rows[1] == sum(r.c for r in sup if r.s_suppkey >= 1)
    zero = [r.c for r in sup if r.s_suppkey == 0]
    if zero:
        assert rows[0] == zero[0]


def test_winsorized_mean_bounded(spark):
    """The winsorized mean lies within [p05, p95] and the bounds are
    genuine order statistics (lo <= hi, both present in the data range)."""
    for r in REGISTRY["winsorized_stats_per_type"].fn(spark, SF_SMOKE).collect():
        assert r.p05_cents <= r.p95_cents
        assert r.p05_cents / 100.0 <= r.winsorized_mean <= r.p95_cents / 100.0


def test_kmv_estimate_accuracy(spark):
    """KMV accuracy: relative error ~1/sqrt(k-1); allow 3 sigma."""
    (row,) = REGISTRY["kmv_distinct_estimate"].fn(spark, SF_CORRECT).collect()
    assert row.n_true > 1000
    rel = abs(row.estimate - row.n_true) / row.n_true
    assert rel < 3.0 / (row.k - 1) ** 0.5, (row.estimate, row.n_true)


def test_skyline_tie_semantics(spark, tmp_path):
    """Dominance ties: equal (price, size) pairs don't dominate each other
    (no strict coordinate), so whole tied groups survive together; a
    same-price smaller size and a same-size higher price are dominated."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from map_reduce485_spark.queries.advanced import skyline_price_size

    rows = [
        (1, 10.0, 5),  # frontier (tied with 2)
        (2, 10.0, 5),  # frontier (tied with 1)
        (3, 10.0, 4),  # dominated: same price, smaller size
        (4, 9.0, 1),   # frontier: strictly cheapest
        (5, 11.0, 6),  # frontier: largest size
        (6, 12.0, 6),  # dominated: same size, higher price
    ]
    t = pa.table(
        {
            "p_partkey": [r[0] for r in rows],
            "p_name": [f"part{r[0]}" for r in rows],
            "p_brand": ["B"] * len(rows),
            "p_type": ["T"] * len(rows),
            "p_size": [r[2] for r in rows],
            "p_retailprice": [r[1] for r in rows],
        }
    )
    pq.write_table(t, tmp_path / "part.parquet")
    got = {r.p_partkey for r in skyline_price_size(spark, str(tmp_path)).collect()}
    assert got == {1, 2, 4, 5}


def test_scoped_caches_release_storage(spark):
    """Round-4 verdict item 7's done-criterion: a multi-query session must
    not accumulate executor storage.  Run cache-using queries, release,
    and require (a) the scoped registry is drained, (b) no NEW persistent
    RDDs remain vs the baseline, (c) re-invoking the same query re-caches
    cleanly (CacheManager-idempotent, no 'already cached' double entry)."""
    from map_reduce485_spark.queries._util import (
        _SCOPED_CACHES,
        release_scoped_caches,
    )
    from map_reduce485_spark.queries.dedup import (
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
    )

    sf = "/root/testdata/sf0.001"
    # warm-up materializes the LONG-LIVED catalog table cache (not scoped —
    # deliberately excluded from release); baseline measured after it
    dedup_ngram_jaccard(spark, sf).count()
    release_scoped_caches()  # drain scoped caches incl. earlier tests'
    baseline = spark.sparkContext._jsc.getPersistentRDDs().size()

    # dedup_minhash_lsh is cache-free since the round-7 map-side-verify
    # rewrite (candidates carry their shingle arrays; nothing shared to
    # cache) — it participates here as the cache-free control;
    # dedup_ngram_jaccard still registers the scoped shingle cache
    dedup_minhash_lsh(spark, sf).count()
    dedup_ngram_jaccard(spark, sf).count()
    assert len(_SCOPED_CACHES) >= 1  # ngram's shingle cache registered once
    n = release_scoped_caches()
    assert n >= 1 and not _SCOPED_CACHES

    # unpersist is async (blocking=False); poll briefly for the cleanup
    import time

    for _ in range(50):
        if spark.sparkContext._jsc.getPersistentRDDs().size() <= baseline:
            break
        time.sleep(0.2)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() <= baseline

    # idempotent re-invocation after release: caches again, exactly once
    dedup_ngram_jaccard(spark, sf).count()
    dedup_ngram_jaccard(spark, sf).count()
    assert len(_SCOPED_CACHES) == 1
    release_scoped_caches()


# -- exact-moment statistics (round 5 continuation) --------------------------


def test_ols_matches_numpy(spark):
    import numpy as np

    from map_reduce485_spark.queries.advanced import ols_regression_fit

    fits = {r.l_returnflag: r for r in ols_regression_fit(spark, SF_SMOKE).collect()}
    li = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .toPandas()
    )
    for flag, grp in li.groupby("l_returnflag"):
        x, y = grp["l_quantity"].to_numpy(), grp["l_extendedprice"].to_numpy()
        slope, intercept = np.polyfit(x, y, 1)
        r = fits[flag]
        assert abs(r.slope - slope) / abs(slope) < 1e-6
        assert abs(r.intercept - intercept) / max(1.0, abs(intercept)) < 1e-5
        assert 0.0 <= r.r2 <= 1.0


def test_mad_lower_median_convention(spark):
    import numpy as np

    from map_reduce485_spark.queries.advanced import mad_robust_stats

    rows = {r.event_type: r for r in mad_robust_stats(spark, SF_SMOKE).collect()}
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_type", "value")
        .toPandas()
    )

    def lower_median(a):  # rank (n+1) div 2, 1-indexed, over sorted values
        a = np.sort(a)
        return a[(len(a) + 1) // 2 - 1]

    for etype, grp in ev.groupby("event_type"):
        cents = np.round(grp["value"].to_numpy() * 100).astype(np.int64)
        med = lower_median(cents)
        mad = lower_median(np.abs(cents - med))
        r = rows[etype]
        assert r.median_value == med / 100.0
        assert r.mad_value == mad / 100.0


def test_autocorrelation_bounds(spark):
    from map_reduce485_spark.queries.advanced import autocorrelation_hourly

    rows = autocorrelation_hourly(spark, SF_SMOKE).collect()
    assert {r.lag_h for r in rows} == {1, 24}
    for r in rows:
        assert -1.0 <= r.autocorr <= 1.0
        assert r.n_pairs > 0


def test_sssp_matches_python_bellman_ford(spark):
    """4-round min-plus relaxation cross-checked against a driver-side
    Bellman-Ford over the same collected edge list (sf0.001)."""
    from map_reduce485_spark.catalog import load_table
    from map_reduce485_spark.queries.graph import _SSSP_ROUNDS, sssp_trade_graph
    import pyspark.sql.functions as F

    got = {r.node: r.min_cost for r in sssp_trade_graph(spark, SF_SMOKE).collect()}

    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    e0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.min(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("w"))
        .collect()
    )
    adj: dict[int, list[tuple[int, int]]] = {}
    for r in e0:
        u, v = r.o_custkey * 2, r.l_suppkey * 2 + 1
        adj.setdefault(u, []).append((v, r.w))
        adj.setdefault(v, []).append((u, r.w))
    dist = {0: 0}
    for _ in range(_SSSP_ROUNDS):
        nxt = dict(dist)
        for u, d in dist.items():
            for v, w in adj.get(u, []):
                if d + w < nxt.get(v, float("inf")):
                    nxt[v] = d + w
        dist = nxt
    assert got == {n: d / 100.0 for n, d in dist.items()}


def test_mmr_matches_python_greedy(spark):
    """Unrolled MMR selection cross-checked against a literal driver-side
    greedy loop over the same pools (sf0.001)."""
    import numpy as np

    from map_reduce485_spark.catalog import load_table
    from map_reduce485_spark.queries.similarity import (
        _MMR_K,
        _MMR_LAM,
        _MMR_POOL,
        mmr_diversified_topk,
    )

    got = [
        (r.query_id, r.cid, r.pick_rank)
        for r in mmr_diversified_topk(spark, SF_SMOKE).collect()
    ]

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, SF_SMOKE, "embeddings").collect()
    }

    def cos(a, b):
        return float(a @ b / (np.sqrt(a @ a) * np.sqrt(b @ b)))

    exp = []
    for qid in [v for v in sorted(emb) if v < 3]:
        rel = {c: cos(emb[qid], emb[c]) for c in emb if c != qid}
        pool = sorted(rel, key=lambda c: (-rel[c], c))[:_MMR_POOL]
        sel = [min(pool, key=lambda c: (-rel[c], c))]
        while len(sel) < _MMR_K:
            remaining = [c for c in pool if c not in sel]
            best = min(
                remaining,
                key=lambda c: (
                    -(
                        _MMR_LAM * rel[c]
                        - (1 - _MMR_LAM) * max(cos(emb[c], emb[s]) for s in sel)
                    ),
                    c,
                ),
            )
            sel.append(best)
        exp.extend((qid, c, i + 1) for i, c in enumerate(sel))
    assert sorted(got) == sorted(exp)


def test_random_projection_jl_concentration(spark):
    """JL distortion witness: per-row norm ratios concentrate around 1
    (E[ratio]=1 for a ±1 projection) and the sign matrix is reproducible."""
    from map_reduce485_spark.queries.similarity import (
        _rp_signs,
        embedding_random_projection,
    )

    assert _rp_signs() == _rp_signs()
    flat = [s for row in _rp_signs() for s in row]
    assert set(flat) == {-1, 1}
    assert 0.3 < sum(1 for s in flat if s == 1) / len(flat) < 0.7

    ratios = [
        r.norm_ratio for r in embedding_random_projection(spark, SF_SMOKE).collect()
    ]
    assert ratios and all(r > 0 for r in ratios)
    mean = sum(ratios) / len(ratios)
    assert 0.8 < mean < 1.25


def test_quantile_normalize_invariants(spark):
    """Monotonicity within each type (order-preserving map) and exact
    distribution alignment: every type's normalized multiset comes from
    the pooled values, and identical within-type quantiles map to
    identical pooled values."""
    from map_reduce485_spark.queries.advanced import quantile_normalize_per_type

    rows = quantile_normalize_per_type(spark, SF_SMOKE).collect()
    pool = sorted(r.value for r in rows)
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append((r.value, r.event_id, r.normalized))
    for vals in by_type.values():
        vals.sort()
        norms = [n for _, _, n in vals]
        assert norms == sorted(norms)  # order-preserving
        assert set(norms) <= set(pool)  # image lies in the pooled values


def test_observation_metrics_on_pipeline(spark):
    """`df.observe` — zero-cost pipeline telemetry collected DURING the
    action (no second scan): row count and an exact cents sum observed on
    the q1 input must match a direct aggregation."""
    from pyspark.sql import Observation
    import pyspark.sql.functions as F
    from map_reduce485_spark.catalog import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    obs = Observation("li_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("qty_cents"),
    )
    out = observed.groupBy("l_returnflag").count().collect()
    direct = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("q"),
    ).collect()[0]
    assert sum(r["count"] for r in out) == direct.n
    assert obs.get["n_rows"] == direct.n
    assert obs.get["qty_cents"] == direct.q


def test_mg_twophase_equals_plain_groupby(spark):
    """The Misra-Gries two-phase plan is EXACT: same rows as the plain
    groupBy-HAVING twin (sf0.01 — the threshold is non-vacuous there)."""
    from map_reduce485_spark.queries.text_analysis import (
        heavy_hitter_tokens,
        heavy_hitters_mg_twophase,
    )

    mg = {(r.token, r.freq) for r in heavy_hitters_mg_twophase(spark, SF_CORRECT).collect()}
    plain = {(r.token, r.freq) for r in heavy_hitter_tokens(spark, SF_CORRECT).collect()}
    assert mg == plain and len(mg) > 0


def test_poisson_bootstrap_ci_brackets_mean(spark):
    """Deterministic bootstrap invariants: order statistics are ordered,
    the CI brackets the sample mean on this corpus (deterministic
    resamples → stable), and all 32 resamples materialize."""
    from map_reduce485_spark.queries.advanced import poisson_bootstrap_ci

    (r,) = poisson_bootstrap_ci(spark, SF_SMOKE).collect()
    assert r.n_resamples == 32
    assert r.boot_min <= r.ci80_lo <= r.ci80_hi <= r.boot_max
    assert r.ci80_lo < r.sample_mean < r.ci80_hi


def test_ngram_commonness_bounds_and_dup_saturation(spark):
    """`commonness` is a fraction of a doc's distinct grams that are
    corpus-common, so 0 <= n_common <= n_grams always; and a doc whose
    text is byte-identical to another doc's must score exactly 1.0
    (every gram trivially recurs).  sf0.001's documents table carries
    exact-dup families by construction, so the saturation case is
    exercised on real fixture data, joined via md5(text) groups."""
    import pyspark.sql.functions as F

    from map_reduce485_spark.queries.text_analysis import ngram_commonness
    from map_reduce485_spark.queries._util import T

    sf = "/root/testdata/sf0.001"
    rows = ngram_commonness(spark, sf).collect()
    assert rows, "expected at least one >=8-token document"
    assert all(0 <= r.n_common <= r.n_grams for r in rows)
    assert all(0.0 <= r.commonness <= 1.0 for r in rows)
    (docs,) = T(spark, sf, "documents")
    fam = (
        docs.groupBy(F.md5("text").alias("fp"))
        .agg(F.collect_list("doc_id").alias("ids"), F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .collect()
    )
    dup_ids = {i for r in fam for i in r.ids}
    scored = {r.doc_id: r.commonness for r in rows}
    saturated = [scored[i] for i in dup_ids if i in scored]
    if saturated:  # exact-dup docs long enough to carry an 8-gram
        assert all(c == 1.0 for c in saturated)


def test_tokenizer_fertility_invariants(spark):
    """Fertility ratios are internally consistent with their integer
    numerators: chars_per_token * n_bpe_tokens ~ n_chars, a BPE token is
    never longer than the text it lexes (ratio >= 1 cannot be asserted
    for chars/token in general, but counts are positive and each ratio
    reproduces from the sums it is defined over)."""
    from map_reduce485_spark.queries.text_analysis import (
        tokenizer_fertility_by_lang,
    )

    rows = tokenizer_fertility_by_lang(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.n_bpe_tokens > 0 and r.n_ws_tokens > 0 and r.n_chars > 0
        # the BPE-ish lexer splits punctuation off words, so it never
        # produces fewer tokens than whitespace splitting
        assert r.n_bpe_tokens >= r.n_ws_tokens
        assert abs(r.chars_per_token - r.n_chars / r.n_bpe_tokens) < 1e-5
        assert abs(r.tokens_per_word - r.n_bpe_tokens / r.n_ws_tokens) < 1e-5


def test_semdedup_keep_rule_consistency(spark):
    """SemDeDup invariants on fixture data: every vector appears exactly
    once; a vector with zero near-dups is always kept; within any
    cluster, the lowest vec_id among near-dup-carrying members is kept
    (the greedy keep-lowest-id rule can never drop the cluster's first
    member: no smaller id exists to evict it)."""
    from map_reduce485_spark.queries.similarity import semdedup_prune

    rows = semdedup_prune(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == len({r.vec_id for r in rows}) == 500
    assert all(r.is_kept == 1 for r in rows if r.n_near_dups == 0)
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r)
    for members in by_cluster.values():
        carriers = [r for r in members if r.n_near_dups > 0]
        if carriers:
            first = min(carriers, key=lambda r: r.vec_id)
            assert first.is_kept == 1
    # the threshold is tuned to exercise real prunes on the fixture
    assert any(r.is_kept == 0 for r in rows)


def test_filter_threshold_sweep_is_monotone(spark):
    """Retention is non-increasing in the threshold, the t=0 row keeps
    the whole corpus (quality >= 0 always), and fractions are exact
    ratios of the kept counts."""
    from map_reduce485_spark.queries.text_analysis import filter_threshold_sweep

    rows = sorted(
        filter_threshold_sweep(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r.threshold,
    )
    assert len(rows) == 10 and rows[0].threshold == 0.0
    assert rows[0].frac_docs == 1.0 and rows[0].frac_tokens == 1.0
    for a, b in zip(rows, rows[1:]):
        assert b.n_docs_kept <= a.n_docs_kept
        assert b.n_tokens_kept <= a.n_tokens_kept
    for r in rows:
        assert abs(r.frac_docs - r.n_docs_kept / rows[0].n_docs_kept) < 1e-12
        assert abs(r.frac_tokens - r.n_tokens_kept / rows[0].n_tokens_kept) < 1e-12


def test_token_balanced_shards_balance(spark):
    """The descending round-robin deal: shard doc counts differ by at
    most 1, token totals sum to the corpus total, and the deal balances
    tokens far better than the worst case — every shard within 25% of
    the ideal mean on the fixture corpus."""
    from map_reduce485_spark.queries.text_analysis import (
        _N_SHARDS,
        token_balanced_shards,
    )

    rows = token_balanced_shards(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == _N_SHARDS
    counts = [r.n_docs for r in rows]
    assert max(counts) - min(counts) <= 1
    assert all(abs(r.balance_ratio - 1.0) < 0.25 for r in rows)


def test_sequence_pattern_match_against_python_re(spark):
    """The per-user match counts must equal Python's re.findall over the
    same initial strings — an independent third engine for the greedy
    non-overlapping scan semantics both SQL engines are trusted with."""
    import re as _re

    from map_reduce485_spark.queries.events_batch import (
        _SEQ_PATTERN,
        sequence_pattern_match,
    )

    rows = sequence_pattern_match(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        hits = _re.findall(_SEQ_PATTERN, r.seq)
        assert r.n_matches == len(hits)
        assert r.total_matched_chars == sum(len(h) for h in hits)
        assert r.seq_len == len(r.seq)
    assert any(r.n_matches > 0 for r in rows)


def test_psi_source_drift_nonnegative_and_complete(spark):
    """PSI is a sum of (p-q)*ln(p/q) terms, each >= 0 (the integrand of
    a symmetrized KL), so every pair's PSI must be non-negative; all
    C(|sources|, 2) ordered pairs are emitted; and smoothing keeps every
    value finite even with empty deciles."""
    import math

    from map_reduce485_spark.queries.text_analysis import psi_source_drift

    rows = psi_source_drift(spark, "/root/testdata/sf0.001").collect()
    n_sources = len({r.source_a for r in rows} | {r.source_b for r in rows})
    assert len(rows) == n_sources * (n_sources - 1) // 2
    assert all(r.psi >= 0 and math.isfinite(r.psi) for r in rows)
    assert all(r.source_a < r.source_b for r in rows)


def test_mann_whitney_matches_python_ranks(spark):
    """u_a/u_b/z must match a from-scratch Python implementation with
    tie-averaged ranks over the same cents-quantized values (independent
    third engine, like the sequence-pattern and SSSP checks)."""
    import math

    import pyspark.sql.functions as F

    from map_reduce485_spark.queries._util import T
    from map_reduce485_spark.queries.advanced import mann_whitney_u_test

    sf = "/root/testdata/sf0.001"
    (events,) = T(spark, sf, "events")
    vals = (
        events.filter(F.col("event_type").isin("view", "purchase"))
        .select(
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            (F.col("event_type") == "view").cast("int").alias("is_a"),
        )
        .collect()
    )
    xs = sorted((r.cents, r.is_a) for r in vals)
    n = len(xs)
    ranks: dict[int, float] = {}
    i = 0
    while i < n:
        j = i
        while j < n and xs[j][0] == xs[i][0]:
            j += 1
        ranks[xs[i][0]] = (i + 1 + j) / 2.0  # average of ranks i+1..j
        i = j
    n_a = sum(a for _, a in xs)
    n_b = n - n_a
    r_a = sum(ranks[c] for c, a in xs if a)
    u_a = r_a - n_a * (n_a + 1) / 2.0
    tie_cubes = 0
    for c in {c for c, _ in xs}:
        t = sum(1 for cc, _ in xs if cc == c)
        tie_cubes += t**3 - t
    var = n_a * n_b / 12.0 * ((n + 1.0) - tie_cubes / (n * (n - 1.0)))
    z = (u_a - n_a * n_b / 2.0) / math.sqrt(var)

    row = mann_whitney_u_test(spark, sf).collect()[0]
    assert (row.n_a, row.n_b) == (n_a, n_b)
    assert row.u_a == u_a and row.u_b == n_a * n_b - u_a
    assert abs(row.z - z) < 1e-12


def test_keep_best_star_matches_baseline_on_shared_clusters(spark):
    """The banded-star keep policy must agree with the exact all-pairs
    baseline wherever both see the same cluster: key each pipeline's
    clusters by the FROZENSET of member doc_ids (`dedup_clusters` vs
    `dedup_clusters_star`), and for every member set present in both,
    the survivor chosen by `dedup_keep_best_quality` /
    `dedup_keep_best_star` must be the same document — banding may only
    change RECALL (which clusters form), never the keep decision within
    a cluster."""
    from map_reduce485_spark.queries.dedup import (
        dedup_clusters,
        dedup_clusters_star,
        dedup_keep_best_quality,
        dedup_keep_best_star,
    )

    sf = "/root/testdata/sf0.001"

    def members_by_cluster(df):
        out: dict = {}
        for r in df.select("doc_id", "cluster_id").collect():
            out.setdefault(r.cluster_id, set()).add(r.doc_id)
        return {cid: frozenset(s) for cid, s in out.items()}

    base_members = members_by_cluster(dedup_clusters(spark, sf))
    star_members = members_by_cluster(dedup_clusters_star(spark, sf))
    base_keep = {
        r.cluster_id: r.keep_doc_id
        for r in dedup_keep_best_quality(spark, sf).collect()
    }
    star_keep = {
        r.cluster_id: r.keep_doc_id
        for r in dedup_keep_best_star(spark, sf).collect()
    }
    # survivor keyed by member set — cluster_id labels differ between the
    # pipelines (min-label vs star contraction), member sets are canonical
    base_by_set = {base_members[c]: k for c, k in base_keep.items()}
    star_by_set = {star_members[c]: k for c, k in star_keep.items()}
    shared = set(base_by_set) & set(star_by_set)
    assert shared, "expected clusters with identical member sets in the twins"
    for ms in shared:
        assert base_by_set[ms] == star_by_set[ms], sorted(ms)
    # the comparison must be non-vacuous in both directions: at least one
    # multi-member cluster shared, and the keep decision actually chosen
    # from >1 candidates there
    assert any(len(ms) > 1 for ms in shared), "only singletons shared"


def test_distributed_prefix_sum_matches_global_window(spark):
    """`distributed_prefix_sum` (round 10) must be bit-identical to the
    single-partition `sum().over(Window.orderBy(...))` it replaces, for
    any total order — including the MULTI-COLUMN one-pass form (several
    running sums in one range shuffle) and negative values (the sweep
    line's ±1 deltas).  Built over a shuffled frame with several range
    partitions so the broadcast offsets are actually exercised."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from map_reduce485_spark.queries._util import distributed_prefix_sum

    n = 5000
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("uid"),
            (F.hash("id") % 7 - 3).alias("a"),
            (F.hash("id", "id") % 1000).alias("b"),
        )
        .repartition(13)
    )
    got = {
        r.uid: (r.ca, r.cb)
        for r in distributed_prefix_sum(
            df, ["uid"], ["a", "b"], ["ca", "cb"], num_partitions=7
        ).collect()
    }
    w = W.orderBy("uid").rowsBetween(W.unboundedPreceding, 0)
    want = {
        r.uid: (r.ca, r.cb)
        for r in df.select(
            "uid", F.sum("a").over(w).alias("ca"), F.sum("b").over(w).alias("cb")
        ).collect()
    }
    assert got == want


def test_distributed_rank_dense_total_order(spark):
    """Canary for `distributed_rank`'s two structural assumptions: (1)
    monotonically_increasing_id increments by exactly 1 per row in row
    order within a partition (Spark's documented MonotonicallyIncreasingID
    layout), and (2) range partitions are ordered and non-overlapping.
    Together they must reproduce the exact global row_number.  Built over
    a deliberately shuffled frame with several range partitions so the
    broadcast partition offsets are actually exercised — if either
    assumption ever changes in a Spark upgrade, this fails loudly before
    any oracle does."""
    from pyspark.sql import functions as F

    from map_reduce485_spark.queries._util import distributed_rank

    n = 5000
    df = (
        spark.range(n)
        .select((F.hash("id") % 100).alias("k"), F.col("id").alias("uid"))
        .repartition(13)
    )
    rows = (
        distributed_rank(df, ["k", "uid"], alias="rk", num_partitions=7)
        .orderBy("k", "uid")
        .collect()
    )
    assert [r.rk for r in rows] == list(range(1, n + 1))
    keys = [(r.k, r.uid) for r in rows]
    assert keys == sorted(keys)


def test_distributed_rank_descending_order(spark):
    """Descending sort columns must range-partition and rank correctly
    (repartitionByRange honors Column sort direction)."""
    from pyspark.sql import functions as F

    from map_reduce485_spark.queries._util import distributed_rank

    df = spark.range(1000).select(F.col("id").alias("uid"))
    rows = (
        distributed_rank(df, [F.col("uid").desc()], alias="rk", num_partitions=5)
        .orderBy(F.col("uid").desc())
        .collect()
    )
    assert [r.rk for r in rows] == list(range(1, 1001))
    assert rows[0].uid == 999 and rows[-1].uid == 0


def test_distributed_prefix_max_matches_global_window(spark):
    """`distributed_prefix_max` must equal the single-partition global
    window it replaces, including the NULL first row."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from map_reduce485_spark.queries._util import distributed_prefix_max

    df = (
        spark.range(2000)
        .select(F.col("id").alias("k"), (F.hash("id") % 97).alias("v"))
        .repartition(11)
    )
    got = {
        r.k: r.pm
        for r in distributed_prefix_max(
            df, ["k"], "v", "pm", num_partitions=5
        ).collect()
    }
    w = W.orderBy("k").rowsBetween(W.unboundedPreceding, -1)
    exp = {
        r.k: r.pm
        for r in df.select("k", F.max("v").over(w).alias("pm")).collect()
    }
    assert got == exp


def test_readme_registry_count_in_sync():
    """Docs cannot drift from the registry (round-8 verdict item 3: the
    README said 276 while the registry held 278).  Every query count the
    README quotes must equal len(REGISTRY) — this runs in the same
    pre-commit pytest ritual as the gate, so a registry-growing commit
    that forgets the README fails here."""
    import re
    from pathlib import Path

    txt = (Path(__file__).resolve().parent.parent / "README.md").read_text()
    counts = {int(m) for m in re.findall(r"registry \((\d+) queries", txt)}
    counts |= {int(m) for m in re.findall(r"(\d+)/\1 oracle queries PASS", txt)}
    assert counts == {len(REGISTRY)}, (counts, len(REGISTRY))


# -- round 9 additions: quantiles, leakage-safe split, recall eval, sparse
# cosine, label propagation --


def test_exact_global_quantiles_match_sorted_corpus(spark):
    """The distributed-rank quantile ladder must equal the ground truth
    computed from the fully sorted corpus: value(p) = sorted(n_chars,
    doc_id)[ceil(p*n/100) - 1].  Also monotone in p by construction."""
    from map_reduce485_spark.queries.advanced import exact_global_quantiles

    rows = exact_global_quantiles(spark, SF_SMOKE).collect()
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("n_chars", "doc_id")
        .collect()
    )
    srt = sorted((r.n_chars, r.doc_id) for r in docs)
    n = len(srt)
    got = {r.pct: (r.rk, r.value) for r in rows}
    assert set(got) == {25, 50, 75, 90, 99}
    for p, (rk, value) in got.items():
        want_rk = (p * n + 99) // 100
        assert rk == want_rk
        assert value == srt[want_rk - 1][0]
    vals = [got[p][1] for p in (25, 50, 75, 90, 99)]
    assert vals == sorted(vals)


def test_cluster_safe_split_no_leakage_and_covers_corpus(spark):
    """Structural leakage check: recompute the doc-level assignment the
    summary aggregates (group_key = cluster_id or doc_id, md5-bucket
    80/10/10) and assert (1) every cluster lands in exactly one split,
    (2) per-split doc counts match the query's summary, (3) unclustered
    docs get the identical split `dataset_split_assign` would give."""
    import hashlib

    from map_reduce485_spark.queries.dedup import (
        cluster_safe_split,
        dedup_clusters_star,
    )

    def split_of(key: int) -> str:
        b = int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % 100
        return "train" if b < 80 else ("val" if b < 90 else "test")

    clusters = {
        r.doc_id: r.cluster_id
        for r in dedup_clusters_star(spark, SF_SMOKE).collect()
    }
    docs = [
        r.doc_id
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    assign = {d: split_of(clusters.get(d, d)) for d in docs}
    # (1) no cluster straddles splits
    by_cluster: dict = {}
    for d, c in clusters.items():
        by_cluster.setdefault(c, set()).add(assign[d])
    assert all(len(s) == 1 for s in by_cluster.values())
    # (2) summary counts match the recomputation
    got = {r.split: r.n_docs for r in cluster_safe_split(spark, SF_SMOKE).collect()}
    want: dict = {}
    for s in assign.values():
        want[s] = want.get(s, 0) + 1
    assert got == want
    # (3) singletons agree with the doc-id hash rule (same md5 bucket fn)
    singles = [d for d in docs if d not in clusters]
    assert singles, "expected unclustered docs at sf0.001"
    for d in singles[:50]:
        assert assign[d] == split_of(d)


def test_ann_lsh_recall_eval_bounds(spark):
    """Recall eval internal consistency: 5 query rows; n_lsh <= min(10,
    n_bucket); n_hits <= n_lsh; recall == n_hits/10 in [0, 1]."""
    from map_reduce485_spark.queries.similarity import ann_lsh_recall_eval

    rows = ann_lsh_recall_eval(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_lsh <= min(10, r.n_bucket)
        assert r.n_hits <= r.n_lsh
        assert r.recall == r.n_hits / 10.0
        assert 0.0 <= r.recall <= 1.0


def test_sparse_cosine_topk_is_valid_ranking(spark):
    """Sparse cosine invariants: sims in (0, 1 + eps]; ranks are dense
    1..k per query ordered by (sim desc, doc_id); the query doc never
    appears as its own neighbor; dot and n_shared are positive."""
    from map_reduce485_spark.queries.similarity import sparse_cosine_topk

    rows = sparse_cosine_topk(spark, SF_SMOKE).collect()
    assert rows
    by_q: dict = {}
    for r in rows:
        assert r.doc_id != r.query_id
        assert r.n_shared >= 1 and r.dot >= 1
        assert 0.0 < r.sim <= 1.0 + 1e-9
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        keys = [(-r.sim, r.doc_id) for r in rs]
        assert keys == sorted(keys)


def test_label_propagation_forms_nontrivial_communities(spark):
    """LPA invariants: every graph node labeled exactly once; labels are
    node ids; strictly fewer communities than nodes (propagation actually
    merged something); at least one community has >1 member."""
    from map_reduce485_spark.queries.graph import label_propagation_communities

    rows = label_propagation_communities(spark, SF_SMOKE).collect()
    nodes = [r.node for r in rows]
    assert len(nodes) == len(set(nodes))
    labels = {r.community for r in rows}
    assert labels <= set(nodes) | labels  # labels drawn from node-id space
    assert len(labels) < len(nodes)
    sizes: dict = {}
    for r in rows:
        sizes[r.community] = sizes.get(r.community, 0) + 1
    assert max(sizes.values()) > 1


def test_multiprobe_recall_dominates_single_probe(spark):
    """Multi-probe LSH must never lose to single-probe: per query, the
    probed candidate set is a superset of the query's own bucket, so
    n_cand >= n_bucket and (because rerank is exact within candidates)
    recall >= the single-probe recall."""
    from map_reduce485_spark.queries.similarity import (
        ann_lsh_multiprobe_recall,
        ann_lsh_recall_eval,
    )

    single = {r.query_id: r for r in ann_lsh_recall_eval(spark, SF_SMOKE).collect()}
    multi = {
        r.query_id: r for r in ann_lsh_multiprobe_recall(spark, SF_SMOKE).collect()
    }
    assert set(single) == set(multi) and len(multi) == 5
    for q, m in multi.items():
        s = single[q]
        assert m.n_cand >= s.n_bucket
        assert m.recall >= s.recall
        assert m.n_hits <= m.n_lsh <= min(10, m.n_cand)


def test_source_term_lift_recomputes(spark):
    """Spot-check the lift arithmetic against a driver-side recomputation
    from raw token counts at sf0.001, and the per-source top-5 contract."""
    import collections

    from map_reduce485_spark.queries.text_analysis import source_term_lift

    rows = source_term_lift(spark, SF_SMOKE).collect()
    assert rows
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("source", "text")
        .collect()
    )
    st: dict = collections.Counter()
    for r in docs:
        for t in r.text.lower().split(" "):
            if t:
                st[(r.source, t)] += 1
    tf_t = collections.Counter()
    n_s = collections.Counter()
    for (s, t), c in st.items():
        tf_t[t] += c
        n_s[s] += c
    n = sum(st.values())
    by_src: dict = {}
    for r in rows:
        assert r.tf >= 5
        want = (st[(r.source, r.term)] * float(n)) / (tf_t[r.term] * float(n_s[r.source]))
        assert abs(r.lift - want) < 1e-12
        by_src.setdefault(r.source, []).append(r)
    for s, rs in by_src.items():
        assert len(rs) <= 5
        rs.sort(key=lambda r: r.rn)
        keys = [(-r.lift, r.term) for r in rs]
        assert keys == sorted(keys)


def test_zipf_fit_shape(spark):
    """Zipf fit invariants on the synthetic corpus: k = min(1000, vocab),
    slope is negative (frequency decreases with rank by construction of
    the rank), and R^2 lies in [0, 1]."""
    from map_reduce485_spark.queries.text_analysis import zipf_law_fit

    row = zipf_law_fit(spark, "/root/testdata/sf0.001").collect()[0]
    assert row.k <= 1000 and row.k <= row.n_terms
    assert row.zipf_slope < 0
    assert 0.0 <= row.r2 <= 1.0


def test_distinct_ngram_diversity_bounds(spark):
    """distinct-n ratios are valid probabilities and distinct counts never
    exceed totals; bigram totals are exactly unigram totals minus one per
    document with >= 2 words (sliding-window count identity)."""
    from map_reduce485_spark.queries.text_analysis import (
        distinct_ngram_diversity,
    )

    rows = distinct_ngram_diversity(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0 < r.d_unigrams <= r.n_unigrams
        assert 0 < r.d_bigrams <= r.n_bigrams
        assert 0.0 < r.distinct_1 <= 1.0
        assert 0.0 < r.distinct_2 <= 1.0
        # bigrams are strictly harder to repeat than unigrams
        assert r.distinct_2 >= r.distinct_1


def test_per_source_quantile_filter_quota(spark):
    """The per-source q25 cut keeps roughly the top three quartiles —
    exactly n - ceil(n/4) + ties at the threshold — and never less than
    half the source (the threshold is a REAL value from the source, so at
    least rows >= it from rank ceil(n/4) up survive)."""
    from map_reduce485_spark.queries.text_analysis import (
        per_source_quantile_filter,
    )

    rows = per_source_quantile_filter(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        expect_min = r.n_docs - (r.n_docs + 3) // 4 + 1  # ranks above the cut
        assert expect_min <= r.n_kept <= r.n_docs
        assert abs(r.kept_frac - r.n_kept / r.n_docs) < 1e-12


def test_soft_dedup_weights_mass(spark):
    """Soft-dedup invariants: every document appears exactly once; weights
    are 1/cluster_size; the total weighted mass equals the number of
    near-dup FAMILIES plus singletons (each cluster contributes exactly
    1.0), which is also what hard dedup would keep."""
    from map_reduce485_spark.queries.dedup import (
        dedup_clusters,
        soft_dedup_weights,
    )

    sf = "/root/testdata/sf0.001"
    rows = soft_dedup_weights(spark, sf).collect()
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    for r in rows:
        assert abs(r.weight - 1.0 / r.cluster_size) < 1e-15
    mass = sum(r.weight for r in rows)
    n_families = len(
        {r.cluster_id for r in dedup_clusters(spark, sf).collect()}
    )
    n_clustered = sum(1 for r in rows if r.cluster_size > 1)
    n_singletons = n_docs - n_clustered
    assert abs(mass - (n_families + n_singletons)) < 1e-9


def test_bh_fdr_step_up_rule(spark):
    """Recompute the BH step-up decision in Python from the emitted
    (p, rk) columns and check the rejected flags match exactly; the
    rejected set must be a PREFIX of the p-ordered cells."""
    from map_reduce485_spark.queries.advanced import bh_fdr_correction

    rows = sorted(
        bh_fdr_correction(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r.rk,
    )
    m = len(rows)
    kstar = max((r.rk for r in rows if r.p * m <= 0.1 * r.rk), default=0)
    for r in rows:
        assert r.rejected == (1 if r.rk <= kstar else 0)
    flags = [r.rejected for r in rows]
    assert flags == sorted(flags, reverse=True)  # prefix property


def test_two_level_assignment_contract(spark):
    """`assign_clusters_two_level` invariants on a small deterministic
    frame: (1) every vector is assigned exactly once; (2) the chosen
    centroid is the EXACT argmin (lowest distance, then lowest cid)
    among the centroids of the vector's chosen group — the in-group
    search is exact even though the group routing is approximate; and
    (3) with k <= g (every centroid its own group) it degenerates to
    the exact flat assignment."""
    from pyspark.sql import functions as F

    from map_reduce485_spark.operators.kmeans import (
        _lloyd_rows,
        assign_clusters,
        assign_clusters_two_level,
        kmeans_fit,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(200)
    )
    cents = kmeans_fit(emb, k=25, iterations=2)
    rows = {r.vec_id: r for r in assign_clusters_two_level(emb, cents).collect()}
    assert len(rows) == emb.count()

    import math

    g = math.isqrt(24) + 1
    groups = _lloyd_rows(cents, g)

    def sqdist(v, c):
        return sum((float(x) - y) * (float(x) - y) for x, y in zip(v, c))

    vecs = {r.vec_id: r.embedding for r in emb.collect()}
    for vid, r in rows.items():
        grp = groups[r.cluster]
        in_group = [i for i in range(len(cents)) if groups[i] == grp]
        best = min(in_group, key=lambda i: (sqdist(vecs[vid], cents[i]), i))
        assert r.cluster == best, (vid, r.cluster, best)

    # degenerate case: k=2 -> g=2, every centroid its own group, so the
    # coarse routing IS the exact assignment — provided the centroids sit
    # on the 1e-6 grid (group representatives are micro-unit-rounded
    # means; off-grid centroids would differ from their own rep by <1e-6
    # and could flip a bisector vector)
    cents_small = [
        [round(x * 1e6) / 1e6 for x in c]
        for c in kmeans_fit(emb, k=2, iterations=1)
    ]
    flat = {
        r.vec_id: r.cluster for r in assign_clusters(emb, cents_small).collect()
    }
    two = {
        r.vec_id: r.cluster
        for r in assign_clusters_two_level(emb, cents_small).collect()
    }
    assert flat == two


def test_assign_clusters_column_contract(spark):
    """Round-9 advice: both assigners must (1) preserve the input column
    ORDER with `cluster` appended (positional consumers), and (2) carry
    each row's own `others` values intact — which holds because id_col is
    unique; a duplicated id could splice values across rows, so the
    fixture asserts the uniqueness precondition the docstring documents."""
    from map_reduce485_spark.operators.kmeans import (
        assign_clusters,
        assign_clusters_two_level,
        kmeans_fit,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("label", "vec_id", "embedding")  # id deliberately NOT first
        .limit(100)
    )
    assert emb.count() == emb.select("vec_id").distinct().count()
    cents = kmeans_fit(emb.select("vec_id", "embedding"), k=4, iterations=1)
    labels = {r.vec_id: r.label for r in emb.collect()}
    for fn in (assign_clusters, assign_clusters_two_level):
        out = fn(emb, cents)
        assert out.columns == ["label", "vec_id", "embedding", "cluster"], fn
        for r in out.collect():
            assert r.label == labels[r.vec_id], fn


def test_moments_sketch_merge_identity(spark):
    """The merge proof must actually witness equality (is_equal = 1) and
    the derived mean/stddev must match a NumPy recomputation over the raw
    cents to 6 decimals."""
    from map_reduce485_spark.queries.sketches import moments_sketch_merge

    row = moments_sketch_merge(spark, "/root/testdata/sf0.001").collect()[0]
    assert row.is_equal == 1
    import math

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    cents = [
        int(round(r.o_totalprice * 100)) for r in orders.select("o_totalprice").collect()
    ]
    n = len(cents)
    mean = sum(cents) / n / 100.0
    var = (sum(c * c for c in cents) - sum(cents) ** 2 / n) / n
    assert abs(row.mean_price - round(mean, 6)) < 1e-9
    assert abs(row.stddev_price - round(math.sqrt(var) / 100.0, 6)) < 1e-6


def test_ngram_novelty_bounds_and_first_doc(spark):
    """Novelty invariants: ratios in (0, 1]; the lowest doc_id (the first
    ever ingested) has novelty exactly 1.0 (every one of its grams first
    occurs there); per-doc novel counts sum to the number of DISTINCT
    grams in the corpus (each gram is novel exactly once)."""
    from pyspark.sql import functions as F

    from map_reduce485_spark.queries.text_analysis import (
        _NOVELTY_N,
        ngram_novelty_score,
    )

    rows = ngram_novelty_score(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        # 0.0 is legitimate: a fully derivative doc (every gram first
        # appeared in a lower doc_id)
        assert 0.0 <= r.novelty <= 1.0
        assert 0 <= r.n_novel <= r.n_grams
    first = min(rows, key=lambda r: r.doc_id)
    assert first.novelty == 1.0
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    grams = (
        # mirror the query's own >= _NOVELTY_N token guard: without it a
        # short doc makes sequence(1, size-7) descend through 0 and the
        # slice throws at runtime (round-9 advice)
        docs.select(
            F.expr("filter(split(lower(text), ' '), x -> x <> '')").alias("w")
        )
        .filter(F.size("w") >= _NOVELTY_N)
        .select(
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(w) - {_NOVELTY_N - 1}),"
                    f" i -> concat_ws(' ', slice(w, i, {_NOVELTY_N})))"
                )
            ).alias("g")
        )
        .filter(F.col("g") != "")
        .distinct()
        .count()
    )
    assert sum(r.n_novel for r in rows) == grams


def test_gopher_filters_recompute_python(spark):
    """Recompute every Gopher fraction for 30 docs in pure Python (Counter
    over n-grams) and require exact agreement with the query's doubles —
    the per-doc metric must be the published definition, not an
    approximation of it."""
    from collections import Counter

    from map_reduce485_spark.queries.text_analysis import (
        _GOPHER_DUP_N,
        _GOPHER_TOP_NS,
        gopher_repetition_filters,
    )

    got = {
        r.doc_id: r
        for r in gopher_repetition_filters(spark, SF_SMOKE).collect()
    }
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(30)
        .collect()
    )
    assert len(docs) == 30
    for d in docs:
        w = [t for t in d.text.lower().split(" ") if t]
        row = got[d.doc_id]
        for n in _GOPHER_TOP_NS:
            grams = [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]
            if not grams:
                assert getattr(row, f"frac_top_{n}gram") == 0.0
                continue
            c = Counter(grams)
            tot = sum(cnt * len(g) for g, cnt in c.items())
            top = max((cnt, len(g), g) for g, cnt in c.items())
            assert getattr(row, f"frac_top_{n}gram") == top[0] * top[1] / tot
        grams5 = [
            " ".join(w[i : i + _GOPHER_DUP_N])
            for i in range(len(w) - _GOPHER_DUP_N + 1)
        ]
        if grams5:
            c5 = Counter(grams5)
            tot5 = sum(cnt * len(g) for g, cnt in c5.items())
            dup5 = sum(cnt * len(g) for g, cnt in c5.items() if cnt > 1)
            assert row.frac_dup_5gram == dup5 / tot5
        flags = [row.pass_top_2gram, row.pass_top_3gram, row.pass_top_4gram,
                 row.pass_dup_5gram]
        assert row.gopher_pass == int(all(flags))


def test_bottomk_sketch_merge_and_error_bound(spark):
    """merge_ok must witness bottom-k associativity, the estimates must be
    actual sample order statistics, and the realized quantile error must
    sit within the DKW-style envelope for k=256 (generous 5x margin)."""
    from map_reduce485_spark.queries.sketches import (
        _BK_K,
        bottomk_quantile_sketch_merge,
    )

    row = bottomk_quantile_sketch_merge(spark, SF_CORRECT).collect()[0]
    assert row.merge_ok == 1
    assert row.n_total > _BK_K
    vals = sorted(
        r.value
        for r in spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .select("value")
        .collect()
    )
    import math

    for tag, p in ((25, 0.25), (50, 0.50), (75, 0.75), (90, 0.90)):
        est = getattr(row, f"est_q{tag}")
        exact = getattr(row, f"exact_q{tag}")
        assert exact == vals[math.ceil(p * len(vals)) - 1]
        assert getattr(row, f"err_q{tag}") == abs(est - exact)
        # sample quantile concentration: rank error ~ sqrt(p(1-p)/k)
        rank_of_est = sum(1 for v in vals if v <= est) / len(vals)
        assert abs(rank_of_est - p) < 5 * math.sqrt(0.25 / _BK_K)


def test_ppr_mass_concentrates_on_seed_side(spark):
    """PPR invariants: every rank positive, total top-rank mass below the
    normalized budget, and seed-side (customer, even-id) nodes hold rank
    (restart mass lands there every round)."""
    from map_reduce485_spark.queries.graph import ppr_seed_expansion

    rows = ppr_seed_expansion(spark, SF_SMOKE).collect()
    assert rows
    assert all(r.ppr_scaled > 0 for r in rows)
    assert any(r.node % 2 == 0 for r in rows)
    assert sum(r.ppr_scaled for r in rows) <= 10**12


def test_link_prediction_jaccard_recompute(spark):
    """Jaccard must equal common/(d1+d2-common) with degrees over the
    hub-capped edge set, and the emitted pairs must be the true top-50."""
    from map_reduce485_spark.queries.graph import (
        _LP_MAX_DEG,
        link_prediction_jaccard,
    )

    rows = link_prediction_jaccard(spark, SF_SMOKE).collect()
    assert rows
    from collections import defaultdict

    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    l = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    e0 = set(
        (r.c, r.s)
        for r in o.join(l, o.o_orderkey == l.l_orderkey)
        .selectExpr("o_custkey AS c", "l_suppkey AS s")
        .distinct()
        .collect()
    )
    by_c = defaultdict(set)
    for c, s in e0:
        by_c[c].add(s)
    by_s = defaultdict(set)
    for c, ss in by_c.items():
        if len(ss) <= _LP_MAX_DEG:
            for s in ss:
                by_s[s].add(c)
    import itertools

    scores = {}
    for s1, s2 in itertools.combinations(sorted(by_s), 2):
        common = len(by_s[s1] & by_s[s2])
        if common:
            scores[(s1, s2)] = common / (len(by_s[s1]) + len(by_s[s2]) - common)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[: len(rows)]
    got = [((r.s1, r.s2), r.jaccard) for r in rows]
    assert got == want


def test_minhash_random_pairs_calibration_coverage(spark):
    """The random matching must score exactly floor(n_eligible/2) pairs
    (eligible = docs with >= 3 words, i.e. at least one shingle — the
    ranking is restricted to signature holders), bins must be valid
    deciles, and mean_abs_err must respect the 8-permutation estimator's
    granularity bounds (est is a multiple of 1/8)."""
    from pyspark.sql import functions as F

    from map_reduce485_spark.queries.dedup import (
        minhash_calibration_random_pairs,
    )

    rows = minhash_calibration_random_pairs(spark, SF_CORRECT).collect()
    assert rows
    n_eligible = (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .filter(F.expr("size(filter(split(text, ' '), x -> x <> '')) >= 3"))
        .count()
    )
    assert sum(r.n_pairs for r in rows) == n_eligible // 2
    for r in rows:
        assert 0 <= r.bin <= 10
        assert 0.0 <= r.mean_est <= 1.0
        assert 0.0 <= r.mean_exact <= 1.0
        assert r.mean_abs_err >= abs(r.mean_est - r.mean_exact) - 1e-9


def test_familiarity_terciles_balanced_and_ordered(spark):
    """Terciles must partition the scored docs into three near-equal
    buckets, and bucket boundaries must respect the familiarity order
    (min familiarity of bucket b >= max familiarity of bucket b+1 up to
    rank ties broken by doc_id)."""
    from map_reduce485_spark.queries.text_analysis import (
        familiarity_tercile_split,
    )

    rows = familiarity_tercile_split(spark, SF_SMOKE).collect()
    assert rows
    n = len(rows)
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    assert sorted(by_bucket) == [0, 1, 2]
    for b, rs in by_bucket.items():
        assert abs(len(rs) - n / 3) <= 1
    assert min(r.familiarity for r in by_bucket[0]) >= max(
        r.familiarity for r in by_bucket[1]
    )
    assert min(r.familiarity for r in by_bucket[1]) >= max(
        r.familiarity for r in by_bucket[2]
    )


def test_stratified_sample_nesting_and_uniformity(spark):
    """Each stratum's sample must be the true bottom-k by md5 (recomputed
    in Python), ranks must be 1..k contiguous, and a k'=8 prefix must be
    exactly the first 8 ranks (nesting)."""
    import hashlib

    from map_reduce485_spark.queries.text_analysis import (
        _STRAT_K,
        stratified_bottomk_sample,
    )

    rows = stratified_bottomk_sample(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "lang", "doc_id"
    ).collect()
    by_lang = {}
    for d in docs:
        h = hashlib.md5(str(d.doc_id).encode()).hexdigest()
        by_lang.setdefault(d.lang, []).append((h, d.doc_id))
    got = {}
    for r in rows:
        got.setdefault(r.lang, []).append((r.sample_rank, r.h, r.doc_id))
    for lang, pairs in by_lang.items():
        want = sorted(pairs)[:_STRAT_K]
        g = sorted(got[lang])
        assert [rk for rk, _, _ in g] == list(range(1, len(want) + 1))
        assert [(h, d) for _, h, d in g] == want


def test_silhouette_bounds_and_recompute(spark):
    """Silhouette values must lie in [-1, 1] (simplified silhouette with
    a = nearest centroid is in [0, 1]); per-cluster sizes must sum to the
    corpus; and a NumPy recomputation of the per-cluster means must agree
    to the DECIMAL(24,6) rounding."""
    import numpy as np

    from map_reduce485_spark.operators.kmeans import kmeans_fit
    from map_reduce485_spark.queries.similarity import kmeans_silhouette_eval

    rows = kmeans_silhouette_eval(spark, SF_SMOKE).collect()
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    assert sum(r.n_vecs for r in rows) == len(emb)
    cents = np.array(
        kmeans_fit(
            spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet"), k=16, iterations=3
        )
    )
    by_cid = {}
    for e in emb:
        v = np.array(e.embedding, dtype=np.float64)
        d = np.sqrt(((cents - v) ** 2).sum(axis=1))
        order = np.lexsort((np.arange(len(d)), d))
        a, b = d[order[0]], d[order[1]]
        s = (b - a) / max(a, b) if max(a, b) > 0 else 0.0
        by_cid.setdefault(int(order[0]), []).append(s)
    for r in rows:
        assert 0.0 <= r.mean_silhouette <= 1.0
        want = sum(round(s, 6) for s in by_cid[r.cluster_id]) / r.n_vecs
        assert abs(r.mean_silhouette - want) < 5e-6


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_gopher_short_docs_emit_passing_rows(spark, tmp_path):
    """A doc too short to form ANY n-gram (< 2 words) must still emit a
    row with every fraction 0.0 and gopher_pass 1 — on BOTH engines
    (round-10 advice: downstream gopher_pass joins must see short docs
    pass trivially, not vanish)."""
    import duckdb

    from map_reduce485_spark.queries import REGISTRY, _load_all

    _load_all()
    spec = REGISTRY["gopher_repetition_filters"]
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "one", "en", "t", 3),          # 1 word: no n-grams at any n
            (2, "a b", "en", "t", 3),          # 2-grams only
            (3, "x y x y x y x y", "en", "t", 15),  # heavy repetition
        ],
    )
    got = {r.doc_id: r for r in spec.fn(spark, sf).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1].gopher_pass == 1
    assert got[1].frac_top_2gram == 0.0 and got[1].frac_dup_5gram == 0.0
    assert got[3].gopher_pass == 0  # top-2gram fraction ~0.5 > 0.20
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    ora = {r[0]: r for r in con.execute(spec.oracle).fetchall()}
    assert set(ora) == {1, 2, 3}
    cols = [c for c, *_ in con.execute(f"DESCRIBE ({spec.oracle})").fetchall()]
    for did in (1, 2, 3):
        for i, c in enumerate(cols):
            assert got[did][c] == ora[did][i], (did, c)


def test_random_pairs_calibration_skips_shingleless_docs(spark, tmp_path):
    """With a corpus containing a shingle-less (< 3 words) doc, the random
    matching must cover floor(n_eligible/2) pairs — the short doc neither
    produces a pair nor silently drops its partner's pair (round-10
    advice) — and Spark must agree with the oracle."""
    import duckdb

    from map_reduce485_spark.queries import REGISTRY, _load_all

    _load_all()
    spec = REGISTRY["minhash_calibration_random_pairs"]
    texts = [
        "alpha beta gamma delta epsilon",
        "alpha beta gamma delta zeta",
        "one two three four five six",
        "red green blue yellow purple",
        "too short",  # 2 words: zero shingles, ineligible
    ]
    sf = _write_docs(
        spark,
        tmp_path,
        [(i + 1, t, "en", "t", len(t)) for i, t in enumerate(texts)],
    )
    rows = spec.fn(spark, sf).collect()
    assert sum(r.n_pairs for r in rows) == 4 // 2  # 4 eligible docs -> 2 pairs
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    ora = con.execute(spec.oracle).fetchall()
    assert sorted((r.bin, r.n_pairs) for r in rows) == sorted(
        (r[0], r[1]) for r in ora
    )


def test_bottomk_hash_prefilter_preserves_bottomk(spark):
    """The md5-threshold pre-filter must (a) pass every true bottom-k row
    per group — result-identical to the unfiltered collect — and (b) cut
    the surviving row count to ~margin*k, which is what makes the
    downstream collect_list state O(k) instead of O(partition rows)."""
    import collections
    import hashlib

    from pyspark.sql import functions as F

    from map_reduce485_spark.queries._util import bottomk_hash_prefilter

    n, k = 6000, 16
    df = spark.range(n).select(
        (F.col("id") % 3).alias("g"),
        F.md5(F.col("id").cast("string")).alias("h"),
        "id",
    )
    surv = collections.defaultdict(set)
    for r in bottomk_hash_prefilter(df, "h", ["g"], k).collect():
        surv[r.g].add((r.h, r.id))
    true_bottom = collections.defaultdict(list)
    for i in range(n):
        true_bottom[i % 3].append((hashlib.md5(str(i).encode()).hexdigest(), i))
    for g, rows in true_bottom.items():
        assert set(sorted(rows)[:k]) <= surv[g]  # no true bottom-k row lost
        # ~8k = 128 expected survivors of 2000 group rows; 8x slack
        assert k <= len(surv[g]) <= 64 * k


def test_bottomk_guard_raises_on_deficient_group(spark):
    """bottomk_guard turns the prefilter's Chernoff bound into an enforced
    invariant (round-11 advice): a group whose survivor count fell below
    least(k, n) must RAISE at runtime, never silently pass; groups at or
    above the certificate (including small groups with n < k, where
    least(k, n) = n) sail through."""
    import pytest
    from pyspark.sql import functions as F

    from map_reduce485_spark.queries._util import bottomk_guard

    k = 16
    ok = spark.createDataFrame(
        [("a", 16, 4000), ("b", 5, 5)], "g string, m long, n long"
    )
    assert ok.filter(bottomk_guard(F.col("m"), F.col("n"), k)).count() == 2
    bad = spark.createDataFrame(
        [("a", 16, 4000), ("c", 15, 4000)], "g string, m long, n long"
    )
    with pytest.raises(Exception) as ei:
        bad.filter(bottomk_guard(F.col("m"), F.col("n"), k)).count()
    assert "bottomk_hash_prefilter" in str(ei.value)


def test_bottomk_guard_raises_on_zero_survivor_group(spark):
    """The survivor-count gate alone cannot see a group whose survivor
    count is ZERO — it has no rows in the merge aggregate and would
    silently vanish (round-12 advice).  The call sites close the edge by
    LEFT-joining the group-count table over the merge output with the
    survivor count coalesced to 0; this test replays that exact shape
    with one group's survivors forcibly removed (simulating the
    Chernoff-pathological all-dropped case, which real md5 data cannot
    produce on demand) and asserts the guard RAISES instead of emitting
    a frame with the group missing."""
    import pytest
    from pyspark.sql import functions as F

    from map_reduce485_spark.queries._util import (
        bottomk_guard,
        bottomk_hash_prefilter,
    )

    k = 8
    df = spark.range(600).select(
        (F.col("id") % 3).alias("g"),
        F.md5(F.col("id").cast("string")).alias("h"),
        "id",
    )
    filtered, counts = bottomk_hash_prefilter(
        df, "h", ["g"], k, keep_count=True, with_group_counts=True
    )
    assert set(counts.columns) == {"g", "_bk_n"} and counts.count() == 3

    def merge(pref):
        local = pref.groupBy("g").agg(F.count("*").alias("_bk_m"))
        return (
            counts.join(local, "g", "left")
            .withColumn(
                "_bk_m", F.coalesce(F.col("_bk_m"), F.lit(0).cast("long"))
            )
            .filter(bottomk_guard(F.col("_bk_m"), F.col("_bk_n"), k))
        )

    # healthy path: every group present, guard passes, nothing dropped
    assert merge(filtered).count() == 3
    # pathological path: group 1 loses ALL survivors -> without the
    # counts join it would vanish; with it, the guard must raise
    with pytest.raises(Exception) as ei:
        merge(filtered.filter(F.col("g") != 1)).count()
    assert "bottomk_hash_prefilter" in str(ei.value)


def test_exact_substring_l50_subset_of_l20(spark, tmp_path):
    """Geometry monotonicity (round-12 verdict item 4): every position
    covered at the paper's production constant L=50 is covered at the
    L=20 gate constant — a repeated >=50-token substring is a fortiori a
    repeated >=20-token substring, so the position covers NEST.  Built on
    a synthetic corpus where both geometries fire: a 60-token motif
    repeated across two docs (spans at both L) plus a 25-token motif
    repeated across two other docs (spans at L=20 only).  Also pins the
    l50 summary query's counts against the same spans, and its
    sentinel shape (exactly one row even when empty) on a no-dup corpus."""
    from map_reduce485_spark.queries import REGISTRY, _load_all
    from map_reduce485_spark.queries.dedup import _substring_spans

    _load_all()
    motif60 = [f"m{i:03d}" for i in range(60)]
    motif25 = [f"p{i:03d}" for i in range(25)]
    filler = lambda tag, n: [f"{tag}{i:03d}" for i in range(n)]
    mk = lambda ts: " ".join(ts)
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, mk(motif60 + filler("a", 30)), "en", "t", 1),
            (2, mk(filler("b", 10) + motif60), "en", "t", 1),
            (3, mk(motif25 + filler("c", 40)), "en", "t", 1),
            (4, mk(filler("d", 15) + motif25), "en", "t", 1),
        ],
    )

    def cover(L):
        out = set()
        for r in _substring_spans(spark, sf, L).collect():
            out |= {(r.doc_id, p) for p in range(r.span_start, r.span_end + 1)}
        return out

    c20, c50 = cover(20), cover(50)
    assert c50 and c50 < c20  # strict: the 25-token motif is L=20-only
    want50 = {(1, p) for p in range(1, 61)} | {(2, p) for p in range(11, 71)}
    assert c50 == want50
    assert {(3, p) for p in range(1, 26)} <= c20

    row = REGISTRY["dedup_exact_substring_spans_l50"].fn(spark, sf).collect()
    assert len(row) == 1
    assert (row[0].n_spans, row[0].n_docs_affected, row[0].tokens_covered) == (
        2,
        2,
        120,
    )
    # sentinel shape on a span-free corpus: one all-zero row, never empty
    sf2 = _write_docs(
        spark,
        tmp_path / "nodup",
        [(1, mk(filler("x", 55)), "en", "t", 1), (2, mk(filler("y", 55)), "en", "t", 1)],
    )
    row2 = REGISTRY["dedup_exact_substring_spans_l50"].fn(spark, sf2).collect()
    assert len(row2) == 1
    assert (row2[0].n_spans, row2[0].n_docs_affected, row2[0].tokens_covered) == (
        0,
        0,
        0,
    )


def test_distributed_scan_helpers_materialize_range_partitioning(spark):
    """The three distributed-scan helpers MUST read their range-
    partitioned frame through a materialization barrier (round-13 find):
    the offsets/totals aggregate and the row-side join are separate
    executions of the same sub-plan, and repartitionByRange samples its
    boundaries nondeterministically per execution — at the 100x smoke
    scale the unbarriered rank helper produced NON-DENSE, RUN-VARYING
    ranks (max rk 485,614/492,811 over n=500,000 on consecutive runs;
    exchange reuse masks it at test SF, so this pin is structural: the
    analyzed-with-cached-data plan must contain an InMemoryRelation).
    Also re-asserts density end-to-end at test scale."""
    from pyspark.sql import functions as F

    from map_reduce485_spark.queries._util import (
        distributed_prefix_max,
        distributed_prefix_sum,
        distributed_rank,
        release_scoped_caches,
    )

    df = spark.range(5000).select(
        (F.col("id") % 97).alias("k"), "id", F.lit(1).alias("one")
    )
    outs = {
        "rank": distributed_rank(df, ["k", "id"], alias="rk"),
        "psum": distributed_prefix_sum(df, ["k", "id"], "one", "ps"),
        "pmax": distributed_prefix_max(df, ["k", "id"], "id", "pm"),
    }
    try:
        for name, out in outs.items():
            plan = out._jdf.queryExecution().withCachedData().toString()
            assert "InMemoryRelation" in plan, f"{name} lost its barrier"
        r = outs["rank"].agg(
            F.count("*").alias("n"),
            F.max("rk").alias("m"),
            F.count_distinct("rk").alias("d"),
        ).collect()[0]
        assert (r.n, r.m, r.d) == (5000, 5000, 5000)
    finally:
        release_scoped_caches()


def test_decon_eval_split_predicates_agree():
    """decontaminate_substring_spans duplicates the eval-split predicate
    rather than importing it (module acyclicity); the two constants must
    stay textually identical so both queries screen against the SAME
    eval slice."""
    from map_reduce485_spark.queries.dedup import _DECON_SUB_EVAL
    from map_reduce485_spark.queries.text_analysis import _DECON_EVAL

    assert _DECON_SUB_EVAL == _DECON_EVAL


def test_decontaminate_substring_spans_semantics(spark, tmp_path):
    """Span-level decontamination on a constructed corpus: an eval doc
    leaks a 30-token motif into one training doc -> exactly one span
    covering the motif in the TRAINING doc (never a span on an eval
    doc); a motif shared only between two TRAINING docs is corpus
    duplication, not contamination -> no span from this query (but the
    corpus-dup spans query must find it — the two seed predicates split
    the work exactly)."""
    from map_reduce485_spark.queries import REGISTRY, _load_all
    from map_reduce485_spark.queries.dedup import _DECON_SUB_EVAL

    _load_all()
    from pyspark.sql import functions as F

    motif = [f"e{i:03d}" for i in range(30)]  # >= L = 20
    dupm = [f"d{i:03d}" for i in range(25)]
    filler = lambda tag, n: [f"{tag}{i:03d}" for i in range(n)]
    mk = lambda ts: " ".join(ts)
    # pick doc ids on each side of the eval split deterministically
    probe = spark.range(1, 400).select(
        "id", F.expr(_DECON_SUB_EVAL.replace("doc_id", "id")).alias("ev")
    ).collect()
    eval_ids = [r.id for r in probe if r.ev]
    train_ids = [r.id for r in probe if not r.ev]
    e1, t1, t2, t3 = eval_ids[0], train_ids[0], train_ids[1], train_ids[2]
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (e1, mk(motif + filler("a", 10)), "en", "t", 1),
            (t1, mk(filler("b", 7) + motif + filler("c", 5)), "en", "t", 1),
            (t2, mk(dupm + filler("x", 20)), "en", "t", 1),
            (t3, mk(filler("y", 9) + dupm), "en", "t", 1),
        ],
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in REGISTRY["decontaminate_substring_spans"].fn(spark, sf).collect()
    }
    assert got == {(t1, 8, 37, 30)}  # motif at positions 8..37, train doc only
    dup_docs = {
        r.doc_id
        for r in REGISTRY["dedup_exact_substring_spans"].fn(spark, sf).collect()
    }
    assert {t2, t3} <= dup_docs  # corpus-dup query owns the train-train pair


def test_substring_top_duplicated_tie_boundary(spark, tmp_path):
    """Top-k determinism when EVERY candidate ties (two identical docs:
    every gram has n_occurrences = 2): the selection must be the k
    smallest hashes (ORDER BY count DESC, h) on both engines, the exact
    boundary case the natural corpus may never exercise."""
    import duckdb

    from map_reduce485_spark.queries import REGISTRY, _load_all
    from map_reduce485_spark.queries.dedup import _TOPDUP_K, _TOPDUP_ORACLE

    _load_all()
    text = " ".join(f"w{i:03d}" for i in range(45))  # 26 grams at L=20
    sf = _write_docs(
        spark, tmp_path, [(1, text, "en", "t", 1), (2, text, "en", "t", 1)]
    )
    got = REGISTRY["substring_top_duplicated"].fn(spark, sf).collect()
    assert len(got) == _TOPDUP_K
    assert all(r.n_occurrences == 2 and r.n_docs == 2 and r.example_doc_id == 1
               for r in got)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{sf}/documents.parquet/*.parquet')"
    )
    want = {
        (r[0], r[1], r[2], r[3], r[4])
        for r in con.execute(_TOPDUP_ORACLE).fetchall()
    }
    assert {
        (r.h, r.n_occurrences, r.n_docs, r.example_doc_id, r.gram_text)
        for r in got
    } == want


def test_decontaminate_leak_report_semantics(spark, tmp_path):
    """Benchmark-owner rollup on a constructed corpus: an eval doc whose
    30-token motif leaks into TWO training docs reports n_training_docs
    = 2 and exactly its duplicated distinct grams as leaked; a clean
    eval doc emits nothing (n_leaked_grams > 0 filter)."""
    from pyspark.sql import functions as F

    from map_reduce485_spark.queries import REGISTRY, _load_all
    from map_reduce485_spark.queries.dedup import _DECON_SUB_EVAL, _SUBDUP_L

    _load_all()
    probe = spark.range(1, 400).select(
        "id", F.expr(_DECON_SUB_EVAL.replace("doc_id", "id")).alias("ev")
    ).collect()
    eval_ids = [r.id for r in probe if r.ev]
    train_ids = [r.id for r in probe if not r.ev]
    e1, e2, t1, t2 = eval_ids[0], eval_ids[1], train_ids[0], train_ids[1]
    motif = [f"e{i:03d}" for i in range(30)]
    filler = lambda tag, n: [f"{tag}{i:03d}" for i in range(n)]
    mk = lambda ts: " ".join(ts)
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (e1, mk(motif + filler("a", 5)), "en", "t", 1),
            (e2, mk(filler("z", 40)), "en", "t", 1),  # clean eval doc
            (t1, mk(filler("b", 3) + motif), "en", "t", 1),
            (t2, mk(motif + filler("c", 8)), "en", "t", 1),
        ],
    )
    rows = {r.doc_id: r for r in
            REGISTRY["decontaminate_leak_report"].fn(spark, sf).collect()}
    assert set(rows) == {e1}
    r = rows[e1]
    # e1 has 35 tokens -> 16 grams, of which the 11 motif-only grams
    # (starts 1..30-L+1) occur in the training docs
    assert r.n_grams == 35 - _SUBDUP_L + 1
    assert r.n_leaked_grams == 30 - _SUBDUP_L + 1
    assert r.n_training_docs == 2


def test_decontaminate_minhash_catches_fuzzy_leak(spark, tmp_path):
    """The fuzzy decon query's reason to exist, constructed exactly: a
    training doc that paraphrases an eval doc with one token changed
    every 19 positions has NO shared 20-token run (substring-span decon
    finds nothing) but shingle Jaccard ~0.73 >= 0.5 — the LSH probe must
    flag the pair with the exact verified Jaccard, and must not emit
    train-train or unrelated pairs."""
    from pyspark.sql import functions as F

    from map_reduce485_spark.queries import REGISTRY, _load_all
    from map_reduce485_spark.queries.dedup import _DECON_SUB_EVAL

    _load_all()
    probe = spark.range(1, 400).select(
        "id", F.expr(_DECON_SUB_EVAL.replace("doc_id", "id")).alias("ev")
    ).collect()
    e1 = [r.id for r in probe if r.ev][0]
    t1, t2 = [r.id for r in probe if not r.ev][:2]
    base = [f"tok{i:03d}" for i in range(1, 97)]  # 96 tokens
    edited = list(base)
    for p in (19, 38, 57, 76, 95):  # 1-indexed spacing-19 edits
        edited[p - 1] = f"chg{p:03d}"
    mk = lambda ts: " ".join(ts)
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (e1, mk(base), "en", "t", 1),
            (t1, mk(edited), "en", "t", 1),
            (t2, mk([f"zz{i:03d}" for i in range(90)]), "en", "t", 1),
        ],
    )
    got = REGISTRY["decontaminate_minhash_lsh"].fn(spark, sf).collect()
    assert [(r.doc_id, r.eval_doc_id) for r in got] == [(t1, e1)]
    # 4 interior edits touch 3 shingles each, the edit at position 95
    # only 2 (max shingle start is n-2 = 94): 14 affected -> 80/108
    assert abs(got[0].jaccard - 80 / 108) < 1e-12
    # ...and the exact-substring decon finds NOTHING here (no >= 20-token
    # shared run), which is precisely the gap the fuzzy space covers
    assert REGISTRY["decontaminate_substring_spans"].fn(spark, sf).count() == 0


def test_editdist_verify_semantics(spark, tmp_path):
    """Edit-space verification on a constructed corpus: a one-character
    substitution inside the compared prefix must survive (dist 1), a
    structurally different doc must be excluded even though SNM makes
    every pair in a tiny corpus a candidate, and the 5*dist <= max_len
    gate must be exact at the boundary."""
    from map_reduce485_spark.queries import REGISTRY, _load_all

    _load_all()
    base = "the quick brown fox jumps over the lazy dog " * 5  # 225 chars
    nearly = base[:100] + "X" + base[101:]
    other = "zz " + " ".join(f"q{i}" for i in range(60))
    sf = _write_docs(
        spark,
        tmp_path,
        [(1, base, "en", "t", 1), (2, nearly, "en", "t", 1), (3, other, "en", "t", 1)],
    )
    rows = {
        (r.a_id, r.b_id): r
        for r in REGISTRY["dedup_editdist_verify"].fn(spark, sf).collect()
    }
    assert set(rows) == {(1, 2)}
    r = rows[(1, 2)]
    assert r.edit_distance == 1 and r.max_len == len(base)
    assert abs(r.edit_sim - (1 - 1 / len(base))) < 1e-12


def test_winnowing_capped_equals_exact_below_cap(spark):
    """Whenever every fingerprint's df is under the cap, the df-capped
    scale twin must reproduce the exact summary EXACTLY and report zero
    capped fingerprints — the no-recall-loss-below-cap guarantee (the
    dedup_prefix_filter_join equality template applied to the round-11
    capped twin).  The precondition is RECOMPUTED, not assumed (measured
    max df 9 at today's sf0.001 — but the testdata generator may
    change): if the corpus ever exceeds the cap, the test instead pins
    the accounting invariant."""
    from pyspark.sql import functions as F

    from map_reduce485_spark.queries.dedup import (
        _WINNOW_DF_CAP,
        _winnow_fp,
        dedup_winnowing_summary,
        dedup_winnowing_summary_capped,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    max_df = (
        _winnow_fp(docs)
        .groupBy("h")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    capped_rows = dedup_winnowing_summary_capped(spark, SF_SMOKE).collect()
    capped = {
        (r.n_shared, r.n_pairs, r.n_left_docs, r.n_right_docs)
        for r in capped_rows
    }
    if max_df <= _WINNOW_DF_CAP:
        exact = {
            (r.n_shared, r.n_pairs, r.n_left_docs, r.n_right_docs)
            for r in dedup_winnowing_summary(spark, SF_SMOKE).collect()
        }
        assert capped == exact and len(capped) > 0
        assert all(r.n_capped_fps == 0 for r in capped_rows)
    else:  # generator changed: equality no longer applies, accounting must
        assert all(r.n_capped_fps > 0 for r in capped_rows)


def test_truncation_pairs_cover_mid_deciles(spark):
    """Each truncation fraction must score exactly the eligible-doc count
    (docs with >= 12 words), exact Jaccard must grow with the prefix
    fraction on average, and the three fractions together must cover
    deciles the sibling calibrations cannot reach (bins strictly between
    1 and 8 present)."""
    from pyspark.sql import functions as F

    from map_reduce485_spark.queries.dedup import (
        minhash_calibration_truncation_pairs,
    )

    rows = minhash_calibration_truncation_pairs(spark, SF_CORRECT).collect()
    assert rows
    n_eligible = (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .filter(F.expr("size(filter(split(text, ' '), x -> x <> '')) >= 12"))
        .count()
    )
    by_pct = {}
    for r in rows:
        assert r.pct in (25, 50, 75)
        assert 0 <= r.bin <= 10
        assert 0.0 <= r.mean_est <= 1.0 and 0.0 < r.mean_exact <= 1.0
        by_pct.setdefault(r.pct, []).append(r)
    for pct, rs in by_pct.items():
        assert sum(r.n_pairs for r in rs) == n_eligible, pct
    mean = lambda rs: sum(r.mean_exact * r.n_pairs for r in rs) / sum(
        r.n_pairs for r in rs
    )
    assert mean(by_pct[25]) < mean(by_pct[50]) < mean(by_pct[75])
    assert any(1 < r.bin < 8 for r in rows)


def test_gopher_quality_filters_recompute_python(spark):
    """Recompute every word-level gate in pure Python for the smoke corpus
    and compare flags + integer stats; every doc must emit a row."""
    from map_reduce485_spark.queries.text_analysis import (
        _GQ_MAX_WORDS,
        _GQ_MIN_WORDS,
        _GQ_STOPWORDS,
        gopher_quality_filters,
    )

    rows = {r.doc_id: r for r in gopher_quality_filters(spark, SF_SMOKE).collect()}
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    assert set(rows) == {d.doc_id for d in docs}
    for d in docs:
        w = [x for x in d.text.lower().split(" ") if x]
        r = rows[d.doc_id]
        assert r.n_words == len(w)
        total = sum(len(x) for x in w)
        n_sym = d.text.count("#") + d.text.count("...")
        n_alpha = sum(1 for x in w if any("a" <= c <= "z" for c in x))
        n_stop = sum(1 for s in _GQ_STOPWORDS if s in w)
        assert r.n_stopwords_present == n_stop
        want = int(
            _GQ_MIN_WORDS <= len(w) <= _GQ_MAX_WORDS
            and 3 * len(w) <= total <= 10 * len(w)
            and 10 * n_sym <= len(w)
            and 5 * n_alpha >= 4 * len(w)
            and n_stop >= 2
        )
        assert r.gopher_quality_pass == want, d.doc_id


def test_winnowing_capped_sentinel_on_all_capped_corpus(spark, tmp_path):
    """A corpus whose every dup family exceeds the df cap must emit the
    single zero sentinel row carrying n_capped_fps (never an empty
    frame) — on BOTH engines; and a family under the cap must still
    produce real pair rows alongside correct accounting."""
    import duckdb

    from map_reduce485_spark.queries import REGISTRY, _load_all
    from map_reduce485_spark.queries.dedup import _WINNOW_DF_CAP

    _load_all()
    spec = REGISTRY["dedup_winnowing_summary_capped"]
    # one exact-duplicate family of cap+2 docs: every fingerprint's df
    # exceeds the cap, so nothing survives the index filter
    fam = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    sf = _write_docs(
        spark,
        tmp_path,
        [(i + 1, fam, "en", "t", len(fam)) for i in range(_WINNOW_DF_CAP + 2)],
    )
    rows = spec.fn(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_shared, r.n_pairs, r.n_left_docs, r.n_right_docs) == (0, 0, 0, 0)
    assert r.n_capped_fps > 0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    ora = con.execute(spec.oracle).fetchall()
    assert len(ora) == 1 and list(ora[0]) == [0, 0, 0, 0, r.n_capped_fps]


def test_winnowing_capped_mid_cap_regime(spark, tmp_path):
    """The PARTIAL-cap middle regime (round-11 verdict item 4): one dup
    family over the df cap (its fingerprints dropped, counted in
    n_capped_fps) alongside one family under it (its pairs must survive
    intact).  The survivor summary AND the cap accounting must agree
    cross-engine, with no zero sentinel row (real pairs exist)."""
    import duckdb

    from map_reduce485_spark.queries import REGISTRY, _load_all
    from map_reduce485_spark.queries.dedup import (
        _WINNOW_DF_CAP,
        _WINNOW_MIN_SHARED,
    )

    _load_all()
    spec = REGISTRY["dedup_winnowing_summary_capped"]
    big = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    small = "one two three four five six seven eight nine ten eleven twelve"
    rows = [
        (i + 1, big, "en", "t", len(big)) for i in range(_WINNOW_DF_CAP + 2)
    ] + [(100 + i, small, "en", "t", len(small)) for i in range(3)]
    sf = _write_docs(spark, tmp_path, rows)
    got = spec.fn(spark, sf).collect()
    # real pair rows (the 3-doc family shares every fingerprint: C(3,2)
    # pairs), never the zero sentinel, and the over-cap family's drop
    # count rides every row
    assert len(got) >= 1
    assert all(r.n_shared >= _WINNOW_MIN_SHARED for r in got)
    assert sum(r.n_pairs for r in got) == 3
    assert all(r.n_capped_fps > 0 for r in got)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    ora = con.execute(spec.oracle).fetchall()
    assert sorted(tuple(r) for r in ora) == sorted(
        (r.n_shared, r.n_pairs, r.n_left_docs, r.n_right_docs, r.n_capped_fps)
        for r in got
    )


def test_exact_substring_spans_recompute_python(spark):
    """Recompute the Lee-et-al removal spans in pure Python — but via the
    POSITION-COVER definition, not the query's clustering: mark every
    token position covered by some duplicated L-gram, then read off the
    maximal runs of covered positions.  Matching the query's output
    end-to-end pins BOTH docstring claims at once: the L-gram-cover ==
    repeated-substring-cover equivalence AND that gap-<=-L seed
    clustering yields exactly the maximal disjoint covered intervals."""
    import collections

    from map_reduce485_spark.queries.dedup import (
        _SUBDUP_L,
        dedup_exact_substring_spans,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    L = _SUBDUP_L
    counts = collections.Counter()
    doc_grams = {}
    for d in docs:
        w = [x for x in d.text.lower().split(" ") if x]
        grams = [tuple(w[i : i + L]) for i in range(len(w) - L + 1)]
        doc_grams[d.doc_id] = grams
        counts.update(grams)
    want = set()
    for doc_id, grams in doc_grams.items():
        covered = set()
        for i, g in enumerate(grams):
            if counts[g] >= 2:
                covered.update(range(i + 1, i + L + 1))  # 1-based tokens
        for p in sorted(covered):
            if p - 1 not in covered:  # interval start
                e = p
                while e + 1 in covered:
                    e += 1
                want.add((doc_id, p, e, e - p + 1))
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in dedup_exact_substring_spans(spark, SF_SMOKE).collect()
    }
    assert got == want and len(want) > 0


def test_exact_substring_incremental_equals_full_restricted(spark):
    """The incremental ingest twin must equal the FULL span query
    restricted to arrival docs (md5-prefix-'f' split) — pinning on the
    Spark side the equivalence the oracle states via the filtered CTE:
    c_arrivals(g) + c_base(g) is exactly the full-corpus df, so the
    arrival-gram index probe finds exactly the full query's seeds."""
    from map_reduce485_spark.queries.dedup import (
        dedup_exact_substring_incremental,
        dedup_exact_substring_spans,
    )

    got = {
        tuple(r)
        for r in dedup_exact_substring_incremental(spark, SF_SMOKE).collect()
    }
    import hashlib

    full = {
        tuple(r)
        for r in dedup_exact_substring_spans(spark, SF_SMOKE).collect()
        if hashlib.md5(str(r.doc_id).encode()).hexdigest().startswith("f")
    }
    assert got == full and len(got) > 0


def test_exact_substring_gap_merge_and_apply(spark, tmp_path):
    """The overlap case the natural corpus never exercises: seeds with a
    start gap of 2 (duplicated L-grams at pos 1 and 3, pos 2 unique) must
    merge into ONE maximal span — a step-1 run grouping would emit two
    overlapping spans and double-count 40 tokens for a 22-token cover.
    The apply twin must delete exactly the merged cover, keep the tail,
    and empty out fully-covered docs; both queries checked cross-engine."""
    import duckdb

    from map_reduce485_spark.queries import REGISTRY, _load_all
    from map_reduce485_spark.queries.dedup import _SUBDUP_L

    _load_all()
    L = _SUBDUP_L
    assert L == 20  # token layout below is built for this geometry
    toks = [f"t{i:03d}" for i in range(1, 42)]
    mk = lambda ts: " ".join(ts)
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, mk(toks), "en", "t", len(mk(toks))),  # 41 tokens
            (2, mk(toks[0:20]), "en", "t", 1),  # = doc1's gram at pos 1
            (3, mk(toks[2:22]), "en", "t", 1),  # = doc1's gram at pos 3
        ],
    )
    spec = REGISTRY["dedup_exact_substring_spans"]
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in spec.fn(spark, sf).collect()
    }
    want = {(1, 1, 22, 22), (2, 1, 20, 20), (3, 1, 20, 20)}
    assert got == want
    aspec = REGISTRY["dedup_exact_substring_apply"]
    arows = {r.doc_id: r for r in aspec.fn(spark, sf).collect()}
    assert (arows[1].n_tokens, arows[1].n_removed, arows[1].n_kept) == (41, 22, 19)
    assert arows[1].cleaned_text == mk(toks[22:])
    for d in (2, 3):
        assert (arows[d].n_removed, arows[d].n_kept) == (20, 0)
        assert arows[d].cleaned_text == ""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    assert {tuple(r) for r in con.execute(spec.oracle).fetchall()} == want
    ora = {r[0]: r for r in con.execute(aspec.oracle).fetchall()}
    assert all(
        tuple(ora[d]) == (
            d,
            arows[d].n_tokens,
            arows[d].n_removed,
            arows[d].n_kept,
            arows[d].cleaned_text,
        )
        for d in (1, 2, 3)
    )
