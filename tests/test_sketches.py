"""Bloom filter units beyond the driver gate — above all the duplicate-row
regression for the prefiltered join (ADVICE r4): the prefilter must treat
every fact row independently, so duplicate (key, payload) rows pass through
as duplicates instead of being merged or dropped by a row-identity groupBy.
"""

from pyspark.sql import functions as F

from map_reduce485_spark.queries.sketches import (
    _K,
    bloom_block_bitmap,
    bloom_prefilter,
)


def test_bloom_prefilter_keeps_duplicate_rows(spark):
    """Two IDENTICAL fact rows (same key, same payload) must both survive
    the prefilter — the explode+groupBy formulation collapsed them to one
    and then DROPPED that one (n_hits == 2k != k)."""
    keys = spark.createDataFrame([(10,), (20,)], "k bigint")
    dense = bloom_block_bitmap(keys)
    fact = spark.createDataFrame(
        [(10, 5.0), (10, 5.0), (10, 7.0), (20, 5.0), (99, 5.0)],
        "k bigint, price double",
    )
    kept = bloom_prefilter(fact, "k", dense)
    # member keys always pass (no false negatives); the duplicate pair
    # stays a pair.  Key 99 may or may not pass (false positives allowed),
    # so only assert on the member rows.
    member_rows = kept.filter(F.col("k").isin(10, 20)).collect()
    assert len(member_rows) == 4
    assert sum(1 for r in member_rows if (r.k, r.price) == (10, 5.0)) == 2


def test_bloom_prefilter_is_map_side(spark):
    """The prefilter must probe via BROADCAST hash joins only — one per
    hash function; the fact side is never shuffled or sort-merge-joined
    (the bitmap build's own block aggregation is the one allowed
    exchange)."""
    keys = spark.createDataFrame([(1,), (2,), (3,)], "k bigint")
    dense = bloom_block_bitmap(keys)
    fact = spark.range(0, 1000).select(F.col("id").alias("k"))
    plan = (
        bloom_prefilter(fact, "k", dense)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") == _K
    for bad in ("SortMergeJoin", "CartesianProduct"):
        assert bad not in plan, f"prefilter plan contains {bad}:\n{plan}"
    # the only shuffles allowed are the bitmap BUILD's block aggregation
    # (inside the broadcast subtree) — the fact side must never shuffle
    import re

    for mt in re.finditer(r"Exchange hashpartitioning\((\w+)", plan):
        assert mt.group(1).startswith("block"), f"fact-side shuffle:\n{plan}"


def test_bloom_no_false_negatives_bulk(spark):
    """Every inserted key passes its own filter (the Bloom guarantee),
    checked over a few hundred keys in one pass."""
    keys = spark.range(1, 400).select(F.col("id").alias("k"))
    dense = bloom_block_bitmap(keys)
    n_pass = bloom_prefilter(keys, "k", dense).count()
    assert n_pass == 399
    assert dense.count() >= 1  # sanity: bitmap has set blocks


def test_cms_merge_is_exactly_linear(spark):
    """Per-site CMS sketches merged by counter addition must equal the
    single-pass sketch cell-for-cell — the linearity property that makes
    the sketch distributable.  The query computes the comparison itself;
    this pins `n_mismatched_cells == 0` on every hash row so a future
    edit that breaks merge exactness (e.g. a lossy counter type) fails
    here, not only at the oracle gate."""
    from map_reduce485_spark.queries.sketches import _CMS_D, cms_merge_sites

    rows = cms_merge_sites(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == _CMS_D
    assert all(r.n_mismatched_cells == 0 for r in rows)
    assert all(r.total_cnt > 0 for r in rows)


def test_hll_merge_register_max_is_exact(spark):
    """Per-day HLL register tables merged by register-wise MAX must equal
    the registers built over the whole range — the join-semilattice
    property.  All m registers equal, and the merged register table is
    non-trivial (some register saw a value)."""
    from map_reduce485_spark.queries.sketches import _HLL_M, hll_merge_days

    rows = hll_merge_days(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == _HLL_M
    assert all(r.is_equal == 1 for r in rows)
    assert all(r.reg_merged == r.reg_direct for r in rows)
    assert max(r.reg_merged for r in rows) > 0
