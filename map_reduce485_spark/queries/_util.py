"""Shared helpers for the query registry.

Hash-stability toolkit (see package docstring): exact decimal aggregation,
string-formatted timestamps, deterministic top-k tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from map_reduce485_spark.catalog import load_table


def T(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Load the named tables (Parquet typed scans; Catalyst prunes/pushes)."""
    return [load_table(spark, sf_dir, n) for n in names]


# DataFrames cached by query builders in this process, awaiting release.
# Query-scoped caches can't unpersist inside the builder (the caller hasn't
# collected the returned plan yet), so multi-query sessions — the driver gate,
# verify_local, plan_audit, bench, pytest — call release_scoped_caches()
# BETWEEN queries instead (round-4 verdict item 7: a 187-query session must
# not accumulate executor storage).
_SCOPED_CACHES: list[DataFrame] = []


def _plan_is_cached(df: DataFrame) -> bool:
    """True if df's ANALYZED PLAN is in the session CacheManager.

    ``df.is_cached`` only remembers whether .cache() was called on this very
    Python object; a rebuilt identical plan reports False even though Spark
    would (a) serve it from the existing cache and (b) log "Asked to cache
    already cached data" if cached again.  The CacheManager lookup answers
    the real question.
    """
    try:
        cm = df.sparkSession._jsparkSession.sharedState().cacheManager()
        return cm.lookupCachedData(df._jdf).isDefined()
    except Exception:  # Connect mode / API drift — fall back, worst case re-cache
        return df.is_cached


def cache_scoped(df: DataFrame) -> DataFrame:
    """Cache ``df`` for intra-query reuse and register it for later release.

    Idempotent per plan: re-invoking a query in one session finds the plan
    already cached (CacheManager lookup) and neither re-caches nor re-logs —
    execution still uses the existing cache because Spark substitutes cached
    plans at analysis time regardless of which DataFrame object built them.
    """
    if not _plan_is_cached(df):
        df.cache()
        _SCOPED_CACHES.append(df)
    return df


def release_scoped_caches() -> int:
    """Unpersist every query-scoped cache registered since the last release.

    Returns the number released.  Blocking=False: eviction proceeds async so
    the next query isn't stalled behind storage cleanup.
    """
    n = 0
    while _SCOPED_CACHES:
        df = _SCOPED_CACHES.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    n += release_scoped_checkpoints()
    return n


# (SparkContext, rdd_id) pairs for localCheckpoint storage awaiting release —
# the checkpoint twin of _SCOPED_CACHES (checkpointed data lives as persisted
# RDDs, not CacheManager entries, so DataFrame.unpersist cannot reach it).
_SCOPED_CHECKPOINTS: list[tuple[object, int]] = []


def checkpoint_scoped(df: DataFrame) -> DataFrame:
    """Eager ``localCheckpoint`` with the storage handle registered for the
    standard scope-release hooks.

    Use INSTEAD OF :func:`cache_scoped` inside iterative loops whose round
    plan references the previous round's frame more than once: caching cuts
    EXECUTION lineage but the DataFrame still carries the full logical
    plan, so analysis/optimization cost grows ~branch_factor^rounds — the
    round-14 kcore finding, where rounds 1-3 ran <1.3 s each and round 4
    took 7-9 s of pure driver-side planning on a 3^4-copy tree (fix:
    21 s → 2.6 s warm at sf0.01).  ``localCheckpoint`` truncates the
    logical plan to the materialized RDD, so every round plans at
    round-1 cost.

    Trade-off vs cache_scoped: the data is pinned as a persisted RDD
    (MEMORY_AND_DISK — spills, never OOMs) and recomputation on executor
    loss is impossible (irrelevant in local mode; on a cluster, a lost
    checkpoint fails the query instead of recomputing — acceptable for
    intra-query round state, same stance as Spark's own
    ``GraphX``/``ALS`` checkpoint usage).  Release goes through
    :func:`release_scoped_caches`, and callers that drop a generation
    eagerly (two-generation loops) can call the returned frame's
    ``rdd``-level release via :func:`release_checkpoint`."""
    sc = df.sparkSession.sparkContext
    try:
        before = {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}
    except Exception:
        before = None
    out = df.localCheckpoint(eager=True)
    if before is not None:
        try:
            after = {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}
            new_ids = sorted(after - before)
            for rid in new_ids:
                _SCOPED_CHECKPOINTS.append((sc, rid))
            out._mr485_ckpt_ids = new_ids  # for eager two-generation release
        except Exception:
            pass
    return out


def release_scoped_checkpoints() -> int:
    """Release every scoped localCheckpoint's persisted RDD storage."""
    n = 0
    while _SCOPED_CHECKPOINTS:
        sc, rid = _SCOPED_CHECKPOINTS.pop()
        n += 1 if _unpersist_rdd(sc, rid) else 0
    return n


def release_checkpoint(df: DataFrame) -> None:
    """Eagerly release ONE checkpoint_scoped frame's storage (two-generation
    loops: call on generation r-1 once generation r is materialized).
    The scope hooks remain the backstop — ids released here are also
    dropped from the pending list so the hook doesn't double-release."""
    ids = getattr(df, "_mr485_ckpt_ids", None)
    if not ids:
        return
    sc = df.sparkSession.sparkContext
    for rid in ids:
        _unpersist_rdd(sc, rid)
    _SCOPED_CHECKPOINTS[:] = [
        (s, r) for (s, r) in _SCOPED_CHECKPOINTS if not (s is sc and r in set(ids))
    ]
    df._mr485_ckpt_ids = []


def _unpersist_rdd(sc, rid: int) -> bool:
    try:
        jmap = sc._jsc.getPersistentRDDs()
        jrdd = jmap.get(rid)
        if jrdd is not None:
            jrdd.unpersist(False)
            return True
    except Exception:
        pass
    return False


def _order_cols(order_by: list[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_by]


def distributed_rank(
    df: DataFrame,
    order_by: list[str | Column],
    alias: str = "rk",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global ROW_NUMBER over ``order_by`` WITHOUT a single-partition window.

    ``row_number().over(Window.orderBy(...))`` funnels every row through one
    partition — the one plan shape that cannot run at 100 TB (Spark itself
    warns "Moving all data to a single partition").  This is the distributed
    form, entirely JVM-side, one full shuffle of ``df``:

      1. ``repartitionByRange(order_by)`` — range partitions are ordered and
         non-overlapping, so partition i holds a contiguous rank span;
      2. ``sortWithinPartitions(order_by)`` — local external sort (spills);
      3. ``monotonically_increasing_id()`` — a per-partition counter that
         increments by 1 in row order, giving each row its LOCAL position
         (density within a partition is Spark's documented
         ``MonotonicallyIncreasingID`` layout; ``tests/test_queries.py::
         test_distributed_rank_dense_total_order`` is the canary should that
         implementation detail ever change);
      4. a per-partition (count, min_id) aggregate — at most one row per
         partition, a broadcast-sized frame — turned into exclusive prefix
         sums by a window over PARTITION IDS (not data rows), then broadcast
         back: rank = partition_offset + (id - min_id) + 1.

    ``order_by`` MUST be a total order (include a unique tiebreaker): ties
    straddling a range-partition boundary would otherwise make ranks depend
    on boundary placement.  With a total order the result is bit-identical
    to the single-partition ``row_number`` regardless of the sampled range
    boundaries, so oracle hashes are unaffected by the swap.

    The tagged frame is MATERIALIZED once (``cache_scoped``) before the
    two consumers read it — NOT an optimization but a correctness
    requirement (round-13 find): the offsets aggregate and the final join
    are separate executions of the same sub-plan, and
    ``repartitionByRange`` SAMPLES its boundaries nondeterministically
    per execution, so without the barrier the per-partition offsets of
    one partitioning get applied to rows partitioned by ANOTHER —
    measured at the 100x smoke scale as non-dense, run-varying ranks
    (max rk 485,614 / 492,811 over n = 500,000 on consecutive same-
    session runs; exchange reuse does hide it at test SF, which is why
    the dense-total-order canary never fired).  With the barrier the
    same probe reads max = distinct = n with a bit-identical digest
    across runs.  The cached state is the caller's rank PROJECTION
    (order cols + carried cols), not the full table, and is released by
    the standard scope hooks.

    The same shape the reference would need R>1 reducers + an offset pass
    for (its global sort is the single-reducer ``worker/__main__.py`` sort
    with R=1); here the offsets pass is ~num_partitions rows.
    """
    cols = _order_cols(order_by)
    part = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    )
    tagged = cache_scoped(
        part.sortWithinPartitions(*cols).select(
            "*",
            F.spark_partition_id().alias("_dr_pid"),
            F.monotonically_increasing_id().alias("_dr_mid"),
        )
    )
    stats = tagged.groupBy("_dr_pid").agg(
        F.count("*").alias("_dr_cnt"), F.min("_dr_mid").alias("_dr_min")
    )
    # exclusive prefix sum over PARTITION IDS — bounded by the partition
    # count, never by data volume, so this global window is scale-safe
    off_w = W.orderBy("_dr_pid").rowsBetween(W.unboundedPreceding, -1)
    offs = stats.select(
        "_dr_pid",
        "_dr_min",
        F.coalesce(F.sum("_dr_cnt").over(off_w), F.lit(0)).alias("_dr_off"),
    )
    return (
        tagged.join(F.broadcast(offs), "_dr_pid")
        .withColumn(
            alias, F.col("_dr_off") + (F.col("_dr_mid") - F.col("_dr_min")) + 1
        )
        .drop("_dr_pid", "_dr_mid", "_dr_min", "_dr_off")
    )


def distributed_prefix_max(
    df: DataFrame,
    order_by: list[str | Column],
    value_col: str,
    alias: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Running MAX of ``value_col`` over all STRICTLY-preceding rows in the
    total order ``order_by`` (NULL for the first row) — the distributed
    prefix scan, replacing ``max().over(Window.orderBy(...).rowsBetween(
    unboundedPreceding, -1))`` which funnels all rows through one partition.

    Two-level scan: range-partition on the order key, local strict-prefix
    max WITHIN each range partition (the window is partitioned by the range
    partition id, so no partition exceeds its range slice), plus a broadcast
    exclusive prefix-max OVER partitions (≤ partition-count rows).  The row
    answer is ``greatest(local_prefix, partition_prefix)`` — ``greatest``
    skips NULLs, and is NULL only for the global first row.

    Same total-order requirement as :func:`distributed_rank`, and the same
    MATERIALIZATION requirement (round-13 find, see that docstring): the
    local-window and per-partition-max consumers are separate executions,
    and ``repartitionByRange`` samples boundaries per execution, so the
    tagged frame must be a barrier or the broadcast offsets describe a
    different partitioning than the rows they join.
    """
    cols = _order_cols(order_by)
    part = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    )
    tagged = cache_scoped(
        part.select("*", F.spark_partition_id().alias("_dp_pid"))
    )
    lw = (
        W.partitionBy("_dp_pid")
        .orderBy(*cols)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    local = tagged.withColumn("_dp_lpm", F.max(value_col).over(lw))
    pmax = tagged.groupBy("_dp_pid").agg(F.max(value_col).alias("_dp_pmax"))
    pw = W.orderBy("_dp_pid").rowsBetween(W.unboundedPreceding, -1)
    pref = pmax.select(
        "_dp_pid", F.max("_dp_pmax").over(pw).alias("_dp_pref")
    )
    return (
        local.join(F.broadcast(pref), "_dp_pid")
        .withColumn(alias, F.greatest("_dp_lpm", "_dp_pref"))
        .drop("_dp_pid", "_dp_lpm", "_dp_pref")
    )


def distributed_prefix_sum(
    df: DataFrame,
    order_by: list[str | Column],
    value_col: str | list[str],
    alias: str | list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Running (INCLUSIVE) SUM of ``value_col`` in the total order
    ``order_by`` — the sweep-line / gaps-and-islands scan, replacing
    ``sum().over(Window.orderBy(...).rowsBetween(unboundedPreceding, 0))``
    which Spark executes as one global partition ("Moving all data to a
    single partition") and which therefore degrades to a single executor at
    exactly the data scale the sweep is for.

    Same two-level shape as :func:`distributed_prefix_max`: range-partition
    on the order key, inclusive prefix sum WITHIN each range partition (the
    window is partitioned by the range-partition id, so no partition sees
    more than its range slice), plus an exclusive prefix sum OVER the
    per-partition totals (≤ partition-count rows, broadcast back).  Row
    answer = local_prefix + partition_offset.  Sums are exact whenever the
    value type is (integral/decimal); for doubles the usual float-order
    caveat applies — pass decimals for hash-checked paths.

    Same total-order requirement as :func:`distributed_rank`; with a total
    order the result is bit-identical to the single-partition window
    regardless of where the sampled range boundaries fall — PROVIDED the
    tagged frame is materialized once (round-13 find, see
    :func:`distributed_rank`): the local-scan and totals consumers are
    separate executions and each would otherwise sample its own
    boundaries.

    ``value_col``/``alias`` may be parallel LISTS to scan several columns
    in ONE pass (one range shuffle, one offsets broadcast) — the KS
    running-CDF pair is the motivating case.  A STRICT prefix (unbounded
    preceding → −1) is the inclusive result minus the row's own value —
    exact for integer/decimal inputs, so no separate variant ships.
    """
    vcols = [value_col] if isinstance(value_col, str) else list(value_col)
    aliases = [alias] if isinstance(alias, str) else list(alias)
    if len(vcols) != len(aliases):
        raise ValueError("value_col and alias must pair up")
    cols = _order_cols(order_by)
    part = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    )
    # materialization barrier — correctness, not caching (round-13 find;
    # see distributed_rank's docstring): the local-window and totals
    # consumers must read ONE sampled range partitioning
    tagged = cache_scoped(
        part.select("*", F.spark_partition_id().alias("_ps_pid"))
    )
    lw = (
        W.partitionBy("_ps_pid")
        .orderBy(*cols)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    local = tagged.select(
        "*", *[F.sum(v).over(lw).alias(f"_ps_lps_{i}") for i, v in enumerate(vcols)]
    )
    totals = tagged.groupBy("_ps_pid").agg(
        *[F.sum(v).alias(f"_ps_tot_{i}") for i, v in enumerate(vcols)]
    )
    pw = W.orderBy("_ps_pid").rowsBetween(W.unboundedPreceding, -1)
    offs = totals.select(
        "_ps_pid",
        *[
            F.coalesce(F.sum(f"_ps_tot_{i}").over(pw), F.lit(0)).alias(f"_ps_off_{i}")
            for i in range(len(vcols))
        ],
    )
    out = local.join(F.broadcast(offs), "_ps_pid")
    for i, a in enumerate(aliases):
        out = out.withColumn(a, F.col(f"_ps_lps_{i}") + F.col(f"_ps_off_{i}"))
    return out.drop(
        "_ps_pid",
        *[f"_ps_lps_{i}" for i in range(len(vcols))],
        *[f"_ps_off_{i}" for i in range(len(vcols))],
    )


def bottomk_hash_prefilter(
    df: DataFrame,
    h_col: str,
    group_cols: list[str],
    k: int,
    margin: int = 8,
    keep_count: bool = False,
    with_group_counts: bool = False,
) -> DataFrame:
    """Pre-filter rows to ~``margin * k`` per group before a bottom-k-by-
    md5 collect, making the downstream aggregation state genuinely
    O(margin * k) instead of O(partition rows).

    A plain ``slice(array_sort(collect_list(row)), 1, k)`` is bottom-k in
    its OUTPUT but not in its STATE: the collect_list buffer holds every
    row of the group before the sort/slice runs — an executor-OOM risk at
    100 TB partition sizes (round-10 advice).  This helper bounds it for
    real, exploiting that ``h_col`` is an md5 hex hash, i.e. uniform: the
    k-th smallest of n uniform hashes concentrates tightly at ~(k/n) of
    the hash space, so keeping only rows whose 60-bit hash prefix falls
    under ``margin * k / n_group`` of the space passes every true
    bottom-k row unless the binomial survivor count drops below k —
    probability <= exp(-(margin-1)^2/(2*margin) * k) by Chernoff
    (~e^-98 at k=32, margin=8), and deterministic for a given dataset
    (pinned by equality tests against the unfiltered form).

    Cost: one grouped COUNT on the group keys (map-side combinable; the
    group-count table is group-cardinality-sized, broadcast back), one
    comparison per row.  Groups with n <= margin*k pass through
    unfiltered (threshold = full hash space).

    The "result identical" guarantee is PROBABILISTIC (the Chernoff bound
    above), not unconditional — a pathological group where fewer than k
    rows survive the threshold would silently return a wrong bottom-k
    (round-11 advice).  Callers therefore ENFORCE it: pass
    ``keep_count=True`` to retain the per-row group total ``_bk_n``,
    thread a survivor count through the downstream two-phase agg, and
    gate the merge phase on :func:`bottomk_guard` — >= least(k, n)
    survivors is a sufficient certificate that the true bottom-k
    survived (proof in the guard's docstring), so a deficient group
    raises at runtime instead of producing a wrong answer.

    The survivor-count gate alone cannot see a group whose survivor
    count is ZERO: such a group contributes no rows to the merge
    aggregate, so it would vanish from the output instead of raising
    (round-12 advice).  Pass ``with_group_counts=True`` to also get the
    group-count table ``(group_cols..., _bk_n)`` back as a second
    return value; callers LEFT-join it against the merge-phase output
    (counts on the left — it holds every group that had input rows),
    coalesce the survivor count to 0 for absent groups, and apply
    :func:`bottomk_guard` to the joined frame, which makes the
    enforcement genuinely unconditional: 0 >= least(k, n >= 1) is
    false, so an all-dropped group raises like any other deficient
    group.  The table is group-cardinality-sized (same frame the
    threshold join broadcasts), so the extra join is a broadcast
    against an already-tiny merge output.
    """
    max_prefix = 16**15  # 60-bit prefix of the 128-bit md5, fits a long
    cnt = df.groupBy(*group_cols).agg(F.count("*").alias("_bk_n"))
    thr = F.when(
        F.col("_bk_n") <= margin * k, F.lit(max_prefix)
    ).otherwise(
        F.ceil(F.lit(float(margin * k)) * max_prefix / F.col("_bk_n")).cast(
            "long"
        )
    )
    out = df.join(F.broadcast(cnt), group_cols).filter(
        F.conv(F.substring(F.col(h_col), 1, 15), 16, 10).cast("long") <= thr
    )
    out = out if keep_count else out.drop("_bk_n")
    if with_group_counts:
        return out, cnt
    return out


def bottomk_guard(survivors: Column, n_group: Column, k: int) -> Column:
    """Runtime invariant that closes :func:`bottomk_hash_prefilter`'s
    probabilistic gap (round-11 advice): a boolean column for a
    ``filter`` on the merge-phase aggregate — TRUE whenever the group
    kept at least ``least(k, n_group)`` rows, ``raise_error`` otherwise,
    so a deficient group fails LOUDLY instead of silently returning a
    wrong bottom-k.

    Why the survivor count is a SUFFICIENT certificate: the pre-filter
    keeps exactly the rows whose 60-bit hash prefix is <= the threshold
    — a downward-closed set in hash order (equal-length hex strings
    compare lexicographically = numerically, and the bottom-k sort keys
    lead with the full hash).  If a true bottom-k row r had been dropped,
    every survivor's hash would be strictly below r's, so >= k survivors
    would all outrank r — contradicting r being in the bottom-k.  Hence
    survivors >= least(k, n_group) implies the true bottom-k survived
    intact, turning the Chernoff ~e^-98 bound into an enforced invariant
    at zero extra shuffles (both counts ride the aggs the query already
    runs).

    Completeness (round-12 advice): the guard can only inspect groups
    that REACH the merge aggregate — a group with zero survivors has no
    rows there.  Callers close that edge by requesting the group-count
    table from ``bottomk_hash_prefilter(with_group_counts=True)`` and
    LEFT-joining it over the merge output with the survivor count
    coalesced to 0, so all-dropped groups hit the guard too (both wired
    call sites do this; pinned by
    ``test_bottomk_guard_raises_on_zero_survivor_group``)."""
    ok = survivors >= F.least(F.lit(k).cast("long"), n_group)
    return F.when(ok, F.lit(True)).otherwise(
        F.expr(
            "raise_error('bottomk_hash_prefilter: a group kept fewer than"
            " least(k, n) rows — the md5-threshold pre-filter dropped part"
            " of the true bottom-k; increase margin')"
        )
    )


def dsum(expr: str, alias: str, scale: int = 2, precision: int = 24) -> Column:
    """Exact, order-independent SUM of a double expression, surfaced as DOUBLE.

    Double addition is not associative, so a plain SUM(double) depends on
    Spark's partial-agg order and would not hash-match a sequential DuckDB
    sum.  Two exact strategies, picked by output scale:

    - ``scale <= 2`` (money/quantity): round each row to integer units
      (cents) and SUM as BIGINT — the agg buffer is a mutable long, so the
      whole pipeline stays in whole-stage-codegen HashAggregate (~2x faster
      than decimal sums, measured at 10x sf0.1).  Exact while the unit sum
      fits 2^63: ~9.2e16 cents ≈ $9.2e14 — beyond a 100 TB TPC-H total.
    - ``scale > 2`` (revenue ratios at scale 6): per-row DECIMAL cast and
      DECIMAL sum.  Micro-units would overflow a long at ~9.2e12, which a
      100 TB revenue sum exceeds, so these stay decimal (Spark hash-aggs
      wide decimals fine; buffers just aren't codegen-mutable longs).

    Both are exact and engine-agnostic; the final division/cast to DOUBLE
    is identical IEEE rounding on both engines.
    """
    if scale <= 2:
        unit = 10**scale
        return (
            (F.sum(F.round(F.expr(expr) * unit).cast("long")) / float(unit))
            .alias(alias)
        )
    return (
        F.sum(F.expr(expr).cast(f"decimal({precision},{scale})"))
        .cast("double")
        .alias(alias)
    )


def oracle_dsum(expr: str, alias: str, scale: int = 2, precision: int = 24) -> str:
    """DuckDB-side twin of :func:`dsum` (same strategy split by scale)."""
    if scale <= 2:
        unit = 10**scale
        return (
            f"SUM(CAST(ROUND(({expr}) * {unit}) AS BIGINT)) / {float(unit)} AS {alias}"
        )
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE) AS {alias}"
    )


def fmt_ts(col: str | Column, alias: str) -> Column:
    """Timestamp → 'yyyy-MM-dd HH:mm:ss' string (second precision)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss").alias(alias)


ORACLE_TS_FMT = "%Y-%m-%d %H:%M:%S"


def oracle_fmt_ts(expr: str, alias: str) -> str:
    return f"strftime({expr}, '{ORACLE_TS_FMT}') AS {alias}"


def land_parquet(df: DataFrame, sf_dir: str, table: str, n_files: int = 4) -> str:
    """Land a catalog table as parquet files under /tmp for the streaming
    gates (the landing-zone ingestion pattern their file sources read).

    The dir tag fingerprints the SOURCE data (file names, sizes, mtimes),
    not just the path — regenerated source data gets a fresh landing dir
    instead of a stale replay.  The write goes to a process-unique temp dir
    and is renamed into place: rename(2) is atomic, so two first-run
    processes cannot race each other's half-written files (the loser
    removes its own copy).
    """
    import hashlib
    import os
    import shutil
    import tempfile
    from pathlib import Path

    src = Path(sf_dir) / f"{table}.parquet"
    files = sorted(p for p in src.rglob("*") if p.is_file()) if src.is_dir() else [src]
    h = hashlib.md5(f"{sf_dir}:{table}".encode())
    for f in files:
        st = f.stat()
        h.update(f"{f.name}:{st.st_size}:{st.st_mtime_ns}".encode())
    landing = Path(tempfile.gettempdir()) / f"mr485_land_{table}_{h.hexdigest()[:12]}"
    if not (landing / "_SUCCESS").exists():
        # A landing dir WITHOUT _SUCCESS is a broken leftover (e.g. a crash
        # mid-write): a good dir only ever appears via the atomic rename
        # below, _SUCCESS included.  Clear it or the rename would fail
        # ENOTEMPTY forever and the broken dir would be returned as-is.
        if landing.exists():
            shutil.rmtree(landing, ignore_errors=True)
        tmp = landing.with_name(f"{landing.name}.tmp{os.getpid()}")
        df.repartition(n_files).write.mode("overwrite").parquet(str(tmp))
        try:
            os.rename(tmp, landing)
        except OSError:
            # Either another process won the rename (fine — keep theirs) or
            # the target is still broken; re-check instead of assuming.
            shutil.rmtree(tmp, ignore_errors=True)
            if not (landing / "_SUCCESS").exists():
                raise RuntimeError(
                    f"landing dir {landing} unusable: rename failed and no "
                    "complete copy exists (concurrent broken leftover?)"
                )
    return str(landing)
