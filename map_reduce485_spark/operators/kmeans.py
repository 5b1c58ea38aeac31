"""Deterministic Lloyd k-means over an embedding column — the coarse
quantizer behind IVF ANN (`queries/similarity.ann_ivf_topk` uses a
fixed-centroid stand-in; this operator is the production upgrade).

Dataflow is the standard Spark ML iteration shape: the BIG side (corpus)
never leaves the cluster; the SMALL side (K×dim centroids) round-trips
through the driver once per iteration as literal arrays.  Each iteration is
one broadcast-expression assignment pass + one groupBy-average — two jobs,
no quadratic stage, corpus-linear at any scale.

Determinism (no seeded RNG anywhere):
- init: centroids = the K vectors with the lowest ids (same convention as
  `ann_ivf_topk`);
- assignment: argmin of squared L2 distance, ties broken by lowest centroid
  index (`array_position` returns the first match);
- update: per-dimension mean over integer micro-units — each value rounds
  to round(val·1e6) and sums as BIGINT, so the mean is independent of
  Spark's partial-aggregation order (long addition is associative), reruns
  are bit-identical, AND the arithmetic is replayable in ANSI SQL
  (`queries/similarity.py` builds a DuckDB oracle that reruns all Lloyd
  iterations with the same integer math).  Quantizing a coarse-quantizer
  centroid at 1e-6 is semantically free.  Overflow: |val|≲10 ⇒ per-cluster
  sum ≲ 1e7·n; a long holds n up to ~1e11 rows per cluster — beyond a
  100 TB corpus per cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dist_expr(cent_col: str, vec_col: str = "embedding") -> str:
    """Squared L2 distance between a literal centroid array and the vector."""
    return (
        f"aggregate(zip_with({vec_col}, {cent_col},"
        " (x, c) -> (CAST(x AS DOUBLE) - c) * (CAST(x AS DOUBLE) - c)),"
        " 0D, (acc, v) -> acc + v)"
    )


def assign_clusters(
    emb: DataFrame, centroids: list[list[float]], id_col: str = "vec_id"
) -> DataFrame:
    """(emb columns…, cluster) — nearest-centroid id per vector.

    Centroids ride in as a broadcast DataFrame (K×dim doubles) rather than
    literal arrays: the generated code then contains no per-iteration
    constants, so the codegen cache reuses ONE compiled plan across all
    Lloyd iterations — embedding fresh centroid literals forced a
    multi-thousand-node codegen compile every iteration, which dominated
    the (tiny) shuffle.  Assignment = broadcast join + MIN(struct(dist,
    cid)) groupBy: struct comparison is field-ordered, so the minimum is
    exactly "lowest distance, then lowest centroid id" — the identical
    distances and first-match tie-breaking of the previous ROW_NUMBER
    window form (which the DuckDB oracles still replay), but map-side
    COMBINABLE: the n×K joined frame collapses to one candidate per
    vector inside the scan stage, so the shuffle carries n rows, not n×K
    (at the 100× smoke with corpus-scaled k that is 781× less shuffle —
    the window form sorted 156 M joined rows per Lloyd pass).

    PRECONDITION: ``id_col`` uniquely identifies rows — with duplicate
    ids the per-column first() aggregates could splice `others` values
    from different input rows (round-9 advice; pinned in
    `tests/test_queries.py::test_assign_clusters_column_contract`).
    Output columns preserve the input order, with `cluster` appended."""
    spark = emb.sparkSession
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cid int, c array<double>",
    )
    dist = F.expr(
        "aggregate(zip_with(embedding, c, (x, cc) -> (CAST(x AS DOUBLE) - cc)"
        " * (CAST(x AS DOUBLE) - cc)), 0D, (acc, v) -> acc + v)"
    )
    others = [c for c in emb.columns if c != id_col]
    return (
        emb.join(F.broadcast(cent_df))
        .withColumn("_d", dist)
        .groupBy(id_col)
        .agg(
            F.min(F.struct(F.col("_d"), F.col("cid"))).alias("_m"),
            # every non-id column is constant within a vec_id group (the
            # join only replicated rows), so first() is value-deterministic
            *[F.first(c).alias(c) for c in others],
        )
        .select(*emb.columns, F.col("_m.cid").alias("cluster"))
    )


def _recompute_centroids(assigned: DataFrame, dim: int, k: int) -> list[list[float]]:
    """Per-cluster per-dimension mean over exact integer micro-units; empty
    clusters keep a zero vector (deterministic, and cannot capture points).

    Plan shape: posexplode → groupBy(cluster, dim).  A 64-column wide
    aggregate was measured 4x SLOWER here — each Lloyd iteration embeds
    fresh centroid literals, so the giant per-iteration codegen method
    recompiles every time, swamping the smaller shuffle.  The exploded
    shuffle carries rows×dim longs but reuses one compiled shape across
    iterations."""
    rows = (
        assigned.select("cluster", F.posexplode("embedding").alias("dim", "val"))
        .groupBy("cluster", "dim")
        .agg(
            (
                F.sum(F.round(F.col("val") * 1000000.0).cast("long"))
                / F.count("*")
                / 1000000.0
            ).alias("mean")
        )
        .collect()
    )
    cents = [[0.0] * dim for _ in range(k)]
    for r in rows:
        cents[r.cluster][r.dim] = r.mean
    return cents


def kmeans_fit(
    emb: DataFrame,
    k: int = 16,
    iterations: int = 3,
    id_col: str = "vec_id",
    train_mod: int = 1,
    two_level: bool = False,
) -> list[list[float]]:
    """Run ``iterations`` Lloyd steps; returns the final centroids.

    ``train_mod`` > 1 trains on a DETERMINISTIC md5-bucket sample of the
    corpus (vec_id hash % train_mod == 0, expected 1/train_mod of the
    rows) — the production k-means recipe (nobody runs Lloyd over the
    full corpus; ~64 sampled points per centroid estimate the means, the
    full corpus is assigned exactly ONCE afterwards).  Init (lowest-id k)
    comes from the same sample so the whole training path sees one
    consistent frame.  Sampled training stays oracle-replayable:
    `queries/similarity._kmeans_train_ctes(sampled=True)` reruns the
    identical hash filter with the modulus computed from the corpus
    count in-SQL, so hashes match at every SF, not just where the
    modulus degenerates to 1.

    A small or unlucky corpus can leave the hash sample with fewer than
    k rows (or none — IndexError at init); training then falls back to
    the FULL frame (round-9 advice).  The oracle mirrors the fallback
    with the same count-conditional branch."""
    train = emb
    if train_mod > 1:
        bucket = (
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10)
            .cast("int")
            % train_mod
        )
        train = emb.filter(bucket == 0)
    first = (
        train.orderBy(id_col).limit(k).select("embedding").collect()
    )
    if train_mod > 1 and len(first) < k:
        train = emb
        first = train.orderBy(id_col).limit(k).select("embedding").collect()
    dim = len(first[0].embedding)
    centroids = [[float(x) for x in r.embedding] for r in first]
    assigner = assign_clusters_two_level if two_level else assign_clusters
    for _ in range(iterations):
        assigned = assigner(train, centroids)
        centroids = _recompute_centroids(assigned, dim, k)
    return centroids


def inertia(assigned_with_dist: DataFrame) -> float:
    """Sum of squared distances to the assigned centroid (fit quality)."""
    return assigned_with_dist.agg(
        F.sum(F.col("_mindist").cast("decimal(30,10)")).cast("double").alias("v")
    ).collect()[0].v


def assign_with_distance(emb: DataFrame, centroids: list[list[float]]) -> DataFrame:
    cents = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    df = emb.withColumn("_cents", cents)
    dists = F.expr(f"transform(_cents, c -> {_dist_expr('c')})")
    return (
        df.withColumn("_d", dists)
        .withColumn("cluster", F.expr("array_position(_d, array_min(_d))").cast("int") - 1)
        .withColumn("_mindist", F.expr("array_min(_d)"))
        .drop("_cents", "_d")
    )


# ---------------------------------------------------------------------------
# two-level (IVF-style) assignment — O(n·√k·d) instead of O(n·k·d)
# ---------------------------------------------------------------------------


def _round_half_away(v: float) -> int:
    """round-half-away-from-zero to int — the rounding BOTH SQL engines'
    ROUND() implement.  Python's builtin round() is banker's (half-to-
    even), which would silently diverge from the DuckDB oracle replay of
    the two-level grouping exactly on .5 micro-unit boundaries."""
    import math

    return int(math.copysign(math.floor(abs(v) + 0.5), v))


def _lloyd_rows(
    points: list[list[float]], g: int, iterations: int = 3
) -> list[int]:
    """Deterministic Lloyd over a SMALL in-driver point list (the centroid
    table, k rows): returns each point's final group id in [0, g).

    Exactly the distributed algorithm's conventions, in pure Python: init
    = the g lowest-index points, assignment = argmin squared L2 with
    lowest-group tie-break, update = per-dimension mean over integer
    micro-units (half-away round(val*1e6) summed as ints — see
    `_round_half_away`).  No RNG anywhere, so the grouping is
    bit-reproducible across processes AND replayable in SQL
    (`queries/similarity._two_level_assign_oracle`)."""
    dim = len(points[0])
    cents = [list(points[i]) for i in range(min(g, len(points)))]

    def nearest(p: list[float]) -> int:
        best, bd = 0, None
        for j, c in enumerate(cents):
            d = 0.0
            for x, y in zip(p, c):
                d += (x - y) * (x - y)
            if bd is None or d < bd:
                best, bd = j, d
        return best

    assign = [0] * len(points)
    for _ in range(iterations):
        assign = [nearest(p) for p in points]
        sums = [[0] * dim for _ in range(len(cents))]
        cnts = [0] * len(cents)
        for p, a in zip(points, assign):
            cnts[a] += 1
            for i, x in enumerate(p):
                sums[a][i] += _round_half_away(x * 1000000.0)
        for j in range(len(cents)):
            if cnts[j]:
                cents[j] = [s / cnts[j] / 1000000.0 for s in sums[j]]
            else:
                cents[j] = [0.0] * dim
    return [nearest(p) for p in points]


def assign_clusters_two_level(
    emb: DataFrame, centroids: list[list[float]], id_col: str = "vec_id"
) -> DataFrame:
    """(emb columns…, cluster) — APPROXIMATE nearest-centroid assignment in
    O(n·√k·d): the IVF-on-centroids form that keeps corpus-scaled k
    (k ∝ n, `semdedup_prune_scaled_k`) from making assignment quadratic
    in corpus size.

    The k centroids are themselves clustered into g = ceil(√k) groups by
    a deterministic in-driver Lloyd (`_lloyd_rows` — k rows of driver
    state, already the operator's documented budget).  Each vector then
    (1) finds its nearest GROUP representative (n·g distance evals,
    broadcast join + map-side MIN-struct), and (2) searches only that
    group's member centroids (n·avg(k/g) evals, equi-join on the group
    id).  Total ≈ 2n√k·d vs n·k·d flat — the standard IVF trade: a
    vector whose true nearest centroid lives in a different group gets
    its best IN-GROUP centroid instead (for SemDeDup that only
    re-draws cell boundaries; the within-cell prune is cell-bounded
    either way).  Both passes are map-side-combinable MIN(struct)
    aggregates — the same tie-breaking contract as `assign_clusters`,
    pytest-pinned to return the exact in-group argmin.  Same unique-
    ``id_col`` precondition and output column order as
    `assign_clusters`."""
    import math

    spark = emb.sparkSession
    g = max(1, math.isqrt(len(centroids) - 1) + 1) if len(centroids) > 1 else 1
    groups = _lloyd_rows(centroids, g)
    cent_df = spark.createDataFrame(
        [
            (i, groups[i], [float(x) for x in c])
            for i, c in enumerate(centroids)
        ],
        "cid int, grp int, c array<double>",
    )
    # group representatives: micro-unit mean of member centroids (matches
    # _lloyd_rows' update rule), empty groups excluded entirely
    reps: dict[int, list[float]] = {}
    cnt: dict[int, int] = {}
    dim = len(centroids[0])
    acc: dict[int, list[int]] = {}
    for c, grp in zip(centroids, groups):
        a = acc.setdefault(grp, [0] * dim)
        for i, x in enumerate(c):
            a[i] += _round_half_away(x * 1000000.0)
        cnt[grp] = cnt.get(grp, 0) + 1
    for grp, a in acc.items():
        reps[grp] = [s / cnt[grp] / 1000000.0 for s in a]
    rep_df = spark.createDataFrame(
        [(grp, v) for grp, v in sorted(reps.items())], "grp int, c array<double>"
    )
    dist = F.expr(
        "aggregate(zip_with(embedding, c, (x, cc) -> (CAST(x AS DOUBLE) - cc)"
        " * (CAST(x AS DOUBLE) - cc)), 0D, (acc, v) -> acc + v)"
    )
    others = [c for c in emb.columns if c != id_col]
    coarse = (
        emb.join(F.broadcast(rep_df))
        .withColumn("_d", dist)
        .groupBy(id_col)
        .agg(
            F.min(F.struct(F.col("_d"), F.col("grp"))).alias("_m"),
            *[F.first(c).alias(c) for c in others],
        )
        .select(id_col, *others, F.col("_m.grp").alias("grp"))
    )
    return (
        coarse.join(F.broadcast(cent_df), "grp")
        .withColumn("_d", dist)
        .groupBy(id_col)
        .agg(
            F.min(F.struct(F.col("_d"), F.col("cid"))).alias("_m"),
            *[F.first(c).alias(c) for c in others],
        )
        .select(*emb.columns, F.col("_m.cid").alias("cluster"))
    )
