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
    the (tiny) shuffle.  Assignment = broadcast join + per-vector argmin
    via a (dist, cid)-ordered window — identical distances and identical
    first-match tie-breaking to the literal `array_position` formulation
    (and structurally the same ROW_NUMBER the DuckDB oracle replays)."""
    from pyspark.sql import Window as W

    spark = emb.sparkSession
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cid int, c array<double>",
    )
    dist = F.expr(
        "aggregate(zip_with(embedding, c, (x, cc) -> (CAST(x AS DOUBLE) - cc)"
        " * (CAST(x AS DOUBLE) - cc)), 0D, (acc, v) -> acc + v)"
    )
    w = W.partitionBy(id_col).orderBy(F.col("_d").asc(), F.col("cid").asc())
    return (
        emb.join(F.broadcast(cent_df))
        .withColumn("_d", dist)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .withColumnRenamed("cid", "cluster")
        .drop("_d", "_rn", "c")
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
) -> list[list[float]]:
    """Run ``iterations`` Lloyd steps; returns the final centroids."""
    first = (
        emb.orderBy(id_col).limit(k).select("embedding").collect()
    )
    dim = len(first[0].embedding)
    centroids = [[float(x) for x in r.embedding] for r in first]
    for _ in range(iterations):
        assigned = assign_clusters(emb, centroids)
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
