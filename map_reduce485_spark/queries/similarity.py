"""Similarity search over the `embeddings` table (array<float> vectors).

- Brute-force cosine top-k: the exactness baseline.  Spark side computes the
  dot product with JVM-side higher-order array functions (zip_with +
  aggregate) — no Python in the loop; query vectors are broadcast.
- LSH-bucketed ANN: the scale path — deterministic random-hyperplane signs
  derived from md5, bucket equi-join, rerank within bucket.  At 100 TB the
  brute force is O(Q·N); LSH makes the candidate set per query ~N/2^bits.
- Embedding near-dup: pairs with cosine ≥ threshold (dedup by embedding).

The reference has no numeric/vector capability at all (strings only,
SURVEY.md §1.2); this is north-star surface mandated by BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce485_spark.queries import query
from map_reduce485_spark.queries._util import T

# cosine similarity between two float arrays, computed in double, sequential
# left-to-right accumulation — matches DuckDB list_cosine_similarity on
# DOUBLE[] inputs.
_COS_EXPR = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " 0D, (acc, v) -> acc + v)"
    " / (sqrt(aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
    " 0D, (acc, v) -> acc + v))"
    " * sqrt(aggregate(transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
    " 0D, (acc, v) -> acc + v)))"
)


def cosine_col(a: str, b: str) -> F.Column:
    return F.expr(_COS_EXPR.format(a=a, b=b))


_TOPK_ORACLE = """
SELECT query_id, neighbor_id, rank, ROUND(sim, 6) AS sim
FROM (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         list_cosine_similarity(
           CAST(q.embedding AS DOUBLE[]), CAST(n.embedding AS DOUBLE[])
         ) AS sim,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(
             CAST(q.embedding AS DOUBLE[]), CAST(n.embedding AS DOUBLE[])
           ) DESC, n.vec_id
         ) AS rank
  FROM embeddings q JOIN embeddings n ON n.vec_id <> q.vec_id
  WHERE q.vec_id < 5
) WHERE rank <= 10
"""


@query("cosine_topk_bruteforce", _TOPK_ORACLE, tags=("similarity",), bench=True)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors for query vectors (vec_id < 5).

    Plan shape: broadcast the (tiny) query side, score every corpus vector
    JVM-side, then per-query top-k via window — the distributed brute-force
    baseline every ANN variant is measured against.  Ties broken by
    neighbor_id; similarity emitted rounded so cross-engine float formatting
    cannot flip the hash."""
    (emb,) = T(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    n = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb"))
    scored = (
        F.broadcast(q)
        .join(n, F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine_col("q_emb", "n_emb").alias("sim"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


_NEARDUP_ORACLE = """
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       ROUND(list_cosine_similarity(
         CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])
       ), 6) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(
        CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])
      ) >= 0.95
"""


@query("dedup_embedding_cosine", _NEARDUP_ORACLE, tags=("similarity", "dedup"))
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ 0.95.

    All-pairs at test SF; at 100 TB candidates come from the LSH buckets
    below (same rerank expression, bucket-local pairs only)."""
    (emb,) = T(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_emb"))
    b = emb.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_emb"))
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", cosine_col("a_emb", "b_emb").alias("_sim"))
        .filter(F.col("_sim") >= 0.95)
        .select("a_id", "b_id", F.round("_sim", 6).alias("sim"))
    )


# Deterministic pseudo-random hyperplanes: component i of plane p is
# (md5-nibble based) in {-1, +1}.  Engine-agnostic (md5 everywhere), so the
# bucketing — though approximate as an ANN method — is exactly reproducible.
_N_PLANES = 8
_DIM = 64


def _plane_sign_expr(p: int) -> str:
    # sign for (plane p, dim i) from one md5 hex char of 'p:i'
    return (
        f"aggregate(zip_with(embedding, _planes[{p}],"
        " (x, s) -> CAST(x AS DOUBLE) * s), 0D, (acc, v) -> acc + v)"
    )


@query("ann_lsh_buckets", None, tags=("similarity",))
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucketing for ANN (the 100 TB scale path).

    Each vector gets an 8-bit signature: bit p = sign(v · r_p) where r_p is
    a ±1 hyperplane derived deterministically from md5(p ∥ ':' ∥ i).  The
    result (vec_id, bucket, label) partitions the corpus into 2^8 buckets;
    top-k search reranks only within the query's bucket (± multi-probe).
    No oracle: LSH bucket membership is not meaningfully expressible as
    ANSI SQL the driver can sanity-check — rows-only check applies; the
    deterministic construction keeps it reproducible run to run.
    """
    import hashlib

    (emb,) = T(spark, sf_dir, "embeddings")
    # build the ±1 planes driver-side from md5 (tiny: 8×64 ints), ship as literal
    planes = [
        [
            1 if int(hashlib.md5(f"{p}:{i}".encode()).hexdigest(), 16) % 2 == 0 else -1
            for i in range(_DIM)
        ]
        for p in range(_N_PLANES)
    ]
    planes_lit = F.array(
        *[F.array(*[F.lit(float(s)) for s in plane]) for plane in planes]
    )
    df = emb.withColumn("_planes", planes_lit)
    bucket = None
    for p in range(_N_PLANES):
        bit = (F.expr(_plane_sign_expr(p)) > 0).cast("int") * (1 << p)
        bucket = bit if bucket is None else bucket + bit
    return df.select("vec_id", "label", bucket.cast("bigint").alias("bucket")).orderBy("vec_id")


_NORMS_ORACLE = """
SELECT vec_id, label,
       ROUND(sqrt(list_inner_product(
         CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])
       )), 6) AS l2_norm
FROM embeddings
"""


@query("embedding_norms", _NORMS_ORACLE, tags=("similarity",))
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm — the basic vectorized array reduction."""
    (emb,) = T(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.round(
            F.sqrt(
                F.expr(
                    "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
                    " 0D, (acc, v) -> acc + v)"
                )
            ),
            6,
        ).alias("l2_norm"),
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the other classic scale path besides LSH
# ---------------------------------------------------------------------------

_IVF_K = 16  # coarse centroids
_IVF_NPROBE = 4  # cells searched per query

_IVF_ORACLE = f"""
WITH cent AS (
  SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cvec
  FROM embeddings ORDER BY vec_id LIMIT {_IVF_K}
),
assign AS (
  SELECT vec_id, cent_id, emb FROM (
    SELECT e.vec_id, c.cent_id, CAST(e.embedding AS DOUBLE[]) AS emb,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec) DESC,
                      c.cent_id
           ) AS rn
    FROM embeddings e CROSS JOIN cent c
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, cent_id FROM (
    SELECT q.vec_id AS query_id, c.cent_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), c.cvec) DESC,
                      c.cent_id
           ) AS rn
    FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 5
  ) WHERE rn <= {_IVF_NPROBE}
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, a.emb
  FROM probes p JOIN assign a ON a.cent_id = p.cent_id
  WHERE a.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, rank, ROUND(sim, 6) AS sim FROM (
  SELECT c.query_id, c.neighbor_id,
         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), c.emb) AS sim,
         ROW_NUMBER() OVER (
           PARTITION BY c.query_id
           ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), c.emb) DESC,
                    c.neighbor_id
         ) AS rank
  FROM cand c JOIN embeddings q ON q.vec_id = c.query_id
) WHERE rank <= {_IVF_NPROBE * 10 // 4}
"""


@query("ann_ivf_topk", _IVF_ORACLE, tags=("similarity",))
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate top-k: coarse-quantize the corpus into
    cells, search only the query's nearest cells.

    Plumbing is the production IVF shape: the centroid set is tiny →
    broadcast everywhere; assignment is a broadcast join + per-vector argmax
    (one shuffle keyed on vec_id); search reranks only the ~nprobe/K fraction
    of the corpus in the probed cells.  Centroids here are the K lowest
    vec_ids — deterministic so the whole pipeline is oracle-checkable; a real
    deployment would swap in k-means centroids (same dataflow, different
    centroid table).  Recall vs the brute-force baseline is bounded by cell
    locality, the standard IVF trade.
    """
    from pyspark.sql import Window as W

    (emb,) = T(spark, sf_dir, "embeddings")
    cent = (
        emb.orderBy("vec_id")
        .limit(_IVF_K)
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec"))
    )
    sim_to_cent = cosine_col("embedding", "cvec")

    w_vec = W.partitionBy("vec_id").orderBy(F.col("_sim").desc(), "cent_id")
    assign = (
        emb.join(F.broadcast(cent))
        .select("vec_id", "cent_id", "embedding", sim_to_cent.alias("_sim"))
        .withColumn("rn", F.row_number().over(w_vec))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cent_id", F.col("embedding").alias("n_emb"))
    )
    probes = (
        emb.filter(F.col("vec_id") < 5)
        .join(F.broadcast(cent))
        .select(F.col("vec_id").alias("query_id"), "cent_id", sim_to_cent.alias("_sim"))
        .withColumn("rn", F.row_number().over(W.partitionBy("query_id").orderBy(F.col("_sim").desc(), "cent_id")))
        .filter(F.col("rn") <= _IVF_NPROBE)
        .select("query_id", "cent_id")
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    cand = (
        F.broadcast(probes)
        .join(assign, "cent_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(q), F.col("q_id") == F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                cosine_col("q_emb", "n_emb").alias("sim"))
    )
    w_rank = W.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        cand.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= _IVF_NPROBE * 10 // 4)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


@query("ann_ivf_kmeans_topk", None, tags=("similarity",))
def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with trained (k-means) centroids — the production form of
    `ann_ivf_topk`.

    Three deterministic Lloyd iterations (`operators/kmeans.py`: exact
    decimal means, lowest-id init, first-match tie-breaks) produce the
    coarse quantizer; assignment, probing, and rerank are the same dataflow
    as `ann_ivf_topk`.  Rows-only check by design: the centroid means are
    order-exact but replaying 3 Lloyd iterations in one ANSI-SQL statement
    is not reasonably expressible; determinism is instead pinned by
    `tests/test_queries.py::test_kmeans_deterministic_and_converges`."""
    from pyspark.sql import Window as W

    from map_reduce485_spark.operators.kmeans import assign_clusters, kmeans_fit

    (emb,) = T(spark, sf_dir, "embeddings")
    centroids = kmeans_fit(emb, k=16, iterations=3)
    assigned = assign_clusters(emb, centroids).select(
        "vec_id", "embedding", "cluster"
    )

    # probe the 4 nearest cells per query vector (same distance math as assign)
    cents = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    qd = (
        emb.filter(F.col("vec_id") < 5)
        .withColumn("_cents", cents)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.posexplode(
                F.expr(
                    "transform(_cents, c -> aggregate(zip_with(embedding, c,"
                    " (x, cc) -> (CAST(x AS DOUBLE) - cc) * (CAST(x AS DOUBLE) - cc)),"
                    " 0D, (acc, v) -> acc + v))"
                )
            ).alias("cell", "dist"),
        )
    )
    probes = (
        qd.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(F.col("dist"), F.col("cell"))
            ),
        )
        .filter(F.col("rn") <= 4)
        .select("query_id", "q_emb", F.col("cell").alias("cluster"))
    )
    cand = (
        F.broadcast(probes)
        .join(assigned, "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_col("q_emb", "embedding").alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )
