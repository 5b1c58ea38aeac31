"""Similarity search over the `embeddings` table (array<float> vectors).

- Brute-force cosine top-k: the exactness baseline.  Spark side computes the
  dot product with JVM-side higher-order array functions (zip_with +
  aggregate) — no Python in the loop; query vectors are broadcast.
- LSH-bucketed ANN: the scale path — deterministic random-hyperplane signs
  derived from md5, bucket equi-join, rerank within bucket.  At 100 TB the
  brute force is O(Q·N); LSH makes the candidate set per query ~N/2^bits.
- Embedding near-dup: pairs with cosine ≥ threshold (dedup by embedding),
  as a brute-force twin plus an LSH-banded scale twin, both oracle-checked.
- IVF ANN: coarse-quantize (fixed or k-means-trained centroids), probe the
  nearest cells only.

Cross-engine float parity: every floating-point reduction here is a
*sequential left fold* on both engines — Spark `aggregate(..., 0D,
(acc, v) -> acc + v)` vs DuckDB `list_reduce(..., (acc, el) -> acc + el)`
— so results are bit-identical and ROUND(x, 6) cannot straddle engines.

The reference has no numeric/vector capability at all (strings only,
SURVEY.md §1.2); this is north-star surface mandated by BASELINE.json.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce485_spark.queries import query
from map_reduce485_spark.queries._util import T, cache_scoped

_DIM = 64

# cosine similarity between two float arrays, computed in double, sequential
# left-to-right accumulation — bit-matching the DuckDB fragments below.
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


# ---------------------------------------------------------------------------
# DuckDB fragments: sequential left-fold float math (see module docstring)
# ---------------------------------------------------------------------------


def _duck_dot(a: str, b: str, dim: int = _DIM) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, {dim}),"
        f" i -> {a}[i] * {b}[i]), (acc, el) -> acc + el)"
    )


def _duck_sq(a: str, dim: int = _DIM) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, {dim}),"
        f" i -> {a}[i] * {a}[i]), (acc, el) -> acc + el)"
    )


def _duck_cos(a: str, b: str, dim: int = _DIM) -> str:
    return (
        f"({_duck_dot(a, b, dim)}"
        f" / (sqrt({_duck_sq(a, dim)}) * sqrt({_duck_sq(b, dim)})))"
    )


_DUCK_EMB_CTE = (
    "emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"
)

# unit vectors: norm computed once per row, then per-element division —
# the same two-step shape as the Spark side (`_unit_df`)
_DUCK_UNIT_CTE = (
    "nv AS (SELECT vec_id, list_transform(v, x -> x / n) AS u FROM"
    f" (SELECT vec_id, v, sqrt({_duck_sq('v')}) AS n FROM emb))"
)


def _unit_df(emb: DataFrame) -> DataFrame:
    """(vec_id, u: array<double>) — unit-normalized embeddings.

    Normalizing ONCE per vector turns every pairwise cosine downstream into
    a single dot product (3 array reductions per pair → 1): the standard
    trick that makes brute-force and rerank stages ~3× cheaper at any scale.
    """
    return (
        emb.select("vec_id", "embedding")
        .withColumn(
            "_n",
            F.expr(
                "sqrt(aggregate(transform(embedding,"
                " y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)),"
                " 0D, (acc, v) -> acc + v))"
            ),
        )
        .select(
            "vec_id",
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE) / _n)").alias("u"),
        )
    )


_UNIT_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"


# ---------------------------------------------------------------------------
# brute-force top-k (exactness baseline)
# ---------------------------------------------------------------------------

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


# ---------------------------------------------------------------------------
# embedding near-dup: brute-force twin + LSH-banded scale twin
# ---------------------------------------------------------------------------

# Production embedding-dedup thresholds sit at 0.9-0.95; the synthetic
# corpus has no near-identical embeddings (max pairwise cosine ≈ 0.51 at
# sf0.01), so the gate threshold is 0.4 — low enough that the oracle check
# exercises real rows instead of passing vacuously on an empty result.
_NEARDUP_T = 0.4

_NEARDUP_ORACLE = f"""
WITH {_DUCK_EMB_CTE},
{_DUCK_UNIT_CTE},
pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id, {_duck_dot('a.u', 'b.u')} AS sim
  FROM nv a JOIN nv b ON a.vec_id < b.vec_id
)
SELECT a_id, b_id, sim FROM pairs WHERE sim >= {_NEARDUP_T}
"""


@query("dedup_embedding_cosine", _NEARDUP_ORACLE, tags=("similarity", "dedup"))
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ threshold, all-pairs exact.

    This is the brute-force twin (deliberately O(n²), bounded to test SF);
    `dedup_embedding_lsh` below is the banded plan that survives 100 TB.
    Vectors are unit-normalized once so each pair costs one dot product."""
    (emb,) = T(spark, sf_dir, "embeddings")
    nu = _unit_df(emb)
    a = nu.select(F.col("vec_id").alias("a_id"), F.col("u").alias("au"))
    b = nu.select(F.col("vec_id").alias("b_id"), F.col("u").alias("bu"))
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .select(
            "a_id", "b_id", F.expr(_UNIT_DOT.format(a="au", b="bu")).alias("_sim")
        )
        .filter(F.col("_sim") >= _NEARDUP_T)
        .select("a_id", "b_id", F.col("_sim").alias("sim"))
    )


# ---------------------------------------------------------------------------
# random-hyperplane LSH: deterministic md5-derived planes
# ---------------------------------------------------------------------------

_N_PLANES = 8

# component i of plane p is ±1 by the parity of md5("p:i") — deterministic,
# engine-agnostic, and replayed literally inside the DuckDB oracles below
_PLANES: list[list[int]] = [
    [
        1 if int(hashlib.md5(f"{p}:{i}".encode()).hexdigest(), 16) % 2 == 0 else -1
        for i in range(_DIM)
    ]
    for p in range(_N_PLANES)
]

_DUCK_PLANES_CTE = "planes(p, pv) AS (VALUES " + ", ".join(
    f"({p}, CAST([{', '.join(str(float(s)) for s in plane)}] AS DOUBLE[]))"
    for p, plane in enumerate(_PLANES)
) + ")"

_DUCK_BUCKETS_CTE = f"""buckets AS (
  SELECT e.vec_id, e.label,
         CAST(SUM(CASE WHEN {_duck_dot('e.v', 'pl.pv')} > 0
                  THEN (1 << pl.p) ELSE 0 END) AS BIGINT) AS bucket
  FROM emb e CROSS JOIN planes pl
  GROUP BY e.vec_id, e.label
)"""


def _planes_lit() -> F.Column:
    return F.array(*[F.array(*[F.lit(float(s)) for s in plane]) for plane in _PLANES])


def _plane_sign_expr(p: int) -> str:
    # v · r_p as a sequential fold (requires a `_planes` column in scope)
    return (
        f"aggregate(zip_with(embedding, _planes[{p}],"
        " (x, s) -> CAST(x AS DOUBLE) * s), 0D, (acc, v) -> acc + v)"
    )


def _bucket_expr() -> F.Column:
    """8-bit signature: bit p = sign(v · r_p)."""
    bucket = None
    for p in range(_N_PLANES):
        bit = (F.expr(_plane_sign_expr(p)) > 0).cast("int") * (1 << p)
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("bigint")


_LSH_BUCKETS_ORACLE = f"""
WITH {_DUCK_EMB_CTE},
{_DUCK_PLANES_CTE},
{_DUCK_BUCKETS_CTE}
SELECT vec_id, label, bucket FROM buckets
"""


@query("ann_lsh_buckets", _LSH_BUCKETS_ORACLE, tags=("similarity",))
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucketing for ANN (the 100 TB scale path).

    Each vector gets an 8-bit signature: bit p = sign(v · r_p) where r_p is
    a ±1 hyperplane derived deterministically from md5(p ∥ ':' ∥ i).  The
    result (vec_id, bucket, label) partitions the corpus into 2^8 buckets;
    top-k search reranks only within the query's bucket (± multi-probe).
    The DuckDB oracle replays the identical planes (inlined as literals)
    with the identical sequential dot product, so bucket membership is
    hash-checked exactly — not rows-only."""
    (emb,) = T(spark, sf_dir, "embeddings")
    return (
        emb.withColumn("_planes", _planes_lit())
        .select("vec_id", "label", _bucket_expr().alias("bucket"))
    )


_LSH_NEARDUP_ORACLE = f"""
WITH {_DUCK_EMB_CTE},
{_DUCK_UNIT_CTE},
{_DUCK_PLANES_CTE},
{_DUCK_BUCKETS_CTE},
bands AS (
  SELECT vec_id, 0 AS band_id, bucket & 15 AS band_val FROM buckets
  UNION ALL
  SELECT vec_id, 1 AS band_id, bucket >> 4 AS band_val FROM buckets
),
cand AS (
  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_val = b.band_val AND a.vec_id < b.vec_id
),
scored AS (
  SELECT c.a_id, c.b_id, {_duck_dot('x.u', 'y.u')} AS sim
  FROM cand c JOIN nv x ON x.vec_id = c.a_id JOIN nv y ON y.vec_id = c.b_id
)
SELECT a_id, b_id, sim FROM scored WHERE sim >= {_NEARDUP_T}
"""


@query("dedup_embedding_lsh", _LSH_NEARDUP_ORACLE, tags=("similarity", "dedup"))
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup via LSH banding — the scale twin of
    `dedup_embedding_cosine`.

    The 8-bit hyperplane signature splits into 2 bands of 4 bits; pairs
    agreeing on ≥1 band become candidates (equi-join on (band_id, band_val),
    never all-pairs), then candidates are verified with the exact
    normalized dot.  Candidate volume is bounded by band-bucket sizes —
    corpus-linear for non-degenerate data — which is what survives 100 TB.
    Unlike SimHash chunk-banding there is no pigeonhole guarantee for
    cosine, so recall < 1 by design (recall rises toward ~0.95 at the
    production threshold 0.95, where near-dup pairs disagree with a random
    hyperplane ~6% of the time); the construction is fully deterministic,
    and the oracle replays the same planes, bands, and verify — an exact
    hash check of an approximate algorithm."""
    (emb,) = T(spark, sf_dir, "embeddings")
    nu = _unit_df(emb)
    sig = (
        emb.withColumn("_planes", _planes_lit())
        .select("vec_id", _bucket_expr().alias("_bucket"))
        .join(nu, "vec_id")
    )
    bands = sig.select(
        "vec_id",
        "u",
        F.lit(0).alias("band_id"),
        F.col("_bucket").bitwiseAND(F.lit(15)).alias("band_val"),
    ).unionAll(
        sig.select(
            "vec_id",
            "u",
            F.lit(1).alias("band_id"),
            F.shiftright("_bucket", 4).alias("band_val"),
        )
    )
    a = bands.select(
        F.col("vec_id").alias("a_id"), F.col("u").alias("au"), "band_id", "band_val"
    )
    b = bands.select(
        F.col("vec_id").alias("b_id"), F.col("u").alias("bu"), "band_id", "band_val"
    )
    return (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id", "b_id", F.expr(_UNIT_DOT.format(a="au", b="bu")).alias("_sim")
        )
        .filter(F.col("_sim") >= _NEARDUP_T)
        .dropDuplicates(["a_id", "b_id"])
        .select("a_id", "b_id", F.col("_sim").alias("sim"))
    )


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
    vec_ids — deterministic so the whole pipeline is oracle-checkable; the
    k-means-trained variant below is the production form (same dataflow,
    trained centroid table).  Recall vs the brute-force baseline is bounded
    by cell locality, the standard IVF trade.
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


def _kmeans_sqdist(v: str, c: str, dim: int = _DIM) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, {dim}),"
        f" i -> ({v}[i] - {c}[i]) * ({v}[i] - {c}[i])), (acc, el) -> acc + el)"
    )


def _kmeans_train_ctes(
    k: int = 16, iters: int = 3, dim: int = _DIM, sampled: bool = False
) -> list[str]:
    """DuckDB CTEs replaying `operators/kmeans.kmeans_fit` end to end:
    `emb` → `cent0` (lowest-id init) → per-iteration assign/mean/cent →
    the final assignment `asgf(vec_id, v, cid)` against `cent{iters}`.

    Shared by every oracle that consumes trained centroids
    (`ann_ivf_kmeans_topk`, `semdedup_prune`) so the training replay is
    written once.  Exactness rests on three cross-engine invariants, each
    mirrored from the Spark side: (1) distances/cosines are sequential
    left folds (bit-equal), (2) centroid means are integer micro-unit
    sums (associative, engine-agnostic; `operators/kmeans.py`),
    (3) every argmin breaks ties by the id column.  So all Lloyd
    iterations land on bit-identical centroids in both engines.

    ``sampled=True`` replays `kmeans_fit(train_mod=...)`'s deterministic
    md5-bucket TRAINING SAMPLE at this k: the sample modulus m =
    max(1, ceil(n / (64·k))) is computed from the corpus count INSIDE the
    SQL (so the oracle tracks the Spark side at every SF, not just the
    gate's), training CTEs run over the sampled frame `tr`, and the final
    assignment still covers the full corpus.  The Spark side's
    fewer-than-k-sample fallback (train on the full frame) is mirrored by
    the `tr` union of the two mutually-exclusive branches."""
    zero = "[" + ", ".join("0.0" for _ in range(dim)) + "]"
    train = "tr" if sampled else "emb"

    def assign_cte(name: str, cent: str, src: str = "emb") -> str:
        return f"""{name} AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {_kmeans_sqdist('e.v', 'c.c', dim)} ASC, c.cid ASC) AS rn
    FROM {src} e CROSS JOIN {cent} c
  ) WHERE rn = 1
)"""

    ctes = [
        "emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
    ]
    if sampled:
        ctes.append(
            f"tm AS (SELECT GREATEST(1, (COUNT(*) + {64 * k - 1}) // {64 * k})"
            " AS m FROM emb)"
        )
        ctes.append(
            "samp AS (SELECT e.vec_id, e.v FROM emb e, tm WHERE"
            " CAST('0x' || substr(md5(CAST(e.vec_id AS VARCHAR)), 1, 4)"
            " AS BIGINT) % tm.m = 0)"
        )
        ctes.append(
            f"""tr AS (
  SELECT vec_id, v FROM samp WHERE (SELECT COUNT(*) FROM samp) >= {k}
  UNION ALL
  SELECT vec_id, v FROM emb WHERE (SELECT COUNT(*) FROM samp) < {k}
)"""
        )
    ctes.append(
        f"""cent0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, v AS c
  FROM (SELECT vec_id, v FROM {train} ORDER BY vec_id LIMIT {k})
)"""
    )
    for t in range(1, iters + 1):
        ctes.append(assign_cte(f"asg{t}", f"cent{t - 1}", src=train))
        ctes.append(f"""mean{t} AS (
  SELECT cid, dim,
         CAST(SUM(CAST(ROUND(val * 1000000.0) AS BIGINT)) AS DOUBLE)
           / COUNT(*) / 1000000.0 AS m
  FROM (SELECT cid, UNNEST(v) AS val, UNNEST(generate_series(1, {dim})) AS dim
        FROM asg{t})
  GROUP BY cid, dim
)""")
        ctes.append(f"""cent{t} AS (
  SELECT g.cid, COALESCE(l.c, CAST({zero} AS DOUBLE[])) AS c
  FROM (SELECT UNNEST(generate_series(0, {k - 1})) AS cid) g
  LEFT JOIN (SELECT cid, list(m ORDER BY dim) AS c FROM mean{t} GROUP BY cid) l
    ON l.cid = g.cid
)""")
    ctes.append(assign_cte("asgf", f"cent{iters}"))
    return ctes


def _kmeans_ivf_oracle(
    k: int = 16, iters: int = 3, dim: int = _DIM, nprobe: int = 4, topk: int = 10
) -> str:
    """DuckDB replay of `ann_ivf_kmeans_topk`: the shared Lloyd-training
    CTEs (`_kmeans_train_ctes`) plus probe selection and rerank."""
    final = f"cent{iters}"
    ctes = _kmeans_train_ctes(k, iters, dim)

    def sqdist(v: str, c: str) -> str:
        return _kmeans_sqdist(v, c, dim)
    ctes.append(f"""probes AS (
  SELECT query_id, cid FROM (
    SELECT q.vec_id AS query_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY {sqdist('q.v', 'c.c')} ASC, c.cid ASC) AS rn
    FROM emb q CROSS JOIN {final} c WHERE q.vec_id < 5
  ) WHERE rn <= {nprobe}
)""")
    ctes.append("""cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, a.v
  FROM probes p JOIN asgf a ON a.cid = p.cid
  WHERE a.vec_id <> p.query_id
)""")
    cos = _duck_cos("q.v", "c.v", dim)
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT query_id, neighbor_id, rank, sim FROM (
  SELECT c.query_id, c.neighbor_id, {cos} AS sim,
         ROW_NUMBER() OVER (PARTITION BY c.query_id
           ORDER BY {cos} DESC, c.neighbor_id) AS rank
  FROM cand c JOIN emb q ON q.vec_id = c.query_id
) WHERE rank <= {topk}
"""
    )


@query("ann_ivf_kmeans_topk", _kmeans_ivf_oracle(), tags=("similarity",))
def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with trained (k-means) centroids — the production form of
    `ann_ivf_topk`.

    Three deterministic Lloyd iterations (`operators/kmeans.py`: exact
    integer-micro-unit means, lowest-id init, first-match tie-breaks)
    produce the coarse quantizer; assignment, probing, and rerank are the
    same dataflow as `ann_ivf_topk`.  The DuckDB oracle replays all three
    Lloyd iterations as CTEs with the identical integer/sequential-fold
    arithmetic, so this is hash-checked end to end — training included."""
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
        .select("query_id", "neighbor_id", "rank", "sim")
    )


_CENTROID_ORACLE = """
SELECT label, i - 1 AS pos,
       CAST(SUM(CAST(ROUND(CAST(e[i] AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT)
         / (1000000.0 * COUNT(*)) AS centroid,
       COUNT(*) AS n_vectors
FROM (
  SELECT label, UNNEST(generate_series(1, len(embedding))) AS i, embedding AS e
  FROM embeddings
)
GROUP BY label, i
"""


@query("embedding_label_centroids", _CENTROID_ORACLE, tags=("similarity", "agg"))
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (mean pooling) — the centroid-update step
    of IVF/k-means isolated as its own operator, and the standard class
    prototype / semantic-cluster summary op.

    Element-wise means are order-sensitive in floating point, so each
    component sums exact integer MICRO-UNITS (float -> double is exact,
    ROUND half-away agrees across engines) and divides once at the end —
    partial aggregation can combine in any order and the double still
    hash-matches the oracle bit-for-bit.  Shape: posexplode is
    corpus-linear, the groupBy carries (label, pos) keys — labels x dim
    groups of fixed-size state, fully partial-aggregated map-side."""
    (emb,) = T(spark, sf_dir, "embeddings")
    exploded = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    return (
        exploded.groupBy("label", "pos")
        .agg(
            (
                F.sum(F.round(F.col("v").cast("double") * 1000000).cast("long"))
                / (1000000.0 * F.count("*"))
            ).alias("centroid"),
            F.count("*").alias("n_vectors"),
        )
        .select("label", "pos", "centroid", "n_vectors")
    )


# ---------------------------------------------------------------------------
# product quantization (PQ): compressed-vector ANN scoring
# ---------------------------------------------------------------------------

_PQ_M = 4  # subvectors
_PQ_SUB = _DIM // _PQ_M  # dims per subvector
_PQ_K = 16  # codewords per sub-codebook

# deterministic md5-derived codebooks in [-1, 1), replayed literally in the
# oracle (the ann_lsh plane trick, one level deeper)
_PQ_CB: list[list[list[float]]] = [
    [
        [
            (int(hashlib.md5(f"pq:{m}:{k}:{i}".encode()).hexdigest(), 16) % 2000)
            / 1000.0
            - 1.0
            for i in range(_PQ_SUB)
        ]
        for k in range(_PQ_K)
    ]
    for m in range(_PQ_M)
]


def _pq_cb_lit() -> F.Column:
    return F.array(
        *[
            F.array(*[F.array(*[F.lit(v) for v in cw]) for cw in book])
            for book in _PQ_CB
        ]
    )


def _pq_dists_expr(m: int, vec: str) -> str:
    """Distances of `vec`'s m-th subvector (0-based m) to all K codewords:
    sequential-fold sum of squared diffs — bit-identical on both engines."""
    off = m * _PQ_SUB + 1
    return (
        f"transform(sequence(1, {_PQ_K}), k -> "
        f"aggregate(zip_with(slice({vec}, {off}, {_PQ_SUB}),"
        f" element_at(element_at(_cb, {m + 1}), k),"
        " (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),"
        " 0D, (acc, v) -> acc + v))"
    )


def _pq_duck_fold(vec: str, m: int, code: str) -> str:
    """DuckDB mirror of one subvector-to-codeword distance fold (1-based m)."""
    return (
        f"list_reduce(list_transform(generate_series(1, {_PQ_SUB}), i -> "
        f"(CAST({vec}[{(m - 1) * _PQ_SUB} + i] AS DOUBLE) - cb[{m}][{code}][i])"
        f" * (CAST({vec}[{(m - 1) * _PQ_SUB} + i] AS DOUBLE) - cb[{m}][{code}][i])),"
        " (a, b) -> a + b)"
    )


# codebook literals carry an e0 suffix so DuckDB parses them directly as
# DOUBLE: a bare decimal literal goes through DECIMAL first, and the
# decimal->double conversion at the nested array's unified scale rounds 74
# of these 1024 values one ulp away from Python's float parse — enough to
# break bit-parity with the Spark-side `_pq_cb_lit` literals
_DUCK_PQ_CB_CTE = "cbs AS (SELECT CAST([" + ", ".join(
    "[" + ", ".join("[" + ", ".join(f"{v!r}e0" for v in cw) + "]" for cw in book) + "]"
    for book in _PQ_CB
) + "] AS DOUBLE[][][]) AS cb)"

_DUCK_PQ_ENC = "enc AS (SELECT vec_id, " + ", ".join(
    f"list_position(dl{m}, list_min(dl{m})) AS c{m}" for m in range(1, _PQ_M + 1)
) + " FROM (SELECT vec_id, " + ", ".join(
    f"list_transform(generate_series(1, {_PQ_K}), k -> "
    + _pq_duck_fold("v", m, "k")
    + f") AS dl{m}"
    for m in range(1, _PQ_M + 1)
) + " FROM emb, cbs))"

_PQ_ORACLE = f"""
WITH {_DUCK_EMB_CTE},
{_DUCK_PQ_CB_CTE},
{_DUCK_PQ_ENC}
SELECT query_id, neighbor_id, rank, pq_dist FROM (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         {' + '.join(_pq_duck_fold('q.v', m, f'n.c{m}') for m in range(1, _PQ_M + 1))}
           AS pq_dist,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY {' + '.join(_pq_duck_fold('q.v', m, f'n.c{m}') for m in range(1, _PQ_M + 1))} ASC,
                    n.vec_id
         ) AS rank
  FROM emb q JOIN enc n ON n.vec_id <> q.vec_id, cbs
  WHERE q.vec_id < 5
) WHERE rank <= 10
"""


@query("ann_pq_topk", _PQ_ORACLE, tags=("similarity", "ann"))
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: each vector is compressed to M=4 codes
    (one per 16-dim subvector, K=16 codewords — md5-deterministic
    codebooks), and queries score against the RECONSTRUCTED codewords
    (asymmetric distance computation).

    At 100 TB this is what makes in-memory ANN feasible: 64 float dims
    (256 B) become 4 small codes, a 16-128x memory compression depending
    on code width, and scoring touches codebook entries instead of raw
    vectors.  Encoding is map-side (argmin over K literal codewords, no
    shuffle); scoring broadcasts the 5 query vectors; real deployments add
    the IVF coarse stage (`ann_ivf_topk`) in front so only a cell subset
    is scored.

    Every distance is a sequential fold and the argmin ties break to the
    lowest code via `array_position(d, array_min(d))` — both replayed
    exactly in the oracle, so codes AND double distances hash-match."""
    from pyspark.sql import Window as W

    (emb,) = T(spark, sf_dir, "embeddings")
    enc = emb.withColumn("_cb", _pq_cb_lit())
    for m in range(_PQ_M):
        enc = enc.withColumn(f"_d{m}", F.expr(_pq_dists_expr(m, "embedding")))
        enc = enc.withColumn(
            f"c{m + 1}", F.expr(f"array_position(_d{m}, array_min(_d{m}))").cast("int")
        )
    enc = enc.select("vec_id", *[f"c{m}" for m in range(1, _PQ_M + 1)])

    queries_df = (
        emb.filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    )
    joined = (
        F.broadcast(queries_df)
        .crossJoin(enc.withColumn("_cb", _pq_cb_lit()))
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    dist_terms = [
        f"aggregate(zip_with(slice(q_emb, {m * _PQ_SUB + 1}, {_PQ_SUB}),"
        f" element_at(element_at(_cb, {m + 1}), c{m + 1}),"
        " (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),"
        " 0D, (acc, v) -> acc + v)"
        for m in range(_PQ_M)
    ]
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.expr(" + ".join(dist_terms)).alias("pq_dist"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("pq_dist").asc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "neighbor_id", "rank", "pq_dist")
    )


# ---------------------------------------------------------------------------
# IVF + PQ composed: the production ANN shape
# ---------------------------------------------------------------------------

_IVF_PQ_ORACLE = f"""
WITH {_DUCK_EMB_CTE},
{_DUCK_PQ_CB_CTE},
{_DUCK_PQ_ENC},
cent AS (
  SELECT vec_id AS cent_id, v AS cvec FROM emb ORDER BY vec_id LIMIT {_IVF_K}
),
assign AS (
  SELECT vec_id, cent_id FROM (
    SELECT e.vec_id, c.cent_id,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.v, c.cvec) DESC, c.cent_id
           ) AS rn
    FROM emb e CROSS JOIN cent c
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, cent_id FROM (
    SELECT q.vec_id AS query_id, c.cent_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.v, c.cvec) DESC, c.cent_id
           ) AS rn
    FROM emb q CROSS JOIN cent c WHERE q.vec_id < 5
  ) WHERE rn <= {_IVF_NPROBE}
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a ON a.cent_id = p.cent_id
  WHERE a.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, rank, pq_dist FROM (
  SELECT c.query_id, c.neighbor_id,
         {' + '.join(_pq_duck_fold('q.v', m, f'n.c{m}') for m in range(1, _PQ_M + 1))}
           AS pq_dist,
         ROW_NUMBER() OVER (
           PARTITION BY c.query_id
           ORDER BY {' + '.join(_pq_duck_fold('q.v', m, f'n.c{m}') for m in range(1, _PQ_M + 1))} ASC,
                    c.neighbor_id
         ) AS rank
  FROM cand c
  JOIN enc n ON n.vec_id = c.neighbor_id
  JOIN emb q ON q.vec_id = c.query_id, cbs
) WHERE rank <= 10
"""


@query("ann_ivf_pq_topk", _IVF_PQ_ORACLE, tags=("similarity", "ann"))
def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantization composed with PQ asymmetric scoring — the
    production ANN index shape (FAISS's IVFPQ): probe a few coarse cells,
    score ONLY their members, and score against 4 PQ codes per vector
    instead of 64 raw floats.

    Why this is the 100 TB plan (and what each half contributes):

    - IVF (`ann_ivf_topk`) bounds WHICH vectors are scored — candidates
      shrink to ~nprobe/K of the corpus via a broadcast probe->cell
      equi-join, never a cross join against the corpus.
    - PQ (`ann_pq_topk`) bounds WHAT the candidate rows carry — the
      corpus-sized assignment table holds (vec_id, cell, c1..c4): four
      small ints instead of a 256 B vector, so the shuffle and the
      in-memory index are 16-128x smaller.  Raw embeddings appear only in
      the single encode+assign scan; they never flow into the join graph.

    Cell assignment and PQ encoding are computed in ONE pass over the
    corpus (both are map-side argmins over broadcast literals — one scan,
    no shuffle); the only shuffle is the per-vector argmax window on
    vec_id, shared by both outputs.  Centroids are the K lowest vec_ids
    (deterministic, same as `ann_ivf_topk`; `ann_ivf_kmeans_topk` shows
    the trained form) and codebooks are md5-derived, so the oracle replays
    coarse assignment, probing, encoding, and asymmetric distances exactly
    — every float reduction is a sequential left fold, bit-identical
    across engines.
    """
    from pyspark.sql import Window as W

    (emb,) = T(spark, sf_dir, "embeddings")
    cent = (
        emb.orderBy("vec_id")
        .limit(_IVF_K)
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec"))
    )
    codes = [f"c{m}" for m in range(1, _PQ_M + 1)]

    # one corpus scan: PQ codes (argmin over literal codebooks) + cell
    # assignment (argmax cosine over broadcast centroids), sharing the
    # per-vector window shuffle
    enc = emb.withColumn("_cb", _pq_cb_lit())
    for m in range(_PQ_M):
        enc = enc.withColumn(f"_d{m}", F.expr(_pq_dists_expr(m, "embedding")))
        enc = enc.withColumn(
            f"c{m + 1}", F.expr(f"array_position(_d{m}, array_min(_d{m}))").cast("int")
        )
    w_vec = W.partitionBy("vec_id").orderBy(F.col("_sim").desc(), "cent_id")
    assign = (
        enc.join(F.broadcast(cent))
        .select("vec_id", "cent_id", *codes, cosine_col("embedding", "cvec").alias("_sim"))
        .withColumn("rn", F.row_number().over(w_vec))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cent_id", *codes)
    )

    probes = (
        emb.filter(F.col("vec_id") < 5)
        .join(F.broadcast(cent))
        .select(
            F.col("vec_id").alias("query_id"),
            "cent_id",
            cosine_col("embedding", "cvec").alias("_sim"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(F.col("_sim").desc(), "cent_id")
            ),
        )
        .filter(F.col("rn") <= _IVF_NPROBE)
        .select("query_id", "cent_id")
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    dist_terms = [
        f"aggregate(zip_with(slice(q_emb, {m * _PQ_SUB + 1}, {_PQ_SUB}),"
        f" element_at(element_at(_cb, {m + 1}), c{m + 1}),"
        " (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),"
        " 0D, (acc, v) -> acc + v)"
        for m in range(_PQ_M)
    ]
    cand = (
        F.broadcast(probes)
        .join(assign, "cent_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(q), F.col("q_id") == F.col("query_id"))
        .withColumn("_cb", _pq_cb_lit())
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(" + ".join(dist_terms)).alias("pq_dist"),
        )
    )
    w_rank = W.partitionBy("query_id").orderBy(F.col("pq_dist").asc(), "neighbor_id")
    return (
        cand.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= 10)
        .select("query_id", "neighbor_id", "rank", "pq_dist")
    )


# ---------------------------------------------------------------------------
# scalar quantization (int8): the third compression primitive
# ---------------------------------------------------------------------------

_SQ_ORACLE = """
WITH emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
stats AS (
  SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM emb
)
SELECT vec_id, i - 1 AS pos,
       CASE WHEN mx = mn THEN 0
            ELSE CAST(ROUND((v[i] - mn) * 255.0 / (mx - mn)) AS INTEGER) - 128
       END AS code,
       mn, mx
FROM (SELECT vec_id, v, mn, mx, UNNEST(generate_series(1, len(v))) AS i
      FROM stats)
"""


@query("embedding_scalar_quantize", _SQ_ORACLE, tags=("similarity",))
def embedding_scalar_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 scalar quantization — the third vector-compression
    primitive next to LSH sign bits (`ann_lsh_buckets`) and PQ codes
    (`ann_pq_topk`): each component maps to an 8-bit code against the
    vector's own [min, max] range, a 4x memory cut with per-component
    fidelity (what FAISS calls SQ8).

    Entirely map-side (array min/max + transform per row, no shuffle
    until the result), and exactly replayable: (v - mn) * 255 / (mx - mn)
    is the same double expression tree on both engines, and ROUND ties
    break half-away-from-zero in both Spark and DuckDB — the same
    invariant every money sum here rides on."""
    (emb,) = T(spark, sf_dir, "embeddings")
    stats = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    ).select(
        "vec_id", "v", F.array_min("v").alias("mn"), F.array_max("v").alias("mx")
    )
    return stats.select(
        "vec_id",
        F.posexplode(
            F.expr(
                "CASE WHEN mx = mn THEN transform(v, x -> 0)"
                " ELSE transform(v, x ->"
                " CAST(ROUND((x - mn) * 255.0 / (mx - mn)) AS INT) - 128) END"
            )
        ).alias("pos", "code"),
        "mn",
        "mx",
    )


# ---------------------------------------------------------------------------
# streaming ANN index maintenance
# ---------------------------------------------------------------------------

_STREAM_ANN_INDEX_ORACLE = f"""
WITH {_DUCK_EMB_CTE},
{_DUCK_PLANES_CTE},
{_DUCK_BUCKETS_CTE}
SELECT bucket, COUNT(*) AS n_vectors, MIN(vec_id) AS min_vec_id
FROM buckets GROUP BY bucket
"""


@query(
    "streaming_ann_index_gate",
    _STREAM_ANN_INDEX_ORACLE,
    tags=("similarity", "streaming"),
)
def streaming_ann_index_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ANN INDEX MAINTENANCE under the hash gate: embeddings
    arrive as a file stream (one file per micro-batch), each batch's
    vectors are LSH-bucketed MAP-SIDE (the deterministic md5 hyperplanes
    of `ann_lsh_buckets`), and a foreachBatch sink ADDITIVELY merges the
    per-bucket statistics (count, min vec_id) into a parquet index-stats
    table.  The final table must hash-match the batch bucketing of the
    whole corpus.

    This is the third merge class the streaming sinks witness — additive
    (count += delta, min = least), next to replace-by-latest-key (upsert)
    and replace-by-changed-bucket (continuous aggregate) — and it is how a
    real vector index stays current at 100 TB: bucket membership is
    immutable per vector, so ingestion appends bucket rows and folds
    bucket stats; nothing global recomputes.  The stream itself is
    STATELESS (pure map) — statefulness lives entirely in the sink merge,
    the shape that scales to any throughput."""
    import tempfile

    from pyspark.sql import types as ST

    from map_reduce485_spark.queries._util import land_parquet
    from map_reduce485_spark.streaming.jobs import _merge_swap_parquet

    (emb,) = T(spark, sf_dir, "embeddings")
    landing = land_parquet(emb, sf_dir, "embeddings")

    schema = ST.StructType(
        [
            ST.StructField("vec_id", ST.LongType()),
            ST.StructField("embedding", ST.ArrayType(ST.FloatType())),
            ST.StructField("label", ST.IntegerType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
        .withColumn("_planes", _planes_lit())
        .select("vec_id", _bucket_expr().alias("bucket"))
    )

    work = tempfile.mkdtemp(prefix="mr485_ann_index_")
    stats_dir = f"{work}/bucket_stats"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        bspark = batch_df.sparkSession
        delta = batch_df.groupBy("bucket").agg(
            F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec_id")
        )

        def merge(prev: DataFrame) -> DataFrame:
            p = prev.select(
                "bucket",
                F.col("n_vectors").alias("p_n"),
                F.col("min_vec_id").alias("p_min"),
            )
            d = delta.select(
                "bucket",
                F.col("n_vectors").alias("d_n"),
                F.col("min_vec_id").alias("d_min"),
            )
            return p.join(d, "bucket", "full_outer").select(
                "bucket",
                (F.coalesce("p_n", F.lit(0)) + F.coalesce("d_n", F.lit(0))).alias(
                    "n_vectors"
                ),
                F.least(
                    F.coalesce("p_min", F.col("d_min")),
                    F.coalesce("d_min", F.col("p_min")),
                ).alias("min_vec_id"),
            )

        _merge_swap_parquet(bspark, stats_dir, delta, merge)

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(stats_dir)


_COV_SCALE = 1024  # fixed-point quantization: round(x * 2^10)

_COV_ORACLE = f"""
WITH qv AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(ROUND(x * {_COV_SCALE}) AS BIGINT)) AS q
  FROM embeddings
),
cells AS (
  SELECT i, j, qi * qj AS p
  FROM (SELECT vec_id, q, UNNEST(q) AS qi,
               UNNEST(generate_series(1, len(q))) AS i FROM qv),
       LATERAL (SELECT UNNEST(q) AS qj,
                       UNNEST(generate_series(1, len(q))) AS j)
),
gram AS (SELECT i, j, CAST(SUM(p) AS BIGINT) AS g FROM cells GROUP BY 1, 2),
sums AS (
  SELECT i, CAST(SUM(qi) AS BIGINT) AS s
  FROM (SELECT UNNEST(q) AS qi, UNNEST(generate_series(1, len(q))) AS i FROM qv)
  GROUP BY 1
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM qv)
SELECT g.i, g.j, g.g AS gram,
       CAST(n.n * g.g - si.s * sj.s AS BIGINT) AS cov_n2,
       CAST(n.n * g.g - si.s * sj.s AS DOUBLE)
         / (CAST(n.n AS DOUBLE) * n.n * {float(_COV_SCALE * _COV_SCALE)!r}) AS cov
FROM gram g JOIN sums si ON si.i = g.i JOIN sums sj ON sj.i = g.j, n
"""


@query("embedding_covariance_matrix", _COV_ORACLE, tags=("similarity",))
def embedding_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed gram/covariance matrix over the embedding corpus — the
    input every offline PCA / whitening / low-rank-compression job feeds
    its eigensolver: all 64x64 cells of n^2*Cov = n*sum(q_i q_j) -
    sum(q_i)sum(q_j), computed in fixed-point integers (components
    quantized once as round(x*2^10); every product/sum thereafter exact
    bigint), so the matrix is bit-identical across engines and the final
    float cov is one division.

    Scale shape: the outer product runs MAP-SIDE as two nested explodes
    per row (no self-join — the row already holds both factors), and the
    only shuffle carries partial HashAggregate cells: at most
    partitions x d^2 rows regardless of corpus size.  The d^2 result is
    driver-tiny for any d that fits an eigensolver; the 64-row marginal
    sums broadcast back onto it."""
    (emb,) = T(spark, sf_dir, "embeddings")
    qv = emb.select(
        "vec_id",
        F.expr(
            f"transform(CAST(embedding AS ARRAY<DOUBLE>),"
            f" x -> CAST(ROUND(x * {_COV_SCALE}) AS BIGINT))"
        ).alias("q"),
    )
    cells = qv.select(
        F.posexplode("q").alias("i0", "qi"), "q"
    ).select(
        (F.col("i0") + 1).alias("i"),
        "qi",
        F.posexplode("q").alias("j0", "qj"),
    )
    gram = (
        cells.groupBy("i", (F.col("j0") + 1).alias("j"))
        .agg(F.sum(F.col("qi") * F.col("qj")).alias("g"))
    )
    sums = (
        qv.select(F.posexplode("q").alias("i0", "qi"))
        .groupBy((F.col("i0") + 1).alias("i"))
        .agg(F.sum("qi").alias("s"))
    )
    nrow = qv.agg(F.count("*").alias("n"))
    out = (
        gram.join(
            F.broadcast(sums.select(F.col("i").alias("si_i"), F.col("s").alias("si"))),
            F.col("i") == F.col("si_i"),
        )
        .join(
            F.broadcast(sums.select(F.col("i").alias("sj_i"), F.col("s").alias("sj"))),
            F.col("j") == F.col("sj_i"),
        )
        .crossJoin(F.broadcast(nrow))
    )
    cov_n2 = F.col("n") * F.col("g") - F.col("si") * F.col("sj")
    return out.select(
        "i",
        "j",
        F.col("g").alias("gram"),
        cov_n2.cast("long").alias("cov_n2"),
        (
            cov_n2.cast("double")
            / (
                F.col("n").cast("double")
                * F.col("n")
                * F.lit(float(_COV_SCALE * _COV_SCALE))
            )
        ).alias("cov"),
    )


_PCA_ORACLE = f"""
WITH qv AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(ROUND(x * {_COV_SCALE}) AS BIGINT)) AS q
  FROM embeddings
),
cells AS (
  SELECT i, j, qi * qj AS p
  FROM (SELECT vec_id, q, UNNEST(q) AS qi,
               UNNEST(generate_series(1, len(q))) AS i FROM qv),
       LATERAL (SELECT UNNEST(q) AS qj,
                       UNNEST(generate_series(1, len(q))) AS j)
),
gram AS (SELECT i, j, CAST(SUM(p) AS BIGINT) AS g FROM cells GROUP BY 1, 2),
sums AS (
  SELECT i, CAST(SUM(qi) AS BIGINT) AS s
  FROM (SELECT UNNEST(q) AS qi, UNNEST(generate_series(1, len(q))) AS i FROM qv)
  GROUP BY 1
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM qv),
c AS (
  SELECT g.i, g.j,
         CAST(FLOOR(CAST(n.n * g.g - si.s * sj.s AS DOUBLE) / 1048576e0)
              AS BIGINT) AS c
  FROM gram g JOIN sums si ON si.i = g.i JOIN sums sj ON sj.i = g.j, n
),
v1 AS (SELECT i, CAST(SUM(c) AS BIGINT) AS v FROM c GROUP BY i),
v1s AS (SELECT i, CAST(FLOOR(CAST(v AS DOUBLE) / 1024e0) AS BIGINT) AS v FROM v1),
v2 AS (SELECT c.i, CAST(SUM(c.c * v.v) AS BIGINT) AS v
       FROM c JOIN v1s v ON v.i = c.j GROUP BY c.i),
v2s AS (SELECT i, CAST(FLOOR(CAST(v AS DOUBLE) / 1048576e0) AS BIGINT) AS v FROM v2),
v3 AS (SELECT c.i, CAST(SUM(c.c * v.v) AS BIGINT) AS v
       FROM c JOIN v2s v ON v.i = c.j GROUP BY c.i)
SELECT i, CAST(FLOOR(CAST(v AS DOUBLE) / 1048576e0) AS BIGINT) AS direction_scaled
FROM v3
"""


@query("pca_power_iteration", _PCA_ORACLE, tags=("similarity",))
def pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the embedding corpus by THREE power
    iterations over the exact integer covariance
    (`embedding_covariance_matrix`) — the distributed-PCA shape: matvecs
    are join+groupBy over the d^2 cell table with the d-row vector
    BROADCAST, every multiply-add exact bigint; between iterations the
    vector is rescaled by a fixed power-of-two FLOOR(CAST(v AS
    DOUBLE)/2^k) whose double cast, division, and floor are the identical
    IEEE ops on both engines (power iteration only needs direction, so
    fixed right-shifts replace norm division — the trick that keeps the
    whole pipeline hash-exact where a float normalize would drift).

    Shift schedule bounds every intermediate: |C'| <= 2^23 after the
    2^20 shift, products <= 2^52, matvec sums <= 2^58 — all inside
    int64.  Scale: iteration cost is the d^2 cell table (driver-free),
    corpus size only enters through the one covariance pass."""
    cov = embedding_covariance_matrix(spark, sf_dir).select(
        "i",
        "j",
        F.floor(F.col("cov_n2").cast("double") / F.lit(1048576.0))
        .cast("long")
        .alias("c"),
    )
    v1 = cov.groupBy("i").agg(F.sum("c").alias("v"))
    v1s = v1.select(
        "i", F.floor(F.col("v").cast("double") / F.lit(1024.0)).cast("long").alias("v")
    )

    def matvec(vdf):
        return (
            cov.join(
                F.broadcast(vdf.select(F.col("i").alias("vj"), F.col("v").alias("vv"))),
                F.col("j") == F.col("vj"),
            )
            .groupBy("i")
            .agg(F.sum(F.col("c") * F.col("vv")).alias("v"))
        )

    v2 = matvec(v1s)
    v2s = v2.select(
        "i",
        F.floor(F.col("v").cast("double") / F.lit(1048576.0)).cast("long").alias("v"),
    )
    v3 = matvec(v2s)
    return v3.select(
        "i",
        F.floor(F.col("v").cast("double") / F.lit(1048576.0))
        .cast("long")
        .alias("direction_scaled"),
    )


# ---------------------------------------------------------------------------
# reciprocal-rank fusion (hybrid retrieval)
# ---------------------------------------------------------------------------

_RRF_K = 60  # the standard RRF damping constant (Cormack et al., SIGIR'09)

_RRF_ORACLE = f"""
WITH {_DUCK_EMB_CTE},
scored AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         {_duck_cos('q.v', 'n.v')} AS sim_cos,
         {_duck_dot('q.v', 'n.v')} AS sim_dot
  FROM emb q JOIN emb n ON n.vec_id <> q.vec_id
  WHERE q.vec_id < 5
),
ranked AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim_cos DESC, neighbor_id) AS rank_cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim_dot DESC, neighbor_id) AS rank_dot
  FROM scored
),
fused AS (
  SELECT query_id, neighbor_id, rank_cos, rank_dot,
         1e0 / ({_RRF_K} + rank_cos) + 1e0 / ({_RRF_K} + rank_dot) AS rrf_score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY 1e0 / ({_RRF_K} + rank_cos)
                                   + 1e0 / ({_RRF_K} + rank_dot) DESC,
                            neighbor_id) AS fused_rank
  FROM ranked
)
SELECT query_id, neighbor_id, rank_cos, rank_dot, fused_rank,
       ROUND(rrf_score, 6) AS rrf_score
FROM fused WHERE fused_rank <= 10
"""


@query("rrf_fusion_topk", _RRF_ORACLE, tags=("similarity",), bench=True)
def rrf_fusion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion — THE standard combiner for hybrid retrieval
    (dense + sparse, or here: cosine vs raw inner-product, which disagree
    exactly where corpus norms vary).  Each ranking is a per-query window
    over one broadcast-scored frame; the fused score 1/(k+r_a) + 1/(k+r_b)
    uses only small-integer ranks, so the doubles are identical on both
    engines by construction — no float-sum ordering to pin.  At scale the
    input rankings come from the ANN variants (`ann_ivf_pq_topk` etc.) and
    fusion touches only Q·k candidate rows; scoring every corpus vector
    here is the test-SF exactness twin of that plan."""
    from pyspark.sql import Window as W

    (emb,) = T(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    n = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb"))
    dot_expr = (
        "aggregate(zip_with(q_emb, n_emb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " 0D, (acc, v) -> acc + v)"
    )
    scored = (
        F.broadcast(q)
        .join(n, F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_col("q_emb", "n_emb").alias("sim_cos"),
            F.expr(dot_expr).alias("sim_dot"),
        )
    )
    ranked = scored.select(
        "query_id",
        "neighbor_id",
        F.row_number()
        .over(W.partitionBy("query_id").orderBy(F.col("sim_cos").desc(), "neighbor_id"))
        .alias("rank_cos"),
        F.row_number()
        .over(W.partitionBy("query_id").orderBy(F.col("sim_dot").desc(), "neighbor_id"))
        .alias("rank_dot"),
    )
    score = 1.0 / (_RRF_K + F.col("rank_cos")) + 1.0 / (_RRF_K + F.col("rank_dot"))
    fused = ranked.select(
        "query_id",
        "neighbor_id",
        "rank_cos",
        "rank_dot",
        score.alias("rrf_score"),
        F.row_number()
        .over(W.partitionBy("query_id").orderBy(score.desc(), "neighbor_id"))
        .alias("fused_rank"),
    )
    return fused.filter(F.col("fused_rank") <= 10).select(
        "query_id",
        "neighbor_id",
        "rank_cos",
        "rank_dot",
        "fused_rank",
        F.round("rrf_score", 6).alias("rrf_score"),
    )


# ---------------------------------------------------------------------------
# MMR diversified top-k (unrolled greedy selection)
# ---------------------------------------------------------------------------

_MMR_K = 5          # picks per query
_MMR_POOL = 20      # candidate pool per query (top-N by relevance)
_MMR_LAM = 0.7      # relevance weight; (1 - lam) penalizes redundancy


def _oracle_mmr() -> str:
    """Unrolled greedy MMR rounds as chained CTEs — the literal selection
    loop the Spark side runs, replayed sequentially."""
    ctes = [
        _DUCK_EMB_CTE,
        # candidate pool: top-N by relevance per query, ties by id
        f"""cand AS (
  SELECT query_id, cid, rel FROM (
    SELECT q.vec_id AS query_id, n.vec_id AS cid,
           {_duck_cos('q.v', 'n.v')} AS rel,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {_duck_cos('q.v', 'n.v')} DESC, n.vec_id) AS rnk
    FROM emb q JOIN emb n ON n.vec_id <> q.vec_id
    WHERE q.vec_id < 3
  ) WHERE rnk <= {_MMR_POOL})""",
        # pairwise sims within each pool
        f"""psim AS (
  SELECT a.query_id, a.cid AS a_id, b.cid AS b_id, {_duck_cos('va.v', 'vb.v')} AS sim
  FROM cand a JOIN cand b ON a.query_id = b.query_id AND a.cid <> b.cid
  JOIN emb va ON va.vec_id = a.cid JOIN emb vb ON vb.vec_id = b.cid)""",
        """s1 AS (
  SELECT query_id, cid, 1 AS pick_rank, rel AS score FROM (
    SELECT query_id, cid, rel,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rel DESC, cid) AS rnk
    FROM cand) WHERE rnk = 1)""",
    ]
    for t in range(2, _MMR_K + 1):
        p = t - 1
        ctes.append(f"""m{t} AS (
  SELECT c.query_id, c.cid, c.rel, MAX(p.sim) AS maxsim
  FROM cand c
  JOIN psim p ON p.query_id = c.query_id AND p.a_id = c.cid
  JOIN s{p} s ON s.query_id = p.query_id AND s.cid = p.b_id
  WHERE NOT EXISTS (SELECT 1 FROM s{p} x WHERE x.query_id = c.query_id AND x.cid = c.cid)
  GROUP BY c.query_id, c.cid, c.rel)""")
        ctes.append(f"""s{t} AS (
  SELECT query_id, cid, pick_rank, score FROM s{p}
  UNION ALL
  SELECT query_id, cid, {t} AS pick_rank, mmr AS score FROM (
    SELECT query_id, cid,
           {_MMR_LAM} * rel - {round(1 - _MMR_LAM, 10)} * maxsim AS mmr,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY {_MMR_LAM} * rel
                                     - {round(1 - _MMR_LAM, 10)} * maxsim DESC,
                              cid) AS rnk
    FROM m{t}) WHERE rnk = 1)""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT query_id, cid, pick_rank, ROUND(score, 6) AS score FROM s{_MMR_K}"
    )


@query("mmr_diversified_topk", _oracle_mmr(), tags=("similarity",))
def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein '98) — the
    diversified re-rank every RAG retriever runs after ANN: greedily pick
    k results where each pick maximizes λ·relevance − (1−λ)·max-similarity
    to what's already picked, so near-duplicate hits can't crowd the
    context window.  Greedy selection is inherently sequential, but ONLY
    across the k picks: each of the k unrolled rounds is a fully
    distributed (remaining ⋈ pairwise-sims ⋈ selected) → group-max →
    per-query top-1 window, all queries advancing in parallel — the same
    fixed-unroll move as `pagerank_trade_graph`/`sssp_trade_graph`, here
    on an argmax recurrence.  Pool relevance and pair similarities are
    the sequential-fold cosines (bit-identical cross-engine), the MMR
    combination is one shared expression tree, ties break by id — so all
    k picks hash-match the oracle's CTE replay.

    Scale: pair sims are computed once within each query's POOL (N²
    per query with N=pool size, not corpus size) and every round touches
    only pool rows; the corpus-sized work is the candidate generation,
    delegated to the ANN queries at scale (this pool uses exact top-N as
    its test-SF twin)."""
    from pyspark.sql import Window as W

    (emb,) = T(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    n = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("n_emb"))
    cand = cache_scoped(
        F.broadcast(q)
        .join(n, F.col("cid") != F.col("query_id"))
        .select("query_id", "cid", cosine_col("q_emb", "n_emb").alias("rel"))
        .withColumn(
            "rnk",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(F.col("rel").desc(), "cid")
            ),
        )
        .filter(F.col("rnk") <= _MMR_POOL)
        .drop("rnk")
    )
    a = cand.select("query_id", F.col("cid").alias("a_id"))
    b = cand.select(F.col("query_id").alias("qb"), F.col("cid").alias("b_id"))
    va = emb.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_emb"))
    vb = emb.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_emb"))
    psim = cache_scoped(
        a.join(b, (F.col("query_id") == F.col("qb")) & (F.col("a_id") != F.col("b_id")))
        .join(va, "a_id")
        .join(vb, "b_id")
        .select("query_id", "a_id", "b_id", cosine_col("a_emb", "b_emb").alias("sim"))
    )

    w_rel = W.partitionBy("query_id").orderBy(F.col("rel").desc(), "cid")
    sel = (
        cand.withColumn("rnk", F.row_number().over(w_rel))
        .filter(F.col("rnk") == 1)
        .select("query_id", "cid", F.lit(1).alias("pick_rank"), F.col("rel").alias("score"))
    )
    lam, mu = _MMR_LAM, round(1 - _MMR_LAM, 10)
    for t in range(2, _MMR_K + 1):
        rem = cand.join(sel.select("query_id", "cid"), ["query_id", "cid"], "left_anti")
        ms = (
            rem.join(
                psim.withColumnRenamed("a_id", "cid"),
                ["query_id", "cid"],
            )
            .join(
                sel.select("query_id", F.col("cid").alias("b_id")),
                ["query_id", "b_id"],
            )
            .groupBy("query_id", "cid", "rel")
            .agg(F.max("sim").alias("maxsim"))
        )
        mmr = lam * F.col("rel") - mu * F.col("maxsim")
        w_mmr = W.partitionBy("query_id").orderBy(mmr.desc(), "cid")
        pick = (
            ms.withColumn("rnk", F.row_number().over(w_mmr))
            .filter(F.col("rnk") == 1)
            .select(
                "query_id",
                "cid",
                F.lit(t).alias("pick_rank"),
                mmr.alias("score"),
            )
        )
        # truncate lineage each round: sel is referenced ~4× per subsequent
        # round (anti-join, selected-side join, union), so an uncut plan
        # grows geometrically and Catalyst analysis dominates runtime — the
        # `operators/components.py` lesson; the frame is ≤ Q·k rows, so the
        # eager checkpoint is effectively free.
        sel = sel.unionAll(pick).localCheckpoint(eager=True)
    return sel.select(
        "query_id", "cid", "pick_rank", F.round("score", 6).alias("score")
    )


# ---------------------------------------------------------------------------
# random projection (Johnson-Lindenstrauss sketch, md5-derived signs)
# ---------------------------------------------------------------------------

_RP_OUT = 8


def _rp_signs() -> list[list[int]]:
    """±1 sign matrix (OUT × DIM), derived from md5 so every engine/run
    agrees without sharing state: sign[j][i] = +1 iff the first hex digit
    of md5("rp:j:i") < '8'.  Materialized as literals into BOTH the Spark
    expressions and the oracle SQL — the projection matrix is data, not
    code, exactly how a production pipeline would broadcast it."""
    import hashlib as _h

    return [
        [
            1 if _h.md5(f"rp:{j}:{i}".encode()).hexdigest()[0] < "8" else -1
            for i in range(_DIM)
        ]
        for j in range(_RP_OUT)
    ]


def _oracle_rp() -> str:
    signs = _rp_signs()
    comps = []
    for j in range(_RP_OUT):
        lit = "[" + ", ".join(str(s) for s in signs[j]) + "]"
        comps.append(
            f"ROUND(list_reduce(list_transform(generate_series(1, {_DIM}),"
            f" i -> v[i] * ({lit})[i]), (acc, el) -> acc + el), 6) AS p{j}"
        )
    sq = " + ".join(f"p{j} * p{j}" for j in range(_RP_OUT))
    return f"""
WITH {_DUCK_EMB_CTE},
proj AS (SELECT vec_id, {', '.join(comps)},
         {_duck_sq('v')} AS norm2 FROM emb)
SELECT vec_id, {', '.join(f'p{j}' for j in range(_RP_OUT))},
       ROUND(({sq}) / {_RP_OUT} / norm2, 6) AS norm_ratio
FROM proj
"""


@query("embedding_random_projection", _oracle_rp(), tags=("similarity",))
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sketch: project every 64-d embedding to 8
    dimensions through a deterministic ±1 sign matrix (md5-derived, see
    `_rp_signs`) — the dimensionality reduction that makes billion-vector
    candidate generation cheap (8 doubles ≈ 16× less shuffle than the raw
    vector; `ann_pq_topk` is the codebook alternative).  Each component is
    the house sequential left fold, so doubles hash-match; `norm_ratio`
    ((Σpⱼ²)/8 ÷ ‖v‖²) is emitted per row as the JL distortion witness —
    E[ratio] = 1, and the pytest pins its concentration.  Pure map-side:
    zero shuffle at any corpus size, and the sign matrix travels as plan
    literals exactly like a broadcast."""
    (emb,) = T(spark, sf_dir, "embeddings")
    signs = _rp_signs()
    comps = []
    for j in range(_RP_OUT):
        lit = "array(" + ", ".join(str(s) for s in signs[j]) + ")"
        comps.append(
            F.round(
                F.expr(
                    f"aggregate(zip_with(embedding, {lit},"
                    " (x, s) -> CAST(x AS DOUBLE) * s), 0D, (acc, v) -> acc + v)"
                ),
                6,
            ).alias(f"p{j}")
        )
    proj = emb.select(
        "vec_id",
        *comps,
        F.expr(
            "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
            " 0D, (acc, v) -> acc + v)"
        ).alias("norm2"),
    )
    sq = None
    for j in range(_RP_OUT):
        term = F.col(f"p{j}") * F.col(f"p{j}")
        sq = term if sq is None else sq + term
    return proj.select(
        "vec_id",
        *[f"p{j}" for j in range(_RP_OUT)],
        F.round(sq / _RP_OUT / F.col("norm2"), 6).alias("norm_ratio"),
    )


# ---------------------------------------------------------------------------
# centroid drift matrix (embedding-distribution monitoring)
# ---------------------------------------------------------------------------

_DRIFT_ORACLE = f"""
WITH e AS (
  SELECT label, UNNEST(generate_series(1, len(embedding))) AS i, embedding AS emb
  FROM embeddings
),
sums AS (
  SELECT label, i,
         CAST(SUM(CAST(ROUND(CAST(emb[i] AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM e GROUP BY label, i
),
cent AS (SELECT label, i, CAST(s AS DOUBLE) / (1000000.0 * n) AS c FROM sums),
arrs AS (SELECT label, list(c ORDER BY i) AS v FROM cent GROUP BY label),
ns AS (SELECT label, MAX(n) AS n_vectors FROM sums GROUP BY label)
SELECT a.label AS a_label, b.label AS b_label,
       na.n_vectors AS n_a, nb.n_vectors AS n_b,
       ROUND({_duck_cos('a.v', 'b.v')}, 6) AS centroid_cos
FROM arrs a JOIN arrs b ON a.label < b.label
JOIN ns na ON na.label = a.label JOIN ns nb ON nb.label = b.label
"""


@query("centroid_drift_matrix", _DRIFT_ORACLE, tags=("similarity", "agg"))
def centroid_drift_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine between per-label embedding centroids — the drift
    matrix an embedding pipeline monitors across sources/snapshots (two
    populations whose centroids drift toward 1 are collapsing into each
    other; toward 0, diverging).  Centroids reuse the micro-unit exact
    pooling of `embedding_label_centroids` (bigint sums, one division),
    assembled into position-ordered arrays, then the house sequential-fold
    cosine per label pair.  Scale: the corpus-sized work is ONE exploded
    aggregation (combinable map-side, d longs per label); the pairwise
    stage touches only L centroids — L² tiny rows no matter how many
    vectors."""
    (emb,) = T(spark, sf_dir, "embeddings")
    exploded = emb.select("label", F.posexplode("embedding").alias("pos", "x"))
    sums = exploded.groupBy("label", "pos").agg(
        F.sum(F.round(F.col("x").cast("double") * 1000000).cast("long")).alias("s"),
        F.count("*").alias("n"),
    )
    cent = sums.select(
        "label",
        "pos",
        (F.col("s").cast("double") / (1000000.0 * F.col("n"))).alias("c"),
    )
    arrs = cent.groupBy("label").agg(
        F.expr("transform(array_sort(collect_list(struct(pos, c))), t -> t.c)").alias("v")
    )
    ns = sums.groupBy("label").agg(F.max("n").alias("n_vectors"))
    a = arrs.select(F.col("label").alias("a_label"), F.col("v").alias("va"))
    b = arrs.select(F.col("label").alias("b_label"), F.col("v").alias("vb"))
    na = ns.select(F.col("label").alias("a_label"), F.col("n_vectors").alias("n_a"))
    nb = ns.select(F.col("label").alias("b_label"), F.col("n_vectors").alias("n_b"))
    cos = F.expr(
        "aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
        " / (sqrt(aggregate(transform(va, x -> x * x), 0D, (acc, v) -> acc + v))"
        " * sqrt(aggregate(transform(vb, x -> x * x), 0D, (acc, v) -> acc + v)))"
    )
    return (
        a.join(b, F.col("a_label") < F.col("b_label"))
        .join(na, "a_label")
        .join(nb, "b_label")
        .select(
            "a_label",
            "b_label",
            "n_a",
            "n_b",
            F.round(cos, 6).alias("centroid_cos"),
        )
    )


# ---------------------------------------------------------------------------
# Matryoshka truncation evaluation (prefix-dim retrieval recall)
# ---------------------------------------------------------------------------

_MRL_PREFIX = 16  # prefix dims scored against the full 64


def _duck_cos_prefix(a: str, b: str, dim: int) -> str:
    return (
        f"(list_reduce(list_transform(generate_series(1, {dim}),"
        f" i -> {a}[i] * {b}[i]), (acc, el) -> acc + el)"
        f" / (sqrt(list_reduce(list_transform(generate_series(1, {dim}),"
        f" i -> {a}[i] * {a}[i]), (acc, el) -> acc + el))"
        f" * sqrt(list_reduce(list_transform(generate_series(1, {dim}),"
        f" i -> {b}[i] * {b}[i]), (acc, el) -> acc + el))))"
    )


_MRL_ORACLE = f"""
WITH {_DUCK_EMB_CTE},
full_rank AS (
  SELECT query_id, cid, rnk FROM (
    SELECT q.vec_id AS query_id, n.vec_id AS cid,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {_duck_cos('q.v', 'n.v')} DESC, n.vec_id) AS rnk
    FROM emb q JOIN emb n ON n.vec_id <> q.vec_id WHERE q.vec_id < 5
  ) WHERE rnk <= 10),
prefix_rank AS (
  SELECT query_id, cid FROM (
    SELECT q.vec_id AS query_id, n.vec_id AS cid,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {_duck_cos_prefix('q.v', 'n.v', _MRL_PREFIX)} DESC,
                              n.vec_id) AS rnk
    FROM emb q JOIN emb n ON n.vec_id <> q.vec_id WHERE q.vec_id < 5
  ) WHERE rnk <= 10)
SELECT f.query_id,
       CAST(COUNT(p.cid) AS BIGINT) AS n_overlap,
       CAST(COUNT(p.cid) AS DOUBLE) / 10 AS recall_at_10
FROM full_rank f
LEFT JOIN prefix_rank p ON p.query_id = f.query_id AND p.cid = f.cid
GROUP BY f.query_id
"""


@query("matryoshka_recall_eval", _MRL_ORACLE, tags=("similarity", "eval"))
def matryoshka_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation evaluation: score retrieval with only the
    FIRST 16 of 64 dims and measure recall@10 against the full-dim
    ranking — the measurement that decides how far MRL-style prefix
    truncation (4× less vector memory and shuffle here) can go before
    quality falls off.  The evaluation twin of
    `embedding_random_projection` (which compresses by sketching) and
    `minhash_estimate_quality` (the same estimator-vs-exact layer for
    set similarity).  Both rankings are broadcast-scored windows with the
    house fold cosines (`slice` gives the prefix on the Spark side,
    bounded generate_series on DuckDB); recall is an int/10 division.
    Scale: two corpus scans, Q·k-row join — corpus-linear like every
    scoring pass here."""
    from pyspark.sql import Window as W

    (emb,) = T(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    n = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("n_emb"))
    scored = (
        F.broadcast(q)
        .join(n, F.col("cid") != F.col("query_id"))
        .select(
            "query_id",
            "cid",
            cosine_col("q_emb", "n_emb").alias("sim_full"),
            F.expr(
                f"aggregate(zip_with(slice(q_emb, 1, {_MRL_PREFIX}),"
                f" slice(n_emb, 1, {_MRL_PREFIX}),"
                " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"
                f" / (sqrt(aggregate(transform(slice(q_emb, 1, {_MRL_PREFIX}),"
                " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (acc, v) -> acc + v))"
                f" * sqrt(aggregate(transform(slice(n_emb, 1, {_MRL_PREFIX}),"
                " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (acc, v) -> acc + v)))"
            ).alias("sim_prefix"),
        )
    )
    wf = W.partitionBy("query_id").orderBy(F.col("sim_full").desc(), "cid")
    wp = W.partitionBy("query_id").orderBy(F.col("sim_prefix").desc(), "cid")
    ranked = scored.select(
        "query_id",
        "cid",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wp).alias("rp"),
    )
    full10 = ranked.filter(F.col("rf") <= 10).select("query_id", "cid")
    pref10 = ranked.filter(F.col("rp") <= 10).select(
        F.col("query_id").alias("pq"), F.col("cid").alias("pc")
    )
    return (
        full10.join(
            pref10,
            (F.col("query_id") == F.col("pq")) & (F.col("cid") == F.col("pc")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("pc").alias("n_overlap"),
            (F.count("pc").cast("double") / 10).alias("recall_at_10"),
        )
    )


# ---------------------------------------------------------------------------
# negative sampling (contrastive-training pair generation)
# ---------------------------------------------------------------------------

_NEG_K = 10

_NEG_ORACLE = f"""
WITH {_DUCK_EMB_CTE},
scored AS (
  SELECT q.vec_id AS query_id, n.vec_id AS cid,
         {_duck_cos('q.v', 'n.v')} AS sim,
         CAST('0x' || substr(md5(CAST(q.vec_id AS VARCHAR) || ':' ||
                                 CAST(n.vec_id AS VARCHAR)), 1, 15) AS BIGINT) AS u
  FROM emb q JOIN emb n ON n.vec_id <> q.vec_id
  WHERE q.vec_id < 5
),
ranked AS (
  SELECT query_id, cid, sim, u,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, cid) AS sim_rank
  FROM scored
)
SELECT query_id, cid AS negative_id, neg_rank, ROUND(sim, 6) AS sim
FROM (
  SELECT query_id, cid, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY u, cid) AS neg_rank
  FROM ranked WHERE sim_rank > {_NEG_K}
) WHERE neg_rank <= {_NEG_K}
"""


@query("negative_sampling_pairs", _NEG_ORACLE, tags=("similarity", "training"))
def negative_sampling_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training NEGATIVE sampling: for each query, 10 corpus
    vectors drawn uniformly by an md5(query:candidate) key — deterministic
    and rerun-stable where `rand()` is neither — EXCLUDING the top-10
    most-similar (those are potential false negatives; filtering them is
    the standard hard-negative hygiene).  Emits (query, negative, rank,
    sim) ready to pair with the positives from `cosine_topk_bruteforce`.
    The exclusion needs the similarity rank, so the test-SF plan scores
    the corpus exactly (the ANN twins bound WHICH candidates get scored
    at 100 TB); the sampling itself is one hash expression and one
    per-query window — no RNG state, no skew."""
    from pyspark.sql import Window as W

    (emb,) = T(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    n = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("n_emb"))
    scored = (
        F.broadcast(q)
        .join(n, F.col("cid") != F.col("query_id"))
        .select(
            "query_id",
            "cid",
            cosine_col("q_emb", "n_emb").alias("sim"),
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("query_id").cast("string"),
                            F.col("cid").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("u"),
        )
    )
    w_sim = W.partitionBy("query_id").orderBy(F.col("sim").desc(), "cid")
    w_u = W.partitionBy("query_id").orderBy("u", "cid")
    ranked = scored.withColumn("sim_rank", F.row_number().over(w_sim))
    return (
        ranked.filter(F.col("sim_rank") > _NEG_K)
        .withColumn("neg_rank", F.row_number().over(w_u))
        .filter(F.col("neg_rank") <= _NEG_K)
        .select(
            "query_id",
            F.col("cid").alias("negative_id"),
            "neg_rank",
            F.round("sim", 6).alias("sim"),
        )
    )


# ---------------------------------------------------------------------------
# scalar-quantization retrieval evaluation (the SQ sibling of matryoshka)
# ---------------------------------------------------------------------------

_SQ_EVAL_ORACLE = f"""
WITH {_DUCK_EMB_CTE},
deq AS (
  SELECT vec_id, v,
         CASE WHEN list_max(v) = list_min(v) THEN v ELSE
           list_transform(v, x -> list_min(v)
             + CAST(ROUND((x - list_min(v)) * 255.0 / (list_max(v) - list_min(v)))
                    AS INTEGER) * (list_max(v) - list_min(v)) / 255.0) END AS vhat
  FROM emb
),
full_rank AS (
  SELECT query_id, cid FROM (
    SELECT q.vec_id AS query_id, n.vec_id AS cid,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {_duck_cos('q.v', 'n.v')} DESC, n.vec_id) AS rnk
    FROM emb q JOIN emb n ON n.vec_id <> q.vec_id WHERE q.vec_id < 5
  ) WHERE rnk <= 10),
sq_rank AS (
  SELECT query_id, cid FROM (
    SELECT q.vec_id AS query_id, n.vec_id AS cid,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {_duck_cos('q.v', 'n.vhat')} DESC, n.vec_id) AS rnk
    FROM emb q JOIN deq n ON n.vec_id <> q.vec_id WHERE q.vec_id < 5
  ) WHERE rnk <= 10)
SELECT f.query_id,
       CAST(COUNT(p.cid) AS BIGINT) AS n_overlap,
       CAST(COUNT(p.cid) AS DOUBLE) / 10 AS recall_at_10
FROM full_rank f
LEFT JOIN sq_rank p ON p.query_id = f.query_id AND p.cid = f.cid
GROUP BY f.query_id
"""


@query("sq_recall_eval", _SQ_EVAL_ORACLE, tags=("similarity", "eval"))
def sq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantization retrieval evaluation: recall@10 of ASYMMETRIC
    int8 search (full-precision query against per-vector-dequantized int8
    corpus — the FAISS SQ8 shape, 4× less vector memory/shuffle) versus
    the exact ranking.  Completes the compression-eval trio with
    `embedding_random_projection` (sketch) and `matryoshka_recall_eval`
    (truncation): three ways to shrink vectors, each with its measured
    quality cost.  Dequantization is one per-element expression (same
    round/scale ops both engines, mn=mx guard for constant vectors);
    scoring/ranking is the standard broadcast-window plan."""
    from pyspark.sql import Window as W

    (emb,) = T(spark, sf_dir, "embeddings")
    deq = emb.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("n_emb"),
        F.expr(
            "CASE WHEN array_max(embedding) = array_min(embedding) THEN"
            " transform(embedding, x -> CAST(x AS DOUBLE)) ELSE"
            " transform(embedding, x -> CAST(array_min(embedding) AS DOUBLE)"
            "   + CAST(ROUND((CAST(x AS DOUBLE) - CAST(array_min(embedding) AS DOUBLE))"
            "          * 255.0 / (CAST(array_max(embedding) AS DOUBLE)"
            "                     - CAST(array_min(embedding) AS DOUBLE))) AS INT)"
            "   * (CAST(array_max(embedding) AS DOUBLE)"
            "      - CAST(array_min(embedding) AS DOUBLE)) / 255.0) END"
        ).alias("vhat"),
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        F.broadcast(q)
        .join(deq, F.col("cid") != F.col("query_id"))
        .select(
            "query_id",
            "cid",
            cosine_col("q_emb", "n_emb").alias("sim_full"),
            F.expr(
                "aggregate(zip_with(q_emb, vhat,"
                " (x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)"
                " / (sqrt(aggregate(transform(q_emb,"
                " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (acc, v) -> acc + v))"
                " * sqrt(aggregate(transform(vhat, x -> x * x), 0D, (acc, v) -> acc + v)))"
            ).alias("sim_sq"),
        )
    )
    wf = W.partitionBy("query_id").orderBy(F.col("sim_full").desc(), "cid")
    ws = W.partitionBy("query_id").orderBy(F.col("sim_sq").desc(), "cid")
    ranked = scored.select(
        "query_id",
        "cid",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(ws).alias("rs"),
    )
    full10 = ranked.filter(F.col("rf") <= 10).select("query_id", "cid")
    sq10 = ranked.filter(F.col("rs") <= 10).select(
        F.col("query_id").alias("pq"), F.col("cid").alias("pc")
    )
    return (
        full10.join(
            sq10,
            (F.col("query_id") == F.col("pq")) & (F.col("cid") == F.col("pc")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("pc").alias("n_overlap"),
            (F.count("pc").cast("double") / 10).alias("recall_at_10"),
        )
    )


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup by within-cluster cosine pruning — round 8
# ---------------------------------------------------------------------------

# Production SemDeDup thresholds sit at ~0.95-0.999 on real embedding
# spaces; same synthetic-corpus note as _NEARDUP_T (max pairwise cosine
# ~0.51), so the gate threshold is 0.4 to exercise real prunes.
_SEMDEDUP_T = _NEARDUP_T


def _semdedup_oracle(
    k: int = 16,
    iters: int = 3,
    dim: int = _DIM,
    salt_cell: int | None = None,
    sampled: bool = False,
) -> str:
    """Lloyd replay + within-cell cosine prune; with ``salt_cell``, cells
    larger than the cap are md5-sub-split first (the scaled variant's
    deterministic worst-case bound), replayed with the same hex-prefix
    integer hash as the Spark side; ``sampled`` replays the md5-bucket
    training sample (see `_kmeans_train_ctes`)."""
    dot = _duck_dot("a.u", "b.u", dim)
    if salt_cell is None:
        keyed = "SELECT vec_id, cid, 0 AS sb, v FROM asgf"
    else:
        keyed = f"""SELECT a.vec_id, a.cid,
         CAST('0x' || substr(md5(CAST(a.vec_id AS VARCHAR)), 1, 4) AS INT)
           % CAST((c.cn + {salt_cell - 1}) // {salt_cell} AS INT) AS sb,
         a.v
  FROM asgf a
  JOIN (SELECT cid, COUNT(*) AS cn FROM asgf GROUP BY cid) c
    ON c.cid = a.cid"""
    return (
        "WITH "
        + ",\n".join(_kmeans_train_ctes(k, iters, dim, sampled=sampled))
        + f""",
keyed AS (
  {keyed}
),
nv AS (
  SELECT vec_id, cid, sb, list_transform(v, x -> x / n) AS u
  FROM (SELECT vec_id, cid, sb, v, sqrt({_duck_sq('v', dim)}) AS n FROM keyed)
)
SELECT a.vec_id AS vec_id, CAST(a.cid AS BIGINT) AS cluster,
       CAST(SUM(CASE WHEN {dot} >= {_SEMDEDUP_T} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_near_dups,
       CAST(1 - MAX(CASE WHEN {dot} >= {_SEMDEDUP_T} AND b.vec_id < a.vec_id
                         THEN 1 ELSE 0 END) AS INTEGER) AS is_kept
FROM nv a LEFT JOIN nv b
  ON b.cid = a.cid AND b.sb = a.sb AND b.vec_id <> a.vec_id
GROUP BY a.vec_id, a.cid
"""
    )


@query("semdedup_prune", _semdedup_oracle(), tags=("similarity", "dedup"))
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al., 2023): cluster the embedding space with
    k-means, then prune SEMANTIC duplicates — pairs whose cosine exceeds
    the threshold — only WITHIN each cluster.  The keep rule is the
    INDEPENDENT PAIRWISE one (the standard SemDeDup behavior): a vector
    is dropped iff ANY lower-id near neighbor exists, whether or not
    that neighbor is itself dropped — so in a chain a<b<c with a~b, b~c
    but not a~c, both b and c are pruned (c by the already-pruned b).
    This over-prunes relative to a greedy sequential sweep, which is
    exactly what the paper's implementation does and what makes the rule
    embarrassingly parallel: each vector's decision reads only its own
    neighbor list, no sequential dependency across the cell.

    Output per vector: its trained cluster, how many same-cluster
    near-dups it has, and whether the pairwise keep-lowest-id rule keeps
    it — the keep-set a downstream training pipeline joins against
    (`dedup_keep_best_quality` is the quality-aware variant of the same
    decision over text dedup).

    100 TB shape: training is `operators/kmeans.py` (per-iteration one
    broadcast-assignment pass + one groupBy-mean; only K centroid rows
    ever reach the driver); assignment is a broadcast join; the pairwise
    stage shuffles once on the cluster key and its cost is sum over
    cells of |cell|^2 — bounded by the coarse quantizer's cell sizes
    (k scales with corpus size in production SemDeDup), never n^2.
    Unit-normalizing once per vector makes each pair one dot product.
    The DuckDB oracle replays Lloyd training via the shared
    `_kmeans_train_ctes` and the identical sequential-fold cosine, so
    cluster ids, near-dup counts, and keep decisions all hash-match.
    """
    return _semdedup_prune_at_k(spark, sf_dir, k=16)


_SEMDEDUP_CELL = 256  # target expected cell size for the corpus-scaled k


@query(
    "semdedup_prune_scaled_k",
    _semdedup_oracle(salt_cell=_SEMDEDUP_CELL, sampled=True),
    tags=("similarity", "dedup"),
)
def semdedup_prune_scaled_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with CORPUS-SCALED k AND a deterministic cell-size cap —
    the production form of `semdedup_prune` (round-8 open item): the
    within-cell pairwise stage costs sum over cells of |cell|^2, so
    production SemDeDup grows k with the corpus.  Here
    k = max(16, n // {cell}) (expected cell ~{cell} vectors), PLUS the
    bound k-means cannot promise: measured on this corpus at the 10x
    smoke, 3 Lloyd iterations leave the MEDIAN cell at ~2,000 vectors
    (k=78, synthetic embeddings have no real cluster structure), so
    "k scales with n" alone still left the prune stage ~8x over budget.
    Any cell larger than {cell} is therefore sub-split by a DETERMINISTIC
    md5 hash of vec_id into ceil(|cell|/{cell}) sub-cells — the worst
    case is now |cell| ≤ ~{cell} BY CONSTRUCTION, total pairwise cost
    ≤ n·{cell} at any corpus and any clustering quality.  The trade is
    the standard SemDeDup one, just finer: near-dup pairs split across
    sub-cells are missed, exactly as pairs split across k-means cells
    already are.

    Training runs on a deterministic md5-bucket SAMPLE of ~64 vectors
    per centroid (`kmeans_fit(train_mod=...)`) — the production recipe:
    Lloyd estimates means, means need a sample, and the full corpus is
    assigned exactly once afterwards.  The ORACLE REPLAYS THE SAMPLING:
    `_kmeans_train_ctes(sampled=True)` computes the same modulus
    max(1, ceil(n/(64·k))) from the corpus count inside the SQL and
    filters training with the identical hex-prefix md5 hash, so the
    query is hash-checkable at EVERY shipped SF (sf0.1's 2,000 vectors
    → train_mod=2 included — round-9 advice), not only at gate corpora
    where the modulus degenerates to 1.  The remaining honest scale
    limit is the FINAL assignment itself: k = n/{cell} makes one
    full-corpus nearest-centroid pass O(n*k*d) = O(n^2 d/{cell}) — the
    production fix is two-level (IVF-style) assignment over clustered
    centroids, O(n*sqrt(k)*d); the within-cell prune is already bounded
    by the sub-split regardless.  (The two-level path only engages at
    k ≥ 64, beyond every shipped SF at this corpus — its own oracle
    gate is `ann_two_level_assign`, which forces it at a small k.)

    n comes from a count(*) action at plan build (parquet metadata);
    k x dim centroids are the only driver-side state.  Oracle: the
    SHARED `_kmeans_train_ctes` Lloyd replay at this corpus's k plus the
    same md5 training sample and hex-prefix md5 sub-split — the whole
    pipeline INCLUDING sampling and salting is hash-checked; at smoke
    scale only k and the split counts change."""
    (emb,) = T(spark, sf_dir, "embeddings")
    n = emb.count()
    k = max(16, n // _SEMDEDUP_CELL)
    # train on ~64 sampled vectors per centroid (production k-means never
    # runs Lloyd over the full corpus); 64k = max(1024, n/4) >= n at every
    # gate SF, so train_mod == 1 there and the oracle replay is unchanged
    train_mod = max(1, -(-n // (64 * k)))
    # two-level (IVF-style) assignment once k outgrows the gate's flat
    # range: O(n*sqrt(k)*d), the fix for the O(n*k*d) quadratic the
    # docstring names; every gate corpus has k = 16 < 64, so the
    # oracle-replayed flat path is what the gate hash-checks
    return _semdedup_prune_at_k(
        spark, sf_dir, k=k, salt_cell=_SEMDEDUP_CELL, train_mod=train_mod,
        two_level=k >= 64,
    )


semdedup_prune_scaled_k.__doc__ = semdedup_prune_scaled_k.__doc__.format(
    cell=_SEMDEDUP_CELL
)


def _semdedup_prune_at_k(
    spark: SparkSession,
    sf_dir: str,
    k: int,
    salt_cell: int | None = None,
    train_mod: int = 1,
    two_level: bool = False,
) -> DataFrame:
    from map_reduce485_spark.operators.kmeans import (
        assign_clusters,
        assign_clusters_two_level,
        kmeans_fit,
    )

    (emb,) = T(spark, sf_dir, "embeddings")
    centroids = kmeans_fit(
        emb, k=k, iterations=3, train_mod=train_mod, two_level=two_level
    )
    assigner = assign_clusters_two_level if two_level else assign_clusters
    assigned = assigner(emb, centroids).select("vec_id", "embedding", "cluster")
    if salt_cell is None:
        keyed = assigned.withColumn("sb", F.lit(0))
    else:
        sizes = assigned.groupBy("cluster").agg(F.count("*").alias("cn"))
        keyed = assigned.join(F.broadcast(sizes), "cluster").withColumn(
            "sb",
            F.conv(
                F.substring(F.md5(F.col("vec_id").cast("string")), 1, 4), 16, 10
            ).cast("int")
            % F.expr(f"CAST((cn + {salt_cell - 1}) div {salt_cell} AS INT)"),
        )
    nu = keyed.withColumn(
        "_n",
        F.expr(
            "sqrt(aggregate(transform(embedding,"
            " y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)),"
            " 0D, (acc, v) -> acc + v))"
        ),
    ).select(
        "vec_id",
        F.col("cluster").cast("long").alias("cluster"),
        "sb",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE) / _n)").alias("u"),
    )
    a = nu.select("vec_id", "cluster", "sb", F.col("u").alias("au"))
    b = nu.select(
        F.col("vec_id").alias("b_id"),
        F.col("cluster").alias("b_cluster"),
        F.col("sb").alias("b_sb"),
        F.col("u").alias("bu"),
    )
    dot = F.expr(_UNIT_DOT.format(a="au", b="bu"))
    # score each pair ONCE in its own projection: the dot product is an
    # interpreted higher-order function (no codegen, no guaranteed
    # common-subexpression elimination), and CollapseProject refuses to
    # inline a non-cheap alias referenced twice — so `_dot` is evaluated
    # exactly once per joined row however many flags read it
    scored = a.join(
        b,
        (F.col("cluster") == F.col("b_cluster"))
        & (F.col("sb") == F.col("b_sb"))
        & (F.col("vec_id") != F.col("b_id")),
        "left",
    ).select("vec_id", "cluster", "b_id", dot.alias("_dot"))
    near = F.col("_dot") >= _SEMDEDUP_T
    flagged = scored.select(
        "vec_id",
        "cluster",
        F.coalesce(near.cast("int"), F.lit(0)).alias("near"),
        F.coalesce(
            (near & (F.col("b_id") < F.col("vec_id"))).cast("int"), F.lit(0)
        ).alias("near_lower"),
    )
    return flagged.groupBy("vec_id", "cluster").agg(
        F.sum("near").alias("n_near_dups"),
        (1 - F.max("near_lower")).cast("int").alias("is_kept"),
    )


# ---------------------------------------------------------------------------
# two-level (IVF-style) centroid assignment, oracle-gated — round 10
# ---------------------------------------------------------------------------

_TWO_LEVEL_K = 25
_TWO_LEVEL_G = 5  # isqrt(25-1)+1 — the g assign_clusters_two_level derives


def _two_level_assign_oracle(
    k: int = _TWO_LEVEL_K, g: int = _TWO_LEVEL_G, iters: int = 3, dim: int = _DIM
) -> str:
    """DuckDB replay of `operators/kmeans.assign_clusters_two_level` on
    flat-trained centroids: the shared Lloyd CTEs produce cent{iters},
    then the driver-side `_lloyd_rows` grouping of those k centroids into
    g groups is replayed literally (init = g lowest-INDEX centroids, 3
    assign/mean rounds with half-away micro-unit integer means, one final
    assignment), group REPRESENTATIVES are the micro-unit means of member
    centroids (empty groups excluded, exactly as the Python dict does),
    and each vector's cluster is the two-phase argmin: nearest
    representative first, then the best centroid WITHIN that group —
    ties to the lowest gid/cid at each phase, matching both the Python
    `d < bd` strict-improvement loop and Spark's MIN(struct) contract."""
    zero = "[" + ", ".join("0.0" for _ in range(dim)) + "]"
    ctes = _kmeans_train_ctes(k, iters, dim)
    final = f"cent{iters}"

    def sqd(v: str, c: str) -> str:
        return _kmeans_sqdist(v, c, dim)

    def gassign(name: str, cent: str) -> str:
        return f"""{name} AS (
  SELECT pid, v, gid FROM (
    SELECT p.pid, p.v, c.gid,
           ROW_NUMBER() OVER (PARTITION BY p.pid
             ORDER BY {sqd('p.v', 'c.c')} ASC, c.gid ASC) AS rn
    FROM pts p CROSS JOIN {cent} c
  ) WHERE rn = 1
)"""

    ctes.append(f"pts AS (SELECT cid AS pid, c AS v FROM {final})")
    ctes.append(
        f"""gcent0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY pid) - 1 AS gid, v AS c
  FROM (SELECT pid, v FROM pts ORDER BY pid LIMIT {g})
)"""
    )
    for t in range(1, iters + 1):
        ctes.append(gassign(f"gasg{t}", f"gcent{t - 1}"))
        ctes.append(
            f"""gmean{t} AS (
  SELECT gid, dim,
         CAST(SUM(CAST(ROUND(val * 1000000.0) AS BIGINT)) AS DOUBLE)
           / COUNT(*) / 1000000.0 AS m
  FROM (SELECT gid, UNNEST(v) AS val, UNNEST(generate_series(1, {dim})) AS dim
        FROM gasg{t})
  GROUP BY gid, dim
)"""
        )
        ctes.append(
            f"""gcent{t} AS (
  SELECT gg.gid, COALESCE(l.c, CAST({zero} AS DOUBLE[])) AS c
  FROM (SELECT UNNEST(generate_series(0, {g - 1})) AS gid) gg
  LEFT JOIN (SELECT gid, list(m ORDER BY dim) AS c FROM gmean{t} GROUP BY gid) l
    ON l.gid = gg.gid
)"""
        )
    ctes.append(gassign("gasgf", f"gcent{iters}"))
    ctes.append(
        f"""reps AS (
  SELECT gid, list(m ORDER BY dim) AS c FROM (
    SELECT gid, dim,
           CAST(SUM(CAST(ROUND(val * 1000000.0) AS BIGINT)) AS DOUBLE)
             / COUNT(*) / 1000000.0 AS m
    FROM (SELECT gid, UNNEST(v) AS val,
                 UNNEST(generate_series(1, {dim})) AS dim
          FROM gasgf)
    GROUP BY gid, dim
  ) GROUP BY gid
)"""
    )
    ctes.append(
        f"""coarse AS (
  SELECT vec_id, gid FROM (
    SELECT e.vec_id, r.gid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {sqd('e.v', 'r.c')} ASC, r.gid ASC) AS rn
    FROM emb e CROSS JOIN reps r
  ) WHERE rn = 1
)"""
    )
    ctes.append("cmem AS (SELECT gid, pid AS cid FROM gasgf)")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM (
  SELECT e.vec_id, c.cid,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
           ORDER BY {sqd('e.v', 'c.c')} ASC, c.cid ASC) AS rn
  FROM emb e
  JOIN coarse co ON co.vec_id = e.vec_id
  JOIN cmem m ON m.gid = co.gid
  JOIN {final} c ON c.cid = m.cid
) WHERE rn = 1
"""
    )


@query("ann_two_level_assign", _two_level_assign_oracle(), tags=("similarity",))
def ann_two_level_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-level (IVF-style) centroid assignment, FORCED at a small k
    so the gate hash-checks the exact path that runs at smoke/production
    scale (round-9 verdict item 4: `assign_clusters_two_level` only
    engages at k ≥ 64, which no gate corpus reaches through the scaled-k
    policy — this query forces it at k={k}, g={g}).  Flat k-means
    training (the proven `_kmeans_train_ctes` replay) supplies the
    centroids; the ASSIGNMENT is the production two-phase argmin:
    `_lloyd_rows` groups the k centroids into g groups in the driver
    (k rows of driver state), each vector finds its nearest group
    REPRESENTATIVE (n·g distance evals), then the best centroid within
    only that group (n·k/g evals) — O(n·√k·d) total.  The oracle replays
    the driver-side grouping, the representative means, and both argmin
    phases as CTEs, so every (vec_id, cluster) row is hash-checked —
    including the approximation: vectors whose true nearest centroid
    lives outside their coarse group get their in-group argmin in BOTH
    engines."""
    from map_reduce485_spark.operators.kmeans import (
        assign_clusters_two_level,
        kmeans_fit,
    )

    (emb,) = T(spark, sf_dir, "embeddings")
    centroids = kmeans_fit(emb, k=_TWO_LEVEL_K, iterations=3)
    assigned = assign_clusters_two_level(
        emb.select("vec_id", "embedding"), centroids
    )
    return assigned.select(
        "vec_id", F.col("cluster").cast("long").alias("cluster")
    )


ann_two_level_assign.__doc__ = ann_two_level_assign.__doc__.format(
    k=_TWO_LEVEL_K, g=_TWO_LEVEL_G
)


# ---------------------------------------------------------------------------
# embedding-norm QA: per-label moments + outlier counts — round 9
# ---------------------------------------------------------------------------

_NORM_OUTLIER_Z = 3  # |z| > 3 in integer micro-units

_NORM_OUTLIERS_ORACLE = f"""
WITH e AS (
  SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
nm AS (
  SELECT label,
         CAST(ROUND(sqrt({_duck_sq('v')}) * 1000000) AS BIGINT) AS u
  FROM e
),
mo AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(u) AS BIGINT) AS s,
         SUM(CAST(u AS DECIMAL(38,0)) * u) AS sq
  FROM nm GROUP BY label
),
st AS (
  SELECT label, n, s, sq,
         CAST(s AS DOUBLE) / n AS mean_u,
         sqrt(CAST(sq AS DOUBLE) / n
              - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) AS std_u
  FROM mo
)
SELECT st.label, st.n,
       st.mean_u / 1000000 AS mean_norm,
       st.std_u / 1000000 AS std_norm,
       CAST(SUM(CASE WHEN abs(nm.u - st.mean_u) > {_NORM_OUTLIER_Z} * st.std_u
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM nm JOIN st ON st.label = nm.label
GROUP BY st.label, st.n, st.mean_u, st.std_u
"""


@query("embedding_norm_outliers", _NORM_OUTLIERS_ORACLE, tags=("similarity",))
def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-norm QA per label: mean/std of the L2 norm and the count
    of |z| > {z} outliers — the standard sanity screen before any
    cosine-based pipeline (a batch of zero/exploded-norm vectors from a
    bad encoder run poisons both ANN recall and SemDeDup pruning, and it
    shows up here first).

    Exactness: each norm is one sqrt (IEEE-correctly-rounded, identical
    on both engines), then quantized to integer MICRO-UNITS — so the
    per-label sums that feed mean/std are order-independent integer/
    decimal arithmetic (the `operators/kmeans.py` discipline), and the
    outlier comparison |u - mean| > {z}·std evaluates the identical
    double expression tree on both engines.  Two passes over the slim
    (label, u) stream: moments groupBy, then a broadcast join back
    (labels are catalog-sized) for the outlier count."""
    (emb,) = T(spark, sf_dir, "embeddings")
    nm = emb.select(
        "label",
        F.round(
            F.expr(
                "sqrt(aggregate(transform(embedding,"
                " y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)),"
                " 0D, (acc, v) -> acc + v))"
            )
            * 1000000
        )
        .cast("long")
        .alias("u"),
    )
    mean_u = F.col("s").cast("double") / F.col("n")
    st = (
        nm.groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.sum("u").alias("s"),
            F.sum(F.col("u").cast("decimal(38,0)") * F.col("u")).alias("sq"),
        )
        .select(
            "label",
            "n",
            mean_u.alias("mean_u"),
            F.sqrt(
                F.col("sq").cast("double") / F.col("n") - mean_u * mean_u
            ).alias("std_u"),
        )
    )
    return (
        nm.join(F.broadcast(st), "label")
        .groupBy("label", "n", "mean_u", "std_u")
        .agg(
            F.sum(
                (
                    F.abs(F.col("u") - F.col("mean_u"))
                    > _NORM_OUTLIER_Z * F.col("std_u")
                ).cast("int")
            )
            .cast("long")
            .alias("n_outliers")
        )
        .select(
            "label",
            "n",
            (F.col("mean_u") / 1000000).alias("mean_norm"),
            (F.col("std_u") / 1000000).alias("std_norm"),
            "n_outliers",
        )
    )


embedding_norm_outliers.__doc__ = embedding_norm_outliers.__doc__.format(
    z=_NORM_OUTLIER_Z
)


# ---------------------------------------------------------------------------
# hyperplane-LSH recall evaluation vs the brute-force baseline — round 9
# ---------------------------------------------------------------------------

_ANN_LSH_RECALL_ORACLE = f"""
WITH {_DUCK_EMB_CTE},
{_DUCK_PLANES_CTE},
{_DUCK_BUCKETS_CTE},
scored AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         list_cosine_similarity(
           CAST(q.embedding AS DOUBLE[]), CAST(n.embedding AS DOUBLE[])
         ) AS sim,
         qb.bucket = nb.bucket AS same_bucket
  FROM embeddings q
  JOIN embeddings n ON n.vec_id <> q.vec_id
  JOIN buckets qb ON qb.vec_id = q.vec_id
  JOIN buckets nb ON nb.vec_id = n.vec_id
  WHERE q.vec_id < 5
),
exact10 AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY sim DESC, neighbor_id
           ) AS rk
    FROM scored
  ) WHERE rk <= 10
),
lsh10 AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY sim DESC, neighbor_id
           ) AS rk
    FROM scored WHERE same_bucket
  ) WHERE rk <= 10
),
nb AS (
  SELECT query_id, COUNT(*) AS n_bucket FROM scored
  WHERE same_bucket GROUP BY query_id
),
nl AS (SELECT query_id, COUNT(*) AS n_lsh FROM lsh10 GROUP BY query_id),
h AS (
  SELECT e.query_id, COUNT(*) AS n_hits
  FROM exact10 e JOIN lsh10 l
    ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
  GROUP BY e.query_id
),
qids AS (SELECT DISTINCT query_id FROM scored)
SELECT q.query_id,
       CAST(COALESCE(nb.n_bucket, 0) AS BIGINT) AS n_bucket,
       CAST(COALESCE(nl.n_lsh, 0) AS BIGINT) AS n_lsh,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       COALESCE(h.n_hits, 0) / 10.0 AS recall
FROM qids q
LEFT JOIN nb ON nb.query_id = q.query_id
LEFT JOIN nl ON nl.query_id = q.query_id
LEFT JOIN h ON h.query_id = q.query_id
"""


@query("ann_lsh_recall_eval", _ANN_LSH_RECALL_ORACLE, tags=("similarity", "eval"))
def ann_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of single-probe hyperplane-LSH search against the exact
    brute-force baseline — the eval that decides whether the bucketed ANN
    path (`ann_lsh_buckets`) can be trusted at corpus scale, the dense
    sibling of `dedup_lsh_recall_eval` (minhash banding recall) and the
    third member of the recall-eval family with `matryoshka_recall_eval`
    and `sq_recall_eval`.

    Per query (vec_id < 5): exact top-10 by cosine over the whole corpus;
    LSH top-10 restricted to the query's 8-bit bucket (single-probe —
    production multi-probe only raises recall, so this is the floor);
    n_hits = |intersection|, recall = n_hits/10.  n_bucket exposes the
    candidate count the bucket actually reranked — the cost side of the
    recall/cost trade.

    Scale: the exact side here is the eval harness, not the serving path
    (production runs it on a sampled query slice exactly like the minhash
    recall eval); the LSH side is one broadcast of the query buckets and a
    bucket-equi-join — the shape that serves at 100 TB.  Both sides'
    ordering keys and tiebreaks are identical across engines; counts and
    the /10 recall are integer-exact."""
    from pyspark.sql import Window as W

    (emb,) = T(spark, sf_dir, "embeddings")
    buckets = ann_lsh_buckets(spark, sf_dir).select("vec_id", "bucket")
    q = (
        emb.filter(F.col("vec_id") < 5)
        .join(buckets, "vec_id")
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("bucket").alias("q_bucket"),
        )
    )
    n = emb.join(buckets, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("n_emb"),
        F.col("bucket").alias("n_bucket_id"),
    )
    scored = (
        F.broadcast(q)
        .join(n, F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_col("q_emb", "n_emb").alias("sim"),
            (F.col("q_bucket") == F.col("n_bucket_id")).alias("same_bucket"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    exact10 = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("query_id", "neighbor_id")
    )
    lsh_cand = scored.filter("same_bucket")
    lsh10 = (
        lsh_cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("query_id", "neighbor_id")
    )
    nb = lsh_cand.groupBy("query_id").agg(F.count("*").alias("n_bucket"))
    nl = lsh10.groupBy("query_id").agg(F.count("*").alias("n_lsh"))
    h = (
        exact10.join(lsh10, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    qids = scored.select("query_id").distinct()
    return (
        qids.join(nb, "query_id", "left")
        .join(nl, "query_id", "left")
        .join(h, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_bucket", F.lit(0)).cast("bigint").alias("n_bucket"),
            F.coalesce("n_lsh", F.lit(0)).cast("bigint").alias("n_lsh"),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) / 10.0).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# sparse TF cosine top-k via inverted index — round 9
# ---------------------------------------------------------------------------

_SPARSE_COSINE_ORACLE = """
WITH terms AS (
  SELECT doc_id,
         unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term),
norms AS (
  SELECT doc_id, sqrt(CAST(CAST(SUM(tf * tf) AS BIGINT) AS DOUBLE)) AS nrm
  FROM tf GROUP BY doc_id
),
dots AS (
  SELECT q.doc_id AS query_id, d.doc_id AS doc_id,
         COUNT(*) AS n_shared,
         CAST(SUM(q.tf * d.tf) AS BIGINT) AS dot
  FROM tf q JOIN tf d ON d.term = q.term AND d.doc_id <> q.doc_id
  WHERE q.doc_id < 5
  GROUP BY q.doc_id, d.doc_id
),
scored AS (
  SELECT dots.query_id, dots.doc_id, dots.n_shared, dots.dot,
         CAST(dots.dot AS DOUBLE) / (qn.nrm * dn.nrm) AS sim
  FROM dots
  JOIN norms qn ON qn.doc_id = dots.query_id
  JOIN norms dn ON dn.doc_id = dots.doc_id
)
SELECT query_id, doc_id, n_shared, dot, sim, rk FROM (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, doc_id) AS rk
  FROM scored
) WHERE rk <= 10
"""


@query("sparse_cosine_topk", _SPARSE_COSINE_ORACLE, tags=("similarity", "text", "search"))
def sparse_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse term-frequency cosine top-10 via an INVERTED INDEX — the
    classic IR retrieval shape (term-at-a-time scoring), the sparse
    sibling of `cosine_topk_bruteforce`: no embeddings, just the corpus'
    own term statistics (pairs with `keyword_search_rank`, which scores a
    literal keyword set; here the query is a whole document vector).

    Per query doc (doc_id < 5): dot(q, d) = Σ_shared-terms tf_q·tf_d
    accumulated by an equi-join on term (the inverted-index posting
    join), normalized by the precomputed per-doc L2 norms, top-10 by
    (sim desc, doc_id).

    Determinism: tf vectors are integers, so dots and squared norms are
    exact BIGINTs; sim is one double division of identically-derived
    doubles — bit-stable without rounding.  Scale: the posting join is
    keyed on term and bounded by the (broadcast-sized) query side's
    postings; production corpora additionally cap posting-list length
    (drop terms with DF above a stop-term threshold) — this corpus has a
    closed ~40-term vocabulary, so a DF cap would be vacuous here and is
    documented rather than exercised.  Per-query scoring is one
    partial-agg groupBy; the top-k window partitions BY QUERY, never
    globally."""
    from pyspark.sql import Window as W

    (docs,) = T(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id",
        F.explode(
            F.expr("filter(split(lower(text), ' '), x -> x <> '')")
        ).alias("term"),
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    tf = cache_scoped(tf)
    norms = tf.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("tf") * F.col("tf")).cast("double")).alias("nrm")
    )
    qpost = tf.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"), "term", F.col("tf").alias("q_tf")
    )
    dots = (
        F.broadcast(qpost)
        .join(tf, ["term"])
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.count("*").alias("n_shared"),
            F.sum(F.col("q_tf") * F.col("tf")).cast("bigint").alias("dot"),
        )
    )
    qn = norms.select(F.col("doc_id").alias("query_id"), F.col("nrm").alias("q_nrm"))
    scored = (
        dots.join(F.broadcast(qn), "query_id")
        .join(norms, "doc_id")
        .select(
            "query_id",
            "doc_id",
            "n_shared",
            "dot",
            (F.col("dot").cast("double") / (F.col("q_nrm") * F.col("nrm"))).alias(
                "sim"
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), "doc_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("query_id", "doc_id", "n_shared", "dot", "sim", "rk")
    )


_ANN_MULTIPROBE_ORACLE = f"""
WITH {_DUCK_EMB_CTE},
{_DUCK_PLANES_CTE},
{_DUCK_BUCKETS_CTE},
probes AS (
  SELECT b.vec_id AS query_id,
         CASE WHEN p.p = {_N_PLANES} THEN b.bucket
              ELSE xor(b.bucket, CAST(1 << p.p AS BIGINT)) END AS pbucket
  FROM buckets b CROSS JOIN (SELECT unnest(generate_series(0, {_N_PLANES})) AS p) p
  WHERE b.vec_id < 5
),
scored AS (
  SELECT pr.query_id, nb.vec_id AS neighbor_id,
         list_cosine_similarity(
           CAST(q.embedding AS DOUBLE[]), CAST(n.embedding AS DOUBLE[])
         ) AS sim
  FROM probes pr
  JOIN buckets nb ON nb.bucket = pr.pbucket AND nb.vec_id <> pr.query_id
  JOIN embeddings q ON q.vec_id = pr.query_id
  JOIN embeddings n ON n.vec_id = nb.vec_id
),
exact10 AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(
               CAST(q.embedding AS DOUBLE[]), CAST(n.embedding AS DOUBLE[])
             ) DESC, n.vec_id
           ) AS rk
    FROM embeddings q JOIN embeddings n ON n.vec_id <> q.vec_id
    WHERE q.vec_id < 5
  ) WHERE rk <= 10
),
lsh10 AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY sim DESC, neighbor_id
           ) AS rk
    FROM scored
  ) WHERE rk <= 10
),
nc AS (SELECT query_id, COUNT(*) AS n_cand FROM scored GROUP BY query_id),
nl AS (SELECT query_id, COUNT(*) AS n_lsh FROM lsh10 GROUP BY query_id),
h AS (
  SELECT e.query_id, COUNT(*) AS n_hits
  FROM exact10 e JOIN lsh10 l
    ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
  GROUP BY e.query_id
),
qids AS (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 5)
SELECT q.query_id,
       CAST(COALESCE(nc.n_cand, 0) AS BIGINT) AS n_cand,
       CAST(COALESCE(nl.n_lsh, 0) AS BIGINT) AS n_lsh,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       COALESCE(h.n_hits, 0) / 10.0 AS recall
FROM qids q
LEFT JOIN nc ON nc.query_id = q.query_id
LEFT JOIN nl ON nl.query_id = q.query_id
LEFT JOIN h ON h.query_id = q.query_id
"""


@query(
    "ann_lsh_multiprobe_recall",
    _ANN_MULTIPROBE_ORACLE,
    tags=("similarity", "eval"),
)
def ann_lsh_multiprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of MULTI-PROBE hyperplane-LSH search — the production
    refinement of `ann_lsh_recall_eval`'s single-probe floor: each query
    probes its own 8-bit bucket PLUS the 8 Hamming-distance-1 buckets
    (one sign bit flipped), the standard multi-probe schedule (Lv et al.,
    VLDB'07) that buys recall without growing the index.

    Per query (vec_id < 5): candidates = vectors in any of the 9 probe
    buckets (buckets are disjoint, so no pair dedup is needed), reranked
    by exact cosine, top-10 vs the exact brute-force top-10.  n_cand is
    the reranking cost actually paid — read next to the single-probe
    eval, the pair quantifies the recall/cost curve the banding geometry
    buys (`dedup_lsh_band_sweep` is the same table for minhash).

    Scale: probe generation is a 9-row-per-query map-side expansion of
    the BROADCAST query side; candidate selection is one equi-join on
    bucket id against the bucketed corpus — never a scan of un-bucketed
    vectors; rerank cost is bounded by the probed buckets' occupancy."""
    from pyspark.sql import Window as W

    (emb,) = T(spark, sf_dir, "embeddings")
    buckets = ann_lsh_buckets(spark, sf_dir).select("vec_id", "bucket")
    qb = buckets.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("bucket").alias("q_bucket")
    )
    probe_ids = spark.range(_N_PLANES + 1).select(F.col("id").alias("p"))
    probes = qb.crossJoin(F.broadcast(probe_ids)).select(
        "query_id",
        F.when(F.col("p") == _N_PLANES, F.col("q_bucket"))
        .otherwise(
            F.expr(f"q_bucket ^ CAST(shiftleft(1, CAST(p AS INT)) AS BIGINT)")
        )
        .alias("pbucket"),
    )
    cand = (
        F.broadcast(probes)
        .join(
            buckets.select(
                F.col("vec_id").alias("neighbor_id"), F.col("bucket").alias("nb")
            ),
            (F.col("nb") == F.col("pbucket"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select("query_id", "neighbor_id")
    )
    qemb = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    nemb = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb")
    )
    scored = (
        cand.join(F.broadcast(qemb), "query_id")
        .join(nemb, "neighbor_id")
        .select("query_id", "neighbor_id", cosine_col("q_emb", "n_emb").alias("sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    # exact top-10 baseline (brute force over the whole corpus)
    exact_scored = (
        F.broadcast(qemb)
        .join(nemb, F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine_col("q_emb", "n_emb").alias("sim"))
    )
    exact10 = (
        exact_scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("query_id", "neighbor_id")
    )
    lsh10 = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("query_id", "neighbor_id")
    )
    nc = scored.groupBy("query_id").agg(F.count("*").alias("n_cand"))
    nl = lsh10.groupBy("query_id").agg(F.count("*").alias("n_lsh"))
    h = (
        exact10.join(lsh10, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    qids = qemb.select("query_id")
    return (
        qids.join(nc, "query_id", "left")
        .join(nl, "query_id", "left")
        .join(h, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_cand", F.lit(0)).cast("bigint").alias("n_cand"),
            F.coalesce("n_lsh", F.lit(0)).cast("bigint").alias("n_lsh"),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) / 10.0).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# k-means clustering-quality eval: simplified silhouette per cluster
# ---------------------------------------------------------------------------


def _silhouette_oracle(k: int = 16, iters: int = 3, dim: int = _DIM) -> str:
    ctes = _kmeans_train_ctes(k, iters, dim)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
d AS (
  SELECT e.vec_id, c.cid,
         sqrt({_kmeans_sqdist('e.v', 'c.c', dim)}) AS dist
  FROM emb e CROSS JOIN cent{iters} c
),
r AS (
  SELECT vec_id, cid, dist,
         ROW_NUMBER() OVER (PARTITION BY vec_id
           ORDER BY dist ASC, cid ASC) AS rn
  FROM d
),
sil AS (
  SELECT a.vec_id, a.cid,
         CASE WHEN GREATEST(a.dist, b.dist) > 0
              THEN (b.dist - a.dist) / GREATEST(a.dist, b.dist)
              ELSE 0.0 END AS s
  FROM (SELECT vec_id, cid, dist FROM r WHERE rn = 1) a
  JOIN (SELECT vec_id, dist FROM r WHERE rn = 2) b USING (vec_id)
)
SELECT cid AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(CAST(s AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*)
         AS mean_silhouette
FROM sil GROUP BY cid
"""
    )


@query("kmeans_silhouette_eval", _silhouette_oracle(), tags=("similarity", "eval"))
def kmeans_silhouette_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-QUALITY eval for the trained k-means quantizer — the
    recall-eval discipline applied to clustering itself: per cluster, the
    mean SIMPLIFIED SILHOUETTE (Hruschka et al.) s = (b - a) / max(a, b),
    where a is a vector's Euclidean distance to its own centroid and b
    its distance to the nearest OTHER centroid.  s near 1: compact,
    well-separated cells (IVF probes and SemDeDup cell-quadratics behave);
    s near 0: boundary-heavy cells (raise k or iterations).  Because
    assignment IS argmin-to-centroid, a and b are simply the two smallest
    entries of the per-vector distance array — no joins, no second pass.

    Exactness: training replays bit-identically via the shared Lloyd CTEs
    (`_kmeans_train_ctes`); distances are sequential left folds + one
    correctly-rounded sqrt; the argmin tie-break is (dist, cid) — the
    same rule as `assign_clusters`; per-cluster means go through the
    DECIMAL(24,6) order-independent sum.  The a=b=0 degenerate (vector
    equal to two centroids) pins s = 0 on both engines.

    Scale shape: one map-side pass over the vectors against the k-row
    broadcast centroid array (O(n·k·d), the same cost class as
    assignment), then one bounded groupBy(cid) — k rows out at any
    corpus size."""
    from map_reduce485_spark.operators.kmeans import kmeans_fit

    (emb,) = T(spark, sf_dir, "embeddings")
    centroids = kmeans_fit(emb, k=16, iterations=3)
    cents = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    two = (
        emb.withColumn("_cents", cents)
        .select(
            "vec_id",
            F.expr(
                "array_sort(transform(_cents, (c, i) -> struct("
                "sqrt(aggregate(zip_with(embedding, c,"
                " (x, cc) -> (CAST(x AS DOUBLE) - cc) * (CAST(x AS DOUBLE) - cc)),"
                " 0D, (acc, v) -> acc + v)) AS dist, i AS cid)))"
            ).alias("arr"),
        )
        .select(
            "vec_id",
            F.expr("arr[0].cid").alias("cid"),
            F.expr("arr[0].dist").alias("a"),
            F.expr("arr[1].dist").alias("b"),
        )
    )
    sil = two.select(
        "vec_id",
        "cid",
        F.when(
            F.greatest("a", "b") > 0,
            (F.col("b") - F.col("a")) / F.greatest("a", "b"),
        )
        .otherwise(F.lit(0.0))
        .alias("s"),
    )
    return sil.groupBy(F.col("cid").alias("cluster_id")).agg(
        F.count("*").alias("n_vecs"),
        (
            F.sum(F.col("s").cast("decimal(24,6)")).cast("double") / F.count("*")
        ).alias("mean_silhouette"),
    )
