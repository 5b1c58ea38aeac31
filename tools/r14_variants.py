"""Round-14 optimization candidates, A/B'd against the registered queries via
tools/ab_code.py BEFORE any registry change.  Each variant documents the
hypothesis and the guide section that motivates it; winners get folded into
the query module (same semantics, proven by the harness's parity check + the
oracle gate), losers stay here as the measured record of what was rejected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce485_spark.queries._util import T, cache_scoped


# ---------------------------------------------------------------------------
# dedup_ngram_jaccard: carry |shingle set| map-side (guide §2.3/§2.4)
# ---------------------------------------------------------------------------


def dedup_ngram_jaccard_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypothesis: the registered query re-aggregates the cached shingle
    stream TWICE to rebuild per-doc set sizes (`sizes` consumed as sa and
    sb — two groupBy exchanges + two joins in the r14 before-plan,
    operators 18-35).  But |shingle set| is known MAP-SIDE at shingle
    generation time: it is the length of the array being exploded.  Carry
    `n` on every shingle row and the candidate aggregation can emit
    (intersection, na, nb) in ONE pass — the sizes subtree, both its
    exchanges, and both final joins disappear.  Cost: one extra int per
    cached/joined shingle row."""
    (docs,) = T(spark, sf_dir, "documents")
    sh = (
        docs.select(
            "doc_id", F.expr("filter(split(text, ' '), x -> x <> '')").alias("w")
        )
        .filter(F.size("w") >= 3)
        .select(
            "doc_id",
            F.expr(
                "array_distinct(transform(sequence(1, size(w) - 2),"
                " i -> xxhash64(w[i-1], w[i], w[i+1])))"
            ).alias("arr"),
        )
        .select("doc_id", F.size("arr").alias("n"), F.explode("arr").alias("shingle"))
    )
    sh = cache_scoped(sh)
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(
            F.count("*").alias("intersection"),
            F.first(F.col("a.n")).alias("na"),
            F.first(F.col("b.n")).alias("nb"),
        )
    )
    return pairs.select(
        "a_id",
        "b_id",
        (
            F.col("intersection").cast("double")
            / (F.col("na") + F.col("nb") - F.col("intersection"))
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= 0.5)


# ---------------------------------------------------------------------------
# dedup_minhash_lsh: materialize the signature table once (guide §2.4/§5)
# ---------------------------------------------------------------------------


def dedup_minhash_lsh_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypothesis: the registered plan re-derives the per-doc signature
    aggregate (scan → shingle Generate → two-phase ObjectHashAggregate
    with the collect_list(sh_arr)) FOUR times — once per band branch of
    the union, times both sides of the self-join (r14 before-plan
    operators 1-17 and 20-36).  AQE exchange reuse recovers the partial
    side but every consumer re-runs the FINAL ObjectHashAggregate (array
    merge) and everything above it.  cache_scoped the digest table (the
    pagerank e0 move) so all four consumers read one InMemoryRelation."""
    from map_reduce485_spark.queries.dedup import (
        _BANDS,
        _N_PERM,
        _NGRAM_THRESHOLD,
        _spark_shingles,
    )

    (docs,) = T(spark, sf_dir, "documents")
    sh = _spark_shingles(docs)
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{j}")))).alias(f"h{j}")
            for j in range(_N_PERM)
        ],
        F.array_sort(F.collect_list(F.xxhash64("shingle"))).alias("sh_arr"),
        F.count("*").alias("n"),
    )
    digests = cache_scoped(
        sig.select(
            "doc_id",
            "sh_arr",
            "n",
            *[
                F.md5(F.concat(*[F.col(f"h{j}") for j in band])).alias(f"d{bi}")
                for bi, band in enumerate(_BANDS)
            ],
        )
    )
    n_b = len(_BANDS)
    bands = None
    for bi in range(n_b):
        b = digests.select(
            "doc_id",
            "sh_arr",
            "n",
            F.lit(bi).alias("band_id"),
            F.col(f"d{bi}").alias("band"),
            *[
                (F.col(f"d{k}") if k < bi else F.lit(None).cast("string")).alias(
                    f"d{k}"
                )
                for k in range(n_b - 1)
            ],
        )
        bands = b if bands is None else bands.unionAll(b)
    a = bands.alias("a")
    b = bands.alias("b")
    first_match = F.lit(True)
    for k in range(1, n_b):
        first_match = first_match & (
            (F.col("a.band_id") < k) | (F.col(f"a.d{k - 1}") != F.col(f"b.d{k - 1}"))
        )
    inter = F.size(F.array_intersect(F.col("a.sh_arr"), F.col("b.sh_arr")))
    return (
        a.join(
            b.hint("shuffle_merge"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(first_match)
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            inter.alias("intersection"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .select(
            "a_id",
            "b_id",
            (
                F.col("intersection").cast("double")
                / (F.col("na") + F.col("nb") - F.col("intersection")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= _NGRAM_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# simhash fingerprints: per-doc distinct map-side (guide §2.4 remove shuffles)
# ---------------------------------------------------------------------------


def _simhash_fp_mapside_distinct(docs: DataFrame, bits: int) -> DataFrame:
    """Tokens are deduped WITHIN each document only — exactly what
    `array_distinct` over the split array computes in the projection, no
    corpus-wide (doc_id, word) distinct exchange needed.  The vote groupBy
    becomes the only fingerprint shuffle."""
    from map_reduce485_spark.queries.dedup import _simhash_bit_sql, _simhash_fp_sql

    _, fp_expr = _simhash_fp_sql("instr", bits)
    tokens = docs.select(
        "doc_id",
        F.explode(
            F.expr("array_distinct(filter(split(text, ' '), x -> x <> ''))")
        ).alias("word"),
    )
    votes = tokens.groupBy("doc_id").agg(
        *[
            F.expr(f"SUM(2 * ({_simhash_bit_sql(b, 'instr')}) - 1)").alias(f"s{b}")
            for b in range(bits)
        ]
    )
    return votes.select("doc_id", F.expr(fp_expr).cast("bigint").alias("simhash"))


def dedup_simhash_summary_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v2: fingerprints with the map-side per-doc distinct (one exchange
    removed from the cached fp build); banding/verify unchanged."""
    from map_reduce485_spark.queries.dedup import (
        _SIMHASH_BITS,
        _simhash_banded_pairs,
    )

    (docs,) = T(spark, sf_dir, "documents")
    fp = cache_scoped(_simhash_fp_mapside_distinct(docs, _SIMHASH_BITS))
    pairs = _simhash_banded_pairs(fp, n_chunks=4, chunk_bits=4)
    return pairs.groupBy("hamming").agg(
        F.count("*").alias("n_pairs"),
        F.count_distinct("a_id").alias("n_left_docs"),
        F.count_distinct("b_id").alias("n_right_docs"),
    )


def _simhash_fp_fully_mapside(docs: DataFrame, bits: int) -> DataFrame:
    """ZERO-shuffle fingerprints: per-doc distinct tokens via
    array_distinct, each token hashed once to its leading-`bits` md5 bit
    pattern (nibble extraction via instr, not conv — the r13 conv variant's
    string-decimal round-trip was the measured cost), then the per-bit
    majority votes are array aggregates over the small int array.  Bit b of
    token value t is (t >> (bits-1-b)) & 1, matching the nibble layout of
    `_simhash_bit_sql` (hex char b//4, bit 3-b%4)."""
    assert bits % 4 == 0
    n_nib = bits // 4
    nib = "(instr('0123456789abcdef', substring(m, {p}, 1)) - 1)"
    packed = " + ".join(
        f"{nib.format(p=i + 1)} * {1 << (4 * (n_nib - 1 - i))}" for i in range(n_nib)
    )
    votes = [
        f"aggregate(tv, 0L, (acc, t) -> acc + 2 * ((t div {1 << (bits - 1 - b)}) % 2) - 1)"
        for b in range(bits)
    ]

    def term(b: int) -> str:
        v = "-9223372036854775808" if b == 63 else str(1 << b)
        return f"(CASE WHEN s{b} > 0 THEN {v}L ELSE 0L END)"

    fp = " + ".join(term(b) for b in range(bits))
    return (
        docs.select(
            "doc_id",
            F.expr(
                "transform(array_distinct(filter(split(text, ' '), x -> x <> '')),"
                f" x -> aggregate(array(md5(x)), 0, (acc, m) -> {packed}))"
            ).alias("tv"),
        )
        .select(
            "doc_id",
            *[F.expr(v).alias(f"s{b}") for b, v in enumerate(votes)],
        )
        .select("doc_id", F.expr(fp).cast("bigint").alias("simhash"))
    )


def dedup_simhash_summary_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v3: fully map-side fingerprints (no fingerprint shuffle at all —
    the banded self-join becomes the query's only exchange)."""
    from map_reduce485_spark.queries.dedup import (
        _SIMHASH_BITS,
        _simhash_banded_pairs,
    )

    (docs,) = T(spark, sf_dir, "documents")
    fp = cache_scoped(_simhash_fp_fully_mapside(docs, _SIMHASH_BITS))
    pairs = _simhash_banded_pairs(fp, n_chunks=4, chunk_bits=4)
    return pairs.groupBy("hamming").agg(
        F.count("*").alias("n_pairs"),
        F.count_distinct("a_id").alias("n_left_docs"),
        F.count_distinct("b_id").alias("n_right_docs"),
    )


# ---------------------------------------------------------------------------
# q21: aggregate before shuffling + window instead of self-join (guide §2.3)
# ---------------------------------------------------------------------------


def q21_waiting_suppliers_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypothesis: the registered plan derives the lineitem⋈orders frame
    TWICE (once for per-order stats, once for the row stream), pays an
    Expand (×2 row multiplication) for the two countDistincts, and
    shuffles lineitem-scale rows three times.  Pre-aggregating per
    (l_orderkey, l_suppkey) first makes the distinct counts plain
    count/sum over the group table, and a window over l_orderkey replaces
    the stats self-join — ONE lineitem-scale exchange (with map-side
    partial aggregation), no Expand, lineitem scanned once."""
    from pyspark.sql import Window as W

    li, orders, supp = T(spark, sf_dir, "lineitem", "orders", "supplier")
    g = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            F.when(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"),
                1,
            )
            .otherwise(0)
            .alias("is_late"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("is_late").alias("late"), F.sum("is_late").alias("n_late_rows"))
    )
    w = W.partitionBy("l_orderkey")
    stats = g.select(
        "l_suppkey",
        "late",
        "n_late_rows",
        F.count("*").over(w).alias("n_supp"),
        F.sum("late").over(w).alias("n_late_supp"),
    )
    return (
        stats.filter(
            (F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
        )
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        # coalesce(…, 0) pins the non-nullable LongType the registered
        # query's count(*) carries (groups are non-empty, so the value is
        # never actually null — this is a schema-identity cast only)
        .agg(
            F.coalesce(F.sum("n_late_rows"), F.lit(0).cast("long")).alias("numwait")
        )
    )


# ---------------------------------------------------------------------------
# decontaminate_eval_overlap: hash grams before the join (guide §2.3/§8)
# ---------------------------------------------------------------------------


def decontaminate_eval_overlap_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypothesis: the gram join only needs gram IDENTITY, not gram text —
    xxhash64 the 8 tokens directly (multi-arg hash, the 8-token string is
    never concatenated or materialized) so the broadcast set holds 8-byte
    longs instead of ~50-byte strings and the train-side explode emits
    longs.  Counts are unchanged unless two distinct grams collide in 64
    bits (~1e-8 at 1e9 grams — the dedup_ngram_jaccard caveat, already
    oracle-accepted there)."""
    from map_reduce485_spark.queries.text_analysis import _DECON_EVAL, _DECON_N

    (docs,) = T(spark, sf_dir, "documents")

    def grams_of(side: DataFrame) -> DataFrame:
        args = ", ".join(f"w[i{'+' + str(k) if k else ''}-1]" for k in range(_DECON_N))
        w = side.select(
            "doc_id",
            F.expr("filter(split(lower(text), ' '), x -> x <> '')").alias("w"),
        )
        return w.filter(F.size("w") >= _DECON_N).select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(w) - {_DECON_N - 1}),"
                    f" i -> xxhash64({args}))"
                )
            ).alias("g"),
        )

    is_eval = F.expr(_DECON_EVAL)
    eval_grams = grams_of(docs.filter(is_eval)).select("g").distinct()
    hits = (
        grams_of(docs.filter(~is_eval))
        .join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_shared_grams"))
    )
    return (
        docs.filter(~is_eval)
        .select("doc_id", "lang")
        .join(F.broadcast(hits), "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("n_shared_grams", F.lit(0)).alias("n_shared_grams"),
        )
    )


# ---------------------------------------------------------------------------
# cosine_topk_bruteforce: two-level top-k (guide §2.5 — 5-key window skew)
# ---------------------------------------------------------------------------


def cosine_topk_bruteforce_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypothesis: the per-query top-k window partitions by query_id — 5
    distinct keys, so the whole scored stream funnels into 5 tasks (the
    single-partition-window problem in miniature; at corpus scale it is a
    straggler by construction).  Two-level top-k: salt by a deterministic
    neighbor bucket, take top-10 within (query, salt) — parallelism
    × n_salt — then the exact top-10 of the ≤ 10·n_salt survivors."""
    from pyspark.sql import Window as W

    from map_reduce485_spark.queries.similarity import cosine_col

    (emb,) = T(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    n = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb"))
    scored = (
        F.broadcast(q)
        .join(n, F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_col("q_emb", "n_emb").alias("sim"),
            F.pmod(F.col("neighbor_id"), F.lit(64)).alias("salt"),
        )
    )
    w1 = W.partitionBy("query_id", "salt").orderBy(F.col("sim").desc(), "neighbor_id")
    pre = (
        scored.withColumn("rk1", F.row_number().over(w1))
        .filter(F.col("rk1") <= 10)
        .drop("rk1", "salt")
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        pre.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


# ---------------------------------------------------------------------------
# q3: HashAggregate instead of SortAggregate (guide §2.4 — remove sorts)
# ---------------------------------------------------------------------------


def q3_shipping_priority_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypothesis: the registered agg carries any_value(o_orderpriority) —
    a STRING aggregation buffer, which HashAggregate's mutable UnsafeRow
    buffer cannot hold, so Spark falls back to SortAggregate (two extra
    full Sorts in the r14 before-plan, operators 15/18).  o_orderdate and
    o_orderpriority are functionally dependent on l_orderkey (one order
    row per key), so moving them INTO the group key produces identical
    groups while every remaining aggregate (long sum, count) is
    hash-able — the sorts disappear."""
    from map_reduce485_spark.queries._util import dsum, fmt_ts

    cust, orders, li = T(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = "1998-06-15"
    return (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(
            orders.filter(F.col("o_orderdate") < cutoff),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            li.filter(F.col("l_shipdate") > cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum("l_extendedprice * (1 - l_discount)", "revenue", 6))
        .select(
            "l_orderkey",
            "revenue",
            fmt_ts("o_orderdate", "orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


def dedup_minhash_lsh_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v3: NO cache — the band rows are generated with one inline_outer
    over an array of (band_id, band) structs instead of a 2-branch union,
    so each join side derives the signature aggregate ONCE (the union shape
    ran the final ObjectHashAggregate once per branch), and the self-join's
    two identical exchanges collapse to one at runtime via AQE exchange
    reuse.  v2 (cache_scoped digests) bought wall 0.54x but paid CPU 2.46x
    for building/reading the array-typed InMemoryRelation — this variant
    targets the same re-derivation without the cache tax."""
    from map_reduce485_spark.queries.dedup import (
        _BANDS,
        _N_PERM,
        _NGRAM_THRESHOLD,
        _spark_shingles,
    )

    (docs,) = T(spark, sf_dir, "documents")
    sh = _spark_shingles(docs)
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{j}")))).alias(f"h{j}")
            for j in range(_N_PERM)
        ],
        F.array_sort(F.collect_list(F.xxhash64("shingle"))).alias("sh_arr"),
        F.count("*").alias("n"),
    )
    n_b = len(_BANDS)
    digests = sig.select(
        "doc_id",
        "sh_arr",
        "n",
        *[
            F.md5(F.concat(*[F.col(f"h{j}") for j in band])).alias(f"d{bi}")
            for bi, band in enumerate(_BANDS)
        ],
    )
    # one struct per band: (band_id, band digest, d0..d{n_b-2} prior-digest
    # slots with the same NULL layout as the union shape)
    structs = ", ".join(
        "struct(%dL as band_id, d%d as band, %s)"
        % (
            bi,
            bi,
            ", ".join(
                (f"d{k}" if k < bi else "cast(null as string)") + f" as d{k}"
                for k in range(n_b - 1)
            ),
        )
        for bi in range(n_b)
    )
    bands = digests.select(
        "doc_id", "sh_arr", "n", F.expr(f"inline(array({structs}))")
    )
    a = bands.alias("a")
    b = bands.alias("b")
    first_match = F.lit(True)
    for k in range(1, n_b):
        first_match = first_match & (
            (F.col("a.band_id") < k) | (F.col(f"a.d{k - 1}") != F.col(f"b.d{k - 1}"))
        )
    inter = F.size(F.array_intersect(F.col("a.sh_arr"), F.col("b.sh_arr")))
    return (
        a.join(
            b.hint("shuffle_merge"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(first_match)
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            inter.alias("intersection"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .select(
            "a_id",
            "b_id",
            (
                F.col("intersection").cast("double")
                / (F.col("na") + F.col("nb") - F.col("intersection")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= _NGRAM_THRESHOLD)
    )


def label_propagation_communities_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-round argmax via max(struct(wsum, -label)) groupBy instead of a
    row_number window: the groupBy gets map-side partial aggregation and
    drops the window's per-partition Sort; max of the struct = highest
    wsum, ties to SMALLEST label (negated second field) — exactly the
    window's (wsum DESC, label ASC) rn=1 row."""
    from pyspark.sql import Window as W  # noqa: F401

    from map_reduce485_spark.queries._util import checkpoint_scoped
    from map_reduce485_spark.queries.graph import _LPA_ITERS

    orders, lineitem = T(spark, sf_dir, "orders", "lineitem")
    e0 = (
        orders.join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .agg(F.count("*").alias("w"))
    )
    edges = cache_scoped(
        e0.unionAll(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w"))
    )
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(_LPA_ITERS):
        votes = (
            edges.join(labels, F.col("src") == F.col("node"))
            .select(F.col("dst").alias("node"), "label", "w")
            .unionAll(labels.select("node", "label", F.lit(1).cast("long").alias("w")))
        )
        labels = (
            votes.groupBy("node", "label")
            .agg(F.sum("w").alias("wsum"))
            .groupBy("node")
            .agg(F.max(F.struct(F.col("wsum"), (-F.col("label")).alias("nl"))).alias("s"))
            .select("node", (-F.col("s.nl")).alias("label"))
        )
        labels = checkpoint_scoped(labels)
    return labels.select("node", F.col("label").alias("community"))


def dedup_ngram_jaccard_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v3: cache ONLY the tiny per-doc sizes table — the before-plan
    computes the `sizes` aggregate twice (once per join side, operators
    18-26/27-35); the doc-count-sized cache removes one full aggregation
    pass over the cached shingle stream without v2's expensive
    re-projection of the shingle cache itself."""
    (docs,) = T(spark, sf_dir, "documents")
    sh = (
        docs.select(
            "doc_id", F.expr("filter(split(text, ' '), x -> x <> '')").alias("w")
        )
        .filter(F.size("w") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(1, size(w) - 2),"
                        " i -> xxhash64(w[i-1], w[i], w[i+1]))"
                    )
                )
            ).alias("shingle"),
        )
    )
    sh = cache_scoped(sh)
    sizes = cache_scoped(sh.groupBy("doc_id").agg(F.count("*").alias("n")))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count("*").alias("intersection"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        pairs.join(sa, F.col("a_id") == F.col("sa.doc_id"))
        .join(sb, F.col("b_id") == F.col("sb.doc_id"))
        .select(
            "a_id",
            "b_id",
            (
                F.col("intersection").cast("double")
                / (F.col("sa.n") + F.col("sb.n") - F.col("intersection"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
    )


def gopher_repetition_filters_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypothesis (guide §2.3 — shuffle keys, not payloads): the per-(doc,
    n, gram) count groupBy shuffles the gram STRINGS; every output value
    depends only on (count, gram length) — even the most-frequent tie-break
    can switch winners without changing top.cnt*top.glen when (cnt, glen)
    tie — so shuffle xxhash64(gram) + length(gram) instead.  The string is
    still built map-side (same generation CPU) but never crosses the
    exchange."""
    from map_reduce485_spark.queries.text_analysis import (
        _GOPHER_DUP_N,
        _GOPHER_DUP_THRESHOLD,
        _GOPHER_THRESHOLDS,
        _GOPHER_TOP_NS,
    )

    (docs,) = T(spark, sf_dir, "documents")
    ns = (*_GOPHER_TOP_NS, _GOPHER_DUP_N)
    tagged_arrays = ", ".join(
        f"if(size(w) >= {n},"
        f" transform(sequence(1, size(w) - {n} + 1),"
        f" i -> struct({n} AS n, array_join(slice(w, i, {n}), ' ') AS gram)),"
        f" array())"
        for n in ns
    )
    grams = (
        docs.select(
            "doc_id",
            F.expr("filter(split(lower(text), ' '), x -> x <> '')").alias("w"),
        )
        .select("doc_id", F.explode(F.expr(f"concat({tagged_arrays})")).alias("t"))
        .select(
            "doc_id",
            "t.n",
            F.xxhash64("t.gram").alias("ghash"),
            F.length("t.gram").alias("glen"),
        )
    )
    lvl = (
        grams.groupBy("doc_id", "n", "ghash")
        .agg(F.count("*").alias("cnt"), F.max("glen").alias("glen"))
        .groupBy("doc_id", "n")
        .agg(
            F.sum(F.col("cnt") * F.col("glen")).alias("tot"),
            F.max(F.struct(F.col("cnt"), F.col("glen"), F.col("ghash"))).alias("top"),
            F.sum(
                F.when(F.col("cnt") > 1, F.col("cnt") * F.col("glen")).otherwise(
                    F.lit(0)
                )
            ).alias("dup"),
        )
        .select(
            "doc_id",
            "n",
            (
                (F.col("top.cnt") * F.col("top.glen")).cast("double") / F.col("tot")
            ).alias("top_frac"),
            (F.col("dup").cast("double") / F.col("tot")).alias("dup_frac"),
        )
    )
    lvl = lvl.unionByName(
        docs.select(
            "doc_id",
            F.lit(0).alias("n"),
            F.lit(0.0).alias("top_frac"),
            F.lit(0.0).alias("dup_frac"),
        )
    )

    def _top(n: int):
        return F.coalesce(
            F.max(F.when(F.col("n") == n, F.col("top_frac"))), F.lit(0.0)
        )

    dup5 = F.coalesce(
        F.max(F.when(F.col("n") == _GOPHER_DUP_N, F.col("dup_frac"))), F.lit(0.0)
    )
    all_pass = None
    for n in _GOPHER_TOP_NS:
        cond = _top(n) <= _GOPHER_THRESHOLDS[n]
        all_pass = cond if all_pass is None else (all_pass & cond)
    all_pass = all_pass & (dup5 <= _GOPHER_DUP_THRESHOLD)
    return lvl.groupBy("doc_id").agg(
        *[_top(n).alias(f"frac_top_{n}gram") for n in _GOPHER_TOP_NS],
        dup5.alias(f"frac_dup_{_GOPHER_DUP_N}gram"),
        *[
            (_top(n) <= _GOPHER_THRESHOLDS[n])
            .cast("int")
            .alias(f"pass_top_{n}gram")
            for n in _GOPHER_TOP_NS
        ],
        (dup5 <= _GOPHER_DUP_THRESHOLD)
        .cast("int")
        .alias(f"pass_dup_{_GOPHER_DUP_N}gram"),
        all_pass.cast("int").alias("gopher_pass"),
    )


def dedup_incremental_arrivals_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same inline-band move as dedup_minhash_lsh, plus cache_scoped(sig):
    the registered shape derives the signature final aggregate up to 4x
    (2-band union x the new/corpus split, whose differing filters defeat
    exchange reuse).  This sig carries NO shingle arrays — 9 narrow string
    columns — so the cache tax that rejected minhash's v2 does not apply."""
    from map_reduce485_spark.queries.dedup import (
        _BANDS,
        _N_PERM,
        _NGRAM_THRESHOLD,
        _spark_shingles,
    )

    (docs,) = T(spark, sf_dir, "documents")
    flags = docs.select(
        "doc_id",
        (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "f").alias(
            "is_new"
        ),
    )
    sh = cache_scoped(_spark_shingles(docs))
    sig = cache_scoped(
        sh.groupBy("doc_id").agg(
            *[
                F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{j}")))).alias(f"h{j}")
                for j in range(_N_PERM)
            ]
        )
    )
    structs = ", ".join(
        "struct({bi} as band_id, md5(concat({cols})) as band)".format(
            bi=bi, cols=", ".join(f"h{j}" for j in band)
        )
        for bi, band in enumerate(_BANDS)
    )
    bands = sig.select("doc_id", F.expr(f"inline(array({structs}))"))
    flagged = bands.join(flags, "doc_id")
    new_side = flagged.filter(F.col("is_new")).select(
        F.col("doc_id").alias("new_id"), "band_id", "band"
    )
    corpus_side = flagged.filter(~F.col("is_new")).select(
        F.col("doc_id").alias("dup_of"), "band_id", "band"
    )
    cand = (
        new_side.join(corpus_side, ["band_id", "band"])
        .filter(F.col("new_id") != F.col("dup_of"))
        .select("new_id", "dup_of")
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    x = sh.alias("x")
    y = sh.alias("y")
    verified = (
        cand.join(x, F.col("x.doc_id") == F.col("new_id"))
        .join(
            y,
            (F.col("y.doc_id") == F.col("dup_of"))
            & (F.col("y.shingle") == F.col("x.shingle")),
        )
        .groupBy("new_id", "dup_of")
        .agg(F.count("*").alias("intersection"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        verified.join(sa, F.col("new_id") == F.col("sa.doc_id"))
        .join(sb, F.col("dup_of") == F.col("sb.doc_id"))
        .select(
            "new_id",
            "dup_of",
            (
                F.col("intersection").cast("double")
                / (F.col("sa.n") + F.col("sb.n") - F.col("intersection"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= _NGRAM_THRESHOLD)
    )


def dedup_incremental_arrivals_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same inline-band move as dedup_minhash_lsh, plus cache_scoped(sig):
    the registered shape derives the signature final aggregate up to 4x
    (2-band union x the new/corpus split, whose differing filters defeat
    exchange reuse).  This sig carries NO shingle arrays — 9 narrow string
    columns — so the cache tax that rejected minhash's v2 does not apply."""
    from map_reduce485_spark.queries.dedup import (
        _BANDS,
        _N_PERM,
        _NGRAM_THRESHOLD,
        _spark_shingles,
    )

    (docs,) = T(spark, sf_dir, "documents")
    flags = docs.select(
        "doc_id",
        (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "f").alias(
            "is_new"
        ),
    )
    sh = cache_scoped(_spark_shingles(docs))
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{j}")))).alias(f"h{j}")
            for j in range(_N_PERM)
        ]
    )
    structs = ", ".join(
        "struct({bi} as band_id, md5(concat({cols})) as band)".format(
            bi=bi, cols=", ".join(f"h{j}" for j in band)
        )
        for bi, band in enumerate(_BANDS)
    )
    bands = sig.select("doc_id", F.expr(f"inline(array({structs}))"))
    flagged = bands.join(flags, "doc_id")
    new_side = flagged.filter(F.col("is_new")).select(
        F.col("doc_id").alias("new_id"), "band_id", "band"
    )
    corpus_side = flagged.filter(~F.col("is_new")).select(
        F.col("doc_id").alias("dup_of"), "band_id", "band"
    )
    cand = (
        new_side.join(corpus_side, ["band_id", "band"])
        .filter(F.col("new_id") != F.col("dup_of"))
        .select("new_id", "dup_of")
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    x = sh.alias("x")
    y = sh.alias("y")
    verified = (
        cand.join(x, F.col("x.doc_id") == F.col("new_id"))
        .join(
            y,
            (F.col("y.doc_id") == F.col("dup_of"))
            & (F.col("y.shingle") == F.col("x.shingle")),
        )
        .groupBy("new_id", "dup_of")
        .agg(F.count("*").alias("intersection"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        verified.join(sa, F.col("new_id") == F.col("sa.doc_id"))
        .join(sb, F.col("dup_of") == F.col("sb.doc_id"))
        .select(
            "new_id",
            "dup_of",
            (
                F.col("intersection").cast("double")
                / (F.col("sa.n") + F.col("sb.n") - F.col("intersection"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= _NGRAM_THRESHOLD)
    )


def bpe_train_merges_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypothesis: per-iteration sym caches cost one materialization job +
    storage write each, but the replace chain is vocab-scale string work
    with branch factor 1 — recomputing k chained replaces from the ONE
    cached initial symbol table is cheaper than materializing every
    generation (3 merges deep)."""
    from pyspark.sql import functions as F2

    from map_reduce485_spark.operators.bpe import _PAIRS, _SYM_INIT
    from map_reduce485_spark.queries.text_analysis import _BPE_MERGES

    (docs,) = T(spark, sf_dir, "documents")
    words = (
        docs.select(
            F2.explode(F2.expr("filter(split(text, ' '), x -> x <> '')")).alias("word")
        )
        .groupBy("word")
        .agg(F2.count("*").alias("freq"))
    )
    sym = cache_scoped(words.select(F2.expr(_SYM_INIT).alias("s"), "freq"))
    out = []
    for step in range(1, _BPE_MERGES + 1):
        pairs = sym.select(
            F2.expr("filter(split(trim(s), '  '), x -> x <> '')").alias("a"), "freq"
        ).select(F2.explode(F2.expr(_PAIRS)).alias("pair"), "freq")
        best = (
            pairs.groupBy("pair")
            .agg(F2.sum("freq").alias("f"))
            .orderBy(F2.col("f").desc(), "pair")
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, freq = best[0].pair, int(best[0].f)
        x, y = pair.split(" ")
        out.append((step, pair, x + y, freq))
        sym = sym.select(
            F2.replace(F2.col("s"), F2.lit(f" {x}  {y} "), F2.lit(f" {x}{y} ")).alias("s"),
            "freq",
        )
    return spark.createDataFrame(out, "step int, pair string, merged string, freq bigint")
