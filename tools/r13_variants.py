"""Round-13 optimization candidates, A/B'd against the registered queries via
tools/ab_code.py BEFORE any registry change.  Each variant documents the
hypothesis; winners get folded into the query module (same semantics, proven
by the harness's parity check + the oracle gate), losers stay here as the
measured record of what was rejected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce485_spark.queries._util import T


def _simhash_fp_packed(docs: DataFrame, bits: int) -> DataFrame:
    """REJECTED (A/B: CPU 1.33x worse, wall 1.10x worse at 16 bits —
    Catalyst's subexpression elimination already dedups the md5 across the
    vote aggregates, and conv()'s string round-trip added cost).

    Original hypothesis (guide §4.2 spirit, JVM-side): the registered
    `_spark_simhash_fp` builds each of the `bits` vote sums from its own
    `md5(word)` + substr + instr chain — if Catalyst does not subexpression-
    eliminate across aggregate expressions, that is `bits` md5 invocations
    per (doc, word) row.  This variant computes md5 ONCE per row in the
    projection below the aggregate, packs the leading 16 hex chars into two
    longs via conv(), and each vote reads one shift-and-mask — bit values
    identical by construction (hex char p's nibble, bit 3 - b%4)."""
    tokens = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )
    n_chunks = (bits + 31) // 32
    packed = tokens.select(
        "doc_id",
        *[
            F.conv(F.expr(f"substr(md5(word), {8 * j + 1}, 8)"), 16, 10)
            .cast("long")
            .alias(f"v{j}")
            for j in range(n_chunks)
        ],
    )

    def bit_expr(b: int) -> str:
        p = 1 + b // 4            # 1-indexed hex char
        j = (p - 1) // 8          # which 8-hex chunk
        q = (p - 1) % 8           # 0-based char within chunk, from the left
        shift = 4 * (7 - q) + (3 - b % 4)
        return f"((v{j} >> {shift}) & 1)"

    votes = packed.groupBy("doc_id").agg(
        *[
            F.expr(f"SUM(2 * {bit_expr(b)} - 1)").alias(f"s{b}")
            for b in range(bits)
        ]
    )
    from map_reduce485_spark.queries.dedup import _simhash_fp_sql

    _, fp_expr = _simhash_fp_sql("instr", bits)
    return votes.select("doc_id", F.expr(fp_expr).cast("bigint").alias("simhash"))


def dedup_simhash_summary_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_simhash_summary with the packed-md5 fingerprint (16-bit)."""
    from map_reduce485_spark.queries._util import cache_scoped
    from map_reduce485_spark.queries.dedup import (
        _SIMHASH_BITS,
        _simhash_banded_pairs,
    )

    (docs,) = T(spark, sf_dir, "documents")
    fp = cache_scoped(_simhash_fp_packed(docs, _SIMHASH_BITS))
    pairs = _simhash_banded_pairs(fp, n_chunks=4, chunk_bits=4)
    return pairs.groupBy("hamming").agg(
        F.count("*").alias("n_pairs"),
        F.count_distinct("a_id").alias("n_left_docs"),
        F.count_distinct("b_id").alias("n_right_docs"),
    )


def dedup_simhash_summary_wide_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_simhash_summary_wide with the packed-md5 fingerprint (64-bit)."""
    from map_reduce485_spark.queries._util import cache_scoped
    from map_reduce485_spark.queries.dedup import (
        _SIMHASH_WIDE_BITS,
        _SIMHASH_WIDE_CHUNK_BITS,
        _simhash_banded_pairs,
    )

    (docs,) = T(spark, sf_dir, "documents")
    fp = cache_scoped(_simhash_fp_packed(docs, _SIMHASH_WIDE_BITS))
    pairs = _simhash_banded_pairs(
        fp, n_chunks=4, chunk_bits=_SIMHASH_WIDE_CHUNK_BITS
    )
    return pairs.groupBy("hamming").agg(
        F.count("*").alias("n_pairs"),
        F.count_distinct("a_id").alias("n_left_docs"),
        F.count_distinct("b_id").alias("n_right_docs"),
    )


def pagerank_trade_graph_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypothesis (guide §2.4, remove repeated work feeding the one cached
    layout): `edges_deg`'s materialization recomputes the orders⋈lineitem
    distinct inside both union branches AND both deg consumers — AQE's
    exchange reuse recovers two of the four at runtime, but the scan + join
    + partial agg ahead of the distinct exchange still run twice.  Caching
    e0 (2 longs per edge) makes the distinct compute once; edges/deg then
    read memory.  Iteration shape untouched."""
    from pyspark.sql import functions as F

    from map_reduce485_spark.queries._util import cache_scoped
    from map_reduce485_spark.queries.graph import (
        _PR_BASE,
        _PR_ITERS,
        _PR_SCALE,
        _TOP_N,
        _graph_bcast_max,
        _maybe_broadcast,
        _node_bound,
    )

    orders, lineitem = T(spark, sf_dir, "orders", "lineitem")
    e0 = cache_scoped(
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = e0.unionAll(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    n_nodes = _node_bound(spark, sf_dir)
    bcast = n_nodes <= _graph_bcast_max()
    edges_deg = cache_scoped(
        edges.join(deg, "src").repartition("dst" if bcast else "src")
    )
    rank = deg.select(F.col("src").alias("node"), F.lit(_PR_SCALE).alias("pr"))
    for _ in range(_PR_ITERS):
        rank = (
            edges_deg.join(
                _maybe_broadcast(rank, n_nodes), edges_deg.src == rank.node
            )
            .select(
                F.col("dst").alias("node"),
                F.expr("pr div out_deg").alias("contrib"),
            )
            .groupBy("node")
            .agg(
                (F.lit(_PR_BASE) + F.expr("(85 * sum(contrib)) div 100")).alias("pr")
            )
        )
    return (
        rank.orderBy(F.col("pr").desc(), "node")
        .limit(_TOP_N)
        .select("node", F.col("pr").alias("rank_scaled"))
    )


def pagerank_trade_graph_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v2 + the node-scale `deg` frame also cached, so rank0 reads ~n_nodes
    rows from memory instead of re-aggregating the 2x-union of e0 per run."""
    from pyspark.sql import functions as F

    from map_reduce485_spark.queries._util import cache_scoped
    from map_reduce485_spark.queries.graph import (
        _PR_BASE,
        _PR_ITERS,
        _PR_SCALE,
        _TOP_N,
        _graph_bcast_max,
        _maybe_broadcast,
        _node_bound,
    )

    orders, lineitem = T(spark, sf_dir, "orders", "lineitem")
    e0 = cache_scoped(
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = e0.unionAll(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = cache_scoped(edges.groupBy("src").agg(F.count("*").alias("out_deg")))
    n_nodes = _node_bound(spark, sf_dir)
    bcast = n_nodes <= _graph_bcast_max()
    edges_deg = cache_scoped(
        edges.join(deg, "src").repartition("dst" if bcast else "src")
    )
    rank = deg.select(F.col("src").alias("node"), F.lit(_PR_SCALE).alias("pr"))
    for _ in range(_PR_ITERS):
        rank = (
            edges_deg.join(
                _maybe_broadcast(rank, n_nodes), edges_deg.src == rank.node
            )
            .select(
                F.col("dst").alias("node"),
                F.expr("pr div out_deg").alias("contrib"),
            )
            .groupBy("node")
            .agg(
                (F.lit(_PR_BASE) + F.expr("(85 * sum(contrib)) div 100")).alias("pr")
            )
        )
    return (
        rank.orderBy(F.col("pr").desc(), "node")
        .limit(_TOP_N)
        .select("node", F.col("pr").alias("rank_scaled"))
    )


def dedup_minhash_lsh_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypothesis (the pagerank e0 mechanism): `digests` is consumed by
    TWO union branches, and the band self-join's two sides each execute
    the union — the shingle-explode + 8-permutation signature groupBy (the
    pipeline's dominant cost) can run up to 4x per execution.  Cache the
    digests frame (doc-scale: 8 hashes + sorted shingle array + 2 band
    digests per doc) so it computes once."""
    from pyspark.sql import functions as F

    from map_reduce485_spark.queries._util import cache_scoped
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
    for k in range(1, len(_BANDS)):
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
                / (F.col("na") + F.col("nb") - F.col("intersection")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= _NGRAM_THRESHOLD)
    )


def decontaminate_eval_overlap_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADOPTED into queries/text_analysis.py (A/B: rows identical, wall
    0.78x, CPU within noise; oracle PASS at sf0.001/0.01/0.1).

    Hypothesis (guide §2.3 'project before the exchange' applied to scan
    filters): the registered plan evaluates the expensive
    `size(filter(split(lower(text))))` length gate BEFORE the cheap md5
    eval-slice predicate on both gram scans, so the eval-side scan tokenizes
    100% of the corpus to keep ~5%.  Filtering on the md5 slice FIRST (on the
    base column, before any tokenization is introduced) lets the scan drop
    95% of rows before the split.  Same rows by construction — filters
    commute; the train side keeps ~95% so its win is bounded, but the eval
    side drops ~20x the work."""
    _DECON_EVAL = "substr(md5(CAST(doc_id AS STRING)), 1, 2) <= '0c'"
    _DECON_N = 8
    (docs,) = T(spark, sf_dir, "documents")

    def grams_of(side: DataFrame) -> DataFrame:
        w = side.select(
            "doc_id",
            F.expr("filter(split(lower(text), ' '), x -> x <> '')").alias("w"),
        )
        return w.filter(F.size("w") >= _DECON_N).select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(w) - {_DECON_N - 1}),"
                    f" i -> concat_ws(' ', slice(w, i, {_DECON_N})))"
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
