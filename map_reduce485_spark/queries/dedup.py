"""Deduplication operators for large-scale training-data pipelines.

Four families, all shuffle-native (no driver-side collection anywhere):

- **Exact** — hash-groupBy on a content digest.
- **N-gram Jaccard** — exact set similarity over word 3-gram shingles with an
  inverted-index candidate join.  Correct but candidate generation is
  O(sum of posting-list²); the scale path is MinHash below.
- **MinHash + LSH** — shingle → 8-permutation MinHash signature → 2 bands of
  4 → band-bucket equi-join for candidates → exact-Jaccard verify.  The
  "permutations" are md5(shingle ∥ '#j') and the signature element is the
  lexicographic MIN of the hex digests — deterministic, engine-agnostic
  (hex-string order == 128-bit numeric order), so the whole pipeline is
  SQL-expressible and oracle-checkable, unlike seeded-random approaches.
  At 100 TB this is THE dedup strategy: cost is O(docs × shingles) for
  signatures plus a band-key shuffle; no quadratic blowup.
- **SimHash** — 16-bit fingerprint from md5-nibble bit votes over the token
  set; near-dup pairs = Hamming distance ≤ 3.  At scale, candidate pairs
  come from banding on fingerprint chunks rather than the all-pairs join
  used at test SF (documented inline).

The reference has no dedup operator (its substrate could express exact dedup
as identity-map + first-of-group reduce, SURVEY.md §2.b 'Distinct'); these
are the north-star extensions mandated by BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce485_spark.queries import query
from map_reduce485_spark.queries._util import T, cache_scoped, checkpoint_scoped

# ---------------------------------------------------------------------------
# shared shingle fragments
# ---------------------------------------------------------------------------

# DuckDB CTE producing (doc_id, shingle): distinct word 3-grams per document.
_ORACLE_SHINGLES = """
words AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
),
sh AS (
  SELECT doc_id,
         UNNEST(list_distinct(list_transform(
           generate_series(1, len(w) - 2),
           i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]
         ))) AS shingle
  FROM words WHERE len(w) >= 3
)
"""


def _spark_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) — distinct word 3-grams per document.

    Pure JVM-side array expressions (split/filter/transform/array_distinct/
    explode) — whole-stage codegen, no Python UDF in the hot path."""
    return (
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
                        " i -> concat_ws(' ', w[i-1], w[i], w[i+1]))"
                    )
                )
            ).alias("shingle"),
        )
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


@query(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keep_doc_id
    FROM documents GROUP BY md5(text)
    """,
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content digest, keep the lowest doc_id.

    Hashing first means the shuffle carries 32-byte digests, not documents —
    at 100 TB that is the difference between shuffling 100 TB and ~3 TB."""
    (docs,) = T(spark, sf_dir, "documents")
    return (
        docs.select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keep_doc_id"))
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard
# ---------------------------------------------------------------------------

_NGRAM_THRESHOLD = 0.5

_NGRAM_ORACLE = f"""
WITH {_ORACLE_SHINGLES},
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS intersection
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT a_id, b_id,
       CAST(intersection AS DOUBLE) / (sa.n + sb.n - intersection) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = a_id
JOIN sizes sb ON sb.doc_id = b_id
WHERE CAST(intersection AS DOUBLE) / (sa.n + sb.n - intersection) >= {_NGRAM_THRESHOLD}
"""


@query("dedup_ngram_jaccard", _NGRAM_ORACLE, tags=("dedup",), bench=True)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact Jaccard over word 3-gram shingle sets.

    Candidates come from an inverted-index self-join on shingles (only pairs
    sharing ≥1 shingle are scored).  Jaccard = |∩| / (|A|+|B|-|∩|) — an
    integer/integer division, so the value hashes identically everywhere.

    Shingles are collapsed to 8-byte xxhash64 keys *inside the transform
    lambda* (multi-column hash of the 3 words — the shingle string is never
    materialized): shingle generation runs ~2x faster and the self-join
    shuffles fixed-width longs instead of ~30-byte strings (~35% faster
    join measured; at 100 TB it shrinks the candidate shuffle by ~4x).
    Set-intersection counts are unchanged unless two distinct shingles
    collide in 64 bits (~1e-8 for 10^9 distinct shingles) — the
    oracle-checked counts stay exact.
    """
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
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
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
        .filter(F.col("jaccard") >= _NGRAM_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_N_PERM = 8  # 8 hash permutations → 2 bands of 4 rows
_BANDS = ((0, 1, 2, 3), (4, 5, 6, 7))

_MINHASH_SIG_COLS_SQL = ",\n         ".join(
    f"MIN(md5(shingle || '#{j}')) AS h{j}" for j in range(_N_PERM)
)
_MINHASH_BANDS_SQL = " UNION ALL ".join(
    f"SELECT doc_id, {bi} AS band_id, md5({' || '.join(f'h{j}' for j in band)}) AS band"
    " FROM sig"
    for bi, band in enumerate(_BANDS)
)

_MINHASH_ORACLE = f"""
WITH {_ORACLE_SHINGLES},
sig AS (
  SELECT doc_id,
         {_MINHASH_SIG_COLS_SQL}
  FROM sh GROUP BY doc_id
),
bands AS ({_MINHASH_BANDS_SQL}),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_id = b.band_id AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
verified AS (
  SELECT c.a_id, c.b_id, COUNT(*) AS intersection
  FROM cand c
  JOIN sh x ON x.doc_id = c.a_id
  JOIN sh y ON y.doc_id = c.b_id AND y.shingle = x.shingle
  GROUP BY c.a_id, c.b_id
)
SELECT a_id, b_id,
       CAST(intersection AS DOUBLE) / (sa.n + sb.n - intersection) AS jaccard
FROM verified
JOIN sizes sa ON sa.doc_id = a_id
JOIN sizes sb ON sb.doc_id = b_id
WHERE CAST(intersection AS DOUBLE) / (sa.n + sb.n - intersection) >= {_NGRAM_THRESHOLD}
"""


@query("dedup_minhash_lsh", _MINHASH_ORACLE, tags=("dedup",), bench=True)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup detection, fully deterministic.

    Signature: h_j(doc) = MIN over shingles of md5(shingle ∥ '#j'), j<8 —
    lexicographic min over hex digests ≡ numeric min over the 128-bit hash,
    so this IS MinHash with 8 independent permutations.  LSH: 2 bands × 4
    rows; docs sharing any band digest become candidates (collision
    probability s⁴·2 for Jaccard s — ~0.94 recall at s=0.8, by design).
    Candidates are then verified with exact Jaccard.

    Scale: signatures are one groupBy over shingles; banding is a constant
    fan-out of 2; the candidate join shuffles on 16-byte band digests.  No
    all-pairs stage anywhere — this is the 100 TB dedup path.

    Round-8 rework — RECORD-CARRYING VERIFICATION: the per-doc groupBy
    that builds the minhash signature now also collects the doc's sorted
    xxhash64 shingle array (one pass, same shuffle), each band row
    carries it (band index stays LINEAR in corpus bytes: 2 bands x docs),
    and exact Jaccard is verified MAP-SIDE inside the band self-join via
    `size(array_intersect(...))` — one JVM set-intersection per
    first-match candidate.  This deletes the entire explode-join-regroup
    verify stage (three shuffles and a |candidates| x |shared shingles|
    intermediate that hit 1.2B rows at the 100x smoke).  Counts are
    unchanged unless two shingles collide in 64 bits (the
    `dedup_ngram_jaccard` caveat, ~1e-8 at 1e9 shingles), so the
    string-shingle oracle still hash-matches; signatures stay md5-over-
    string-shingles, which is what keeps the oracle replayable in DuckDB.
    """
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
    # every band row carries ALL band digests (d0, d1, ...) so a pair that
    # collides in several bands can be kept at its FIRST matching band by a
    # map-side filter — no global `distinct` shuffle over the candidate-pair
    # stream (the same first-match-banding move as `dedup_simhash_banded`;
    # exactly-once emission is what lets the verify join count safely)
    digests = sig.select(
        "doc_id",
        "sh_arr",
        "n",
        *[
            F.md5(F.concat(*[F.col(f"h{j}") for j in band])).alias(f"d{bi}")
            for bi, band in enumerate(_BANDS)
        ],
    )
    n_b = len(_BANDS)
    # Round-14 optimization (guide §2.4 — don't re-derive shared subtrees):
    # band rows come from ONE `inline` over an array of (band_id, band,
    # prior-digest...) structs instead of a per-band union.  The union shape
    # re-ran the final signature ObjectHashAggregate once per branch per
    # join side (4x total; AQE exchange reuse only dedups below the
    # exchange); with inline each side derives the signature once and the
    # self-join's two identical exchanges collapse via runtime reuse.
    # A/B (tools/ab_code.py, sf0.1): CPU 0.69x warm / 0.62x cold, wall
    # 0.92x/0.93x; the cache_scoped alternative bought wall 0.54x but paid
    # CPU 2.46x building/reading the array-typed InMemoryRelation —
    # rejected (tools/r14_variants.py::dedup_minhash_lsh_v2).
    # Band bi's first-match filter only reads PRIOR digests d0..d(bi-1)
    # (and the last digest never at all), so later slots ride as NULLs —
    # one null bit each in the band shuffle instead of a 32-char hex
    # string; the `band_id < k` disjunct short-circuits before a NULL is
    # read.
    structs = ", ".join(
        "struct({bi} as band_id, d{bi} as band, {prior})".format(
            bi=bi,
            prior=", ".join(
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
    for k in range(1, len(_BANDS)):
        first_match = first_match & (
            (F.col("a.band_id") < k) | (F.col(f"a.d{k - 1}") != F.col(f"b.d{k - 1}"))
        )
    inter = F.size(F.array_intersect(F.col("a.sh_arr"), F.col("b.sh_arr")))
    return (
        a.join(
            # a SELF-join's sides are equal-sized — broadcast is never the
            # right strategy, and Catalyst's union/generate size guess can
            # undershoot the threshold at scale (the prefix-join lesson)
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


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 16


def _simhash_bit_sql(b: int, instr_fn: str) -> str:
    """Bit b of md5(word) as 0/1, from hex nibble b//4, bit (3 - b%4).

    ``instr_fn`` is 'instr' (Spark) or 'strpos' (DuckDB) — same semantics."""
    hex_pos = 1 + b // 4
    shift = 3 - b % 4
    return (
        f"(({instr_fn}('0123456789abcdef', substr(md5(word), {hex_pos}, 1)) - 1)"
        f" >> {shift}) & 1"
    )


def _simhash_fp_sql(instr_fn: str, bits: int = _SIMHASH_BITS) -> str:
    """SUM-of-votes → fingerprint expression over a (doc_id, word) stream.

    ``bits`` up to 64; bit 63 contributes the BIGINT sign bit, so its term
    adds -2^63 (two's complement) — xor/bit_count/chunk-mask arithmetic all
    operate on the bit pattern and are sign-agnostic on both engines."""
    votes = ",\n       ".join(
        f"SUM(2 * ({_simhash_bit_sql(b, instr_fn)}) - 1) AS s{b}"
        for b in range(bits)
    )

    def term(b: int) -> str:
        v = "-9223372036854775808" if b == 63 else str(1 << b)
        return f"(CASE WHEN s{b} > 0 THEN {v} ELSE 0 END)"

    fp = " + ".join(term(b) for b in range(bits))
    return votes, fp


_DUCK_VOTES, _DUCK_FP = _simhash_fp_sql("strpos")

_SIMHASH_ORACLE = f"""
WITH tokens AS (
  SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
),
votes AS (
  SELECT doc_id,
       {_DUCK_VOTES}
  FROM tokens WHERE word <> '' GROUP BY doc_id
)
SELECT doc_id, CAST({_DUCK_FP} AS BIGINT) AS simhash FROM votes
"""


@query("simhash_fingerprints", _SIMHASH_ORACLE, tags=("dedup",))
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 16-bit SimHash fingerprint.

    Each distinct token votes ±1 on every bit position (bit values taken
    from its md5 digest nibbles); the fingerprint keeps the majority sign.
    Integer votes → exact, engine-agnostic.  Computed entirely map-side
    (per-doc distinct + votes are array expressions, see
    `_spark_simhash_fp`) — zero shuffles, embarrassingly scalable."""
    (docs,) = T(spark, sf_dir, "documents")
    return _spark_simhash_fp(docs, _SIMHASH_BITS)


def _spark_simhash_fp(docs: DataFrame, bits: int) -> DataFrame:
    """(doc_id, simhash) at the given fingerprint width — the Spark twin of
    `_simhash_fp_sql`, shared by the 16-bit oracle queries and the 64-bit
    production-shape queries.

    Round-14 rework (guide §2.4 — remove shuffles outright): fingerprints
    are computed ENTIRELY MAP-SIDE.  Token sets are per-document by
    definition, so the corpus-wide (doc_id, word) `distinct` exchange is
    `array_distinct` in the projection; each distinct token is hashed ONCE
    to the leading-`bits` bit pattern of its md5 (nibbles packed with
    shiftleft/bitwise-or — overflow-free for the 64-bit width, where the
    top nibble would overflow additive packing under ANSI); the per-bit
    ±1 vote sums are array `aggregate`s over that small int array
    (arithmetic `shiftright(t) & 1` reads bit b, matching
    `_simhash_bit_sql`'s hex layout: bit b = nibble b//4, bit 3-b%4 —
    i.e. bit position bits-1-b of the packed value; for b=63 the
    arithmetic shift's sign extension still yields the correct bit).
    ZERO exchanges: the old shape paid a corpus-wide distinct shuffle
    plus a vote groupBy shuffle per fingerprint build.  A/B at sf0.1
    (via dedup_simhash_summary): JVM CPU 0.24x warm / 0.24x cold, wall
    1.07x warm (noise) / 0.87x cold.  Value-identical by construction:
    same token sets, same md5 bits, same majority rule — pinned by the
    family's oracle hash checks.

    Docs with NO tokens (empty/whitespace text) produce no vote row in
    the old groupBy shape, so the map-side form filters empty token
    arrays explicitly to keep the output row set identical."""
    _, fp_expr = _simhash_fp_sql("instr", bits)
    assert bits % 4 == 0 and bits <= 64, "hex-nibble packing needs 4 | bits <= 64"
    n_nib = bits // 4
    nib = "(instr('0123456789abcdef', substring(m, {p}, 1)) - 1)"
    packed = " | ".join(
        f"shiftleft(cast({nib.format(p=i + 1)} as bigint), {4 * (n_nib - 1 - i)})"
        for i in range(n_nib)
    )
    votes = [
        f"aggregate(tv, 0L, (acc, t) -> acc + 2 * (shiftright(t, {bits - 1 - b}) & 1) - 1)"
        for b in range(bits)
    ]
    return (
        docs.select(
            "doc_id",
            F.expr(
                "transform(transform(array_distinct("
                "filter(split(text, ' '), x -> x <> '')), x -> md5(x)),"
                f" m -> {packed})"
            ).alias("tv"),
        )
        .filter(F.size("tv") > 0)
        .select(
            "doc_id",
            *[F.expr(v).alias(f"s{b}") for b, v in enumerate(votes)],
        )
        .select("doc_id", F.expr(fp_expr).cast("bigint").alias("simhash"))
    )


_SIMHASH_PAIRS_ORACLE = f"""
WITH tokens AS (
  SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
),
votes AS (
  SELECT doc_id,
       {_DUCK_VOTES}
  FROM tokens WHERE word <> '' GROUP BY doc_id
),
fp AS (SELECT doc_id, CAST({_DUCK_FP} AS BIGINT) AS simhash FROM votes)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


@query("dedup_simhash_pairs", _SIMHASH_PAIRS_ORACLE, tags=("dedup",))
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ 3.

    Test-SF implementation compares all pairs; at 100 TB candidates come
    from banding the fingerprint into 4-bit chunks (pigeonhole: Hamming ≤ 3
    over 4 chunks ⇒ ≥1 chunk identical) and equi-joining per chunk — same
    LSH-bucketing shape as MinHash above, never quadratic."""
    fp = simhash_fingerprints(spark, sf_dir)
    a = fp.alias("a")
    b = fp.alias("b")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
    )


@query("dedup_simhash_banded", _SIMHASH_PAIRS_ORACLE, tags=("dedup",))
def dedup_simhash_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via chunk banding — same result set as
    `dedup_simhash_pairs`, scalable plan.

    Pigeonhole: Hamming distance ≤ 3 over a 16-bit fingerprint split into 4
    nibbles ⇒ at least one nibble is identical, so the all-pairs join is
    replaced *exactly* (not approximately — hence the identical oracle) by
    4 equi-joins on (chunk_id, nibble) + Hamming verify.  A pair whose
    fingerprints agree on several nibbles matches several bands; instead
    of a global `distinct` over the candidate pairs (a shuffle of the
    full — quadratic-in-cluster-size — pair stream), each pair is kept
    only at its FIRST matching band: both join sides carry the whole
    fingerprint, so "no earlier nibble of a⊕b is zero" is a map-side
    expression and every qualifying pair survives exactly once with ZERO
    post-join shuffle.  Cost is driven by bucket sizes (64 buckets here;
    2^16 chunks of a 64-bit fingerprint in production), never by corpus².
    This is the plan that survives 100 TB; `dedup_simhash_pairs` is its
    brute-force twin for test-SF cross-checking."""
    fp = cache_scoped(simhash_fingerprints(spark, sf_dir))
    return _simhash_banded_pairs(fp, n_chunks=4, chunk_bits=4)


def _simhash_banded_pairs(
    fp: DataFrame, n_chunks: int, chunk_bits: int, max_hamming: int = 3
) -> DataFrame:
    """Chunk-banded SimHash pair generation at any (n_chunks, chunk_bits)
    geometry — pigeonhole requires max_hamming < n_chunks so every
    qualifying pair shares at least one identical chunk.  Shared by the
    16-bit oracle twin (4x4-bit nibbles, 16 buckets/band — fine at test SF)
    and the 64-bit production shape (4x16-bit chunks, 65,536 buckets/band —
    the geometry whose bucket sizes stay bounded at corpus scale)."""
    assert max_hamming < n_chunks, "pigeonhole needs more chunks than flips"
    mask = (1 << chunk_bits) - 1
    chunks = None
    for c in range(n_chunks):
        ch = fp.select(
            "doc_id",
            "simhash",
            F.lit(c).alias("chunk_id"),
            F.shiftright("simhash", chunk_bits * c)
            .bitwiseAND(F.lit(mask))
            .alias("chunk"),
        )
        chunks = ch if chunks is None else chunks.unionAll(ch)
    a = chunks.alias("a")
    b = chunks.alias("b")
    x = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    # first-match-band dedup: all chunks below chunk_id differ, i.e. the
    # low chunk_bits*chunk_id bits of a⊕b have no zero chunk.  Build the
    # check as "every earlier chunk is nonzero" with a bounded AND chain
    # (chunk_id is one literal per union branch, so this folds per branch).
    # Arithmetic-vs-logical shift is irrelevant: the mask keeps only the
    # true low bits, so the sign bit of a 64-bit fingerprint never leaks.
    earlier_nonzero = F.lit(True)
    for c in range(1, n_chunks):
        earlier_nonzero = earlier_nonzero & (
            (F.col("a.chunk_id") < c)
            | (F.shiftright(x, chunk_bits * (c - 1)).bitwiseAND(F.lit(mask)) != 0)
        )
    return (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(earlier_nonzero)
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.bit_count(x).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


_SIMHASH_SUMMARY_ORACLE = f"""
WITH pairs AS ({_SIMHASH_PAIRS_ORACLE})
SELECT hamming, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT a_id) AS BIGINT) AS n_left_docs,
       CAST(COUNT(DISTINCT b_id) AS BIGINT) AS n_right_docs
FROM pairs GROUP BY hamming
"""


@query("dedup_simhash_summary", _SIMHASH_SUMMARY_ORACLE, tags=("dedup",), bench=True)
def dedup_simhash_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup SUMMARY — the 100 TB OUTPUT SHAPE for the banded
    plan (round-5 verdict item 5): per-Hamming-distance pair counts and
    distinct-doc counts instead of the raw pair list.  A near-dup-dense
    corpus makes the pair set quadratic in cluster size (337 M rows at the
    10x smoke — nothing downstream ever consumes them raw); the decision
    a pipeline actually takes needs the aggregate, so the verify stage
    feeds a ≤4-row map-side-combinable groupBy and the sink is constant
    size at any corpus scale.  `dedup_simhash_banded` remains the
    pair-level oracle twin; this query wraps its exact plan."""
    pairs = dedup_simhash_banded(spark, sf_dir)
    return pairs.groupBy("hamming").agg(
        F.count("*").alias("n_pairs"),
        F.count_distinct("a_id").alias("n_left_docs"),
        F.count_distinct("b_id").alias("n_right_docs"),
    )


_SIMHASH_WIDE_BITS = 64
_SIMHASH_WIDE_CHUNK_BITS = 16  # 4 chunks x 16 bits -> 65,536 buckets/band

_DUCK_VOTES64, _DUCK_FP64 = _simhash_fp_sql("strpos", _SIMHASH_WIDE_BITS)

_SIMHASH_WIDE_PAIRS_SQL = f"""
WITH tokens AS (
  SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
),
votes AS (
  SELECT doc_id,
       {_DUCK_VOTES64}
  FROM tokens WHERE word <> '' GROUP BY doc_id
),
fp AS (SELECT doc_id, CAST({_DUCK_FP64} AS BIGINT) AS simhash FROM votes)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""

_SIMHASH_WIDE_SUMMARY_ORACLE = f"""
WITH pairs AS ({_SIMHASH_WIDE_PAIRS_SQL})
SELECT hamming, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT a_id) AS BIGINT) AS n_left_docs,
       CAST(COUNT(DISTINCT b_id) AS BIGINT) AS n_right_docs
FROM pairs GROUP BY hamming
"""


@query("dedup_simhash_summary_wide", _SIMHASH_WIDE_SUMMARY_ORACLE, tags=("dedup",))
def dedup_simhash_summary_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION-GEOMETRY SimHash summary: 64-bit fingerprints banded
    as 4 x 16-bit chunks (65,536 buckets per band) with Hamming ≤ 3 verify
    — the shape `dedup_simhash_banded`'s docstring names as the 100 TB
    plan, now a first-class oracle-checked query rather than a comment.

    Why geometry matters (round-8 verdict item 2): the 16-bit twin's
    4-bit nibbles give only 16 values per band, so at 50 M docs every
    band bucket holds ~3 M docs and the verify join degenerates to
    near-quadratic (913 s of the 100x smoke).  With 65,536 values per
    band, bucket sizes are corpus/65,536 plus the true dup families —
    bounded by data skew, not by the banding itself.  The 100x smoke
    runs THIS query so the artifact measures the plan a cluster would
    actually execute; the 16-bit twin stays as the sf-scale oracle pair
    (`dedup_simhash_pairs`/`dedup_simhash_banded` cross-check) and the
    round-comparable bench entry.

    Bit 63 is the BIGINT sign bit (fingerprint adds -2^63 for a majority
    vote there); xor/bit_count and the mask-after-shift chunk extraction
    are bit-pattern operations, identical on both engines regardless of
    sign — pinned by this query's own hash check."""
    (docs,) = T(spark, sf_dir, "documents")
    fp = cache_scoped(_spark_simhash_fp(docs, _SIMHASH_WIDE_BITS))
    pairs = _simhash_banded_pairs(
        fp, n_chunks=4, chunk_bits=_SIMHASH_WIDE_CHUNK_BITS
    )
    return pairs.groupBy("hamming").agg(
        F.count("*").alias("n_pairs"),
        F.count_distinct("a_id").alias("n_left_docs"),
        F.count_distinct("b_id").alias("n_right_docs"),
    )


# ---------------------------------------------------------------------------
# dedup clustering: pairs → connected components → keep/drop decisions
# ---------------------------------------------------------------------------

# the recursive component CTEs, shared by dedup_clusters and the
# quality-aware keep policy below
_CLUSTERS_CTES = f"""{_ORACLE_SHINGLES},
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
rawpairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS intersection
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT a_id, b_id FROM rawpairs
  JOIN sizes sa ON sa.doc_id = a_id
  JOIN sizes sb ON sb.doc_id = b_id
  WHERE CAST(intersection AS DOUBLE) / (sa.n + sb.n - intersection)
        >= {_NGRAM_THRESHOLD}
),
edges AS (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION ALL SELECT b_id, a_id FROM pairs
),
reach(id, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT reach.id, edges.dst FROM reach JOIN edges ON edges.src = reach.r
)"""

_CLUSTERS_ORACLE = f"""
WITH RECURSIVE {_CLUSTERS_CTES}
SELECT id AS doc_id, MIN(r) AS cluster_id,
       CAST(id = MIN(r) AS INTEGER) AS is_kept
FROM reach GROUP BY id
"""


@query("dedup_clusters", _CLUSTERS_ORACLE, tags=("dedup",))
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → connected components → keep-one-per-cluster.

    The last stage of a production dedup pipeline: pairwise similarity only
    says "a ~ b"; the corpus decision needs transitive clusters (a~b, b~c ⇒
    one cluster) with one survivor each (the minimum doc_id here).

    Spark side is iterative min-label propagation — each round every node
    adopts the smallest label among itself and its neighbors, converging in
    O(component diameter) rounds; each round is one join + one groupBy, all
    shuffle-native (this is the simple form of the large-star/small-star
    connected-components algorithm used at web scale).  The oracle computes
    the same components with a recursive CTE.  Only docs that appear in at
    least one near-dup pair are emitted (singletons trivially keep
    themselves).
    """
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("a_id", "b_id")
    edges = pairs.unionAll(
        pairs.select(F.col("b_id").alias("a_id"), F.col("a_id").alias("b_id"))
    )
    edges = cache_scoped(edges)
    labels = (
        edges.select(F.col("a_id").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
    )
    # diameter of near-dup clusters is tiny (dup groups are near-cliques);
    # bound the loop and stop early once a fixpoint is reached.  The old and
    # new label ride in ONE joined frame so each round costs one join + one
    # groupBy + one action over the cached result (no separate diff join).
    for _ in range(10):
        neighbor_min = (
            edges.join(labels, F.col("b_id") == F.col("id"))
            .groupBy(F.col("a_id").alias("nid"))
            .agg(F.min("label").alias("nlabel"))
        )
        step = (
            labels.join(neighbor_min, F.col("id") == F.col("nid"), "left")
            .select(
                "id",
                F.col("label").alias("old_label"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
        )
        # checkpoint, not cache (round 14, the kcore planning-cost find):
        # each round's step references the previous labels twice, so the
        # logical plan grew per round even with caches; truncating it keeps
        # every round planning at round-1 cost (warm 3.6 s -> 2.9 s sf0.1).
        step = checkpoint_scoped(step)
        changed = step.filter(F.col("label") != F.col("old_label")).limit(1).count()
        labels = step.select("id", "label")
        if changed == 0:
            break
    return labels.select(
        F.col("id").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        (F.col("id") == F.col("label")).cast("int").alias("is_kept"),
    )


# the recursive component CTEs over the MINHASH-LSH verified pair stream
# (the production clustering input) — same reach recursion as
# _CLUSTERS_CTES, different pair generator: banded LSH candidates with
# exact-Jaccard verification, exactly dedup_minhash_lsh's oracle
_LSH_CLUSTERS_CTES = f"""{_ORACLE_SHINGLES},
sig AS (
  SELECT doc_id,
         {_MINHASH_SIG_COLS_SQL}
  FROM sh GROUP BY doc_id
),
bands AS ({_MINHASH_BANDS_SQL}),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_id = b.band_id AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inters AS (
  SELECT c.a_id, c.b_id, COUNT(*) AS intersection
  FROM cand c
  JOIN sh x ON x.doc_id = c.a_id
  JOIN sh y ON y.doc_id = c.b_id AND y.shingle = x.shingle
  GROUP BY c.a_id, c.b_id
),
vpairs AS (
  SELECT i.a_id, i.b_id
  FROM inters i
  JOIN sizes sa ON sa.doc_id = i.a_id
  JOIN sizes sb ON sb.doc_id = i.b_id
  WHERE CAST(i.intersection AS DOUBLE) / (sa.n + sb.n - i.intersection)
        >= {_NGRAM_THRESHOLD}
),
edges AS (
  SELECT a_id AS src, b_id AS dst FROM vpairs
  UNION ALL SELECT b_id, a_id FROM vpairs
),
reach(id, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT reach.id, edges.dst FROM reach JOIN edges ON edges.src = reach.r
)"""

_LSH_CLUSTERS_ORACLE = f"""
WITH RECURSIVE {_LSH_CLUSTERS_CTES}
SELECT id AS doc_id, MIN(r) AS cluster_id,
       CAST(id = MIN(r) AS INTEGER) AS is_kept
FROM reach GROUP BY id
"""


@query("dedup_clusters_star", _LSH_CLUSTERS_ORACLE, tags=("dedup", "graph"))
def dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components by alternating large-star/small-star contraction
    over the MINHASH-LSH VERIFIED pair stream, with exact-duplicate
    contraction — the bounded-rounds, bounded-disk scale twin of
    `dedup_clusters`, wired the way a production pipeline actually runs.

    Min-label propagation converges in O(component diameter) join rounds:
    perfect for near-dup families (near-cliques), pathological on chains —
    a transitive chain of 10^6 borderline-similar docs would need 10^6
    shuffle rounds.  The alternating-star algorithm (Kiveris et al.,
    SoCC'14; see `operators/components.py`) converges in O(log^2 n) rounds
    on ANY topology, so it is the form that survives adversarial cluster
    shapes at 100 TB.

    Exact-dup contraction (the standard production move): a dup family of
    g identical documents contributes g(g-1)/2 near-dup pairs — quadratic
    in multiplicity — yet carries one bit of clustering information.  So
    before the star rounds, every doc is mapped to the minimum doc_id of
    its content-fingerprint (md5(text)) group, intra-family pairs collapse
    to dropped self-loops, and the star rounds materialize only the
    contracted representative graph (bounded by CONTENT diversity, not dup
    multiplicity).  Members rejoin at the end with their representative's
    component label.  Exactness: identical text ⇒ identical shingle sets ⇒
    Jaccard 1 ≥ threshold, so every family with ≥2 members and ≥1 shingle
    is a clique in the raw pair graph — contraction merges only
    already-connected nodes and preserves components; a family's
    representative (its min doc_id) is also the family's min inside any
    component, so the contracted component minimum equals the raw one.
    (On a corpus whose duplicates are all NEAR-dups — e.g. the scale
    smoke's perturbed per-copy texts — exact-dup contraction is a no-op
    by design; it pays off on real corpora, where exact-dup families
    dominate.  The round-7 advice was right that contraction alone did
    NOT fix the mult=100 ENOSPC.  The argument carries over to the LSH
    pair graph: identical text ⇒ identical minhash signature ⇒ a
    band-0 collision that verifies at Jaccard 1 ≥ t, so exact-dup
    families are cliques here too.)

    WHY LSH PAIRS (the round-8 finding, measured): clustering the EXACT
    all-pairs stream is inherently quadratic in dup multiplicity — not
    in the star rounds (whose per-round `distinct` collapses
    near-clique families after round 1) but in pair GENERATION.  At the
    100x smoke (every doc in a 100-copy near-dup family), the exact
    inverted-index join must evaluate ~5B single-shingle collisions
    whatever the verification plan: the explode-join-regroup plan
    spilled ~4.5 GB/min into a 1.1B-row hash-agg (the round-6 ENOSPC),
    a fetch-arrays-by-id plan shuffled ~43 GB of array payloads on the
    candidate stream (round-8 ENOSPC), and the best map-side plan
    (`dedup_prefix_filter_join`'s first-match + record-carrying
    verification) ran disk-stable but >40 min of pure collision
    evaluation.  Banded MinHash keys candidates by 16-byte WHOLE-BAND
    digests, so a dup family is ~one bucket per band instead of one
    bucket per shingle: pair generation completed the same corpus in
    201 s (SCALE_SMOKE_100x).  That is why every production dedup
    pipeline clusters banded candidates — and why this, the scale twin,
    consumes `dedup_minhash_lsh`'s verified pairs (banding recall at
    the threshold is the documented tradeoff), while `dedup_clusters`
    keeps the exact all-pairs input as the oracle-side baseline.

    Same output contract as `dedup_clusters`; the oracle composes
    `dedup_minhash_lsh`'s deterministic md5-minhash CTEs with the same
    recursive reach; a pytest property test pins logarithmic
    convergence on a deliberately chained fixture where label
    propagation's round bound would blow up.
    """
    from map_reduce485_spark.operators.components import star_components

    (docs,) = T(spark, sf_dir, "documents")
    pairs = cache_scoped(
        dedup_minhash_lsh(spark, sf_dir).select("a_id", "b_id")
    )
    # materialize the cache BEFORE planning the consumers: Catalyst's
    # row estimate for the filtered similarity join is a blind guess
    # ("tiny"), and every downstream join would inherit it and try to
    # BROADCAST the pair stream (an 8.3 GiB build abort at the 100x
    # smoke).  A materialized InMemoryRelation reports its true size, so
    # the planner broadcasts the genuinely-small side (rep_map here, at
    # test scale) and shuffle-joins when the pairs are big — the right
    # call at every scale, with no hard-coded strategy.
    pairs.count()
    rep_map = cache_scoped(
        docs.select("doc_id", F.md5("text").alias("fp")).select(
            "doc_id", F.min("doc_id").over(Window.partitionBy("fp")).alias("rep")
        )
    )
    ra = rep_map.select(F.col("doc_id").alias("a_id"), F.col("rep").alias("rep_a"))
    rb = rep_map.select(F.col("doc_id").alias("b_id"), F.col("rep").alias("rep_b"))
    contracted = (
        pairs.join(ra, "a_id")
        .join(rb, "b_id")
        .select("rep_a", "rep_b")
        .filter(F.col("rep_a") != F.col("rep_b"))
    )
    labels_rep, _rounds = star_components(contracted, "rep_a", "rep_b")
    # every doc that appears in >=1 raw pair is emitted (oracle contract);
    # a rep with no inter-family edges is absent from labels_rep and keeps
    # its own id as the cluster label (its family is a component by itself)
    members = (
        pairs.select(F.col("a_id").alias("doc_id"))
        .unionAll(pairs.select(F.col("b_id").alias("doc_id")))
        .distinct()
    )
    lbl = labels_rep.select(F.col("id").alias("rep"), "label")
    cluster = F.coalesce(F.col("label"), F.col("rep"))
    return (
        members.join(rep_map, "doc_id")
        .join(lbl, "rep", "left")
        .select(
            "doc_id",
            cluster.alias("cluster_id"),
            (F.col("doc_id") == cluster).cast("int").alias("is_kept"),
        )
    )


_CLUSTER_HISTO_ORACLE = f"""
WITH RECURSIVE {_LSH_CLUSTERS_CTES},
comp AS (SELECT id, MIN(r) AS cid FROM reach GROUP BY id),
csize AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS cluster_size
          FROM comp GROUP BY cid)
SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(cluster_size) AS BIGINT) AS n_docs,
       CAST(SUM(cluster_size) - COUNT(*) AS BIGINT) AS n_dropped
FROM csize GROUP BY cluster_size
"""


@query("dedup_cluster_size_histogram", _CLUSTER_HISTO_ORACLE, tags=("dedup", "graph"))
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size histogram — the 100 TB OUTPUT SHAPE for near-dup
    CLUSTERING, completing the summary-twin pattern
    (`dedup_simhash_summary` / `dedup_winnowing_summary` did it for the
    banded pair stage): per cluster size, how many clusters, how many
    docs they hold, and how many docs a keep-one policy drops.  That
    histogram (the corpus's duplication profile) is the number a pipeline
    operator actually reads before committing a dedup pass; the per-doc
    assignment list stays distributed.  Plan: the exact-dup-contracted
    star components of `dedup_clusters_star`, then two map-side-
    combinable groupBys — output is bounded by the largest cluster size,
    constant-ish at any corpus scale."""
    clusters = dedup_clusters_star(spark, sf_dir)
    csize = clusters.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return csize.groupBy("cluster_size").agg(
        F.count("*").alias("n_clusters"),
        F.sum("cluster_size").alias("n_docs"),
        (F.sum("cluster_size") - F.count("*")).alias("n_dropped"),
    )


# ---------------------------------------------------------------------------
# winnowing: strided local fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03)
# ---------------------------------------------------------------------------

_WINNOW_W = 4  # window of consecutive gram hashes; guarantee length w+2 grams
_WINNOW_MIN_SHARED = 2
# df-cap for the _capped scale twin: fingerprints shared by more docs carry
# no near-dup signal (the plagiarism-index stop-fingerprint move, same
# argument as link_prediction_jaccard's hub cap).  16 keeps 100% of pairs at
# sf0.001/sf0.01 and 96% at sf0.1 (measured: max df 9/7/24 per SF), while
# bounding per-fingerprint pair cost at C(16,2) regardless of dup-family
# multiplicity — the exact form's C(df,2) grows as family-size² (107 M pairs
# and 386-440 s at the 100x smoke, the round-10 verdict's one weak item).
_WINNOW_DF_CAP = 16

# shared fingerprint-extraction CTEs (words -> 3-gram hashes -> winnowed
# window minima -> per-doc distinct fingerprints)
_WINNOW_FP_CTES = f"""words AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
),
grams AS (
  SELECT doc_id, i, md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS h,
         len(w) - 2 AS n_grams
  FROM (SELECT doc_id, w, UNNEST(generate_series(1, len(w) - 2)) AS i
        FROM words WHERE len(w) >= 3)
),
wins AS (
  SELECT doc_id, i, n_grams,
         MIN(h || lpad(CAST(100000000 - i AS VARCHAR), 8, '0'))
           OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING) AS sel
  FROM grams
),
fp AS (
  SELECT DISTINCT doc_id, substr(sel, 1, 32) AS h
  FROM wins WHERE i <= n_grams - {_WINNOW_W - 1}
)"""

_WINNOW_ORACLE = f"""
WITH {_WINNOW_FP_CTES},
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_shared
  FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT a_id, b_id, n_shared FROM pairs WHERE n_shared >= {_WINNOW_MIN_SHARED}
"""


@query("dedup_winnowing_pairs", _WINNOW_ORACLE, tags=("dedup",))
def dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidates by WINNOWING fingerprints: hash word 3-grams in
    document order, slide a w=4 window over consecutive gram hashes, keep
    each window's minimum (rightmost position on ties — the paper's robust
    winnowing rule), and join documents on shared fingerprints.

    Guarantee: any shared run of >= w+2 consecutive words produces at least
    one shared fingerprint — unlike MinHash there are no probabilistic
    misses above the guarantee length, and unlike the full n-gram inverted
    index (`dedup_ngram_jaccard`, the exact twin) only ~2/(w+1) of grams
    survive as index keys.

    100 TB shape: gram explode is corpus-linear but map-side; the window
    runs per-document (state = w rows, partition key = doc_id — never a
    global window); the fingerprint index join shuffles 16-byte hashes at
    ~40% the full index's volume, with md5-uniform posting lists.  The
    windowed-min stride is the same primitive `doc_fingerprint` documents
    as its scale path — this is that path, realized.

    The tie-break key packs (hash, 10^8 - position) into one string so both
    engines' plain MIN picks the identical (lowest-hash, rightmost) gram —
    no argmin/min_by cross-engine semantics in play.
    """
    (docs,) = T(spark, sf_dir, "documents")
    return _winnow_pairs(docs)


def _winnow_pairs(docs: DataFrame) -> DataFrame:
    """(a_id, b_id, n_shared) winnowing candidate pairs — the shared core
    of `dedup_winnowing_pairs` and `dedup_graph_triangles`.

    Pair generation is the fingerprint-index SELF-JOIN, kept deliberately
    after a measured round-9 A/B: the grouped-posting-list alternative
    (groupBy(h).collect_list + map-side nested-transform pair explosion —
    the move that cut minhash 201 s → 35 s) was 43% SLOWER here at both
    the 10x and 100x smokes (4.0 → 5.7 s, 415 → ~590 s).  Minhash's win
    came from deleting an explode-join-regroup VERIFY stage; winnowing
    has no verify stage, so the swap only traded a whole-stage-codegen
    sort-merge join for an ObjectHashAggregate building array state plus
    per-row struct allocation.  The join's pair stream lands directly in
    a partial hash agg (map-side combine across fingerprints), so total
    shuffle volume is comparable and the JVM-tight join wins.

    FINGERPRINT EXTRACTION stays explode + per-doc window + distinct,
    also after a measured A/B (this round): the all-array alternative
    (per-row transform/slice/array_min/array_distinct — zero shuffle
    before the index join) was 70-75% SLOWER at both smokes (10x:
    3.54 s -> 5.98 s; 100x: 400 s -> 701 s, quiet box, best-of-2).
    Spark evaluates higher-order functions INTERPRETED, one closure
    call + object allocation per array element, while the explode /
    window / distinct pipeline is whole-stage-codegen throughout — at
    ~50 gram-hashes x ~4-element slices per doc the per-element
    interpreter overhead costs more than the two shuffles it saves.
    Same lesson as the pair-generation A/B above: measured plans beat
    theoretically-shuffle-optimal plans."""
    a = _winnow_fp(docs).select(F.col("doc_id").alias("a_id"), "h")
    b = _winnow_fp(docs).select(F.col("doc_id").alias("b_id"), "h")
    return (
        a.join(b, "h")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= _WINNOW_MIN_SHARED)
    )


def _winnow_fp(docs: DataFrame) -> DataFrame:
    """(doc_id, h) winnowing fingerprints — explode + per-doc window +
    distinct (the measured-fastest extraction; see `_winnow_pairs` for the
    rejected all-array A/B)."""
    from pyspark.sql import Window as W

    words = docs.select(
        "doc_id", F.expr("filter(split(text, ' '), x -> x <> '')").alias("w")
    ).filter(F.size("w") >= 3)
    grams = words.select(
        "doc_id",
        (F.size("w") - 2).alias("n_grams"),
        F.explode(F.sequence(F.lit(1), F.size("w") - 2)).alias("i"),
        "w",
    ).select(
        "doc_id",
        "n_grams",
        "i",
        F.expr(
            "md5(concat(element_at(w, i), ' ', element_at(w, i + 1),"
            " ' ', element_at(w, i + 2)))"
        ).alias("h"),
    )
    win = W.partitionBy("doc_id").orderBy("i").rowsBetween(0, _WINNOW_W - 1)
    key = F.concat(
        "h", F.lpad((F.lit(100000000) - F.col("i")).cast("string"), 8, "0")
    )
    return (
        grams.withColumn("sel", F.min(key).over(win))
        .filter(F.col("i") <= F.col("n_grams") - (_WINNOW_W - 1))
        .select("doc_id", F.substring("sel", 1, 32).alias("h"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# triangle counting over the near-dup candidate graph
# ---------------------------------------------------------------------------

_TRIANGLES_ORACLE = f"""
WITH pairs AS ({_WINNOW_ORACLE}),
deg AS (
  SELECT id, COUNT(*) AS deg FROM (
    SELECT a_id AS id FROM pairs UNION ALL SELECT b_id FROM pairs
  ) GROUP BY id
),
o AS (
  SELECT CASE WHEN (da.deg, p.a_id) < (db.deg, p.b_id) THEN p.a_id ELSE p.b_id END AS u,
         CASE WHEN (da.deg, p.a_id) < (db.deg, p.b_id) THEN p.b_id ELSE p.a_id END AS v,
         CASE WHEN (da.deg, p.a_id) < (db.deg, p.b_id) THEN db.deg ELSE da.deg END AS dv
  FROM pairs p JOIN deg da ON da.id = p.a_id JOIN deg db ON db.id = p.b_id
)
SELECT LEAST(x.u, x.v, y.v) AS a_id,
       x.u + x.v + y.v - LEAST(x.u, x.v, y.v) - GREATEST(x.u, x.v, y.v) AS b_id,
       GREATEST(x.u, x.v, y.v) AS c_id
FROM o x
JOIN o y ON x.u = y.u AND ((x.dv, x.v) < (y.dv, y.v))
JOIN o z ON z.u = x.v AND z.v = y.v
"""


@query("dedup_graph_triangles", _TRIANGLES_ORACLE, tags=("dedup", "graph"))
def dedup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the near-dup candidate graph (winnowing pairs as
    edges) via DEGREE-ORDERED edge orientation — the distributed triangle
    algorithm that scales: orient every edge from its lower-(degree, id)
    endpoint to the higher, so each triangle is found exactly once at its
    lowest-order corner and the wedge join's fan-out per node is bounded
    by out-degree, which degree-ordering caps at O(sqrt(|E|)) — a plain
    id-ordering would let one high-degree hub generate degree^2 wedges.

    Triangle density over candidate pairs is the standard diagnostic for
    whether near-dup families are cliques (true duplicate groups) or
    chains (shingle-collision noise).  Three joins, all on node keys; no
    node ever sees more than its neighborhood.  Output triples are
    id-sorted via least/sum/greatest — identical arithmetic on both
    engines."""
    (docs,) = T(spark, sf_dir, "documents")
    pairs = cache_scoped(_winnow_pairs(docs).select("a_id", "b_id"))
    deg = (
        pairs.select(F.col("a_id").alias("id"))
        .unionAll(pairs.select(F.col("b_id").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    e = (
        pairs.join(deg.select(F.col("id").alias("a_id"), F.col("deg").alias("da")), "a_id")
        .join(deg.select(F.col("id").alias("b_id"), F.col("deg").alias("db")), "b_id")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a_id") < F.col("b_id"))
    )
    o = e.select(
        F.when(a_first, F.col("a_id")).otherwise(F.col("b_id")).alias("u"),
        F.when(a_first, F.col("b_id")).otherwise(F.col("a_id")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    x = o.select(F.col("u"), F.col("v").alias("v1"), F.col("dv").alias("dv1"))
    y = o.select(F.col("u"), F.col("v").alias("v2"), F.col("dv").alias("dv2"))
    wedges = x.join(y, "u").filter(
        (F.col("dv1") < F.col("dv2"))
        | ((F.col("dv1") == F.col("dv2")) & (F.col("v1") < F.col("v2")))
    )
    closing = o.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    tri = wedges.join(closing, ["v1", "v2"])
    lo = F.least("u", "v1", "v2")
    hi = F.greatest("u", "v1", "v2")
    return tri.select(
        lo.alias("a_id"),
        (F.col("u") + F.col("v1") + F.col("v2") - lo - hi).alias("b_id"),
        hi.alias("c_id"),
    )


_KEEP_BEST_ORACLE = f"""
WITH RECURSIVE {_CLUSTERS_CTES},
clusters AS (
  SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
),
ranked AS (
  SELECT c.cluster_id, c.doc_id, d.n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY c.cluster_id ORDER BY d.n_chars DESC, c.doc_id
         ) AS rn,
         COUNT(*) OVER (PARTITION BY c.cluster_id) AS n_docs
  FROM clusters c JOIN documents d ON d.doc_id = c.doc_id
)
SELECT cluster_id, doc_id AS keep_doc_id, n_chars AS keep_n_chars, n_docs
FROM ranked WHERE rn = 1
"""


@query("dedup_keep_best_quality", _KEEP_BEST_ORACLE, tags=("dedup",))
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production keep POLICY on top of near-dup clusters: instead of
    `dedup_clusters`' arbitrary lowest-id survivor, keep each cluster's
    highest-QUALITY document (longest here, stand-in for any score;
    ties -> lowest doc_id) — what an actual training-data pipeline ships:
    duplicates differ by truncation/boilerplate and the survivor choice
    decides what the model sees.

    Composes the cluster operator with a per-cluster argmax (one window
    over cluster-cardinality rows — clusters are tiny near-cliques, so
    the partition key is never skewed).  The oracle extends the recursive
    component CTE with the same ranked choice."""
    from pyspark.sql import Window as W

    (docs,) = T(spark, sf_dir, "documents")
    clusters = dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    w = W.partitionBy("cluster_id").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_docs", F.count("*").over(W.partitionBy("cluster_id")))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("keep_doc_id"),
            F.col("n_chars").alias("keep_n_chars"),
            "n_docs",
        )
    )


_MH_QUALITY_ORACLE = f"""
WITH {_ORACLE_SHINGLES},
sig AS (
  SELECT doc_id,
         {_MINHASH_SIG_COLS_SQL}
  FROM sh GROUP BY doc_id
),
bands AS ({_MINHASH_BANDS_SQL}),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_id = b.band_id AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.a_id, c.b_id, COUNT(*) AS intersection
  FROM cand c
  JOIN sh x ON x.doc_id = c.a_id
  JOIN sh y ON y.doc_id = c.b_id AND y.shingle = x.shingle
  GROUP BY c.a_id, c.b_id
)
SELECT c.a_id, c.b_id,
       ({' + '.join(f'CASE WHEN sa.h{j} = sb.h{j} THEN 1 ELSE 0 END' for j in range(_N_PERM))})
         / {_N_PERM}.0 AS est_jaccard,
       CAST(COALESCE(i.intersection, 0) AS DOUBLE)
         / (za.n + zb.n - COALESCE(i.intersection, 0)) AS exact_jaccard
FROM cand c
JOIN sig sa ON sa.doc_id = c.a_id
JOIN sig sb ON sb.doc_id = c.b_id
JOIN sizes za ON za.doc_id = c.a_id
JOIN sizes zb ON zb.doc_id = c.b_id
LEFT JOIN inter i ON i.a_id = c.a_id AND i.b_id = c.b_id
"""


@query("minhash_estimate_quality", _MH_QUALITY_ORACLE, tags=("dedup",))
def minhash_estimate_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator evaluation for the MinHash sketch (the dedup analog of
    `langid_confusion_matrix`): for every LSH candidate pair, the
    signature-based Jaccard ESTIMATE (matching permutations / 8) side by
    side with the EXACT shingle Jaccard — the report that justifies the
    band/row configuration before trusting it at 100 TB.  Both columns
    are int/int divisions; the estimate needs only the 8-column signature
    table (what production keeps), the exact value only for the tiny
    candidate set."""
    (docs,) = T(spark, sf_dir, "documents")
    sh = cache_scoped(_spark_shingles(docs))
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{j}")))).alias(f"h{j}")
            for j in range(_N_PERM)
        ]
    )
    bands = None
    for bi, band in enumerate(_BANDS):
        b = sig.select(
            "doc_id",
            F.lit(bi).alias("band_id"),
            F.md5(F.concat(*[F.col(f"h{j}") for j in band])).alias("band"),
        )
        bands = b if bands is None else bands.unionAll(b)
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        cand.join(sh.alias("x"), F.col("x.doc_id") == F.col("a_id"))
        .join(
            sh.alias("y"),
            (F.col("y.doc_id") == F.col("b_id"))
            & (F.col("y.shingle") == F.col("x.shingle")),
        )
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("intersection"))
    )
    sa = sig.select(
        F.col("doc_id").alias("_a"), *[F.col(f"h{j}").alias(f"a{j}") for j in range(_N_PERM)]
    )
    sb = sig.select(
        F.col("doc_id").alias("_b"), *[F.col(f"h{j}").alias(f"b{j}") for j in range(_N_PERM)]
    )
    za = sizes.select(F.col("doc_id").alias("_za"), F.col("n").alias("na"))
    zb = sizes.select(F.col("doc_id").alias("_zb"), F.col("n").alias("nb"))
    matches = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
        for j in range(_N_PERM)
    )
    return (
        cand.join(sa, F.col("a_id") == F.col("_a"))
        .join(sb, F.col("b_id") == F.col("_b"))
        .join(za, F.col("a_id") == F.col("_za"))
        .join(zb, F.col("b_id") == F.col("_zb"))
        .join(inter, ["a_id", "b_id"], "left")
        .select(
            "a_id",
            "b_id",
            (matches / float(_N_PERM)).alias("est_jaccard"),
            (
                F.coalesce("intersection", F.lit(0)).cast("double")
                / (F.col("na") + F.col("nb") - F.coalesce("intersection", F.lit(0)))
            ).alias("exact_jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# incremental corpus dedup: new arrivals probed against the existing index
# ---------------------------------------------------------------------------

_INCR_ORACLE = f"""
WITH {_ORACLE_SHINGLES},
flags AS (
  SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = 'f' AS is_new
  FROM documents
),
sig AS (
  SELECT doc_id,
         {_MINHASH_SIG_COLS_SQL}
  FROM sh GROUP BY doc_id
),
bands AS ({_MINHASH_BANDS_SQL}),
cand AS (
  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS dup_of
  FROM bands a JOIN flags fa ON fa.doc_id = a.doc_id AND fa.is_new
       JOIN bands b ON a.band = b.band AND a.band_id = b.band_id
                    AND a.doc_id <> b.doc_id
       JOIN flags fb ON fb.doc_id = b.doc_id AND NOT fb.is_new
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
verified AS (
  SELECT c.new_id, c.dup_of, COUNT(*) AS intersection
  FROM cand c
  JOIN sh x ON x.doc_id = c.new_id
  JOIN sh y ON y.doc_id = c.dup_of AND y.shingle = x.shingle
  GROUP BY c.new_id, c.dup_of
)
SELECT new_id, dup_of,
       CAST(intersection AS DOUBLE) / (sa.n + sb.n - intersection) AS jaccard
FROM verified
JOIN sizes sa ON sa.doc_id = new_id
JOIN sizes sb ON sb.doc_id = dup_of
WHERE CAST(intersection AS DOUBLE) / (sa.n + sb.n - intersection)
      >= {_NGRAM_THRESHOLD}
"""


@query("dedup_incremental_arrivals", _INCR_ORACLE, tags=("dedup",))
def dedup_incremental_arrivals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL ingest dedup — the shape a production pipeline actually
    runs every batch: new arrivals (docs whose md5(doc_id) starts with
    'f', a deterministic ~1/16 split standing in for "today's crawl") are
    probed against the EXISTING corpus's MinHash band index; only
    arrival×corpus band collisions become candidates, never
    corpus×corpus.  At 100 TB this is the whole point of maintaining the
    band index as a table (`streaming_ann_index_gate` maintains the
    embedding analog): per-batch cost scales with the ARRIVALS times
    collision rate, while `dedup_minhash_lsh` re-pairs the full corpus.

    Same signature/band/verify recipe as `dedup_minhash_lsh` (docstring
    there); output is (new_id, dup_of, jaccard >= threshold) — the reject
    list for the arriving batch."""
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
    # Round-14: band rows via one inline(array(structs)) instead of a
    # per-band union (the dedup_minhash_lsh move) — the union ran the
    # signature final aggregate once per branch per side of the
    # new/corpus split, whose differing filters defeat exchange reuse.
    # A/B: JVM CPU 0.79x warm / 0.55x cold.  (cache_scoped(sig) also
    # measured: wall 0.81x but CPU 1.52x — cache tax again; rejected,
    # tools/r14_variants.py::dedup_incremental_arrivals_v2.)
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


# ---------------------------------------------------------------------------
# prefix-filtered EXACT similarity join (AllPairs/PPJoin family)
# ---------------------------------------------------------------------------


def _shingle_arrays(docs: DataFrame) -> DataFrame:
    """(doc_id, sh, n, pref) — each doc's distinct word-3-gram xxhash64
    shingles as ONE SORTED ARRAY (`sh`, ascending hash = the global
    canonical order), its size `n`, and the prefix-filter slice `pref`
    (first n − ceil(t·n) + 1 elements for t = 1/2, integer arithmetic —
    ceil through float multiplication is off-by-one at exact boundaries).

    Pure JVM array expressions; one row per document, so the similarity
    join below shuffles O(docs × prefix_len) fixed-width rows instead of
    exploding per-shingle pairs."""
    return (
        docs.select(
            "doc_id", F.expr("filter(split(text, ' '), x -> x <> '')").alias("w")
        )
        .filter(F.size("w") >= 3)
        .select(
            "doc_id",
            F.array_sort(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(1, size(w) - 2),"
                        " i -> xxhash64(w[i-1], w[i], w[i+1]))"
                    )
                )
            ).alias("sh"),
        )
        .select(
            "doc_id",
            "sh",
            F.size("sh").alias("n"),
            F.expr("slice(sh, 1, size(sh) - (size(sh) + 1) div 2 + 1)").alias(
                "pref"
            ),
        )
    )


@query("dedup_prefix_filter_join", _NGRAM_ORACLE, tags=("dedup",))
def dedup_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard similarity join via PREFIX FILTERING (the
    AllPairs/PPJoin family) — the third point in the design space next to
    the quadratic baseline and MinHash LSH: same EXACT output as
    `dedup_ngram_jaccard` (the oracle is literally that query's SQL, and
    a pytest pins set-equality), near-linear candidate generation like
    LSH, but with NO recall loss — the prefix-filter lemma guarantees
    every qualifying pair collides.

    Mechanics: each doc's shingles are ranked in one GLOBAL canonical
    order (ascending xxhash64 value); with threshold t, a pair at
    Jaccard >= t must overlap in >= ceil(t·|d|) shingles, so the first
    |d| − ceil(t·|d|) + 1 ranked shingles of each doc (its PREFIX) must
    share at least one token with the other side's prefix (pigeonhole).
    Candidates = prefix-token equi-join + the size filter
    t·|a| <= |b| <= |a|/t.

    Two scale moves beyond the textbook join (both rework round-6/7
    lessons from the LSH path into the exact path):

    - **first-match emission** (the LSH first-match-banding trick): a
      pair sharing k prefix tokens surfaces k times in the equi-join;
      instead of a global `distinct` over that collision stream (a
      shuffle quadratic in dup-family size), each collision row decides
      LOCALLY whether its token is the pair's MINIMUM shared prefix
      token (`array_min(array_intersect(pref_a, pref_b))`) and survives
      only then: exactly one row per candidate pair, no distinct.
    - **record-carrying verification** (the VernicaJoin kernel shape):
      the index rows carry the doc's FULL sorted shingle array, so
      `size(array_intersect(sh_a, sh_b))` verifies each first-match
      survivor MAP-SIDE in the self-join stage — one JVM
      set-intersection per CANDIDATE, and only VERIFIED pairs (three
      narrow columns) ever leave the stage.  This replaces two earlier
      plans that both ENOSPC'd the 100x smoke: the explode-join-regroup
      plan (|pairs| × |shared shingles| ≈ 1.1B-row hash-agg spill,
      round 6) and a fetch-arrays-by-id plan whose second exchange
      carried a 400-byte array on every CANDIDATE row (candidates ≫
      verified pairs, ~43 GB of shuffle, round 8).

    The index is O(prefix_len) rows per doc, each carrying O(doc_len)
    longs — the record-carrying trade is quadratic in DOC LENGTH, the
    right call for web/LLM corpora (short docs, huge counts); a
    long-document corpus would flip to the fetch-by-id shape instead.
    Intra-family collision rows still grow quadratically with dup
    multiplicity — inherent to EXACT all-pairs output — but they are
    map-side evaluate-and-drop rows, never shuffled or spilled."""
    (docs,) = T(spark, sf_dir, "documents")
    arrs = cache_scoped(_shingle_arrays(docs))
    idx = arrs.select(
        "doc_id", "n", "pref", "sh", F.explode("pref").alias("shingle")
    )
    a = idx.alias("a")
    b = idx.alias("b")
    # MERGE-pinned like the verification joins below: the two sides of a
    # SELF-join are the same size, so broadcasting one is never right —
    # and Catalyst's generate/filter size guess for the exploded prefix
    # index undershoots the 64 MB threshold at scale (an 8.3 GiB
    # broadcast build abort at the 100x smoke).  SMJ also lets AQE reuse
    # one exchange for both sides.
    cand = (
        a.join(
            b.hint("shuffle_merge"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # size filter: nb >= t*na and na >= t*nb  (t = 1/2, integers)
            & (F.col("b.n") * 2 >= F.col("a.n"))
            & (F.col("a.n") * 2 >= F.col("b.n")),
        )
        # first-match: keep the ONE collision at the pair's minimum shared
        # prefix token — exactly-once emission with no distinct shuffle
        .filter(
            F.col("a.shingle")
            == F.array_min(F.array_intersect(F.col("a.pref"), F.col("b.pref")))
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.size(
                F.array_intersect(F.col("a.sh"), F.col("b.sh"))
            ).alias("intersection"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
    )
    return cand.select(
        "a_id",
        "b_id",
        (
            F.col("intersection").cast("double")
            / (F.col("na") + F.col("nb") - F.col("intersection")).cast("double")
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= _NGRAM_THRESHOLD)


# ---------------------------------------------------------------------------
# sorted-neighborhood blocking (the windowed-scan member of the family)
# ---------------------------------------------------------------------------

_SNM_W = 8  # neighborhood width: pairs within w-1 rank positions are compared


def _snm_candidates(docs: DataFrame) -> DataFrame:
    """Sorted-neighborhood candidate pairs (a_id < b_id), shared by the
    Jaccard-verified `dedup_sorted_neighborhood` and the edit-distance-
    verified `dedup_editdist_verify`: distributed rank over the blocking
    key, rank-div-w double bucketing (each record lands in its own and
    the previous bucket, so every pair within w-1 positions shares one),
    equi-join + distance trim — hash join, never a band BNLJ, and the
    sort pass runs on every executor (`distributed_rank`), not one
    global-window partition."""
    from map_reduce485_spark.queries._util import distributed_rank

    ranked = distributed_rank(
        docs.select("doc_id", F.substring("text", 1, 24).alias("bk")),
        ["bk", "doc_id"],
        alias="rk",
    ).select("doc_id", "rk")
    tagged = ranked.select(
        "doc_id",
        "rk",
        F.explode(
            F.array(F.expr(f"rk div {_SNM_W}"), F.expr(f"rk div {_SNM_W} - 1"))
        ).alias("bucket"),
    )
    a = tagged.alias("a")
    b = tagged.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("b.rk") - F.col("a.rk")).between(1, _SNM_W - 1),
        )
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("a_id"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("b_id"),
        )
        .distinct()
    )


_SNM_ORACLE = f"""
WITH {_ORACLE_SHINGLES},
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
keyed AS (
  SELECT doc_id, substr(text, 1, 24) AS bk FROM documents
),
ranked AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bk, doc_id) AS rk FROM keyed
),
cand AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM ranked a JOIN ranked b
    ON b.rk - a.rk BETWEEN 1 AND {_SNM_W - 1} AND a.doc_id < b.doc_id
  UNION
  SELECT b.doc_id, a.doc_id
  FROM ranked a JOIN ranked b
    ON b.rk - a.rk BETWEEN 1 AND {_SNM_W - 1} AND b.doc_id < a.doc_id
),
verified AS (
  SELECT c.a_id, c.b_id, COUNT(*) AS intersection
  FROM cand c
  JOIN sh x ON x.doc_id = c.a_id
  JOIN sh y ON y.doc_id = c.b_id AND y.shingle = x.shingle
  GROUP BY c.a_id, c.b_id
)
SELECT a_id, b_id,
       CAST(intersection AS DOUBLE) / (sa.n + sb.n - intersection) AS jaccard
FROM verified
JOIN sizes sa ON sa.doc_id = a_id
JOIN sizes sb ON sb.doc_id = b_id
WHERE CAST(intersection AS DOUBLE) / (sa.n + sb.n - intersection)
      >= {_NGRAM_THRESHOLD}
"""


@query("dedup_sorted_neighborhood", _SNM_ORACLE, tags=("dedup",))
def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SORTED-NEIGHBORHOOD blocking (Hernandez/Stolfo) — the fourth
    candidate-generation strategy in the dedup family, next to all-pairs
    (exact, quadratic), LSH (probabilistic recall), and prefix filtering
    (exact recall, token join): sort the corpus once by a blocking key
    (first 24 chars here) and compare only records within a fixed window
    of w={_SNM_W} rank positions.  Candidates are LINEAR in corpus size
    (w-1 per record) with DETERMINISTIC recall limits — near-dups whose
    keys sort far apart are missed by design, which is the documented
    trade (production systems run multiple passes with different keys).
    Survivors verify with exact Jaccard, so emitted pairs are exact.

    The window self-join is expressed as an EQUI-join on rank div w
    buckets (each record lands in its bucket and the previous one, so any
    pair within w-1 positions shares a bucket) — hash join, no band BNLJ;
    the distance predicate then trims to the true neighborhood.  The
    global rank is `distributed_rank` (range partition on (bk, doc_id) +
    per-partition positions + broadcast partition-offset prefix sums), so
    the sort pass — the whole SNM algorithm — runs on every executor
    instead of the single partition a plain global window would use.
    Bit-identical ranks (total order via doc_id), unchanged output."""
    (docs,) = T(spark, sf_dir, "documents")
    cand = _snm_candidates(docs)
    sh = cache_scoped(_spark_shingles(docs))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    x = sh.alias("x")
    y = sh.alias("y")
    verified = (
        cand.join(x, F.col("x.doc_id") == F.col("a_id"))
        .join(
            y,
            (F.col("y.doc_id") == F.col("b_id"))
            & (F.col("y.shingle") == F.col("x.shingle")),
        )
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("intersection"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        verified.join(sa, F.col("a_id") == F.col("sa.doc_id"))
        .join(sb, F.col("b_id") == F.col("sb.doc_id"))
        .select(
            "a_id",
            "b_id",
            (
                F.col("intersection").cast("double")
                / (F.col("sa.n") + F.col("sb.n") - F.col("intersection"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= _NGRAM_THRESHOLD)
    )


_EDIT_PREFIX = 256  # chars compared; caps the O(len^2) DP per pair
_EDIT_SIM_NUM = 5  # keep iff EDIT_SIM_NUM * dist <= max_len, i.e. sim >= 0.8
# largest distance the gate can admit (5*dist <= max_len <= prefix) — the
# banded-DP threshold; exactness argument at the call site
_EDIT_MAX_DIST = _EDIT_PREFIX // _EDIT_SIM_NUM

_EDITDIST_ORACLE = f"""
WITH keyed AS (SELECT doc_id, substr(text, 1, 24) AS bk FROM documents),
ranked AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bk, doc_id) AS rk FROM keyed
),
cand AS (
  SELECT DISTINCT LEAST(a.doc_id, b.doc_id) AS a_id,
                  GREATEST(a.doc_id, b.doc_id) AS b_id
  FROM ranked a JOIN ranked b ON b.rk - a.rk BETWEEN 1 AND {_SNM_W - 1}
),
t AS (SELECT doc_id, substr(text, 1, {_EDIT_PREFIX}) AS p FROM documents),
scored AS (
  SELECT c.a_id, c.b_id,
         CAST(levenshtein(ta.p, tb.p) AS BIGINT) AS edit_distance,
         CAST(GREATEST(len(ta.p), len(tb.p)) AS BIGINT) AS max_len
  FROM cand c
  JOIN t ta ON ta.doc_id = c.a_id
  JOIN t tb ON tb.doc_id = c.b_id
)
SELECT a_id, b_id, edit_distance, max_len,
       1.0e0 - CAST(edit_distance AS DOUBLE) / max_len AS edit_sim
FROM scored
WHERE {_EDIT_SIM_NUM} * edit_distance <= max_len
"""


@query("dedup_editdist_verify", _EDITDIST_ORACLE, tags=("dedup",))
def dedup_editdist_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EDIT-DISTANCE near-dup verification — the character-edit space the
    dedup shelf did not cover (set/Jaccard, MinHash/SimHash sketches,
    winnowing fingerprints, embeddings, and exact-substring spans all
    judge different similarity geometries; record-linkage pipelines
    verify with Levenshtein because it catches single-character noise —
    OCR errors, typos, mojibake — that token-level Jaccard rounds away).
    Sorted-neighborhood candidates (`_snm_candidates`, the identical
    blocking stage `dedup_sorted_neighborhood` uses, so the two verify
    strategies are directly comparable pair-for-pair) are scored with
    exact Levenshtein over the first {_EDIT_PREFIX} chars and kept when
    sim = 1 - dist/max_len >= 0.8, gated as the exact integer comparison
    {_EDIT_SIM_NUM}*dist <= max_len (hash-parity rule: no double
    threshold compares); edit_sim is one IEEE division, identical on
    both engines.

    Scale shape: candidate volume is LINEAR (w-1 pairs per record by
    construction — the SNM property), each pair costs one bounded
    O({_EDIT_PREFIX}^2) DP evaluated JVM-side (`F.levenshtein`, inside
    codegen — no Python), and the text probe is two doc_id-aligned hash
    joins shipping one {_EDIT_PREFIX}-char prefix per side.  The prefix
    cap is the documented trade: production record linkage compares
    normalized key fields, not whole documents — full-text exactness at
    scale is the substring family's job."""
    (docs,) = T(spark, sf_dir, "documents")
    cand = _snm_candidates(docs)
    t = docs.select(
        "doc_id", F.substring("text", 1, _EDIT_PREFIX).alias("p")
    )
    ta = t.alias("ta")
    tb = t.alias("tb")
    la, lb = F.length("ta.p").cast("long"), F.length("tb.p").cast("long")
    scored = (
        cand.join(ta, F.col("ta.doc_id") == F.col("a_id"))
        .join(tb, F.col("tb.doc_id") == F.col("b_id"))
        # EXACT length-bound prune before the DP: levenshtein(a, b) >=
        # |len(a) - len(b)| always, so a pair failing the threshold on
        # length difference alone can never pass it on distance — filter
        # FIRST so the O(prefix^2) DP runs only for length-compatible
        # pairs (at real scale most window candidates are non-dups with
        # differing lengths; this corpus's generator makes near-copies
        # of near-equal length, so the prune is honest but thin here)
        .filter(
            F.lit(_EDIT_SIM_NUM) * F.abs(la - lb) <= F.greatest(la, lb)
        )
        # BANDED DP (Spark 3.5+ 3-arg levenshtein): any pair the gate can
        # keep has dist <= prefix/5 = 51, so the threshold
        # variant runs the O(len x maxdist) band instead of the full
        # O(len^2) table (~5x fewer cells at the 256-char prefix) and
        # returns -1 beyond it — EXACT for this query because true
        # distances are still produced for every pair the threshold can
        # admit, and -1 rows are pairs the integer gate excludes anyway
        # (the dist >= 0 guard keeps -1 from satisfying 5*dist <= max_len).
        .select(
            "a_id",
            "b_id",
            F.levenshtein(F.col("ta.p"), F.col("tb.p"), _EDIT_MAX_DIST)
            .cast("long")
            .alias("edit_distance"),
            F.greatest(la, lb).alias("max_len"),
        )
    )
    return scored.filter(
        (F.col("edit_distance") >= 0)
        & (F.lit(_EDIT_SIM_NUM) * F.col("edit_distance") <= F.col("max_len"))
    ).select(
        "a_id",
        "b_id",
        "edit_distance",
        "max_len",
        (
            F.lit(1.0) - F.col("edit_distance").cast("double") / F.col("max_len")
        ).alias("edit_sim"),
    )


dedup_editdist_verify.__doc__ = (
    dedup_editdist_verify.__doc__.replace("{_EDIT_PREFIX}", str(_EDIT_PREFIX))
    .replace("{_EDIT_SIM_NUM}", str(_EDIT_SIM_NUM))
)


_CHUNK_DEDUP_ORACLE = """
WITH words AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
),
chunks AS (
  SELECT doc_id, i AS chunk_idx,
         md5(array_to_string(w[(i * 8 + 1):(i * 8 + 8)], ' ')) AS digest
  FROM (SELECT doc_id, w, UNNEST(generate_series(0, len(w) // 8 - 1)) AS i
        FROM words WHERE len(w) >= 8)
),
spread AS (
  SELECT digest, COUNT(DISTINCT doc_id) AS nd FROM chunks GROUP BY digest
)
SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN s.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       CAST(SUM(CASE WHEN s.nd > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS dup_ratio
FROM chunks c JOIN spread s ON s.digest = c.digest
GROUP BY c.doc_id
"""


@query("dedup_chunk_spans", _CHUNK_DEDUP_ORACLE, tags=("dedup",))
def dedup_chunk_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUB-document exact dedup — the line/paragraph-level pass every
    production corpus pipeline (CCNet, RefinedWeb) runs BESIDE whole-doc
    dedup: split each doc into non-overlapping 8-word chunks, digest each,
    and report per doc how much of it also appears verbatim in OTHER docs
    (boilerplate, templates, licence headers).  Whole-doc digests
    (`dedup_exact`) miss a doc that is 90% copied with one new sentence;
    the chunk dup_ratio is exactly the signal that catches it, and the
    downstream curation cut (drop docs above a ratio, or strip just the
    duplicated spans) is a filter on this table.

    Scale: chunking is map-side (one explode over size/8 indices); the
    shuffle groups 16-byte digests; cross-doc spread (COUNT DISTINCT doc)
    and the per-doc rollup are two standard aggregations.  No similarity
    math anywhere — this is the exact tier of the dedup ladder, between
    `dedup_exact` (whole doc) and the MinHash/SimHash near-dup tiers."""
    (docs,) = T(spark, sf_dir, "documents")
    chunks = (
        docs.select(
            "doc_id", F.expr("filter(split(text, ' '), x -> x <> '')").alias("w")
        )
        .filter(F.size("w") >= 8)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) div 8 - 1),"
                    " i -> struct(i AS chunk_idx,"
                    " md5(array_join(slice(w, i * 8 + 1, 8), ' ')) AS digest))"
                )
            ).alias("c"),
        )
        .select("doc_id", "c.chunk_idx", "c.digest")
    )
    spread = chunks.groupBy("digest").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    return (
        chunks.join(spread, "digest")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum((F.col("nd") > 1).cast("long")).alias("n_dup_chunks"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_dup_chunks",
            (F.col("n_dup_chunks").cast("double") / F.col("n_chunks")).alias(
                "dup_ratio"
            ),
        )
    )


# ---------------------------------------------------------------------------
# asymmetric containment (subset/quotation detection)
# ---------------------------------------------------------------------------

_CONTAIN_T = 0.6

_CONTAIN_ORACLE = f"""
WITH {_ORACLE_SHINGLES},
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS intersection
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT a_id, b_id, intersection,
       CAST(intersection AS DOUBLE) / sa.n AS containment_a,
       CAST(intersection AS DOUBLE) / sb.n AS containment_b
FROM pairs
JOIN sizes sa ON sa.doc_id = a_id
JOIN sizes sb ON sb.doc_id = b_id
WHERE CAST(intersection AS DOUBLE) / sa.n >= {_CONTAIN_T}
   OR CAST(intersection AS DOUBLE) / sb.n >= {_CONTAIN_T}
"""


@query("dedup_containment_pairs", _CONTAIN_ORACLE, tags=("dedup",))
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC containment |A∩B|/|A| — the dedup metric Jaccard can't
    express: a short document quoted wholesale inside a long one scores
    near-zero Jaccard (the union is huge) but containment ≈ 1 in the
    short→long direction.  Broder's resemblance-vs-containment
    distinction; training-data curation needs BOTH (near-identical pairs
    AND subsumed fragments).  Same inverted-index candidate plan as
    `dedup_ngram_jaccard` (hashed shingles, shingle equi-join, per-pair
    intersection counts — only pairs sharing a shingle ever meet), with
    the two directional ratios in the final projection; kept-rows need
    either direction past {_CONTAIN_T}.  Scale path unchanged: candidates
    come banded (MinHash) at 100 TB, and this containment math reranks
    them — the test-SF exact twin of that rerank."""
    (docs,) = T(spark, sf_dir, "documents")
    sh = cache_scoped(
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
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .agg(F.count("*").alias("intersection"))
    )
    sa = sizes.select(F.col("doc_id").alias("a_id"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b_id"), F.col("n").alias("nb"))
    ca = F.col("intersection").cast("double") / F.col("na")
    cb = F.col("intersection").cast("double") / F.col("nb")
    return (
        pairs.join(sa, "a_id")
        .join(sb, "b_id")
        .filter((ca >= _CONTAIN_T) | (cb >= _CONTAIN_T))
        .select(
            "a_id",
            "b_id",
            "intersection",
            ca.alias("containment_a"),
            cb.alias("containment_b"),
        )
    )


# ---------------------------------------------------------------------------
# content-defined chunking (rolling-hash boundaries)
# ---------------------------------------------------------------------------

_CDC_ORACLE = """
WITH p AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
  FROM documents WHERE octet_length(encode(text)) >= 8
),
byt AS (
  SELECT doc_id, i,
         substr(hx, 2 * i - 1, 2) AS pair,
         (strpos('0123456789ABCDEF', substr(hx, 2 * i - 1, 1)) - 1) * 16
           + strpos('0123456789ABCDEF', substr(hx, 2 * i, 1)) - 1 AS b
  FROM (SELECT doc_id, hx, n, UNNEST(generate_series(1, n)) AS i FROM p)
),
hashed AS (
  SELECT doc_id, i, pair,
         CASE WHEN i >= 8 THEN
           (LAG(b, 0) OVER w) + (LAG(b, 1) OVER w) * 31
           + (LAG(b, 2) OVER w) * 961 + (LAG(b, 3) OVER w) * 29791
           + (LAG(b, 4) OVER w) * 923521 + (LAG(b, 5) OVER w) * 28629151
           + (LAG(b, 6) OVER w) * 887503681 + (LAG(b, 7) OVER w) * 27512614111
         END AS h
  FROM byt
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
flagged AS (
  SELECT doc_id, i, pair,
         CASE WHEN h IS NOT NULL AND h % 64 = 0 THEN 1 ELSE 0 END AS is_boundary
  FROM hashed
),
chunked AS (
  SELECT doc_id, i, pair,
         COALESCE(SUM(is_boundary) OVER (
           PARTITION BY doc_id ORDER BY i
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_idx
  FROM flagged
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(MIN(i) - 1 AS BIGINT) AS start_pos,
       CAST(COUNT(*) AS BIGINT) AS chunk_len,
       md5(string_agg(pair, '' ORDER BY i)) AS chunk_md5
FROM chunked GROUP BY doc_id, chunk_idx
"""


@query("dedup_cdc_chunking", _CDC_ORACLE, tags=("dedup", "text"))
def dedup_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTENT-DEFINED chunking (Rabin/LBFS rolling-hash boundaries) — the
    storage-dedup primitive fixed-size chunking can't replace: insert one
    byte and fixed windows (`doc_chunking`) shift EVERY later boundary,
    while content-defined cuts (hash of the trailing 8 bytes ≡ 0 mod 64)
    realign immediately, so near-identical documents still share most
    chunk digests — feed these to `dedup_chunk_spans`-style grouping for
    sub-document dedup at storage granularity.  The polynomial hash stays
    exact in int64 (no modular reduction → both engines compute the same
    integer; the oracle replays it as 8 LAG terms with literal 31-powers);
    chunk digests hash the uppercase hex so any byte content is SQL-
    expressible.  Map-side only (`operators/chunking.py`, one vectorized
    rolling-hash pass per batch); only (doc, chunk-digest) rows shuffle —
    never payloads — exactly like `dedup_exact`."""
    from map_reduce485_spark.operators.chunking import cdc_chunks

    (docs,) = T(spark, sf_dir, "documents")
    payloads = (
        docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
        .filter(F.octet_length("payload") >= 8)
    )
    return payloads.mapInPandas(
        cdc_chunks,
        schema=(
            "doc_id bigint, chunk_idx bigint, start_pos bigint,"
            " chunk_len bigint, chunk_md5 string"
        ),
    )


_CDC_SHARED_ORACLE = f"""
WITH chunks AS ({_CDC_ORACLE}),
shared AS (
  SELECT chunk_md5, CAST(COUNT(*) AS BIGINT) AS n_copies,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(MAX(chunk_len) AS BIGINT) AS chunk_len
  FROM chunks GROUP BY chunk_md5 HAVING COUNT(DISTINCT doc_id) > 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_shared_chunks,
       CAST(COALESCE(SUM(n_copies), 0) AS BIGINT) AS n_chunk_copies,
       CAST(COALESCE(SUM(chunk_len * (n_copies - 1)), 0) AS BIGINT)
         AS dedupable_bytes
FROM shared
"""


@query("dedup_cdc_shared_chunks", _CDC_SHARED_ORACLE, tags=("dedup",))
def dedup_cdc_shared_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-dedup yield report over the content-defined chunks: chunk
    digests appearing in MORE THAN ONE document, and the bytes a
    chunk-store would reclaim by keeping one copy of each
    (Σ len·(copies−1)) — the number that justifies deploying CDC at all,
    computed from `dedup_cdc_chunking`'s output (oracle embeds that
    query's SQL as a CTE).  Complements `dedup_chunk_spans` (fixed
    word-window spans): these chunks realign across insertions, so the
    yield survives edits.  Shuffle carries (digest, len) pairs only."""
    chunks = dedup_cdc_chunking(spark, sf_dir)
    shared = (
        chunks.groupBy("chunk_md5")
        .agg(
            F.count("*").alias("n_copies"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.max("chunk_len").alias("chunk_len"),
        )
        .filter(F.col("n_docs") > 1)
    )
    return shared.agg(
        F.count("*").alias("n_shared_chunks"),
        F.coalesce(F.sum("n_copies"), F.lit(0)).alias("n_chunk_copies"),
        F.coalesce(
            F.sum(F.col("chunk_len") * (F.col("n_copies") - 1)), F.lit(0)
        ).alias("dedupable_bytes"),
    )


_XLANG_ORACLE = f"""
WITH pairs AS ({_MINHASH_ORACLE}),
labeled AS (
  SELECT least(da.lang, db.lang) AS lang_a,
         greatest(da.lang, db.lang) AS lang_b
  FROM pairs p
  JOIN documents da ON da.doc_id = p.a_id
  JOIN documents db ON db.doc_id = p.b_id
)
SELECT lang_a, lang_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM labeled GROUP BY lang_a, lang_b
"""


@query("cross_lang_dup_matrix", _XLANG_ORACLE, tags=("dedup",))
def cross_lang_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language × language near-duplicate matrix — the corpus diagnostic
    that tells a multilingual pipeline whether its duplicates live WITHIN
    a language (true re-crawls → dedup per shard) or ACROSS languages
    (templated/machine-translated boilerplate → a different filter).
    Pairs come from the scalable banded `dedup_minhash_lsh` plan (its
    oracle is embedded as a CTE so the two stay in lockstep); each side
    is labeled by an equi-join to the documents table and the unordered
    (lang_a ≤ lang_b) cell counted.  The label join adds two shuffles on
    doc_id over the (small) pair set — at 100 TB the pair set is the
    LSH output, orders of magnitude under the corpus, and the matrix is
    |langs|² rows."""
    pairs = dedup_minhash_lsh(spark, sf_dir)
    (docs,) = T(spark, sf_dir, "documents")
    langs = docs.select("doc_id", "lang")
    da = langs.alias("da")
    db = langs.alias("db")
    labeled = (
        pairs.join(da, F.col("da.doc_id") == F.col("a_id"))
        .join(db, F.col("db.doc_id") == F.col("b_id"))
        .select(
            F.least(F.col("da.lang"), F.col("db.lang")).alias("lang_a"),
            F.greatest(F.col("da.lang"), F.col("db.lang")).alias("lang_b"),
        )
    )
    return labeled.groupBy("lang_a", "lang_b").agg(F.count("*").alias("n_pairs"))


_WINNOW_SUMMARY_ORACLE = f"""
WITH pairs AS ({_WINNOW_ORACLE})
SELECT n_shared, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT a_id) AS BIGINT) AS n_left_docs,
       CAST(COUNT(DISTINCT b_id) AS BIGINT) AS n_right_docs
FROM pairs GROUP BY n_shared
"""


@query("dedup_winnowing_summary", _WINNOW_SUMMARY_ORACLE, tags=("dedup",))
def dedup_winnowing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing near-dup SUMMARY — the constant-size output twin of
    `dedup_winnowing_pairs` (the `dedup_simhash_summary` move applied to
    the fingerprint-join family): per-shared-fingerprint-count pair and
    distinct-doc tallies instead of the raw pair list, which grows
    quadratically in dup-family size (107 M rows at the 100x smoke).
    The verify stage feeds a bounded map-side-combinable groupBy; the
    sink is constant size at any corpus scale.  The pair query stays as
    the oracle-locked pair-level twin."""
    pairs = dedup_winnowing_pairs(spark, sf_dir)
    return pairs.groupBy("n_shared").agg(
        F.count("*").alias("n_pairs"),
        F.count_distinct("a_id").alias("n_left_docs"),
        F.count_distinct("b_id").alias("n_right_docs"),
    )


_WINNOW_CAPPED_ORACLE = f"""
WITH {_WINNOW_FP_CTES},
fdf AS (
  SELECT h, CAST(COUNT(*) AS BIGINT) AS df FROM fp GROUP BY h
),
capstat AS (
  SELECT CAST(COUNT(*) FILTER (WHERE df > {_WINNOW_DF_CAP}) AS BIGINT)
    AS n_capped_fps
  FROM fdf
),
fpc AS (
  SELECT fp.doc_id, fp.h
  FROM fp JOIN fdf ON fdf.h = fp.h AND fdf.df <= {_WINNOW_DF_CAP}
),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_shared
  FROM fpc a JOIN fpc b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
summ AS (
  SELECT n_shared, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(COUNT(DISTINCT a_id) AS BIGINT) AS n_left_docs,
         CAST(COUNT(DISTINCT b_id) AS BIGINT) AS n_right_docs
  FROM pairs WHERE n_shared >= {_WINNOW_MIN_SHARED} GROUP BY n_shared
)
SELECT CAST(COALESCE(s.n_shared, 0) AS BIGINT) AS n_shared,
       CAST(COALESCE(s.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(s.n_left_docs, 0) AS BIGINT) AS n_left_docs,
       CAST(COALESCE(s.n_right_docs, 0) AS BIGINT) AS n_right_docs,
       c.n_capped_fps
FROM capstat c LEFT JOIN summ s ON TRUE
"""


@query("dedup_winnowing_summary_capped", _WINNOW_CAPPED_ORACLE, tags=("dedup",))
def dedup_winnowing_summary_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing near-dup summary with a DF-CAPPED fingerprint index — the
    scale twin that fixes the round-10 verdict's one weak plan: the exact
    form's pair enumeration is the fingerprint self-join, whose
    per-fingerprint cost is C(df, 2) — quadratic in dup-family
    multiplicity (107 M pairs / 386-440 s, ~30% of the whole 100x smoke).
    The cap drops fingerprints shared by more than {cap} documents BEFORE
    the self-join: such "stop fingerprints" carry no near-dup signal
    (every plagiarism index makes this move; `link_prediction_jaccard`
    makes the identical argument for hub customers), and whole near-clone
    families are the job of the banded-LSH -> star-contraction pipeline
    (`dedup_keep_best_star`), not a pairwise index.  Per-fingerprint pair
    cost is then <= C({cap}, 2) — CONSTANT — so total pair volume is
    linear in the number of kept fingerprints at any corpus scale.
    Honest trade: the exact form's detection guarantee ("any shared run
    of >= w+2 words produces a shared fingerprint") survives the cap
    ONLY for runs whose fingerprints stay under df <= {cap}; a run
    whose every fingerprint is corpus-popular is invisible here — by
    design, because such pairs are family members the star-contraction
    pipeline already collapses.

    No silent cap: `n_capped_fps` (the number of dropped fingerprints) is
    part of every output row, hash-checked, and when the cap leaves NO
    surviving pair at all (e.g. a corpus whose every dup family exceeds
    the cap — the 100x smoke generator's shape) the query still emits one
    zero sentinel row (n_shared = 0; real rows are always >=
    {_WINNOW_MIN_SHARED}) carrying the drop count, so a run that capped
    away everything is visible in the artifact, not an empty frame.  Measured at the
    gate SFs the cap changes NOTHING (max df 9 at sf0.001, 7 at sf0.01 —
    set-equality with the exact summary is pytest-pinned there), and at
    sf0.1 it keeps 96% of pairs; the exact `dedup_winnowing_summary`
    stays as the oracle-locked baseline twin.

    Plan shape: one extra groupBy(h) + equi-join on h — the SAME key the
    self-join uses, so all three h-keyed stages shuffle on one aligned
    partitioning (no cross-key re-exchange; at test SF, AQE broadcasts
    the small df side outright — 3 BroadcastHashJoins, 0 sort-merge,
    measured on the executed plan), then the identical groupBy pair
    stream into the constant-size summary sink.  The df filter is the
    ONLY new stage and it is corpus-linear."""
    (docs,) = T(spark, sf_dir, "documents")
    fp = cache_scoped(_winnow_fp(docs))
    fdf = fp.groupBy("h").agg(F.count("*").alias("df"))
    # count(when(...)) not sum(cast(...)): on a corpus producing ZERO
    # fingerprints (every doc shorter than w+2 words) the sum over an
    # empty fdf is NULL in Spark while the oracle's COUNT(*) FILTER is 0
    # — count() is 0 on empty input in both engines (round-11 advice)
    capstat = fdf.agg(
        F.count(F.when(F.col("df") > _WINNOW_DF_CAP, F.lit(1))).alias(
            "n_capped_fps"
        )
    )
    fpc = fp.join(
        fdf.filter(F.col("df") <= _WINNOW_DF_CAP).select("h"), "h"
    )
    a = fpc.select(F.col("doc_id").alias("a_id"), "h")
    b = fpc.select(F.col("doc_id").alias("b_id"), "h")
    pairs = (
        a.join(b, "h")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= _WINNOW_MIN_SHARED)
    )
    summ = pairs.groupBy("n_shared").agg(
        F.count("*").alias("n_pairs"),
        F.count_distinct("a_id").alias("n_left_docs"),
        F.count_distinct("b_id").alias("n_right_docs"),
    )
    # accounting must survive an all-capped corpus: LEFT join from the
    # 1-row capstat (build side = the constant-size summary, bounded by
    # the per-doc fingerprint-count domain) emits one zero sentinel row
    # (n_shared = 0 — real rows are always >= _WINNOW_MIN_SHARED) carrying
    # n_capped_fps when no pair survives, instead of an empty frame that
    # would hide the cap entirely
    return capstat.join(F.broadcast(summ), F.lit(True), "left").select(
        F.coalesce(F.col("n_shared"), F.lit(0).cast("long")).alias("n_shared"),
        F.coalesce(F.col("n_pairs"), F.lit(0).cast("long")).alias("n_pairs"),
        F.coalesce(F.col("n_left_docs"), F.lit(0).cast("long")).alias(
            "n_left_docs"
        ),
        F.coalesce(F.col("n_right_docs"), F.lit(0).cast("long")).alias(
            "n_right_docs"
        ),
        "n_capped_fps",
    )


dedup_winnowing_summary_capped.__doc__ = dedup_winnowing_summary_capped.__doc__.replace(
    "{cap}", str(_WINNOW_DF_CAP)
).replace(
    "{_WINNOW_MIN_SHARED}", str(_WINNOW_MIN_SHARED)
)


# ---------------------------------------------------------------------------
# keep-best-quality over the BANDED star clusters (the full production
# dedup pipeline in one query) — round 8
# ---------------------------------------------------------------------------

_KEEP_BEST_STAR_ORACLE = f"""
WITH RECURSIVE {_LSH_CLUSTERS_CTES},
clusters AS (
  SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
),
ranked AS (
  SELECT c.cluster_id, c.doc_id, d.n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY c.cluster_id ORDER BY d.n_chars DESC, c.doc_id
         ) AS rn,
         COUNT(*) OVER (PARTITION BY c.cluster_id) AS n_docs
  FROM clusters c JOIN documents d ON d.doc_id = c.doc_id
)
SELECT cluster_id, doc_id AS keep_doc_id, n_chars AS keep_n_chars, n_docs
FROM ranked WHERE rn = 1
"""


@query("dedup_keep_best_star", _KEEP_BEST_STAR_ORACLE, tags=("dedup", "graph"))
def dedup_keep_best_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE production dedup pipeline in one query, every stage
    the scale-proven form: banded MinHash-LSH candidates with map-side
    exact-Jaccard verification (`dedup_minhash_lsh`) → alternating-star
    connected components with exact-dup contraction
    (`dedup_clusters_star`) → keep each cluster's highest-quality
    document (longest, ties → lowest doc_id).  The scale twin of
    `dedup_keep_best_quality`, which runs the same keep policy over the
    exact all-pairs label-propagation clusters as the sf-scale baseline.

    This is the query a 100 TB corpus actually runs end-to-end: every
    stage is bucket-bounded or component-bounded (the 100x smoke runs
    the clustering stage in 15 s against a worst-case mult^2 dup
    density — `SCALE_SMOKE_100x.json`), and the final argmax is one
    window over near-clique-sized partitions.  The oracle composes the
    minhash CTEs, the recursive reach, and the ranked choice, so the
    survivor set is hash-checked through all three stages."""
    from pyspark.sql import Window as W

    (docs,) = T(spark, sf_dir, "documents")
    clusters = dedup_clusters_star(spark, sf_dir).select("doc_id", "cluster_id")
    w = W.partitionBy("cluster_id").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_docs", F.count("*").over(W.partitionBy("cluster_id")))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("keep_doc_id"),
            F.col("n_chars").alias("keep_n_chars"),
            "n_docs",
        )
    )


# ---------------------------------------------------------------------------
# LSH recall evaluation against the exact all-pairs baseline — round 8
# ---------------------------------------------------------------------------

_LSH_RECALL_ORACLE = f"""
WITH RECURSIVE {_LSH_CLUSTERS_CTES},
epairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS intersection
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
exact AS (
  SELECT e.a_id, e.b_id
  FROM epairs e
  JOIN sizes sa ON sa.doc_id = e.a_id
  JOIN sizes sb ON sb.doc_id = e.b_id
  WHERE CAST(e.intersection AS DOUBLE) / (sa.n + sb.n - e.intersection)
        >= {_NGRAM_THRESHOLD}
)
SELECT CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS n_exact,
       CAST((SELECT COUNT(*) FROM vpairs) AS BIGINT) AS n_lsh,
       CAST((SELECT COUNT(*) FROM vpairs v
             JOIN exact e ON e.a_id = v.a_id AND e.b_id = v.b_id)
            AS BIGINT) AS n_common,
       CAST((SELECT COUNT(*) FROM vpairs v
             JOIN exact e ON e.a_id = v.a_id AND e.b_id = v.b_id) AS DOUBLE)
         / NULLIF((SELECT COUNT(*) FROM exact), 0) AS recall
"""


@query("dedup_lsh_recall_eval", _LSH_RECALL_ORACLE, tags=("dedup",))
def dedup_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECALL of the banded MinHash-LSH path against the exact all-pairs
    Jaccard baseline at the same threshold — the acceptance eval every
    production dedup pipeline reports before trusting banding (2 bands x
    4 rows collide with probability 1-(1-s^4)^2 ≈ 0.94 at s = 0.8, and
    this query measures the realized number instead of quoting the
    formula).  Both pair sets are verified at the same threshold, so
    LSH output ⊆ exact output structurally (precision 1 by
    construction — pinned in `tests/test_queries.py`
    ::test_dedup_jaccard_invariants) and recall is the one number that
    can move.

    Scale note: the EXACT side is the test-SF-only baseline (inverted-
    index self-join — the quadratic-in-dup-multiplicity stage measured
    and documented in SCALING.md); production runs this eval on a
    SAMPLED slice, which is this same query over a sampled sf_dir.
    1-row output; the counting joins shuffle only (a_id, b_id) pairs."""
    exact = dedup_ngram_jaccard(spark, sf_dir).select("a_id", "b_id")
    lsh = dedup_minhash_lsh(spark, sf_dir).select(
        F.col("a_id").alias("la"), F.col("b_id").alias("lb")
    )
    common = exact.join(
        lsh, (F.col("a_id") == F.col("la")) & (F.col("b_id") == F.col("lb"))
    )
    return (
        exact.agg(F.count("*").alias("n_exact"))
        .crossJoin(lsh.agg(F.count("*").alias("n_lsh")))
        .crossJoin(common.agg(F.count("*").alias("n_common")))
        .select(
            "n_exact",
            "n_lsh",
            "n_common",
            # NULL (not NaN/div-zero) when the corpus has no exact pairs —
            # matches the oracle's NULLIF so sampled/degenerate slices
            # (the documented production mode) hash identically on both
            # engines instead of diverging NULL-vs-NaN
            F.when(
                F.col("n_exact") > 0,
                F.col("n_common").cast("double") / F.col("n_exact"),
            ).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# LSH banding-geometry sweep — round 9 (design-tuning eval for the recall/
# cost trade every production dedup run decides before committing a config)
# ---------------------------------------------------------------------------

# the three geometries expressible over the 8 shipped permutations:
# 1 band x 8 rows (strictest: collide only if the WHOLE signature agrees),
# the shipped 2 x 4, and 4 x 2 (loosest: most candidates, highest recall)
_SWEEP_GEOMS = (
    (1, ((0, 1, 2, 3, 4, 5, 6, 7),)),
    (2, _BANDS),
    (4, ((0, 1), (2, 3), (4, 5), (6, 7))),
)


def _band_sweep_oracle() -> str:
    geom_sqls = []
    for nb, bands in _SWEEP_GEOMS:
        bsql = " UNION ALL ".join(
            f"SELECT doc_id, {bi} AS band_id,"
            f" md5({' || '.join(f'h{j}' for j in band)}) AS band FROM sig"
            for bi, band in enumerate(bands)
        )
        geom_sqls.append(
            f"""SELECT {nb} AS n_bands, {8 // nb} AS rows_per_band, a_id, b_id
  FROM (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM ({bsql}) a JOIN ({bsql}) b
          ON a.band_id = b.band_id AND a.band = b.band
         AND a.doc_id < b.doc_id)"""
        )
    cands = "\n  UNION ALL ".join(geom_sqls)
    return f"""
WITH {_ORACLE_SHINGLES},
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
sig AS (
  SELECT doc_id,
         {_MINHASH_SIG_COLS_SQL}
  FROM sh GROUP BY doc_id
),
epairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
exact AS (
  SELECT e.a_id, e.b_id FROM epairs e
  JOIN sizes sa ON sa.doc_id = e.a_id
  JOIN sizes sb ON sb.doc_id = e.b_id
  WHERE CAST(e.i AS DOUBLE) / (sa.n + sb.n - e.i) >= {_NGRAM_THRESHOLD}
),
cands AS (
  {cands}
),
truth AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true FROM exact),
agg AS (
  SELECT n_bands, rows_per_band,
         CAST(COUNT(*) AS BIGINT) AS n_candidates,
         CAST(SUM(CASE WHEN e.a_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_caught
  FROM cands c
  LEFT JOIN exact e ON e.a_id = c.a_id AND e.b_id = c.b_id
  GROUP BY n_bands, rows_per_band
)
SELECT n_bands, rows_per_band, n_candidates, t.n_true, n_caught,
       CAST(n_caught AS DOUBLE) / NULLIF(t.n_true, 0) AS recall
FROM agg, truth t
"""


@query("dedup_lsh_band_sweep", _band_sweep_oracle(), tags=("dedup",))
def dedup_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Realized candidate RECALL and candidate COUNT for every banding
    geometry the 8-permutation signature supports (1x8, 2x4, 4x2) against
    the exact-Jaccard baseline — the design-tuning table a production
    dedup run reads before committing a config: more/narrower bands raise
    the collision probability (1-(1-s^r)^b) and the candidate bill
    together, and this query measures BOTH realized numbers instead of
    quoting the formula (`dedup_lsh_recall_eval` tracks the one shipped
    geometry; this sweeps the alternatives in one pass over one shared
    signature build).

    Scale note: like the recall eval, the exact baseline is the test-SF /
    sampled-slice side; the candidate branches are banded equi-joins —
    the same bucket-bounded shape as `dedup_minhash_lsh` — so the sweep
    itself runs sampled in production (the smoke's sampled-slice protocol,
    `tools/scale_smoke.py::build_recall_sample`)."""
    (docs,) = T(spark, sf_dir, "documents")
    sh = cache_scoped(_spark_shingles(docs))
    sig = cache_scoped(
        sh.groupBy("doc_id").agg(
            *[
                F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{j}")))).alias(
                    f"h{j}"
                )
                for j in range(_N_PERM)
            ]
        )
    )
    exact = cache_scoped(dedup_ngram_jaccard(spark, sf_dir).select("a_id", "b_id"))
    cands = None
    for nb, bands in _SWEEP_GEOMS:
        digests = sig.select(
            "doc_id",
            *[
                F.md5(F.concat(*[F.col(f"h{j}") for j in band])).alias(f"d{bi}")
                for bi, band in enumerate(bands)
            ],
        )
        rows = None
        for bi in range(nb):
            br = digests.select(
                "doc_id",
                F.lit(bi).alias("band_id"),
                F.col(f"d{bi}").alias("band"),
            )
            rows = br if rows is None else rows.unionAll(br)
        a = rows.alias("a")
        b = rows.alias("b")
        c = (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band") == F.col("b.band"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
            )
            .distinct()
            .select(
                F.lit(nb).alias("n_bands"),
                F.lit(8 // nb).alias("rows_per_band"),
                "a_id",
                "b_id",
            )
        )
        cands = c if cands is None else cands.unionAll(c)
    truth = exact.agg(F.count("*").alias("n_true"))
    hits = exact.select(
        F.col("a_id").alias("ea"), F.col("b_id").alias("eb"), F.lit(1).alias("hit")
    )
    agg = (
        cands.join(
            hits,
            (F.col("a_id") == F.col("ea")) & (F.col("b_id") == F.col("eb")),
            "left",
        )
        .groupBy("n_bands", "rows_per_band")
        .agg(
            F.count("*").alias("n_candidates"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_caught"),
        )
    )
    return agg.crossJoin(F.broadcast(truth)).select(
        "n_bands",
        "rows_per_band",
        "n_candidates",
        "n_true",
        "n_caught",
        F.when(
            F.col("n_true") > 0, F.col("n_caught").cast("double") / F.col("n_true")
        ).alias("recall"),
    )


# ---------------------------------------------------------------------------
# dedup survivorship report — round 9 (what did the pipeline do to my corpus)
# ---------------------------------------------------------------------------

_SURVIVORSHIP_ORACLE = f"""
WITH RECURSIVE {_LSH_CLUSTERS_CTES},
clusters AS (
  SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
),
ranked AS (
  SELECT c.cluster_id, c.doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY c.cluster_id ORDER BY d.n_chars DESC, c.doc_id
         ) AS rn
  FROM clusters c JOIN documents d ON d.doc_id = c.doc_id
),
dropped AS (SELECT doc_id FROM ranked WHERE rn > 1),
tok AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_tokens
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN dr.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_docs_dropped,
       CAST(SUM(CASE WHEN dr.doc_id IS NOT NULL THEN n_tokens ELSE 0 END)
            AS BIGINT) AS n_tokens_dropped,
       CAST(SUM(CASE WHEN dr.doc_id IS NOT NULL THEN n_tokens ELSE 0 END)
            AS DOUBLE) / SUM(n_tokens) AS frac_tokens_dropped
FROM tok LEFT JOIN dropped dr ON dr.doc_id = tok.doc_id
GROUP BY lang
"""


@query("dedup_survivorship_by_lang", _SURVIVORSHIP_ORACLE, tags=("dedup",))
def dedup_survivorship_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language SURVIVORSHIP of the production dedup pipeline — the
    before/after corpus accounting an operator reads after a dedup pass
    (and the multilingual fairness check: near-dup pruning that eats one
    language's tokens disproportionately shifts the training mixture):
    document and token totals, how many of each the keep-best policy
    drops, and the dropped-token fraction.  Drops come from the same
    banded-star pipeline as `dedup_keep_best_star` (every cluster member
    that is NOT the keep-best survivor); singleton documents never enter
    a cluster and survive by construction.

    Scale: the cluster/rank stages are the proven banded path; the
    report adds one token-count scan and a left join on doc_id (the
    dropped set is the small side — duplicates only), then a
    |langs|-row groupBy."""
    from pyspark.sql import Window as W

    (docs,) = T(spark, sf_dir, "documents")
    clusters = dedup_clusters_star(spark, sf_dir).select("doc_id", "cluster_id")
    w = W.partitionBy("cluster_id").orderBy(F.col("n_chars").desc(), "doc_id")
    dropped = (
        clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .select("doc_id", F.lit(1).alias("is_dropped"))
    )
    tok = docs.select(
        "doc_id",
        "lang",
        F.size(F.expr("filter(split(text, ' '), x -> x <> '')"))
        .cast("long")
        .alias("n_tokens"),
    )
    flagged = tok.join(dropped, "doc_id", "left")
    return flagged.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum(F.coalesce(F.col("is_dropped"), F.lit(0)))
        .cast("long")
        .alias("n_docs_dropped"),
        F.sum(
            F.when(F.col("is_dropped").isNotNull(), F.col("n_tokens")).otherwise(
                F.lit(0)
            )
        ).alias("n_tokens_dropped"),
        (
            F.sum(
                F.when(
                    F.col("is_dropped").isNotNull(), F.col("n_tokens")
                ).otherwise(F.lit(0))
            ).cast("double")
            / F.sum("n_tokens")
        ).alias("frac_tokens_dropped"),
    )


# ---------------------------------------------------------------------------
# leakage-safe dataset split: near-dup clusters routed atomically — round 9
# ---------------------------------------------------------------------------

_CLUSTER_SAFE_SPLIT_ORACLE = f"""
WITH RECURSIVE {_LSH_CLUSTERS_CTES},
clusters AS (
  SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
),
keyed AS (
  SELECT d.doc_id, d.n_chars,
         COALESCE(c.cluster_id, d.doc_id) AS group_key,
         c.cluster_id IS NOT NULL AS clustered
  FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id
),
assigned AS (
  SELECT *,
         CASE WHEN CAST('0x' || substr(md5(CAST(group_key AS VARCHAR)), 1, 8) AS BIGINT)
                   % 100 < 80 THEN 'train'
              WHEN CAST('0x' || substr(md5(CAST(group_key AS VARCHAR)), 1, 8) AS BIGINT)
                   % 100 < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM keyed
)
SELECT split,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(clustered AS INTEGER)) AS BIGINT) AS n_clustered_docs,
       COUNT(DISTINCT group_key) AS n_groups,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM assigned GROUP BY split
"""


@query("cluster_safe_split", _CLUSTER_SAFE_SPLIT_ORACLE, tags=("dedup", "etl"))
def cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/val/test split: every near-dup CLUSTER is routed
    to one split atomically, so no document can sit in train while its
    near-copy sits in test — the eval-integrity failure
    `split_leakage_check` measures after the fact, prevented by
    construction here (hash the cluster id, not the doc id; singletons
    hash their own id, which is `dataset_split_assign`'s rule, so the two
    splits agree on every unclustered document).

    Pipeline: banded MinHash-LSH verified pairs → star components
    (`dedup_clusters_star`, every stage bucket/component-bounded) →
    left-join back to the full corpus → md5-bucket the group key with the
    SAME 80/10/10 hash rule as `dataset_split_assign` → per-split totals.
    Cross-split leakage is structurally zero: a cluster has one group_key,
    a group_key has one hash, a hash has one split.

    Scale: the join adds one shuffle keyed on doc_id over (doc_id,
    cluster_id) longs; the split assignment is a map-side expression; the
    report is a 3-row aggregate with map-side partials."""
    (docs,) = T(spark, sf_dir, "documents")
    clusters = dedup_clusters_star(spark, sf_dir).select("doc_id", "cluster_id")
    keyed = docs.select("doc_id", "n_chars").join(clusters, "doc_id", "left").select(
        "doc_id",
        "n_chars",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("group_key"),
        F.col("cluster_id").isNotNull().alias("clustered"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("group_key").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    return (
        keyed.withColumn(
            "split",
            F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"),
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("clustered").cast("int")).cast("bigint").alias(
                "n_clustered_docs"
            ),
            F.countDistinct("group_key").alias("n_groups"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


# ---------------------------------------------------------------------------
# soft dedup: 1/cluster-size loss weights instead of hard removal
# ---------------------------------------------------------------------------

_SOFT_DEDUP_ORACLE = f"""
WITH RECURSIVE {_CLUSTERS_CTES},
assign AS (
  SELECT id AS doc_id, MIN(r) AS cluster_id
  FROM reach GROUP BY id
),
csizes AS (
  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM assign GROUP BY cluster_id
)
SELECT d.doc_id,
       COALESCE(a.cluster_id, d.doc_id) AS cluster_id,
       COALESCE(s.cluster_size, 1) AS cluster_size,
       1e0 / COALESCE(s.cluster_size, 1) AS weight
FROM documents d
LEFT JOIN assign a ON a.doc_id = d.doc_id
LEFT JOIN csizes s ON s.cluster_id = a.cluster_id
"""


@query("soft_dedup_weights", _SOFT_DEDUP_ORACLE, tags=("dedup",))
def soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication: instead of dropping near-dups, weight every
    document by 1/cluster_size so each near-dup FAMILY contributes one
    document's worth of loss (the SoftDeDup alternative to hard removal —
    keeps rare-but-duplicated content visible to the model without
    over-representing it).  Downstream, the weight column multiplies the
    per-example loss or drives `weighted_sample_by_quality`-style
    sampling.

    Composes the shipped pipeline: `dedup_clusters`' label-propagation
    components over the verified near-dup pair stream, a cluster-size
    aggregate (bounded by #clusters), then ONE left broadcast-able join
    back to documents; singletons (docs in no near-dup pair) get weight
    1.0 via the null path of the left join.  The weight itself is a
    single correctly-rounded division of exact BIGINTs, so it
    hash-matches without rounding.  Scale: cluster assignment is the
    banded-join + star pipeline (never all-pairs); the size table is
    cluster-count rows; the join back is a hash join keyed on doc_id."""
    (docs,) = T(spark, sf_dir, "documents")
    assign = dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    assign = cache_scoped(assign)
    sizes = assign.groupBy("cluster_id").agg(
        F.count("*").cast("bigint").alias("cluster_size")
    )
    joined = (
        docs.select("doc_id")
        .join(assign, "doc_id", "left")
        .join(sizes, "cluster_id", "left")
    )
    return joined.select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        F.coalesce(F.col("cluster_size"), F.lit(1).cast("bigint")).alias(
            "cluster_size"
        ),
        (
            F.lit(1.0)
            / F.coalesce(F.col("cluster_size"), F.lit(1).cast("bigint")).cast(
                "double"
            )
        ).alias("weight"),
    )


# ---------------------------------------------------------------------------
# MinHash estimator calibration — round 10
# ---------------------------------------------------------------------------

_CALIB_MATCHES_SQL = " + ".join(
    f"(CASE WHEN sa.h{j} = sb.h{j} THEN 1 ELSE 0 END)" for j in range(_N_PERM)
)

_CALIB_ORACLE = f"""
WITH {_ORACLE_SHINGLES},
sig AS (
  SELECT doc_id,
         {_MINHASH_SIG_COLS_SQL},
         CAST(COUNT(*) AS BIGINT) AS n
  FROM sh GROUP BY doc_id
),
bands AS ({_MINHASH_BANDS_SQL}),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_id = b.band_id AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.a_id, c.b_id, CAST(COUNT(*) AS BIGINT) AS i
  FROM cand c
  JOIN sh x ON x.doc_id = c.a_id
  JOIN sh y ON y.doc_id = c.b_id AND y.shingle = x.shingle
  GROUP BY c.a_id, c.b_id
),
scored AS (
  SELECT CAST({_CALIB_MATCHES_SQL} AS BIGINT) AS matches,
         i.i AS it, sa.n + sb.n - i.i AS un
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.a_id
  JOIN sig sb ON sb.doc_id = c.b_id
  JOIN inter i ON i.a_id = c.a_id AND i.b_id = c.b_id
)
SELECT CAST(FLOOR(CAST(it AS DOUBLE) / un * 10) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(matches) AS DOUBLE) / {_N_PERM} / COUNT(*) AS mean_est,
       CAST(SUM(CAST(CAST(it AS DOUBLE) / un AS DECIMAL(24,6))) AS DOUBLE)
         / COUNT(*) AS mean_exact,
       CAST(SUM(CAST(abs(matches / {_N_PERM}e0 - CAST(it AS DOUBLE) / un)
                     AS DECIMAL(24,6))) AS DOUBLE)
         / COUNT(*) AS mean_abs_err
FROM scored GROUP BY 1
"""


@query("minhash_jaccard_calibration", _CALIB_ORACLE, tags=("dedup", "eval"))
def minhash_jaccard_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALIBRATION of the MinHash similarity estimator against exact
    Jaccard, binned by true similarity — completing the evaluated-not-
    trusted family (`dedup_lsh_recall_eval` measures which pairs the
    BANDING finds; this measures how well the SIGNATURE estimates their
    similarity, the number a pipeline uses when it thresholds on
    estimated Jaccard instead of running exact verification).  For every
    banded candidate pair: est = (matching signature components)/8 — an
    unbiased Jaccard estimator — vs the exact shingle Jaccard, aggregated
    per true-similarity decile into (n_pairs, mean_est, mean_exact,
    mean_abs_err).  With 8 permutations the theoretical RMS error is
    ~sqrt(j(1-j)/8) ≈ 0.14 at j=0.5 — the table shows the realized error
    at each operating point, which is what decides whether 8 permutations
    suffice or the signature needs widening.

    Exactness: matches and intersections are integers; est sums as
    Σmatches (exact); the double-valued exact Jaccard and |est−exact| go
    through the DECIMAL(24,6) order-independent sum (the `dsum` scale-6
    discipline) before their final divisions, so every bin row
    hash-matches.  Scale: this is an EVAL query — production runs it
    over a dup-family-preserving sampled slice (the
    `dedup_lsh_recall_eval_sampled` protocol); candidates come from the
    same banded equi-join as the production pipeline, never all pairs."""
    (docs,) = T(spark, sf_dir, "documents")
    sh = cache_scoped(_spark_shingles(docs))
    sig = cache_scoped(
        sh.groupBy("doc_id").agg(
            *[
                F.min(
                    F.md5(F.concat(F.col("shingle"), F.lit(f"#{j}")))
                ).alias(f"h{j}")
                for j in range(_N_PERM)
            ],
            F.count("*").alias("n"),
        )
    )
    bands = None
    for bi, band in enumerate(_BANDS):
        b = sig.select(
            "doc_id",
            F.lit(bi).alias("band_id"),
            F.md5(F.concat(*[F.col(f"h{j}") for j in band])).alias("band"),
        )
        bands = b if bands is None else bands.unionAll(b)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b.hint("shuffle_merge"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("a_id"), "shingle"), "a_id")
        .join(
            sh.select(F.col("doc_id").alias("b_id"), "shingle"),
            ["b_id", "shingle"],
        )
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("it"))
    )
    sa = sig.select(
        F.col("doc_id").alias("a_id"),
        *[F.col(f"h{j}").alias(f"ha{j}") for j in range(_N_PERM)],
        F.col("n").alias("na"),
    )
    sb = sig.select(
        F.col("doc_id").alias("b_id"),
        *[F.col(f"h{j}").alias(f"hb{j}") for j in range(_N_PERM)],
        F.col("n").alias("nb"),
    )
    matches = None
    for j in range(_N_PERM):
        m = (F.col(f"ha{j}") == F.col(f"hb{j}")).cast("int")
        matches = m if matches is None else matches + m
    scored = (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .join(inter, ["a_id", "b_id"])
        .select(
            matches.cast("long").alias("matches"),
            "it",
            (F.col("na") + F.col("nb") - F.col("it")).alias("un"),
        )
    )
    j_exact = F.col("it").cast("double") / F.col("un")
    est = F.col("matches") / F.lit(float(_N_PERM))
    return (
        scored.groupBy(
            F.floor(j_exact * 10).cast("long").alias("bin")
        )
        .agg(
            F.count("*").alias("n_pairs"),
            (
                F.sum("matches").cast("double") / _N_PERM / F.count("*")
            ).alias("mean_est"),
            (
                F.sum(j_exact.cast("decimal(24,6)")).cast("double")
                / F.count("*")
            ).alias("mean_exact"),
            (
                F.sum(F.abs(est - j_exact).cast("decimal(24,6)")).cast("double")
                / F.count("*")
            ).alias("mean_abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash calibration on a random matching (low-similarity operating points)
# ---------------------------------------------------------------------------

_CALIB_RAND_ORACLE = f"""
WITH {_ORACLE_SHINGLES},
sig AS (
  SELECT doc_id,
         {_MINHASH_SIG_COLS_SQL},
         CAST(COUNT(*) AS BIGINT) AS n
  FROM sh GROUP BY doc_id
),
ranked AS (
  -- rank ONLY shingle-eligible docs (>= 3 words): a doc with no shingles
  -- has no signature, so pairing it would silently drop its pair at the
  -- sig join below — eligibility-first keeps the matching a true perfect
  -- matching over floor(n_eligible/2) pairs (round-10 advice)
  SELECT doc_id,
         row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM sig
),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM ranked a JOIN ranked b ON b.rk = a.rk + 1 AND a.rk % 2 = 1
),
inter AS (
  SELECT p.a_id, p.b_id, CAST(COUNT(*) AS BIGINT) AS i
  FROM pairs p
  JOIN sh x ON x.doc_id = p.a_id
  JOIN sh y ON y.doc_id = p.b_id AND y.shingle = x.shingle
  GROUP BY p.a_id, p.b_id
),
scored AS (
  SELECT CAST({_CALIB_MATCHES_SQL} AS BIGINT) AS matches,
         COALESCE(i.i, 0) AS it, sa.n + sb.n - COALESCE(i.i, 0) AS un
  FROM pairs c
  JOIN sig sa ON sa.doc_id = c.a_id
  JOIN sig sb ON sb.doc_id = c.b_id
  LEFT JOIN inter i ON i.a_id = c.a_id AND i.b_id = c.b_id
)
SELECT CAST(FLOOR(CAST(it AS DOUBLE) / un * 10) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(matches) AS DOUBLE) / {_N_PERM} / COUNT(*) AS mean_est,
       CAST(SUM(CAST(CAST(it AS DOUBLE) / un AS DECIMAL(24,6))) AS DOUBLE)
         / COUNT(*) AS mean_exact,
       CAST(SUM(CAST(abs(matches / {_N_PERM}e0 - CAST(it AS DOUBLE) / un)
                     AS DECIMAL(24,6))) AS DOUBLE)
         / COUNT(*) AS mean_abs_err
FROM scored GROUP BY 1
"""


@query("minhash_calibration_random_pairs", _CALIB_RAND_ORACLE, tags=("dedup", "eval"))
def minhash_calibration_random_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration at the LOW-similarity operating
    points `minhash_jaccard_calibration` cannot reach: banded candidates
    are (by design) concentrated near the similarity threshold, so its
    deciles cluster at the top of the range.  This twin scores a
    deterministic RANDOM PERFECT MATCHING instead — rank every document
    by md5(doc_id) (:func:`distributed_rank`, never a single-partition
    window) and pair consecutive ranks (odd rank with its successor): a
    uniform random pairing that is reproducible on both engines, covers
    floor(n_eligible/2) pairs in strictly linear work (eligible = docs
    with >= 3 words, i.e. at least one shingle — a doc with no shingles
    has no signature to calibrate, so the ranking is restricted to
    signature holders up front rather than silently dropping pairs at
    the sig join), and lands mostly in the 0.0-0.3
    exact-Jaccard deciles — together the two queries calibrate the
    8-permutation estimator across the whole operating range (the
    false-positive side matters when a pipeline thresholds on ESTIMATED
    similarity: est >= 0.5 on a truly-0.1 pair is the error this table
    exposes).

    Unlike banded candidates, random pairs can share ZERO shingles, so
    the intersection join is a LEFT join with COALESCE(i, 0) — exact
    Jaccard 0, bin 0.  Same exactness discipline as the candidate twin:
    integer matches/intersections, DECIMAL(24,6) order-independent sums
    for the double-valued means.  Scale: one rank shuffle, one pairing
    join on rank keys, one shingle-intersect join bounded by the SMALLER
    doc's shingle count per pair — everything linear in the corpus."""
    (docs,) = T(spark, sf_dir, "documents")
    from map_reduce485_spark.queries._util import distributed_rank

    sh = cache_scoped(_spark_shingles(docs))
    sig = cache_scoped(
        sh.groupBy("doc_id").agg(
            *[
                F.min(
                    F.md5(F.concat(F.col("shingle"), F.lit(f"#{j}")))
                ).alias(f"h{j}")
                for j in range(_N_PERM)
            ],
            F.count("*").alias("n"),
        )
    )
    # rank only shingle-ELIGIBLE docs (those with a signature, i.e. >= 3
    # words): pairing an ineligible doc would silently drop its pair at the
    # inner sig join — eligibility-first keeps the matching a true perfect
    # matching over floor(n_eligible/2) pairs (round-10 advice)
    ranked = distributed_rank(
        sig.select(
            "doc_id", F.md5(F.col("doc_id").cast("string")).alias("hkey")
        ),
        ["hkey", "doc_id"],
        alias="rk",
    ).select("doc_id", "rk")
    odd = ranked.filter(F.col("rk") % 2 == 1).select(
        F.col("doc_id").alias("a_id"), (F.col("rk") + 1).alias("brk")
    )
    even = ranked.select(F.col("doc_id").alias("b_id"), F.col("rk").alias("brk"))
    pairs = odd.join(even, "brk").select("a_id", "b_id")
    inter = (
        pairs.join(sh.select(F.col("doc_id").alias("a_id"), "shingle"), "a_id")
        .join(
            sh.select(F.col("doc_id").alias("b_id"), "shingle"),
            ["b_id", "shingle"],
        )
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("it"))
    )
    sa = sig.select(
        F.col("doc_id").alias("a_id"),
        *[F.col(f"h{j}").alias(f"ha{j}") for j in range(_N_PERM)],
        F.col("n").alias("na"),
    )
    sb = sig.select(
        F.col("doc_id").alias("b_id"),
        *[F.col(f"h{j}").alias(f"hb{j}") for j in range(_N_PERM)],
        F.col("n").alias("nb"),
    )
    matches = None
    for j in range(_N_PERM):
        m = (F.col(f"ha{j}") == F.col(f"hb{j}")).cast("int")
        matches = m if matches is None else matches + m
    scored = (
        pairs.join(sa, "a_id")
        .join(sb, "b_id")
        .join(inter, ["a_id", "b_id"], "left")
        .select(
            matches.cast("long").alias("matches"),
            F.coalesce(F.col("it"), F.lit(0).cast("long")).alias("it"),
            (
                F.col("na")
                + F.col("nb")
                - F.coalesce(F.col("it"), F.lit(0).cast("long"))
            ).alias("un"),
        )
    )
    j_exact = F.col("it").cast("double") / F.col("un")
    est = F.col("matches") / F.lit(float(_N_PERM))
    return (
        scored.groupBy(F.floor(j_exact * 10).cast("long").alias("bin"))
        .agg(
            F.count("*").alias("n_pairs"),
            (
                F.sum("matches").cast("double") / _N_PERM / F.count("*")
            ).alias("mean_est"),
            (
                F.sum(j_exact.cast("decimal(24,6)")).cast("double")
                / F.count("*")
            ).alias("mean_exact"),
            (
                F.sum(F.abs(est - j_exact).cast("decimal(24,6)")).cast("double")
                / F.count("*")
            ).alias("mean_abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash calibration on prefix-truncation pairs (mid-similarity deciles)
# ---------------------------------------------------------------------------

_TRUNC_PCTS = ((1, 4), (1, 2), (3, 4))  # prefix fractions as exact rationals
_TRUNC_MIN_WORDS = 12  # every fraction's prefix must hold >= 1 shingle


def _trunc_oracle() -> str:
    sig_full = ",\n         ".join(
        f"MIN(md5(shingle || '#{j}')) AS f{j}" for j in range(_N_PERM)
    )
    per_frac = []
    for p, q in _TRUNC_PCTS:
        tag = f"{100 * p // q}"
        cond = f"i <= (n * {p}) // {q} - 2"
        per_frac.append(
            ",\n         ".join(
                [
                    f"COUNT(DISTINCT CASE WHEN {cond} THEN shingle END)"
                    f" AS c{tag}"
                ]
                + [
                    f"MIN(CASE WHEN {cond} THEN md5(shingle || '#{j}') END)"
                    f" AS p{tag}_{j}"
                    for j in range(_N_PERM)
                ]
            )
        )
    variants = "\n  UNION ALL\n".join(
        f"""  SELECT {100 * p // q} AS pct,
         ({" + ".join(f"CASE WHEN p{100 * p // q}_{j} = f{j} THEN 1 ELSE 0 END" for j in range(_N_PERM))}) AS matches,
         CAST(c{100 * p // q} AS DOUBLE) / c_full AS j_exact
  FROM sigs"""
        for p, q in _TRUNC_PCTS
    )
    return f"""
WITH words AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
),
grams AS (
  SELECT doc_id, len(w) AS n, i, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM (SELECT doc_id, w, UNNEST(generate_series(1, len(w) - 2)) AS i
        FROM words WHERE len(w) >= {_TRUNC_MIN_WORDS})
),
sigs AS (
  SELECT doc_id,
         CAST(COUNT(DISTINCT shingle) AS BIGINT) AS c_full,
         {sig_full},
         {",".join(per_frac)}
  FROM grams GROUP BY doc_id
),
scored AS (
{variants}
)
SELECT pct, CAST(FLOOR(j_exact * 10) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(matches) AS DOUBLE) / {_N_PERM} / COUNT(*) AS mean_est,
       CAST(SUM(CAST(j_exact AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*)
         AS mean_exact,
       CAST(SUM(CAST(abs(matches / {_N_PERM}e0 - j_exact) AS DECIMAL(24,6)))
            AS DOUBLE) / COUNT(*) AS mean_abs_err
FROM scored GROUP BY pct, bin
"""


@query(
    "minhash_calibration_truncation_pairs",
    _trunc_oracle(),
    tags=("dedup", "eval"),
)
def minhash_calibration_truncation_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MinHash estimator calibration at the MID-similarity operating
    points neither sibling reaches (round-10 verdict item 6): banded
    candidates (`minhash_jaccard_calibration`) concentrate near the
    banding threshold, random pairs (`minhash_calibration_random_pairs`)
    near zero.  This twin scores each document against its own PREFIX
    TRUNCATIONS at 25/50/75% of its words: prefix shingles are a strict
    subset of the full doc's, so the exact Jaccard is the distinct-
    shingle ratio |prefix| / |full| — a deterministic, corpus-only dial
    that sweeps the middle deciles without touching the data generator.
    Together the three queries calibrate the {n}-permutation estimator
    across the whole operating range.

    Exactness: counts and matches are integers; the per-pair Jaccard is
    ONE bigint/bigint division; per-bin means ride DECIMAL(24,6)
    order-independent sums (the sibling queries' discipline).  Prefix
    lengths use exact integer arithmetic ((n*p) div q), identical on
    both engines.

    Scale shape: ONE gram explode (corpus-linear, map-side) into ONE
    groupBy(doc_id) whose conditional aggregation computes the full
    signature, all three prefix signatures, and all four distinct-
    shingle counts in a single pass — no joins, no windows, no second
    scan; the variant unpivot and decile binning run on doc-count rows;
    the sink is <= 3 x 11 bins.  Docs under {mw} words are excluded so
    every truncation holds at least one shingle."""
    (docs,) = T(spark, sf_dir, "documents")
    grams = (
        docs.select(
            "doc_id",
            F.expr("filter(split(text, ' '), x -> x <> '')").alias("w"),
        )
        .filter(F.size("w") >= _TRUNC_MIN_WORDS)
        .select(
            "doc_id",
            F.size("w").alias("n"),
            F.explode(F.sequence(F.lit(1), F.size("w") - 2)).alias("i"),
            "w",
        )
        .select(
            "doc_id",
            "n",
            "i",
            F.expr(
                "concat(element_at(w, i), ' ', element_at(w, i + 1),"
                " ' ', element_at(w, i + 2))"
            ).alias("shingle"),
        )
    )
    # Dedupe to one row per (doc, shingle) FIRST, keeping the earliest
    # position: a shingle is inside a prefix iff ANY of its occurrences
    # is, i.e. iff its MIN position is — and the permutation hash is
    # position-independent, so mins and counts over the deduped rows are
    # EXACT.  This converts the four COUNT(DISTINCT ...) aggregates into
    # plain counts, eliminating Spark's Expand operator (which replays
    # every gram row once per distinct-aggregate = 5x the agg input) and
    # hashes each (doc, shingle, permutation) once (8 md5s per DISTINCT
    # shingle, not 32 per gram occurrence — conditional-min expressions
    # are not CSE'd inside aggregates).  Measured: 12.0 s (naive) ->
    # 8.6 s (hash-once) -> see NOTES_r11 for this form, 10x smoke.
    first_pos = grams.groupBy("doc_id", "shingle").agg(
        F.min("i").alias("i"), F.min("n").alias("n")
    )
    hashed = first_pos.select(
        "doc_id",
        "n",
        "i",
        *[
            F.md5(F.concat(F.col("shingle"), F.lit(f"#{j}"))).alias(f"h{j}")
            for j in range(_N_PERM)
        ],
    )
    aggs = [F.count("*").alias("c_full")]
    for j in range(_N_PERM):
        aggs.append(F.min(F.col(f"h{j}")).alias(f"f{j}"))
    for p, q in _TRUNC_PCTS:
        tag = f"{100 * p // q}"
        # exact integer prefix length: (n * p) div q matches the oracle's //
        cond = F.col("i") <= F.expr(f"(n * {p}) div {q}") - 2
        aggs.append(F.sum(cond.cast("long")).alias(f"c{tag}"))
        for j in range(_N_PERM):
            aggs.append(
                F.min(F.when(cond, F.col(f"h{j}"))).alias(f"p{tag}_{j}")
            )
    sigs = hashed.groupBy("doc_id").agg(*aggs)
    variant_structs = []
    for p, q in _TRUNC_PCTS:
        tag = f"{100 * p // q}"
        matches = " + ".join(
            f"CASE WHEN p{tag}_{j} = f{j} THEN 1 ELSE 0 END"
            for j in range(_N_PERM)
        )
        variant_structs.append(
            f"struct({100 * p // q}L AS pct, CAST({matches} AS BIGINT) AS"
            f" matches, CAST(c{tag} AS DOUBLE) / c_full AS j_exact)"
        )
    scored = sigs.select(
        F.explode(F.expr(f"array({', '.join(variant_structs)})")).alias("v")
    ).select("v.pct", "v.matches", "v.j_exact")
    return (
        scored.groupBy(
            "pct", F.floor(F.col("j_exact") * 10).cast("long").alias("bin")
        )
        .agg(
            F.count("*").alias("n_pairs"),
            (
                F.sum("matches").cast("double") / _N_PERM / F.count("*")
            ).alias("mean_est"),
            (
                F.sum(F.col("j_exact").cast("decimal(24,6)")).cast("double")
                / F.count("*")
            ).alias("mean_exact"),
            (
                F.sum(
                    F.abs(
                        F.col("matches") / F.lit(float(_N_PERM))
                        - F.col("j_exact")
                    ).cast("decimal(24,6)")
                ).cast("double")
                / F.count("*")
            ).alias("mean_abs_err"),
        )
    )


minhash_calibration_truncation_pairs.__doc__ = (
    minhash_calibration_truncation_pairs.__doc__.replace("{n}", str(_N_PERM))
    .replace("{mw}", str(_TRUNC_MIN_WORDS))
)


# ---------------------------------------------------------------------------
# EXACT substring-level dedup (Lee et al. 2022) — round 12
# ---------------------------------------------------------------------------

# Span threshold in tokens.  Lee et al. 2022 ("Deduplicating Training Data
# Makes Language Models Better") remove verbatim substrings of >= 50 BPE
# tokens; this corpus's documents average ~55 whitespace words (max 99), so
# the gate runs the same algorithm at 20 words to exercise multi-seed span
# merging — a production run sets this one constant back to 50.
_SUBDUP_L = 20

# shared CTE chain for the substring-dedup family: seed detection through
# maximal covered spans.  Seeds are merged into one span whenever the gap
# between consecutive seed starts is <= L (not just 1): seed p covers
# [p, p+L-1] and seed q = p+g covers [q, q+L-1], whose union is contiguous
# exactly when g <= L — so gap-<=-L clusters are precisely the MAXIMAL
# disjoint covered intervals, and span_tokens sum to the exact removal
# count (a step-1 run grouping would emit overlapping spans whenever
# 2 <= g <= L and double-count their tokens).
def _subdup_ctes(L: int) -> str:
    """The seed-cover CTE chain at span threshold ``L`` — the gate oracle
    uses L = `_SUBDUP_L`; the production-constant twin re-instantiates the
    SAME text at the paper's L = 50 (one constant, zero new logic)."""
    return f"""words AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
  FROM documents
),
grams AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         md5(array_to_string(w[i:i+{L}-1], ' ')) AS h
  FROM (SELECT doc_id, w, UNNEST(generate_series(1, len(w) - {L} + 1)) AS i
        FROM words WHERE len(w) >= {L})
),
dup AS (SELECT h FROM grams GROUP BY h HAVING COUNT(*) >= 2),
seeds AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (h)),
clustered AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   <= {L} THEN 0 ELSE 1 END AS new_run
  FROM seeds
),
runs AS (
  SELECT doc_id, pos,
         SUM(new_run) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS grp
  FROM clustered
),
spans AS (
  SELECT doc_id,
         CAST(MIN(pos) AS BIGINT) AS span_start,
         CAST(MAX(pos) + {L} - 1 AS BIGINT) AS span_end,
         CAST(MAX(pos) - MIN(pos) + {L} AS BIGINT) AS span_tokens
  FROM runs GROUP BY doc_id, grp
)"""


_SUBDUP_CTES = _subdup_ctes(_SUBDUP_L)

_SUBDUP_ORACLE = f"""
WITH {_SUBDUP_CTES}
SELECT doc_id, span_start, span_end, span_tokens FROM spans
"""


def _gap_merge_spans(seeds: DataFrame, L: int) -> DataFrame:
    """Seed starts (doc_id, pos) -> maximal disjoint covered spans: the
    gap-<=-L lag flag + running sum per document (two window functions
    over ONE per-doc sort; see `dedup_exact_substring_spans` for the
    maximality proof).  Shared by the corpus-dup spans family and the
    eval-set span decontamination — identical clustering, different seed
    predicate."""
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    runs = seeds.withColumn(
        "new_run",
        F.when(
            F.col("pos") - F.lag("pos").over(w_doc) <= L, F.lit(0)
        ).otherwise(F.lit(1)),
    ).withColumn(
        "grp",
        F.sum("new_run").over(w_doc.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return runs.groupBy("doc_id", "grp").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + L - 1).alias("span_end"),
        (F.max("pos") - F.min("pos") + L).alias("span_tokens"),
    ).select("doc_id", "span_start", "span_end", "span_tokens")


def _substring_spans(spark: SparkSession, sf_dir: str, L: int) -> DataFrame:
    """The L-gram seed-cover spans pipeline at threshold ``L`` (plan and
    exactness argument in `dedup_exact_substring_spans`'s docstring —
    this helper exists so the paper's L = 50 production constant runs the
    IDENTICAL code path as the L = 20 gate geometry)."""
    (docs,) = T(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.expr("filter(split(lower(text), ' '), x -> x <> '')").alias("w"),
    ).filter(F.size("w") >= L)
    grams = cache_scoped(
        words.select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(w) - {L} + 1),"
                    f" i -> md5(concat_ws(' ', slice(w, i, {L}))))"
                )
            ).alias("p0", "h"),
        ).select("doc_id", (F.col("p0") + 1).cast("long").alias("pos"), "h")
    )
    dup = (
        grams.groupBy("h")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("h")
    )
    seeds = grams.join(dup, "h").select("doc_id", "pos")
    return _gap_merge_spans(seeds, L)


@query("dedup_exact_substring_spans", _SUBDUP_ORACLE, tags=("dedup",))
def dedup_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT substring-level dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): per-document removal
    spans — maximal token intervals covered by some VERBATIM substring of
    >= {L} tokens that occurs at least twice in the corpus (cross-doc or
    self-repeat, as in the paper) — the byte-exact-span dedup class the
    shelf's set/sketch/fingerprint/embedding spaces did not cover
    (round-11 verdict item 2).  Each output row is (doc_id, span_start,
    span_end, span_tokens), 1-based inclusive token indices: the removal
    list a training pipeline applies before tokenization.

    The paper builds a suffix array; the distributed formulation here is
    L-GRAM SEED COVER, and it is EXACT, not an approximation — a token
    position p lies inside a repeated substring of length >= L iff p lies
    inside a duplicated L-gram: (<=) a duplicated L-gram IS a repeated
    substring of length L; (=>) any occurrence of a repeated substring of
    length m >= L that covers p contains a length-L window that still
    covers p (an m-interval containing p always has an L-subinterval
    containing p when m >= L), and every L-window inside a repeated
    substring is itself duplicated.  So the union of duplicated-L-gram
    positions equals the union of repeated->=L-substring positions, and
    the output is that union's MAXIMAL DISJOINT intervals: consecutive
    seeds are merged whenever their start gap is <= L — seed p covers
    [p, p+L-1] and seed q = p+g covers [q, q+L-1], whose union is
    contiguous exactly when g <= L, so gap-<=-L clusters ARE the maximal
    covered intervals (a step-1 run grouping would emit overlapping spans
    whenever 2 <= g <= L); spans are disjoint by construction, so
    span_tokens sum to the exact per-doc removal count the apply twin
    relies on.  Clusters come from the standard lag-gap flag + running
    sum per document.

    Exactness caveat (round-12 advice, same convention as the repo's
    other md5-keyed queries): "exact" holds up to md5 equality of the
    L-word windows — a gram hash collision would fabricate a seed.  Both
    engines key on the same md5, so parity is unaffected either way; at
    ~2^-128 per pair the risk is negligible, and a pipeline requiring
    unconditional exactness would compare the raw gram text in the dup
    filter (shuffling the 20-word strings the hashing exists to avoid).

    Scale shape, all corpus-linear: one gram explode (~n_tokens rows, the
    same volume every shingle query here ships) hashed to md5 BEFORE the
    exchange so 20-word strings never shuffle; the duplicate filter is a
    map-side-combinable count groupBy(h) joined back on the SAME key h
    (one aligned exchange pair, no re-partition between them); the cluster
    grouping is a pair of per-DOCUMENT window functions (lag + running
    sum) over ONE per-doc sort (bounded by doc length — never a
    single-partition window) and a per-doc groupBy.  Seed-side state is
    one (pos) long per duplicated gram; nothing is quadratic in dup
    family size because seeds join against the distinct gram set, not
    against other occurrences.  The reference has no dedup surface at all
    (SURVEY.md S2.b explicitly-absent list)."""
    return _substring_spans(spark, sf_dir, _SUBDUP_L)


dedup_exact_substring_spans.__doc__ = dedup_exact_substring_spans.__doc__.replace(
    "{L}", str(_SUBDUP_L)
)


_SUBDUP_L50 = 50

_SUBDUP_L50_ORACLE = f"""
WITH {_subdup_ctes(_SUBDUP_L50)}
SELECT CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_affected,
       CAST(COALESCE(SUM(span_tokens), 0) AS BIGINT) AS tokens_covered
FROM spans
"""


@query("dedup_exact_substring_spans_l50", _SUBDUP_L50_ORACLE, tags=("dedup",))
def dedup_exact_substring_spans_l50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`dedup_exact_substring_spans` at the PRODUCTION constant — Lee et
    al. 2022 remove verbatim substrings of >= 50 tokens; the gate query
    runs L = 20 because this corpus's documents average ~55 whitespace
    words, and through round 12 the paper's geometry was documented as
    "one constant away" but never executed in any artifact (round-12
    verdict item 4).  This twin instantiates the IDENTICAL pipeline
    (`_substring_spans`, one shared code path) and oracle CTE chain at
    L = {_SUBDUP_L50} and reports the corpus rollup a production run
    reads first: span count, affected docs, covered tokens.

    Output is a single summary row rather than the span list because at
    this L over the test corpora the span set is typically EMPTY (few
    docs reach 50 words twice-verbatim) — a count row keeps the result
    sentinel-shaped (never an empty frame, the repo's no-empty-output
    convention) while still hash-checking the entire pipeline: DuckDB
    replays the same seed-cover CTEs at L = 50 and must agree on all
    three counts.  Monotonicity vs the gate geometry (every L = 50
    covered position is L = 20 covered; span sets nest) is pinned by
    `test_exact_substring_l50_subset_of_l20`.  Scale shape identical to
    the parent: gram volume is ~n_tokens rows regardless of L (one md5
    per start position — L only changes the hashed window width), so the
    100x smoke entry measures the paper's geometry at the paper's
    constant."""
    spans = _substring_spans(spark, sf_dir, _SUBDUP_L50)
    return spans.agg(
        F.count("*").alias("n_spans"),
        F.count_distinct("doc_id").alias("n_docs_affected"),
        F.coalesce(F.sum("span_tokens"), F.lit(0)).cast("long").alias(
            "tokens_covered"
        ),
    )


_SUBDUP_INCR_ORACLE = f"""
WITH {_SUBDUP_CTES}
SELECT doc_id, span_start, span_end, span_tokens
FROM spans
WHERE doc_id IN (SELECT doc_id FROM documents
                 WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = 'f')
"""


@query(
    "dedup_exact_substring_incremental",
    _SUBDUP_INCR_ORACLE,
    tags=("dedup", "etl"),
)
def dedup_exact_substring_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL ingest twin of `dedup_exact_substring_spans` — the
    shape a production pipeline actually runs per batch (the
    `dedup_incremental_arrivals` move applied to the substring class):
    arrivals (docs whose md5(doc_id) starts with 'f', the repo's standing
    ~1/16 "today's crawl" split) get removal spans for every position
    covered by an L-gram duplicated ANYWHERE — in the standing corpus, in
    another arrival, or repeated within the doc — which is exactly the
    full query's output restricted to arrival docs (the oracle states it
    that way, so the equivalence is hash-checked, not claimed).

    The plan is what makes it incremental: ONLY arrival docs are
    shingled into positional grams; the base corpus contributes one
    gram->count INDEX (groupBy h — the table a production system
    maintains as standing state and only the in-query build pays for
    here, the same amortization story as `dedup_incremental_arrivals`'
    band index and `streaming_ann_index_gate`'s embedding index), and an
    arrival gram is a seed iff c_arrivals(g) + c_base(g) >= 2 — one
    LEFT join of the arrival-cardinality gram set against the index on
    the SAME key h it was grouped on.  Per-batch cost therefore scales
    with the ARRIVALS (explode + index probe), never with
    corpus x corpus; the seed->span clustering is the parent query's
    per-doc lag+running-sum merge over arrival docs only."""
    (docs,) = T(spark, sf_dir, "documents")
    L = _SUBDUP_L
    flagged = docs.select(
        "doc_id",
        (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "f").alias(
            "is_new"
        ),
        F.expr("filter(split(lower(text), ' '), x -> x <> '')").alias("w"),
    ).filter(F.size("w") >= L)

    def grams(df: DataFrame) -> DataFrame:
        return df.select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(w) - {L} + 1),"
                    f" i -> md5(concat_ws(' ', slice(w, i, {L}))))"
                )
            ).alias("p0", "h"),
        ).select("doc_id", (F.col("p0") + 1).cast("long").alias("pos"), "h")

    arr_grams = cache_scoped(grams(flagged.filter(F.col("is_new"))))
    base_index = grams(flagged.filter(~F.col("is_new"))).groupBy("h").agg(
        F.count("*").alias("c_base")
    )
    arr_df = arr_grams.groupBy("h").agg(F.count("*").alias("c_arr"))
    dup = (
        arr_df.join(base_index, "h", "left")
        .filter(
            F.col("c_arr") + F.coalesce(F.col("c_base"), F.lit(0)) >= 2
        )
        .select("h")
    )
    seeds = arr_grams.join(dup, "h").select("doc_id", "pos")
    return _gap_merge_spans(seeds, L)


_SUBDUP_RATE_ORACLE = f"""
WITH {_SUBDUP_CTES},
per_doc AS (
  SELECT doc_id, CAST(SUM(span_tokens) AS BIGINT) AS nrem
  FROM spans GROUP BY doc_id
),
tok AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
              AS BIGINT) AS n_tokens
  FROM documents
)
SELECT t.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(t.n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(COALESCE(p.nrem, 0)) AS BIGINT) AS n_removed,
       CAST(SUM(CASE WHEN COALESCE(p.nrem, 0) > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_docs_affected,
       CASE WHEN SUM(t.n_tokens) > 0
            THEN CAST(SUM(COALESCE(p.nrem, 0)) AS DOUBLE)
                 / CAST(SUM(t.n_tokens) AS DOUBLE)
            ELSE 0.0 END AS removal_rate
FROM tok t LEFT JOIN per_doc p USING (doc_id)
GROUP BY t.source
"""


@query("dedup_substring_rate_by_source", _SUBDUP_RATE_ORACLE, tags=("dedup", "agg"))
def dedup_substring_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DECISION-shaped rollup of exact substring dedup (the
    `dedup_simhash_summary` move applied to the substring class): per
    source — docs, tokens, tokens covered by duplicated >= L-token
    substrings, docs affected, and the removal rate.  This is the report
    a data lead reads before a crawl-source keep/drop call (which feed is
    shipping boilerplate?), and the number Lee et al. 2022 report per
    corpus (fraction of tokens removed).

    Scale shape: the spans pipeline (corpus-linear, see
    `dedup_exact_substring_spans`), a per-doc span-token sum (doc-bounded
    groups), ONE doc_id-aligned left join against the per-doc token
    counts (spanless docs contribute zero), then a groupBy on the
    SOURCE-domain key — map-side combinable, constant-size output at any
    corpus scale.  n_removed sums exactly because spans are
    disjoint-maximal; the rate is one double division of exact bigints
    (identical IEEE rounding both engines)."""
    (docs,) = T(spark, sf_dir, "documents")
    spans = dedup_exact_substring_spans(spark, sf_dir)
    per_doc = spans.groupBy("doc_id").agg(
        F.sum("span_tokens").alias("nrem")
    )
    tok = docs.select(
        "doc_id",
        "source",
        F.expr(
            "CAST(size(filter(split(lower(text), ' '), x -> x <> ''))"
            " AS BIGINT)"
        ).alias("n_tokens"),
    )
    nrem = F.coalesce(F.col("nrem"), F.lit(0).cast("long"))
    joined = tok.join(per_doc, "doc_id", "left").select(
        "source", "n_tokens", nrem.alias("nrem")
    )
    return joined.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("nrem").alias("n_removed"),
        F.sum((F.col("nrem") > 0).cast("long")).alias("n_docs_affected"),
    ).select(
        "source",
        "n_docs",
        "n_tokens",
        "n_removed",
        "n_docs_affected",
        F.when(
            F.col("n_tokens") > 0,
            F.col("n_removed").cast("double")
            / F.col("n_tokens").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("removal_rate"),
    )


_SUBDUP_APPLY_ORACLE = f"""
WITH {_SUBDUP_CTES},
sarr AS (
  SELECT doc_id,
         list({{'s': span_start, 'e': span_end}} ORDER BY span_start) AS sp,
         CAST(SUM(span_tokens) AS BIGINT) AS nrem
  FROM spans GROUP BY doc_id
)
SELECT w.doc_id,
       CAST(len(w.w) AS BIGINT) AS n_tokens,
       CAST(COALESCE(s.nrem, 0) AS BIGINT) AS n_removed,
       CAST(len(w.w) - COALESCE(s.nrem, 0) AS BIGINT) AS n_kept,
       COALESCE(array_to_string(
         CASE WHEN s.sp IS NULL THEN w.w
              ELSE list_filter(w.w, (x, i) ->
                     len(list_filter(s.sp,
                         p -> i BETWEEN p.s AND p.e)) = 0) END,
         ' '), '') AS cleaned_text
FROM words w LEFT JOIN sarr s USING (doc_id)
"""


@query("dedup_exact_substring_apply", _SUBDUP_APPLY_ORACLE, tags=("dedup",))
def dedup_exact_substring_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY half of exact substring dedup (Lee et al. 2022): take
    `dedup_exact_substring_spans`' removal list and emit the CLEANED
    corpus — every document (spanless docs included), with its covered
    tokens deleted, as (doc_id, n_tokens, n_removed, n_kept,
    cleaned_text).  cleaned_text is the whitespace re-join of the
    surviving lowercased tokens (the tokenization the whole text shelf
    uses), '' when a doc was removed entirely; n_removed is the exact
    covered-token count — the spans twin emits maximal DISJOINT
    intervals, so their span_tokens sum without double-counting and
    n_kept = n_tokens - n_removed needs no second pass over positions.

    Plan shape, the part worth copying at 100 TB: NO positional explode
    and NO range join — per-doc spans are collected into one small array
    (<= n_tokens/L entries per doc, disjoint intervals each >= L long),
    LEFT-joined back on doc_id alone (one aligned exchange; spanless docs
    pass through with the full text), and the deletion itself is a
    ROW-LOCAL indexed-lambda array filter: token i survives iff no span
    contains it, evaluated inside the row against the tiny span array.
    Both engines run the same indexed lambda (Spark filter's i is
    0-based, DuckDB list_filter's is 1-based — offset in the Spark
    expression), so cleaned_text hash-checks verbatim.  The reference
    has no dedup surface at all (SURVEY.md S2.b)."""
    (docs,) = T(spark, sf_dir, "documents")
    return _apply_spans(docs, dedup_exact_substring_spans(spark, sf_dir))


def _apply_spans(docs: DataFrame, spans: DataFrame) -> DataFrame:
    """Delete the covered tokens of ``spans`` from every document (plan
    in `dedup_exact_substring_apply`'s docstring): per-doc span-array
    collect (<= n_tokens/L disjoint entries), doc_id-aligned LEFT join,
    row-local indexed-lambda filter.  Shared by the corpus-dup apply and
    the decontamination apply — identical deletion, different span
    source."""
    sarr = spans.groupBy("doc_id").agg(
        F.expr(
            "array_sort(collect_list(struct(span_start AS s, span_end AS e)))"
        ).alias("sp"),
        F.sum("span_tokens").alias("nrem"),
    )
    words = docs.select(
        "doc_id",
        F.expr("filter(split(lower(text), ' '), x -> x <> '')").alias("w"),
    )
    nrem = F.coalesce(F.col("nrem"), F.lit(0).cast("long"))
    return words.join(sarr, "doc_id", "left").select(
        "doc_id",
        F.size("w").cast("long").alias("n_tokens"),
        nrem.alias("n_removed"),
        (F.size("w").cast("long") - nrem).alias("n_kept"),
        F.expr(
            "concat_ws(' ', CASE WHEN sp IS NULL THEN w ELSE"
            " filter(w, (x, i) -> NOT exists(sp,"
            " p -> i + 1 >= p.s AND i + 1 <= p.e)) END)"
        ).alias("cleaned_text"),
    )


# eval split predicate — the SAME deterministic ~1/20 slice
# decontaminate_eval_overlap uses (text_analysis._DECON_EVAL; duplicated
# rather than imported to keep the modules acyclic — pinned equal by
# test_decon_eval_split_predicates_agree)
_DECON_SUB_EVAL = "substr(md5(CAST(doc_id AS STRING)), 1, 2) <= '0c'"

_DECON_SUB_CTES = f"""tok AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '0c' AS is_eval
  FROM documents
),
grams AS (
  SELECT doc_id, is_eval, CAST(i AS BIGINT) AS pos,
         md5(array_to_string(w[i:i+{_SUBDUP_L}-1], ' ')) AS h
  FROM (SELECT doc_id, w, is_eval,
               UNNEST(generate_series(1, len(w) - {_SUBDUP_L} + 1)) AS i
        FROM tok WHERE len(w) >= {_SUBDUP_L})
),
eval_h AS (SELECT DISTINCT h FROM grams WHERE is_eval),
seeds AS (SELECT g.doc_id, g.pos
          FROM grams g JOIN eval_h USING (h) WHERE NOT g.is_eval),
clustered AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   <= {_SUBDUP_L} THEN 0 ELSE 1 END AS new_run
  FROM seeds
),
runs AS (
  SELECT doc_id, pos,
         SUM(new_run) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS grp
  FROM clustered
),
spans AS (
  SELECT doc_id,
         CAST(MIN(pos) AS BIGINT) AS span_start,
         CAST(MAX(pos) + {_SUBDUP_L} - 1 AS BIGINT) AS span_end,
         CAST(MAX(pos) - MIN(pos) + {_SUBDUP_L} AS BIGINT) AS span_tokens
  FROM runs GROUP BY doc_id, grp
)"""

_DECON_SUB_ORACLE = f"""
WITH {_DECON_SUB_CTES}
SELECT doc_id, span_start, span_end, span_tokens FROM spans
"""


@query(
    "decontaminate_substring_spans",
    _DECON_SUB_ORACLE,
    tags=("dedup", "text", "etl"),
)
def decontaminate_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPAN-LEVEL benchmark decontamination — the substring-dedup
    machinery (Lee et al. 2022) pointed at the eval set instead of the
    corpus: for every TRAINING document, the maximal token intervals
    covered by a verbatim >= L-token substring that also occurs in an
    EVAL document (the same deterministic md5(doc_id)-prefix eval slice
    `decontaminate_eval_overlap` screens against).  Where the 8-gram
    overlap query FLAGS contaminated docs for wholesale removal, this
    emits the surgical removal list — delete just the leaked passage,
    keep the doc — the remediation Lee et al. apply to benchmark leaks.
    Output rows are (doc_id, span_start, span_end, span_tokens) over
    training docs only, directly consumable by the
    `dedup_exact_substring_apply` deletion shape.

    Plan, and why it is LIGHTER than the corpus-dup spans query: the
    seed predicate needs no corpus-wide gram-count shuffle at all — the
    eval side is a benchmark corpus (megabytes at any training scale),
    so its distinct gram-hash set BROADCASTS, and training grams become
    seeds via a map-side broadcast-hash join (md5 computed BEFORE the
    probe; 20-word strings never leave the row).  The only exchange the
    training side pays is the per-doc window sort of the surviving seeds
    (contamination-bounded, tiny), then the shared gap-<=-L merge
    (`_gap_merge_spans` — identical clustering and maximality proof as
    `dedup_exact_substring_spans`, including its md5-collision caveat).
    Corpus-linear in the training side with ZERO training-side
    wide-shuffle: the 100 TB decontamination pass at the cost of a scan."""
    (docs,) = T(spark, sf_dir, "documents")
    L = _SUBDUP_L
    tok = docs.select(
        "doc_id",
        F.expr("filter(split(lower(text), ' '), x -> x <> '')").alias("w"),
        F.expr(_DECON_SUB_EVAL).alias("is_eval"),
    ).filter(F.size("w") >= L)
    grams = tok.select(
        "doc_id",
        "is_eval",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size(w) - {L} + 1),"
                f" i -> md5(concat_ws(' ', slice(w, i, {L}))))"
            )
        ).alias("p0", "h"),
    ).select("doc_id", "is_eval", (F.col("p0") + 1).cast("long").alias("pos"), "h")
    # eval gram-hash set: benchmark-sized, broadcast — the training side
    # is filtered map-side and never shuffles whole (same rationale as
    # decontaminate_eval_overlap's broadcast; no pre-distinct on the
    # training side either, the broadcast filter runs first)
    eval_h = grams.filter("is_eval").select("h").distinct()
    seeds = (
        grams.filter(~F.col("is_eval"))
        .join(F.broadcast(eval_h), "h")
        .select("doc_id", "pos")
    )
    return _gap_merge_spans(seeds, L)


_DECON_APPLY_ORACLE = f"""
WITH {_DECON_SUB_CTES},
sarr AS (
  SELECT doc_id,
         list({{'s': span_start, 'e': span_end}} ORDER BY span_start) AS sp,
         CAST(SUM(span_tokens) AS BIGINT) AS nrem
  FROM spans GROUP BY doc_id
),
train AS (SELECT doc_id, w FROM tok WHERE NOT is_eval)
SELECT t.doc_id,
       CAST(len(t.w) AS BIGINT) AS n_tokens,
       CAST(COALESCE(s.nrem, 0) AS BIGINT) AS n_removed,
       CAST(len(t.w) - COALESCE(s.nrem, 0) AS BIGINT) AS n_kept,
       COALESCE(array_to_string(
         CASE WHEN s.sp IS NULL THEN t.w
              ELSE list_filter(t.w, (x, i) ->
                     len(list_filter(s.sp,
                         p -> i BETWEEN p.s AND p.e)) = 0) END,
         ' '), '') AS cleaned_text
FROM train t LEFT JOIN sarr s USING (doc_id)
"""


_DECON_MH_ORACLE = f"""
WITH {_ORACLE_SHINGLES},
sig AS (SELECT doc_id, {_MINHASH_SIG_COLS_SQL} FROM sh GROUP BY doc_id),
bands AS ({_MINHASH_BANDS_SQL}),
ev AS (SELECT doc_id FROM documents
       WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '0c'),
cand AS (
  SELECT DISTINCT t.doc_id AS doc_id, e.doc_id AS eval_doc_id
  FROM bands t JOIN bands e ON t.band = e.band AND t.band_id = e.band_id
  WHERE t.doc_id NOT IN (SELECT doc_id FROM ev)
    AND e.doc_id IN (SELECT doc_id FROM ev)
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
verified AS (
  SELECT c.doc_id, c.eval_doc_id, COUNT(*) AS i
  FROM cand c JOIN sh x ON x.doc_id = c.doc_id
  JOIN sh y ON y.doc_id = c.eval_doc_id AND y.shingle = x.shingle
  GROUP BY c.doc_id, c.eval_doc_id
)
SELECT v.doc_id, v.eval_doc_id,
       CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
FROM verified v
JOIN sizes sa ON sa.doc_id = v.doc_id
JOIN sizes sb ON sb.doc_id = v.eval_doc_id
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {_NGRAM_THRESHOLD}
"""


@query(
    "decontaminate_minhash_lsh",
    _DECON_MH_ORACLE,
    tags=("dedup", "text", "etl"),
)
def decontaminate_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY benchmark decontamination — the MinHash-LSH near-dup
    machinery pointed at the eval set, completing the decontamination
    family's third space: `decontaminate_eval_overlap` catches exact
    8-gram leaks, `decontaminate_substring_spans` exact >= L-token
    passages, and this catches PARAPHRASED / lightly-edited eval
    contamination that exact matching misses (the near-dup screening
    production corpora run against benchmarks — token-level edits break
    every exact gram but leave Jaccard high).  Output: each (training
    doc, eval doc) pair banded together and VERIFIED at exact Jaccard
    >= {_NGRAM_THRESHOLD} — the removal list plus its evidence.

    Plan: signatures are the standard one-groupBy MinHash pass over the
    WHOLE corpus (the cost a dedup pipeline already pays; a production
    system reuses the same signature table for both jobs).  From there
    the eval side — benchmark-sized — BROADCASTS (band digests + sorted
    xxhash64 shingle arrays + sizes), and the training side probes it
    MAP-SIDE per band with first-match banding (band b kept only when
    every earlier band digest differs — no distinct shuffle), verifying
    exact Jaccard in-row via `size(array_intersect(...))` against the
    broadcast eval array (the record-carrying verification move from
    `dedup_minhash_lsh`).  ZERO training-side self-join and zero
    verify shuffle: candidates never leave their map task.  Same
    xxhash64-collision caveat as the parent (oracle verifies on string
    shingles; ~1e-8 at 1e9 shingles).  Recall is the LSH band curve
    (~0.94 at s = 0.8, eval'd by `dedup_lsh_recall_eval`)."""
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
    dig = sig.select(
        "doc_id",
        "sh_arr",
        "n",
        *[
            F.md5(F.concat(*[F.col(f"h{j}") for j in band])).alias(f"d{bi}")
            for bi, band in enumerate(_BANDS)
        ],
        F.expr(_DECON_SUB_EVAL).alias("is_eval"),
    )
    ev = dig.filter("is_eval").select(
        F.col("doc_id").alias("eval_doc_id"),
        F.col("sh_arr").alias("e_arr"),
        F.col("n").alias("e_n"),
        *[F.col(f"d{bi}").alias(f"e_d{bi}") for bi in range(len(_BANDS))],
    )
    tr = dig.filter(~F.col("is_eval"))
    matched = None
    for bi in range(len(_BANDS)):
        cond = F.col(f"d{bi}") == F.col(f"e_d{bi}")
        for pj in range(bi):  # first-match banding, map-side
            cond = cond & (F.col(f"d{pj}") != F.col(f"e_d{pj}"))
        m = tr.join(F.broadcast(ev), cond)
        matched = m if matched is None else matched.unionAll(m)
    withi = matched.withColumn(
        "i", F.expr("size(array_intersect(sh_arr, e_arr))").cast("long")
    )
    return (
        withi.withColumn(
            "jaccard",
            F.col("i").cast("double")
            / (F.col("n") + F.col("e_n") - F.col("i")),
        )
        .filter(F.col("jaccard") >= _NGRAM_THRESHOLD)
        .select("doc_id", "eval_doc_id", "jaccard")
    )


decontaminate_minhash_lsh.__doc__ = decontaminate_minhash_lsh.__doc__.replace(
    "{_NGRAM_THRESHOLD}", str(_NGRAM_THRESHOLD)
)


_LEAK_REPORT_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '0c' AS is_eval
  FROM documents
),
grams AS (
  SELECT doc_id, is_eval, md5(array_to_string(w[i:i+{_SUBDUP_L}-1], ' ')) AS h
  FROM (SELECT doc_id, w, is_eval,
               UNNEST(generate_series(1, len(w) - {_SUBDUP_L} + 1)) AS i
        FROM tok WHERE len(w) >= {_SUBDUP_L})
),
eg AS (SELECT DISTINCT doc_id, h FROM grams WHERE is_eval),
hits AS (
  SELECT DISTINCT g.h, g.doc_id AS train_doc
  FROM grams g JOIN (SELECT DISTINCT h FROM eg) e USING (h)
  WHERE NOT g.is_eval
),
per_doc AS (
  SELECT e.doc_id,
         CAST(COUNT(DISTINCT CASE WHEN t.train_doc IS NOT NULL THEN e.h END)
              AS BIGINT) AS n_leaked_grams,
         CAST(COUNT(DISTINCT t.train_doc) AS BIGINT) AS n_training_docs
  FROM eg e LEFT JOIN hits t USING (h)
  GROUP BY e.doc_id
),
sizes AS (SELECT doc_id, CAST(COUNT(DISTINCT h) AS BIGINT) AS n_grams FROM eg GROUP BY doc_id)
SELECT s.doc_id, s.n_grams, p.n_leaked_grams, p.n_training_docs
FROM sizes s JOIN per_doc p USING (doc_id)
WHERE p.n_leaked_grams > 0
"""


@query(
    "decontaminate_leak_report",
    _LEAK_REPORT_ORACLE,
    tags=("dedup", "text", "etl"),
)
def decontaminate_leak_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BENCHMARK-OWNER view of span-level decontamination — the
    reverse rollup of `decontaminate_substring_spans`: for every LEAKED
    eval document, its distinct-L-gram count, how many of those grams
    occur verbatim in the training corpus, and how many distinct
    training documents carry them.  This is the report an eval maintainer
    publishes (GPT-3 appendix C / PaLM contamination tables: per-benchmark
    "% examples leaked, n overlapping documents"), and the number that
    decides whether a benchmark score survives the leak or the benchmark
    needs a clean split.

    Plan: the eval side is benchmark-sized, so its distinct (doc, gram)
    set and gram-hash set both BROADCAST; training grams probe the hash
    set MAP-SIDE (md5 pre-probe, same as the spans twin) and only the
    contamination-bounded hit set (distinct (gram, train_doc)) reaches an
    aggregation — keyed by gram hash, then joined back to the broadcast
    eval grams and rolled up per eval doc.  The training corpus is
    scanned once and never wide-shuffled; every aggregation state is
    bounded by eval size x contamination, not corpus size."""
    (docs,) = T(spark, sf_dir, "documents")
    L = _SUBDUP_L
    tok = docs.select(
        "doc_id",
        F.expr("filter(split(lower(text), ' '), x -> x <> '')").alias("w"),
        F.expr(_DECON_SUB_EVAL).alias("is_eval"),
    ).filter(F.size("w") >= L)
    grams = tok.select(
        "doc_id",
        "is_eval",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(w) - {L} + 1),"
                f" i -> md5(concat_ws(' ', slice(w, i, {L}))))"
            )
        ).alias("h"),
    )
    eg = grams.filter("is_eval").select("doc_id", "h").distinct()
    eval_h = eg.select("h").distinct()
    hits = (
        grams.filter(~F.col("is_eval"))
        .join(F.broadcast(eval_h), "h")
        .select("h", F.col("doc_id").alias("train_doc"))
        .distinct()
    )
    per_doc = (
        eg.join(hits, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count_distinct(
                F.when(F.col("train_doc").isNotNull(), F.col("h"))
            ).alias("n_leaked_grams"),
            F.count_distinct("train_doc").alias("n_training_docs"),
        )
    )
    sizes = eg.groupBy("doc_id").agg(F.count_distinct("h").alias("n_grams"))
    return (
        sizes.join(per_doc, "doc_id")
        .filter(F.col("n_leaked_grams") > 0)
        .select("doc_id", "n_grams", "n_leaked_grams", "n_training_docs")
    )


@query(
    "decontaminate_substring_apply",
    _DECON_APPLY_ORACLE,
    tags=("dedup", "text", "etl"),
)
def decontaminate_substring_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY half of span-level decontamination: emit the CLEANED
    TRAINING corpus — every training document (eval docs are not part of
    the output; they are the benchmark being protected), with the leaked
    >= L-token passages from `decontaminate_substring_spans` deleted —
    (doc_id, n_tokens, n_removed, n_kept, cleaned_text).  The surgical
    remediation Lee et al. 2022 apply to benchmark leaks: keep the doc,
    excise the passage — versus `decontaminate_eval_overlap`'s
    flag-for-wholesale-removal rule.

    Plan: the decontamination spans pipeline (broadcast eval-gram probe,
    zero training-side wide shuffle) feeding the SAME row-local deletion
    as `dedup_exact_substring_apply` (`_apply_spans`: per-doc span-array
    collect, one doc_id-aligned left join, indexed-lambda array filter —
    no positional explode, no range join).  Both engines run the
    identical lambda (0- vs 1-based index offset handled), so
    cleaned_text hash-checks verbatim; spanless and sub-L docs pass
    through whole, fully-leaked docs emit '' with n_kept 0."""
    (docs,) = T(spark, sf_dir, "documents")
    train = docs.filter(~F.expr(_DECON_SUB_EVAL))
    return _apply_spans(train, decontaminate_substring_spans(spark, sf_dir))


_TOPDUP_K = 20

_TOPDUP_ORACLE = f"""
WITH words AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
  FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(w[i:i+{_SUBDUP_L}-1], ' ') AS g
  FROM (SELECT doc_id, w, UNNEST(generate_series(1, len(w) - {_SUBDUP_L} + 1)) AS i
        FROM words WHERE len(w) >= {_SUBDUP_L})
),
counted AS (
  SELECT md5(g) AS h,
         CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(MIN(doc_id) AS BIGINT) AS example_doc_id,
         MIN(g) AS gram_text
  FROM grams GROUP BY md5(g) HAVING COUNT(*) >= 2
)
SELECT h, n_occurrences, n_docs, example_doc_id, gram_text
FROM counted
ORDER BY n_occurrences DESC, h
LIMIT {_TOPDUP_K}
"""


@query("substring_top_duplicated", _TOPDUP_ORACLE, tags=("dedup", "agg"))
def substring_top_duplicated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MOST-DUPLICATED-passages report — Lee et al. 2022's Table 1
    move (they print the most-frequent duplicated substrings to show
    WHAT the corpus repeats: licenses, boilerplate, templated spam): the
    top-{_TOPDUP_K} duplicated L-grams by occurrence count, each with
    its occurrence count, distinct-doc count, a deterministic example
    doc, and the verbatim gram text.  The eyeball-check a data lead runs
    before trusting any removal rate, and the artifact a crawl-source
    audit attaches.

    Determinism at the boundary: ties in n_occurrences are broken by the
    gram hash (ORDER BY count DESC, h in both engines), so the top-k SET
    is engine-independent; example_doc_id is MIN(doc_id) and gram_text
    MIN(g) per hash (all occurrences of a gram share the text — MIN is
    just the engine-neutral pick), so every output value hash-checks.

    Scale shape — TWO corpus scans, and that is the point: a single-pass
    groupBy(h) carrying MIN(gram_text) would ship one 20-word string per
    distinct gram per partition through the exchange (partial aggregates
    buffer the MIN before the HAVING can drop anything) — the exact
    string shuffle the whole substring family exists to avoid.  Instead:
    pass 1 is a pure COUNT groupBy on the 32-hex md5 (map-side
    combinable, strings never leave the row) + orderBy().limit() =
    TakeOrderedAndProject for the k winning hashes; pass 2 re-scans the
    corpus (recomputing the explode — scan-bound, the cheap currency at
    100 TB), probes the BROADCAST k-hash set map-side, and only the
    surviving occurrences (k grams x their df) carry text/doc_id into a
    k-group agg — where n_docs and example_doc_id come exactly, since
    every occurrence of a winning gram is present.  Corpus-linear, one
    narrow count shuffle + one broadcast probe."""
    (docs,) = T(spark, sf_dir, "documents")
    L = _SUBDUP_L
    words = docs.select(
        "doc_id",
        F.expr("filter(split(lower(text), ' '), x -> x <> '')").alias("w"),
    ).filter(F.size("w") >= L)
    grams = words.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(w) - {L} + 1),"
                f" i -> concat_ws(' ', slice(w, i, {L})))"
            )
        ).alias("g"),
    ).select("doc_id", "g", F.md5("g").alias("h"))
    topk = (
        grams.groupBy("h")
        .agg(F.count("*").alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= 2)
        .orderBy(F.desc("n_occurrences"), "h")
        .limit(_TOPDUP_K)
    )
    return (
        grams.join(F.broadcast(topk), "h")
        .groupBy("h", "n_occurrences")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("example_doc_id"),
            F.min("g").alias("gram_text"),
        )
        .select("h", "n_occurrences", "n_docs", "example_doc_id", "gram_text")
    )


substring_top_duplicated.__doc__ = substring_top_duplicated.__doc__.replace(
    "{_TOPDUP_K}", str(_TOPDUP_K)
)


# interpolate docstring constants (round-11 sweep)
dedup_sorted_neighborhood.__doc__ = dedup_sorted_neighborhood.__doc__.replace(
    "{_SNM_W}", str(_SNM_W)
)
dedup_containment_pairs.__doc__ = dedup_containment_pairs.__doc__.replace(
    "{_CONTAIN_T}", str(_CONTAIN_T)
)
