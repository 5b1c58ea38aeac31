"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with typed
metadata, processed by Arrow-batched Pandas UDFs (`mapInPandas`) — the only
place Python belongs in the hot path, and only because codec libraries are
Python-side.  The actual codecs are NOT in this container, so decode is a
clearly-marked deterministic fake (see `operators/multimodal.py`); the
Spark-side plumbing — binary schema, batch iteration, UDF signature,
partition-preserving shape — is real and oracle-checked.

The reference is strings-only (SURVEY.md §1.2); binary columns are
north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce485_spark.operators.multimodal import fake_decode_image_meta
from map_reduce485_spark.queries import query
from map_reduce485_spark.queries._util import T


@query(
    "multimodal_bytes",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS payload_sha256,
           octet_length(encode(text)) % 16 AS shard_bucket
    FROM documents
    """,
    tags=("multimodal",),
)
def multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: treat content as opaque bytes; compute size,
    content digest, and a shard bucket (how a 100 TB pipeline routes blobs
    to co-located storage partitions) — all JVM-side."""
    (docs,) = T(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.octet_length(blob).alias("n_bytes"),
        F.sha2(blob, 256).alias("payload_sha256"),
        (F.octet_length(blob) % 16).alias("shard_bucket"),
    )


@query(
    "multimodal_decode_stub",
    """
    SELECT doc_id,
           octet_length(encode(text)) % 640 + 1 AS width,
           (octet_length(encode(text)) * 7) % 480 + 1 AS height,
           (octet_length(encode(text)) % 640 + 1) * ((octet_length(encode(text)) * 7) % 480 + 1)
             AS n_pixels,
           'RGB' AS mode
    FROM documents
    """,
    tags=("multimodal",),
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-decode pipeline over `mapInPandas`: binary in → typed metadata
    out, Arrow batches end to end.  The decode itself is the deterministic
    stub from `operators.multimodal` (real codec absent in this
    environment); the oracle replays the stub's arithmetic, so the whole
    Spark plumbing path — schema, batching, UDF signature — is verified."""
    (docs,) = T(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    return payloads.mapInPandas(
        fake_decode_image_meta,
        schema="doc_id bigint, width bigint, height bigint, n_pixels bigint, mode string",
    )


@query(
    "multimodal_resize_stub",
    """
    SELECT doc_id, 8 AS width, 8 AS height,
           LEAST(octet_length(encode(text)), 64) AS n_bytes_out,
           sha256(substr(hex(encode(text)), 1, 128)) AS resized_sha256
    FROM documents WHERE length(text) > 0
    """,
    tags=("multimodal",),
)
def multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize pipeline over `mapInPandas`: binary in → resized binary
    metadata + content digest out.  The 'resampling' is the deterministic
    truncation fake (`operators.multimodal.fake_resize_image`); the oracle
    replays it byte-exactly for any payload — both sides digest the hex of
    the first 64 BYTES (128 hex chars), so multi-byte UTF-8 cannot diverge
    a char-slice from a byte-slice."""
    from map_reduce485_spark.operators.multimodal import fake_resize_image

    (docs,) = T(spark, sf_dir, "documents")
    payloads = docs.filter(F.length("text") > 0).select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return payloads.mapInPandas(
        fake_resize_image,
        schema="doc_id bigint, width int, height int, n_bytes_out bigint, resized_sha256 string",
    )


@query(
    "multimodal_frame_sample",
    """
    WITH d AS (SELECT doc_id, hex(encode(text)) AS h,
                      octet_length(encode(text)) AS n FROM documents)
    SELECT doc_id, i AS frame_no,
           substr(h, CAST(i * 128 + 1 AS BIGINT), 32) AS frame_hex
    FROM d, UNNEST(generate_series(0, (n - 16) // 64)) AS u(i)
    WHERE n >= 16
    """,
    tags=("multimodal",),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling pipeline over `mapInPandas` with 1→N fan-out:
    each payload yields one row per sampled 'frame' (16-byte slice every 64
    bytes — the stub for decode-and-keep-every-Nth-frame).  Exercises the
    row-multiplying UDF contract a real sampler needs.  The oracle slices
    the payload's hex string (2 chars per byte), so frame boundaries are
    byte-positions on both engines regardless of UTF-8 content."""
    from map_reduce485_spark.operators.multimodal import fake_frame_sample

    (docs,) = T(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    return payloads.mapInPandas(
        fake_frame_sample, schema="doc_id bigint, frame_no bigint, frame_hex string"
    )


@query(
    "multimodal_audio_features",
    """
    WITH bytes AS (
      SELECT doc_id, ('0x' || substr(hex(encode(text)), 2 * i - 1, 2))::INT AS b
      FROM documents, UNNEST(generate_series(1, octet_length(encode(text)))) AS u(i)
      WHERE length(text) > 0
    )
    SELECT doc_id, COUNT(*) AS n_samples,
           COUNT(*) / 16000.0 AS duration_s,
           sqrt(SUM(b * b) / COUNT(*)) AS rms
    FROM bytes GROUP BY doc_id
    """,
    tags=("multimodal",),
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature-extraction pipeline over `mapInPandas`: payload bytes as
    u8 samples → (count, duration@16kHz, RMS).  RMS uses an exact integer
    sum of squares, so Spark-side numpy and the oracle's SQL aggregation
    agree bit-for-bit.  The oracle reads actual BYTE values out of the
    payload's hex string (was: `unicode()` per character, which diverges
    from bytes on any multi-byte UTF-8 character)."""
    from map_reduce485_spark.operators.multimodal import fake_audio_features

    (docs,) = T(spark, sf_dir, "documents")
    payloads = docs.filter(F.length("text") > 0).select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return payloads.mapInPandas(
        fake_audio_features,
        schema="doc_id bigint, n_samples bigint, duration_s double, rms double",
    )


@query(
    "multimodal_byte_histogram",
    """
    WITH p AS (
      SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
      FROM documents WHERE octet_length(encode(text)) > 0
    ),
    nib AS (
      SELECT doc_id, n,
             strpos('0123456789ABCDEF', substr(hx, 2 * i - 1, 1)) - 1 AS bucket
      FROM (SELECT doc_id, hx, n, UNNEST(generate_series(1, n)) AS i FROM p)
    )
    SELECT doc_id, bucket, COUNT(*) AS n_in_bucket,
           CAST(COUNT(*) AS DOUBLE) / n AS pct
    FROM nib GROUP BY doc_id, bucket, n
    """,
    tags=("multimodal",),
)
def multimodal_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level content histogram over binary payloads — the one
    multimodal feature extractor whose MATH is real, not a deterministic
    fake: a 16-bucket (high-nibble) histogram per payload, computed with
    numpy `frombuffer` + one batched `bincount` inside `mapInPandas`.

    This is the Arrow-batched shape every real extractor here would use
    (same signature as the decode stubs), proven on actual content math:
    the oracle re-derives each byte's high nibble from the hex expansion in
    SQL, so counts AND the pct division hash-match exactly.  At 100 TB the
    plan is a single map-side pass — no shuffle until the (tiny) result
    aggregation, payload bytes never leave the executor."""
    from map_reduce485_spark.operators.multimodal import byte_histogram

    (docs,) = T(spark, sf_dir, "documents")
    payloads = (
        docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
        .filter(F.octet_length("payload") > 0)
    )
    return payloads.mapInPandas(
        byte_histogram,
        schema="doc_id bigint, bucket int, n_in_bucket bigint, pct double",
    )


@query(
    "multimodal_audio_rms",
    """
    WITH p AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) // 2 AS n_samples
      FROM documents WHERE octet_length(encode(text)) >= 2
    ),
    sm AS (
      SELECT doc_id, n_samples,
             (strpos('0123456789ABCDEF', substr(hx, 4 * i - 3, 1)) - 1) * 16
               + strpos('0123456789ABCDEF', substr(hx, 4 * i - 2, 1)) - 1
               + 256 * ((strpos('0123456789ABCDEF', substr(hx, 4 * i - 1, 1)) - 1) * 16
                        + strpos('0123456789ABCDEF', substr(hx, 4 * i, 1)) - 1)
               AS raw
      FROM (SELECT doc_id, hx, n_samples, UNNEST(generate_series(1, n_samples)) AS i
            FROM p)
    ),
    v AS (
      SELECT doc_id, n_samples,
             CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS s
      FROM sm
    )
    SELECT doc_id, n_samples,
           CAST(SUM(s * s) AS BIGINT) AS sum_squares,
           CAST(MAX(ABS(s)) AS BIGINT) AS peak,
           sqrt(CAST(CAST(SUM(s * s) AS BIGINT) AS DOUBLE) / n_samples) AS rms
    FROM v GROUP BY doc_id, n_samples
    """,
    tags=("multimodal",),
)
def multimodal_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio loudness features with REAL DSP math (the second genuine-math
    extractor after `multimodal_byte_histogram`): payload bytes as
    little-endian int16 PCM, per-payload sample count / exact square sum /
    peak / RMS via numpy inside `mapInPandas`.  The oracle re-derives each
    sample from the hex expansion (lo + 256*hi, two's complement), so the
    integer features match exactly and RMS — two correctly-rounded IEEE
    ops over exact integers — hash-matches as a double.  Swapping the PCM
    interpretation for a real decoder changes one function body."""
    from map_reduce485_spark.operators.multimodal import audio_rms_features

    (docs,) = T(spark, sf_dir, "documents")
    payloads = (
        docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
        .filter(F.octet_length("payload") >= 2)
    )
    return payloads.mapInPandas(
        audio_rms_features,
        schema="doc_id bigint, n_samples bigint, sum_squares bigint,"
        " peak bigint, rms double",
    )


_AHASH_CTES = """
p AS (
  SELECT doc_id, hex(encode(text)) AS hx
  FROM documents WHERE octet_length(encode(text)) >= 64
),
px AS (
  SELECT doc_id, j,
         (strpos('0123456789ABCDEF', substr(hx, 2 * j - 1, 1)) - 1) * 16
           + strpos('0123456789ABCDEF', substr(hx, 2 * j, 1)) - 1 AS b
  FROM (SELECT doc_id, hx, UNNEST(generate_series(1, 64)) AS j FROM p)
),
sums AS (
  SELECT doc_id, CAST(SUM(b) AS BIGINT) AS sum64 FROM px GROUP BY doc_id
),
hashes AS (
  SELECT px.doc_id, s.sum64,
         CAST(SUM(CASE WHEN j <= 32 AND b * 64 > s.sum64
                       THEN CAST(1 AS BIGINT) << (31 - (j - 1))
                       ELSE 0 END) AS BIGINT) AS hash_hi,
         CAST(SUM(CASE WHEN j > 32 AND b * 64 > s.sum64
                       THEN CAST(1 AS BIGINT) << (31 - (j - 33))
                       ELSE 0 END) AS BIGINT) AS hash_lo
  FROM px JOIN sums s ON s.doc_id = px.doc_id
  GROUP BY px.doc_id, s.sum64
)"""


@query(
    "multimodal_image_ahash",
    f"WITH {_AHASH_CTES}\nSELECT doc_id, sum64, hash_hi, hash_lo FROM hashes",
    tags=("multimodal",),
)
def multimodal_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash over binary payloads — REAL vectorized hash
    math (the third genuine-math multimodal extractor beside the byte
    histogram and PCM RMS): the payload's first 64 bytes read as an 8x8
    grayscale tile, each bit = pixel strictly brighter than the tile mean,
    packed into two int32-range halves.  The brightness test stays in
    integers (byte*64 > sum64), so engines can't disagree by a rounding
    ulp; the oracle replays the identical bit math from the hex expansion
    in SQL.

    On real images aHash is the cheap near-dup screen (robust to resize /
    re-encode); here the tile comes straight from payload bytes, which
    preserves the property that BYTE-identical content gets identical
    hashes — what `multimodal_ahash_dup_groups` exploits.  Scale: pure
    map-side `mapInPandas` (one gather + one comparison matrix per Arrow
    batch), no shuffle at all."""
    from map_reduce485_spark.operators.multimodal import image_ahash

    (docs,) = T(spark, sf_dir, "documents")
    payloads = (
        docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
        .filter(F.octet_length("payload") >= 64)
    )
    return payloads.mapInPandas(
        image_ahash,
        schema="doc_id bigint, sum64 bigint, hash_hi bigint, hash_lo bigint",
    )


@query(
    "multimodal_ahash_dup_groups",
    f"""WITH {_AHASH_CTES}
SELECT hash_hi, hash_lo, CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS keep_doc, MAX(doc_id) AS last_doc
FROM hashes GROUP BY hash_hi, hash_lo HAVING COUNT(*) > 1""",
    tags=("multimodal", "dedup"),
)
def multimodal_ahash_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup screening on the perceptual hash: bucket payloads by their
    64-bit aHash and keep buckets with > 1 member — the multimodal twin of
    `dedup_exact` (which buckets by full-content digest).  With a real
    image decoder in front this catches re-encoded/resized duplicates that
    byte-level digests miss; the grouping, survivor policy (min doc_id),
    and counts are engine-exact either way.  Scale: the shuffle carries
    16-byte hash pairs, never payloads — same contract as the content-
    digest dedup."""
    ah = multimodal_image_ahash(spark, sf_dir)
    return (
        ah.groupBy("hash_hi", "hash_lo")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keep_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )


_FRAME_CUT_ORACLE = """
WITH p AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
  FROM documents WHERE octet_length(encode(text)) >= 32
),
byt AS (
  SELECT doc_id,
         (i - 1) // 32 AS frame_idx,
         (strpos('0123456789ABCDEF', substr(hx, 2 * i - 1, 1)) - 1) * 16
           + strpos('0123456789ABCDEF', substr(hx, 2 * i, 1)) - 1 AS b
  FROM (SELECT doc_id, hx, n, UNNEST(generate_series(1, (n // 32) * 32)) AS i FROM p)
),
frames AS (
  SELECT doc_id, frame_idx, CAST(SUM(b) AS BIGINT) AS brightness
  FROM byt GROUP BY doc_id, frame_idx
),
d AS (
  SELECT doc_id, frame_idx, brightness,
         COALESCE(brightness - LAG(brightness) OVER (
           PARTITION BY doc_id ORDER BY frame_idx), 0) AS delta
  FROM frames
)
SELECT doc_id, frame_idx, brightness, delta,
       CAST(abs(delta) > 192 AS INT) AS is_cut
FROM d
"""


@query("multimodal_frame_delta_cuts", _FRAME_CUT_ORACLE, tags=("multimodal",))
def multimodal_frame_delta_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over frame sequences — the fourth REAL-math
    multimodal extractor (after byte histogram, PCM RMS, aHash): fixed
    32-byte frames, exact integer per-frame brightness, frame-over-frame
    delta, cut flag at |delta| > 192 (≈ the 94th percentile of deltas on
    this corpus, so both classes are populated).  All per-frame math runs
    vectorized in one Arrow batch pass (`operators/multimodal.py::
    frame_delta_cuts`); nothing is collected and the shuffle never carries
    payload bytes — only (doc_id, frame) feature rows, exactly what a real
    video shot-boundary pass emits per decoded frame at any scale."""
    from map_reduce485_spark.operators.multimodal import frame_delta_cuts

    (docs,) = T(spark, sf_dir, "documents")
    payloads = (
        docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
        .filter(F.octet_length("payload") >= 32)
    )
    return payloads.mapInPandas(
        frame_delta_cuts,
        schema="doc_id bigint, frame_idx bigint, brightness bigint, delta bigint, is_cut int",
    )


_TILE_ORACLE = """
WITH p AS (
  SELECT doc_id, hex(encode(text)) AS hx
  FROM documents WHERE octet_length(encode(text)) >= 256
),
byt AS (
  SELECT doc_id,
         ((i - 1) // 16) // 4 AS tile_row,
         ((i - 1) % 16) // 4 AS tile_col,
         (strpos('0123456789ABCDEF', substr(hx, 2 * i - 1, 1)) - 1) * 16
           + strpos('0123456789ABCDEF', substr(hx, 2 * i, 1)) - 1 AS b
  FROM (SELECT doc_id, hx, UNNEST(generate_series(1, 256)) AS i FROM p)
)
SELECT doc_id, tile_row, tile_col,
       CAST(SUM(b) AS BIGINT) AS tile_sum,
       CAST(SUM(b) AS DOUBLE) / 16 AS tile_mean
FROM byt GROUP BY doc_id, tile_row, tile_col
"""


@query("multimodal_tile_means", _TILE_ORACLE, tags=("multimodal",))
def multimodal_tile_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average-pooled tile grid — the fifth REAL-math multimodal extractor
    (histogram, RMS, aHash, scene cuts, now spatial pooling): each
    payload's leading 16×16 bytes pooled to a 4×4 grid of exact integer
    tile sums + one division per tile (`operators/multimodal.py::
    tile_mean_pool`, a single vectorized gather-reshape-sum).  This is
    the thumbnail/patch-grid step the `multimodal_resize_stub` fakes for
    lack of a codec, done with real arithmetic on the bytes we do have.
    Map-side only; the 16-rows-per-doc feature output is what shuffles,
    never payloads."""
    from map_reduce485_spark.operators.multimodal import tile_mean_pool

    (docs,) = T(spark, sf_dir, "documents")
    payloads = (
        docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
        .filter(F.octet_length("payload") >= 256)
    )
    return payloads.mapInPandas(
        tile_mean_pool,
        schema="doc_id bigint, tile_row int, tile_col int, tile_sum bigint, tile_mean double",
    )


def _silence_oracle() -> str:
    from map_reduce485_spark.operators.multimodal import (
        _SILENCE_MIN_RUN,
        _SILENCE_THRESHOLD,
    )

    return f"""
WITH p AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) // 2 AS n
  FROM documents WHERE octet_length(encode(text)) >= 2
),
sm AS (
  SELECT doc_id, i,
         ((strpos('0123456789ABCDEF', substr(hx, 4*i - 3, 1)) - 1) * 16
           + strpos('0123456789ABCDEF', substr(hx, 4*i - 2, 1)) - 1)
         + 256 * ((strpos('0123456789ABCDEF', substr(hx, 4*i - 1, 1)) - 1) * 16
           + strpos('0123456789ABCDEF', substr(hx, 4*i, 1)) - 1) AS raw
  FROM (SELECT doc_id, hx, UNNEST(generate_series(1, n)) AS i FROM p)
),
sv AS (
  SELECT doc_id, i, raw - CASE WHEN raw >= 32768 THEN 65536 ELSE 0 END AS s
  FROM sm
),
silent AS (
  SELECT doc_id, i, i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS grp
  FROM sv WHERE abs(s) < {_SILENCE_THRESHOLD}
),
spans AS (
  SELECT doc_id, grp, CAST(COUNT(*) AS BIGINT) AS len
  FROM silent GROUP BY doc_id, grp
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(len) AS BIGINT) AS silent_samples,
       CAST(MAX(len) AS BIGINT) AS longest_span
FROM spans WHERE len >= {_SILENCE_MIN_RUN} GROUP BY doc_id
"""


@query("multimodal_audio_silence", _silence_oracle(), tags=("multimodal",))
def multimodal_audio_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence-span detection over PCM payloads — the VAD (voice-activity
    detection) primitive an audio pipeline runs before transcription or
    segmentation: maximal runs of consecutive low-amplitude int16 samples,
    reported per payload as span count / silent-sample total / longest
    span (all exact integers).  The numpy run-length logic lives in
    `operators/multimodal.audio_silence_spans`; the oracle re-derives
    every sample from the hex expansion and replays the runs as a
    gaps-and-islands grouping, so the span arithmetic is value-checked
    end to end.  Map-side only — payloads never shuffle; the 4-column
    feature row is the entire output."""
    from map_reduce485_spark.operators.multimodal import audio_silence_spans

    (docs,) = T(spark, sf_dir, "documents")
    payloads = (
        docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
        .filter(F.octet_length("payload") >= 2)
    )
    return payloads.mapInPandas(
        audio_silence_spans,
        schema="doc_id bigint, n_spans bigint, silent_samples bigint,"
        " longest_span bigint",
    )
