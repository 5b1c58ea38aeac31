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
