"""Small-file compaction: rewrite a directory to size-targeted files.

The 100 TB hygiene problem: streaming sinks, CDC merges, and
over-partitioned shuffles leave behind directories of thousands of tiny
files; every downstream scan then pays per-file open/footer/seek overhead
and the driver pays listing cost, so scan throughput collapses long before
data size does.  The fix is periodic compaction — rewrite each directory
into files near a target size (the same maintenance op Delta/Iceberg call
OPTIMIZE / rewrite_data_files; plain-parquet Spark has no built-in, so the
engine provides one).

Sizing goes through the Hadoop FileSystem API (works for file://, HDFS,
S3A alike — not a local-only os.walk), and the rewrite is one
`repartition(n)` round-robin shuffle: n is computed from the actual byte
size, so output files land near the target regardless of how skewed the
input file sizes were.  Pass ``sort_cols`` to fold clustering into the
same pass (compaction + re-sort = one shuffle, not two jobs).

The reference's output layout is fixed at one file per reduce task
(`worker/__main__.py:193,204-208` — R files, whatever their size); size-
targeted layout is part of the engine's scale mandate, not parity.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def dir_bytes(spark: SparkSession, path: str) -> int:
    """Total data bytes under ``path`` via the Hadoop FileSystem API."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(hpath).getLength()


def compact(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    target_mb: int = 128,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Rewrite the parquet directory ``in_dir`` into ``out_dir`` as files
    of ~``target_mb`` each; returns the compacted DataFrame (lazily re-read
    from ``out_dir``).  With ``sort_cols``, clusters rows in the same pass
    (repartitionByRange + sortWithinPartitions instead of round-robin)."""
    n = max(1, math.ceil(dir_bytes(spark, in_dir) / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(in_dir)
    if sort_cols:
        df = df.repartitionByRange(n, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        df = df.repartition(n)
    df.write.mode("overwrite").parquet(out_dir)
    return spark.read.parquet(out_dir)
