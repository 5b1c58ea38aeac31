"""Typed readers and scale-aware writers."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_text_dir(spark: SparkSession, input_dir: str) -> DataFrame:
    """Line-oriented text directory → DataFrame[value: string].

    The reference's dataset model (`manager/__main__.py:224`,
    `worker/__main__.py:104`), upgraded: Spark splits large files by byte
    range (the reference only splits at file granularity, SURVEY.md §2.a
    op #2) and handles compression/globs natively."""
    return spark.read.text(input_dir)


def write_text_parts(df: DataFrame, output_dir: str) -> None:
    """Overwrite-mode text part-files — the reference's sink contract
    (`worker/__main__.py:204-208`, overwrite at `manager/__main__.py:95-101`)."""
    df.write.mode("overwrite").text(output_dir)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    """CSV with an explicit schema — no inference pass over the data (at
    100 TB an inference scan is a full extra read of the dataset)."""
    return spark.read.schema(schema).option("header", header).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-lines with an explicit schema; malformed rows go to the
    PERMISSIVE corrupt-record column rather than failing the job."""
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (native Spark reader): columnar with embedded schema and
    min/max stripe statistics, so predicate pushdown and column pruning
    work exactly as on parquet."""
    return spark.read.orc(path)


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    sort_within: list[str] | None = None,
) -> None:
    """Partition-pruned, optionally run-length-friendly parquet layout.

    ``partition_by`` columns become directory partitions (readers with
    matching predicates skip whole directories — the coarse pruning level
    above row-group stats).  ``sort_within`` clusters rows inside each file
    so min/max row-group stats become selective for those columns."""
    if sort_within:
        df = df.sortWithinPartitions(*sort_within)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
