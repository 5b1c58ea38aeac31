"""Typed-table catalog over the driver's Parquet testdata.

The reference's only source is a directory of text files
(``manager/__main__.py:224``, ``worker/__main__.py:104``); Layer A keeps that.
This module is Layer B's typed-scan surface: Parquet scans that Catalyst can
push filters into and prune columns from.  At 100 TB the same code path works
unchanged — `spark.read.parquet` over a partitioned table directory; partition
pruning and predicate pushdown are what make scans scale, so all queries go
through here rather than hand-rolled readers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (region has 5
# rows, nation 25 — fixed size in TPC-H-style schemas regardless of SF).
ALWAYS_BROADCAST = ("region", "nation")


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # timestamp formatting must agree with the (timezone-naive) DuckDB oracle
    # regardless of what session the harness hands us — runtime SQL conf, so
    # it applies even to a pre-existing plain session
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized reader
    rejects outright.  Read nanos as raw int64 (legacy flag) and convert to a
    microsecond timestamp (truncating division — same ns→us truncation DuckDB
    applies), preserving the documented schema."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    # integer division: double math would lose precision above 2^53 ns
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run an ANSI-SQL query against the catalog tables (the engine's SQL
    entry point: every table registered as a view, then Catalyst plans the
    statement exactly like the DataFrame API — same optimizer, same scans).
    """
    register_views(spark, sf_dir)
    return spark.sql(query)
