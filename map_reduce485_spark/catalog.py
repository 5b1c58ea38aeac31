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

import os

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


# Sessions already tuned by _tune_session.  Keyed by id() but holding a
# strong reference to the session: a bare id-set could false-hit if a stopped
# session were garbage-collected and a new one reused its id (silently
# skipping the UTC timezone the oracles depend on); pinning the object makes
# id reuse impossible while the entry exists, and the identity check guards
# the hash-collision-free lookup.
_TUNED: dict[int, SparkSession] = {}


def _tune_session(spark: SparkSession) -> None:
    """Apply runtime-settable SQL confs to whatever session the harness hands
    us.  The driver constructs a *plain* SparkSession (200 shuffle partitions,
    10 MB broadcast threshold); on local[32] over test-SF data that default
    multiplies pure task-scheduling overhead across every one of the ~106 gate
    queries.  These are exactly the knobs `session.get_spark` sets at build
    time — mirrored here so correctness/bench behavior does not depend on who
    built the session.  All of them are runtime-settable SQL confs.
    """
    if _TUNED.get(id(spark)) is spark:
        return
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # timestamp formatting must agree with the (timezone-naive) DuckDB oracle
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.shuffle.partitions", str(max(cpus, 8)))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    _TUNED[id(spark)] = spark


# (session id, sf_dir, table) → (session, cached DataFrame).  The
# correctness gate runs ~117 queries over the same ten small tables; caching
# the scans turns ~150 repeated parquet reads into in-memory columnar scans.
# The session rides along in the entry for the same reason as _TUNED: a
# cached DataFrame bound to a dead session must never be returned to a new
# session that happens to reuse its id.  Opt-out via
# SPARK_GRAFT_CACHE_TABLES=0 (bench.py does, so measured numbers include the
# real scan).  At production scale this maps to the standard warm-table
# pattern (`spark.catalog.cacheTable` on dims that fit executor memory).
_TABLE_CACHE: dict[tuple[int, str, str], tuple[SparkSession, DataFrame]] = {}


def _cache_enabled() -> bool:
    return os.environ.get("SPARK_GRAFT_CACHE_TABLES", "1") != "0"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    _tune_session(spark)
    key = (id(spark), sf_dir.rstrip("/"), name)
    if _cache_enabled() and key in _TABLE_CACHE:
        owner, df = _TABLE_CACHE[key]
        if owner is spark:
            return df
    if name == "events":
        df = _load_events(spark, sf_dir)
    else:
        df = spark.read.parquet(table_path(sf_dir, name))
    if _cache_enabled():
        df = df.cache()
        _TABLE_CACHE[key] = (spark, df)
    return df


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts has shipped as either TIMESTAMP(NANOS) or TIMESTAMP(MICROS)
    parquet across driver data generations, so the load is type-adaptive:

    - NANOS: Spark's vectorized reader rejects it outright.  Read nanos as
      raw int64 (legacy flag) and convert to a microsecond timestamp
      (truncating integer division — the same ns→us truncation DuckDB
      applies; double math would lose precision above 2^53 ns).
    - MICROS (no tz): arrives as TIMESTAMP_NTZ; cast to the session-local
      TIMESTAMP (session tz is pinned UTC by `_tune_session`) so downstream
      window/date math sees the identical dtype either way."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):  # nanos read as raw int64
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


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
