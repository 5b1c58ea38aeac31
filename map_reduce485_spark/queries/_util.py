"""Shared helpers for the query registry.

Hash-stability toolkit (see package docstring): exact decimal aggregation,
string-formatted timestamps, deterministic top-k tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce485_spark.catalog import load_table


def T(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Load the named tables (Parquet typed scans; Catalyst prunes/pushes)."""
    return [load_table(spark, sf_dir, n) for n in names]


def dsum(expr: str, alias: str, scale: int = 2, precision: int = 24) -> Column:
    """Exact decimal SUM of a double expression, surfaced as DOUBLE.

    Double addition is not associative, so a plain SUM(double) depends on
    Spark's partial-agg order and would not hash-match a sequential DuckDB
    sum.  Casting each row to DECIMAL first makes the sum exact and
    order-independent; the final cast back to DOUBLE is identical IEEE
    rounding on both engines.
    """
    return (
        F.sum(F.expr(expr).cast(f"decimal({precision},{scale})"))
        .cast("double")
        .alias(alias)
    )


def oracle_dsum(expr: str, alias: str, scale: int = 2, precision: int = 24) -> str:
    """DuckDB-side twin of :func:`dsum`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE) AS {alias}"
    )


def fmt_ts(col: str | Column, alias: str) -> Column:
    """Timestamp → 'yyyy-MM-dd HH:mm:ss' string (second precision)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss").alias(alias)


ORACLE_TS_FMT = "%Y-%m-%d %H:%M:%S"


def oracle_fmt_ts(expr: str, alias: str) -> str:
    return f"strftime({expr}, '{ORACLE_TS_FMT}') AS {alias}"
