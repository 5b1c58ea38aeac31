"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine package: `map_reduce485_spark.queries` holds the
registry of every implemented operator (Spark callable + DuckDB oracle SQL).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# importable from any cwd (the engine package lives next to this file)
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from pyspark.sql import DataFrame, SparkSession

from map_reduce485_spark.queries import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1-style pricing
    summary (filter → partial+final hash agg → sort).

    Resolved through the registry (NOT a direct module import): importing
    `queries.relational` here would register that module's queries first
    and silently defeat `_load_all`'s deliberate gate-execution ordering
    whenever the harness calls entry() before queries()."""
    return all_queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ north-star)."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted ⇒ rows-only check)."""
    return all_oracles()
