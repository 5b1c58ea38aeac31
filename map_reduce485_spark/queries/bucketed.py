"""Gate queries that read bucketed tables end-to-end.

The 100 TB play behind `operators/bucketing.py`: two fact tables that are
repeatedly joined on the same key get written bucketed (and sorted) by that
key with the same bucket count; every subsequent join between them plans as
a co-located sort-merge with ZERO Exchange on either side — the recurring
fact-fact shuffle (the single most expensive stage of a typical pipeline at
scale) becomes a per-bucket local merge.

The reference has no layout control at all (its shuffle rehashes every
record of every job, `worker/__main__.py:115-125`); persisted bucketing is
the Spark-native answer to "we pay that shuffle every single day".

These queries prepare the bucketed tables on first use (per SparkSession
and sf_dir), then run the join against the *tables*, so the correctness
gate exercises the actual bucketed-scan path, not a stand-in.  The oracle
is the same join over the raw parquet — results are layout-independent.
`tests/test_bucketing.py` pins the plan property (exactly one Exchange:
the final aggregate; none between scans and join).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce485_spark.operators.bucketing import bucketed_join, write_bucketed
from map_reduce485_spark.queries import query
from map_reduce485_spark.queries._util import T, dsum, oracle_dsum

_N_BUCKETS = 8


def _ensure_bucketed_facts(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write lineitem/orders bucketed+sorted by order key (once per
    session+sf_dir; table names are sf-scoped so different scale factors
    never collide in one catalog)."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    li_t, ord_t = f"b_lineitem_{tag}", f"b_orders_{tag}"
    # external tables at an explicitly writable location: a vanilla
    # SparkSession's warehouse dir is cwd-relative, and the gate may run
    # from a read-only cwd
    root = os.path.join(tempfile.gettempdir(), "mr485_bucketed")
    if not (spark.catalog.tableExists(li_t) and spark.catalog.tableExists(ord_t)):
        li, orders = T(spark, sf_dir, "lineitem", "orders")
        write_bucketed(
            li.select("l_orderkey", "l_extendedprice", "l_discount"),
            li_t,
            "l_orderkey",
            _N_BUCKETS,
            path=os.path.join(root, li_t),
        )
        write_bucketed(
            orders.select("o_orderkey", "o_orderpriority"),
            ord_t,
            "o_orderkey",
            _N_BUCKETS,
            path=os.path.join(root, ord_t),
        )
    return li_t, ord_t


@query(
    "bucketed_fact_join_revenue",
    f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           {oracle_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    tags=("bucketing", "join", "agg"),
)
def bucketed_fact_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority via a co-located fact-fact join over
    tables bucketed+sorted by order key: the join itself is shuffle-free
    (no Exchange below the SortMergeJoin; the only shuffle in the whole
    plan is the final 5-group aggregate).  Same rows as the plain parquet
    join — layout is a physical property, not a semantic one."""
    li_t, ord_t = _ensure_bucketed_facts(spark, sf_dir)
    joined = bucketed_join(
        spark, li_t, ord_t, "l_orderkey", "o_orderkey", force_merge=True
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        dsum("l_extendedprice * (1 - l_discount)", "revenue"),
    )
