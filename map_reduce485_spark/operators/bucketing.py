"""Bucketed-table layout for shuffle-free co-located joins.

The 100 TB play: if two fact tables are repeatedly joined on the same key,
write both bucketed (and sorted) by that key with the same bucket count —
every subsequent join is map-side (sort-merge with zero Exchange), turning
the most expensive recurring shuffle in a pipeline into a local merge.
`tests/test_bucketing.py` pins the no-Exchange plan property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 8,
    sort_key: str | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) table.

    ``path=None`` → managed table in the session warehouse.  Pass ``path``
    to create an *external* bucketed table at an explicitly writable
    location instead — required when the session's default warehouse dir
    (cwd-relative for a vanilla SparkSession) may not be writable."""
    import shutil
    from pathlib import Path
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a crashed prior write can leave an orphan location that blocks CREATE
    if path is None:
        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        orphan = Path(warehouse) / table.lower()
    else:
        orphan = Path(path)
    if orphan.exists():
        shutil.rmtree(orphan)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_key)
    writer = writer.sortBy(sort_key or bucket_key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    force_merge: bool = False,
) -> DataFrame:
    """Join two same-bucketed tables — planned with no shuffle on either
    side (verify with plans.explain_str: no Exchange above the scans).

    ``force_merge`` adds a sort-merge hint: at test scale Catalyst would
    otherwise (rightly) broadcast the small side, which hides the
    bucketing property this helper exists to exploit; at fact-fact scale
    the hint is unnecessary."""
    lt = spark.table(left_table)
    if force_merge:
        lt = lt.hint("merge")
    rt = spark.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key])
