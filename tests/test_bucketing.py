"""Bucketed co-located join: correctness + the no-shuffle plan property."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from map_reduce485_spark.catalog import load_table
from map_reduce485_spark.operators.bucketing import bucketed_join, write_bucketed
from map_reduce485_spark.plans import explain_str
from tests.conftest import SF_SMOKE


def test_bucketed_gate_query_single_exchange(spark):
    """The gate query's only shuffle is the final aggregate — the bucketed
    fact-fact join itself plans with zero Exchange."""
    from map_reduce485_spark.queries.bucketed import bucketed_fact_join_revenue

    df = bucketed_fact_join_revenue(spark, SF_SMOKE)
    plan = explain_str(df)
    assert "SortMergeJoin" in plan, plan[:800]
    tree = plan.split("\n\n")[0]  # formatted explain repeats ops in detail sections
    assert len(re.findall(r"\bExchange\b", tree)) == 1, tree
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan
    # and it computes the same thing as the raw-parquet join
    li = load_table(spark, SF_SMOKE, "lineitem")
    orders = load_table(spark, SF_SMOKE, "orders")
    exp = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_items"))
        .orderBy("o_orderpriority")
        .collect()
    )
    got = df.orderBy("o_orderpriority").select("o_orderpriority", "n_items").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]


def test_bucketed_join_is_shuffle_free_and_correct(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", 8)
    write_bucketed(li, "b_lineitem", "l_orderkey", 8)

    joined = bucketed_join(
        spark, "b_lineitem", "b_orders", "l_orderkey", "o_orderkey", force_merge=True
    )

    # plan property: sort-merge join directly over bucketed scans — no
    # Exchange (shuffle) anywhere between scan and join
    plan = explain_str(joined)
    join_section = plan.split("Scan")[0]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange" not in join_section, plan[:800]
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan

    # correctness: identical aggregate as the plain (shuffling) join
    got = (
        joined.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderpriority")
        .collect()
    )
    exp = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderpriority")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]


def test_bucketed_scratch_cross_process_safe(spark, tmp_path):
    """Round-4 verdict item: two engine PROCESSES racing the first build of
    the shared bucketed scratch must both succeed with correct results.
    The source is a fresh copy (fresh fingerprint → genuinely first-run),
    and a subprocess engine runs the same query concurrently with this
    session's run."""
    import shutil
    import subprocess
    import sys

    from map_reduce485_spark.queries.bucketed import bucketed_fact_join_revenue

    src = tmp_path / "sf"
    src.mkdir()
    for t in ("lineitem", "orders"):
        copy_from = f"/root/testdata/sf0.001/{t}.parquet"
        shutil.copy(copy_from, src / f"{t}.parquet")

    code = (
        "import sys; sys.path.insert(0, '/root/repo');"
        "from map_reduce485_spark import get_spark;"
        "from map_reduce485_spark.queries.bucketed import bucketed_fact_join_revenue;"
        f"s = get_spark('race_proc', cpus=2, shuffle_partitions=2);"
        f"rows = bucketed_fact_join_revenue(s, {str(src)!r}).collect();"
        "print('SUBPROC_ROWS', len(rows))"
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    try:
        here = {
            r.o_orderpriority: (r.n_items, r.revenue)
            for r in bucketed_fact_join_revenue(spark, str(src)).collect()
        }
    finally:
        out, _ = proc.communicate(timeout=300)
    assert proc.returncode == 0, out[-2000:]
    assert "SUBPROC_ROWS" in out

    import duckdb

    con = duckdb.connect()
    exp = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"""
            SELECT o_orderpriority, COUNT(*) AS n,
                   SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0
            FROM read_parquet('{src}/lineitem.parquet') l
            JOIN read_parquet('{src}/orders.parquet') o ON l_orderkey = o_orderkey
            GROUP BY 1
            """
        ).fetchall()
    }
    assert here == exp
