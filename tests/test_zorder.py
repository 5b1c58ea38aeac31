"""Z-order layout: multi-dimensional min/max pruning, measured.

Writes the same table twice — linearly sorted by one column vs z-ordered on
two — then reads back each output file's min/max stats and counts how many
files a selective range filter on the *second* column would have to touch.
Linear layout: every file (the sort ignores that column).  Z-order: a small
fraction.  Also pins that the layout change is semantics-free (same row
multiset)."""

from __future__ import annotations

import tempfile
from pathlib import Path

from pyspark.sql import functions as F

from map_reduce485_spark.catalog import load_table
from map_reduce485_spark.operators.zorder import zorder_write
from tests.conftest import SF_SMOKE

N_FILES = 16


def _files_overlapping(spark, out_dir: str, col: str, lo: float, hi: float) -> int:
    """How many parquet part-files of `out_dir` a [lo, hi] filter on `col`
    must read, by each file's own min/max (what row-group pruning sees)."""
    n = 0
    for f in sorted(Path(out_dir).glob("part-*.parquet")):
        mn, mx = (
            spark.read.parquet(str(f)).agg(F.min(col), F.max(col)).collect()[0]
        )
        if mx >= lo and mn <= hi:
            n += 1
    return n


def test_interleave_matches_python_mirror_and_is_bijective(spark):
    """The Spark bit-interleave expression == the textbook Morton code,
    exhaustively over the full 4-bit grid, and is a bijection (no two
    (x, y) cells share a code — the property pruning correctness rests on)."""
    from map_reduce485_spark.operators.zorder import _interleave

    bits = 4
    grid = [(x, y) for x in range(1 << bits) for y in range(1 << bits)]
    df = spark.createDataFrame(grid, ["qx", "qy"])
    got = {
        (r.qx, r.qy): r.z
        for r in df.select(
            "qx", "qy", _interleave([F.col("qx"), F.col("qy")], bits).alias("z")
        ).collect()
    }

    def morton(x: int, y: int) -> int:
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(x, y): morton(x, y) for x, y in grid}
    assert len(set(got.values())) == len(grid)


def test_interleave_3d_is_bijective(spark):
    """The n-dimensional generalization: exhaustive 3-D grid, every cell a
    distinct code inside [0, 2^(3*bits))."""
    from map_reduce485_spark.operators.zorder import _interleave

    bits = 3
    grid = [
        (x, y, v)
        for x in range(1 << bits)
        for y in range(1 << bits)
        for v in range(1 << bits)
    ]
    df = spark.createDataFrame(grid, ["qx", "qy", "qv"])
    codes = [
        r.z
        for r in df.select(
            _interleave([F.col("qx"), F.col("qy"), F.col("qv")], bits).alias("z")
        ).collect()
    ]
    assert len(set(codes)) == len(grid)
    assert min(codes) >= 0 and max(codes) < 1 << (3 * bits)


def test_zorder_prunes_both_dimensions(spark):
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )

    with tempfile.TemporaryDirectory() as tmp:
        linear_dir, z_dir = f"{tmp}/linear", f"{tmp}/zorder"
        # baseline layout: range-partitioned + sorted on custkey only
        (
            orders.repartitionByRange(N_FILES, "o_custkey")
            .sortWithinPartitions("o_custkey")
            .write.mode("overwrite")
            .parquet(linear_dir)
        )
        zorder_write(orders, z_dir, "o_custkey", "o_totalprice", n_files=N_FILES)

        # a ~10% band on totalprice — the dimension the linear sort ignores
        # (off-center so the band sits inside one quadrant of the curve
        # rather than straddling the top-bit boundary at the median)
        lo, hi = orders.approxQuantile("o_totalprice", [0.20, 0.30], 0.0)
        linear_hits = _files_overlapping(spark, linear_dir, "o_totalprice", lo, hi)
        z_hits = _files_overlapping(spark, z_dir, "o_totalprice", lo, hi)
        assert linear_hits >= N_FILES - 1  # linear layout can't prune this column
        assert z_hits <= N_FILES // 2, (linear_hits, z_hits)

        # and the curve still prunes the FIRST dimension too (z-order trades
        # a bit of single-column locality for locality in every column)
        clo, chi = orders.approxQuantile("o_custkey", [0.20, 0.30], 0.0)
        z_cust_hits = _files_overlapping(spark, z_dir, "o_custkey", clo, chi)
        assert z_cust_hits <= N_FILES // 2, z_cust_hits

        # layout is semantics-free: same row multiset as the source
        back = spark.read.parquet(z_dir)
        assert back.count() == orders.count()
        assert back.exceptAll(orders).count() == 0
        assert orders.exceptAll(back).count() == 0
