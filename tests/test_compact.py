"""Small-file compaction: file count drops to the size target, data intact."""

from __future__ import annotations

import tempfile
from pathlib import Path

from map_reduce485_spark.catalog import load_table
from map_reduce485_spark.operators.compact import compact, dir_bytes
from tests.conftest import SF_SMOKE


def _n_files(d: str) -> int:
    return len(list(Path(d).glob("part-*.parquet")))


def test_compact_small_files(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")

    with tempfile.TemporaryDirectory() as tmp:
        frag_dir, out_dir, sorted_dir = f"{tmp}/frag", f"{tmp}/out", f"{tmp}/sorted"
        # simulate a streaming/CDC sink's debris: 64 tiny files
        li.repartition(64).write.mode("overwrite").parquet(frag_dir)
        assert _n_files(frag_dir) == 64

        total_mb = dir_bytes(spark, frag_dir) / (1024 * 1024)
        back = compact(spark, frag_dir, out_dir, target_mb=1)
        # 64 fragments → ceil(total/1MB) size-targeted files
        expect = max(1, int(total_mb) + (total_mb % 1 > 0))
        assert _n_files(out_dir) == expect, (total_mb, _n_files(out_dir))
        assert _n_files(out_dir) < 64 // 4

        # data survives byte-for-byte (same row multiset)
        assert back.count() == li.count()
        assert back.exceptAll(li).count() == 0
        assert li.exceptAll(back).count() == 0

        # compaction + clustering in one pass: files become disjoint key ranges
        compact(spark, frag_dir, sorted_dir, target_mb=1, sort_cols=["l_orderkey"])
        ranges = []
        for f in sorted(Path(sorted_dir).glob("part-*.parquet")):
            row = (
                spark.read.parquet(str(f))
                .selectExpr("min(l_orderkey)", "max(l_orderkey)")
                .collect()[0]
            )
            ranges.append((row[0], row[1]))
        ranges.sort()
        for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
            assert hi <= lo  # range-disjoint files → min/max pruning works
