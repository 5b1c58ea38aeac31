"""salted_join semantic pins (operators/skew.py).

The r1 advisor found that `salt_from.cast("int") % n_salts` silently DROPPED
rows for negative salt sources (Spark's % keeps the dividend's sign, so
negative salts never matched the small side's exploded 0..n-1 range) and
that right/full joins would duplicate unmatched small-side rows n_salts
times.  These tests pin the fixes: pmod salting, equality with the plain
join for a negative hash-valued salt column, and rejection of outer `how`s.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce485_spark.operators.skew import salted_join


def _tables(spark):
    big = spark.createDataFrame(
        [(k, i) for k in ("hot", "a", "b") for i in range(40 if k == "hot" else 3)],
        "k string, i int",
    )
    small = spark.createDataFrame(
        [("hot", 1), ("a", 2), ("c", 3)], "sk string, v int"
    )
    return big, small


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_with_negative_hash_salt_equals_plain_join(spark, how):
    """A hash column is the documented salt source and is negative about
    half the time — every such row must still land in [0, n_salts) and
    match.  Equality with the plain join is the whole contract."""
    big, small = _tables(spark)
    big = big.withColumn("h", F.xxhash64("k", "i"))  # negative for ~half the rows
    assert big.filter(F.col("h") < 0).count() > 0

    got = salted_join(big, small, "k", "sk", n_salts=8, salt_from=F.col("h"), how=how)
    exp = big.join(small, big["k"] == small["sk"], how)
    cols = ["k", "i", "h", "sk", "v"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, exp.select(*cols).collect())
    )


def test_salted_join_default_row_hash_salt_equals_plain_join(spark):
    big, small = _tables(spark)
    got = salted_join(big, small, "k", "sk", n_salts=4)
    exp = big.join(small, big["k"] == small["sk"], "inner")
    cols = ["k", "i", "sk", "v"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, exp.select(*cols).collect())
    )


def test_salted_join_spreads_hot_key_across_partitions(spark):
    """The point of salting: one hot key occupies n_salts shuffle keys."""
    big, small = _tables(spark)
    salted = salted_join(big, small, "k", "sk", n_salts=8)
    # every (key, salt) pair the hot key was spread over appears in the join
    n_salts_used = (
        big.withColumn(
            "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8))
        )
        .filter(F.col("k") == "hot")
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_salts_used > 1  # 40 rows over 8 salts: all-in-one is ~8^-39
    assert salted.filter(F.col("k") == "hot").count() == 40


@pytest.mark.parametrize("how", ["right", "full", "outer"])
def test_salted_join_rejects_small_side_preserving_joins(spark, how):
    big, small = _tables(spark)
    with pytest.raises(ValueError, match="inner.*left|left.*inner"):
        salted_join(big, small, "k", "sk", how=how)
