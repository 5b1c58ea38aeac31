"""Skew-mitigation join strategies.

At 100 TB a handful of hot keys (the power-law reality of user/order/doc
keys) can put one shuffle partition hours behind the rest.  Two remedies,
composable with any equi-join in the engine:

1. AQE skew-join splitting — on by default in `session.get_spark`
   (`spark.sql.adaptive.skewJoin.enabled`); handles moderate skew with no
   code change.
2. Salted join (below) — the explicit remedy when one side's hot keys are
   known to dwarf AQE's splitting heuristics: spread each hot key over
   ``n_salts`` sub-keys on the big side, replicate the small side once per
   salt, join on (key, salt).  Result is exactly the plain join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
    salt_from: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with hot-key salting.

    ``big`` rows get a deterministic salt in [0, n_salts) (from
    ``salt_from`` if given — any column expression that varies *within* a
    join key — else a hash over the whole row, which always does);
    ``small`` is exploded ×n_salts.  The shuffle then spreads each hot key
    over n_salts partitions instead of one.

    Cost model: small side is duplicated n_salts× (fine for dimension-sized
    inputs; for fact-fact skew, salt only the known-hot keys instead).

    Only ``inner`` and ``left`` joins are supported: the big side carries
    exactly one salt per row, so those two preserve plain-join semantics.
    ``right``/``full`` would emit every unmatched *small*-side row once per
    salt replica — n_salts duplicates — so they are rejected.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "unmatched small-side rows would be duplicated n_salts times"
        )
    salt = (
        # pmod, not %: Spark's % keeps the dividend's sign, so a negative
        # salt_from (e.g. a hash column) would yield salts outside
        # [0, n_salts) that never match the exploded small side
        F.pmod(salt_from.cast("long"), F.lit(n_salts)).cast("int")
        if salt_from is not None
        # row-level hash, NOT a hash of the join key (a per-key-constant
        # salt would leave every hot key in a single partition again)
        else F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)).cast("int")
    )
    big_salted = big.withColumn("_salt", salt)
    small_salted = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = big_salted.join(
        small_salted,
        (big_salted[big_key] == small_salted[small_key])
        & (big_salted["_salt"] == small_salted["_salt"]),
        how,
    )
    return joined.drop("_salt")
