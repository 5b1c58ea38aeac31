"""Z-order (Morton-curve) data layout for multi-dimensional file pruning.

The 100 TB problem this solves: Parquet scans prune files (and row groups)
by min/max column statistics, but a linear `sortBy(x)` layout only tightens
the stats of `x` — a filter on `y` still touches every file.  Interleaving
the bits of several columns into one Morton code and range-partitioning +
sorting by that code clusters rows that are close in EVERY dimension, so
per-file min/max ranges shrink for all participating columns at once and a
selective filter on any of them skips most of the data.  This is the same
layout trick Delta/Iceberg expose as `OPTIMIZE ... ZORDER BY`; Spark core
has no native operator for it, so the engine provides one.

The reference has no layout control at all (its output placement is
`md5(key) % R`, `worker/__main__.py:117-121` — deliberately scattering,
never clustering); this operator exists for the scale goal, not parity.

Everything is JVM-side expression work (rank windows + bit arithmetic —
no UDFs): two shuffles total (one per rank dimension) plus the final range
repartition, each a plain column shuffle that AQE can re-plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

_BITS = 16  # per-dimension quantization: 2^16 buckets is plenty for file pruning


def _quantize(col: str, bits: int) -> Column:
    """Rank-quantize a column to [0, 2^bits): percent_rank is distribution-
    proof (uniform bucket occupancy even for skewed/heavy-tailed values,
    where min-max scaling would collapse everything into a few codes)."""
    pr = F.percent_rank().over(W.orderBy(F.col(col)))
    return F.least(
        F.floor(pr * (1 << bits)).cast("long"), F.lit((1 << bits) - 1)
    )


def _interleave(qx: Column, qy: Column, bits: int) -> Column:
    """Morton code: bit i of x → bit 2i, bit i of y → bit 2i+1."""
    # the shifted terms occupy disjoint bit positions, so summing == OR-ing
    # (and stays a plain long expression Column)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(qx, i) % 2, 2 * i)
            + F.shiftleft(F.shiftright(qy, i) % 2, 2 * i + 1)
        )
    return z


def zorder_code(df: DataFrame, x: str, y: str, bits: int = _BITS) -> DataFrame:
    """Add a `z_code` column interleaving the rank-quantized bits of two
    numeric columns.  (The global rank windows are the honest cost of
    distribution-proof quantization; at petabyte scale, swap `_quantize`
    for fixed min/max scaling computed from table stats — one pass, no
    window — at the price of skew sensitivity.)"""
    return df.withColumn(
        "z_code", _interleave(_quantize(x, bits), _quantize(y, bits), bits)
    )


def zorder_write(
    df: DataFrame,
    out_dir: str,
    x: str,
    y: str,
    n_files: int = 8,
    bits: int = _BITS,
) -> None:
    """Write `df` as parquet clustered on the (x, y) Morton curve:
    range-partition by z_code into `n_files` splits, sort within each, drop
    the helper column.  Every output file then covers a compact rectangle
    of (x, y) space — min/max stats prune on BOTH columns."""
    (
        zorder_code(df, x, y, bits)
        .repartitionByRange(n_files, "z_code")
        .sortWithinPartitions("z_code")
        .drop("z_code")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
