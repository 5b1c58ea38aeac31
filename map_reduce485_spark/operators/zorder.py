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

Scale design — how each dimension is quantized to [0, 2^bits):

  1. One distributed `approxQuantile` pass computes 2^bits - 1 rank
     boundaries (Greenwald-Khanna sketch: fixed-size state per partition,
     merged on the driver — the same mechanism as `percentile_approx`).
     Rank boundaries are distribution-proof: uniform bucket occupancy even
     for skewed/heavy-tailed values, where min/max scaling would collapse
     everything into a few codes.
  2. Bucket assignment is a MAP-SIDE expression over the broadcast literal
     boundary array (count boundaries <= value via `F.aggregate`) — no
     shuffle, no window, whole-stage-codegen'd.

Total shuffles for `zorder_write`: exactly one (the final range partition
by z_code).  The previous implementation rank-quantized with
`percent_rank().over(W.orderBy(col))` — a single-partition global window
over the entire table being re-laid-out, the one shape that cannot run at
100 TB.  The quantile sketch keeps its distribution-proofness at a bounded,
distributed cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# per-dimension quantization: 2^8 = 256 rank buckets per dimension (65536
# curve cells for two dimensions) — far finer than any realistic output
# file count, and cheap to compute as a quantile sketch + 255-element
# map-side comparison fold
_BITS = 8


def _rank_boundaries(df: DataFrame, col: str, bits: int) -> list[float]:
    """Interior rank boundaries of `col` at probabilities i/2^bits — one
    distributed sketch pass, driver state is just the 2^bits - 1 floats."""
    n = 1 << bits
    probs = [i / n for i in range(1, n)]
    # relativeError 1/(4n): tight enough that buckets stay near-uniform,
    # sketch state stays fixed-size per partition
    # duplicates are KEPT deliberately: for low-cardinality / heavy-tied
    # columns a value that spans k quantile points advances the bucket
    # count by k, so `#boundaries <= v` stays ~ 2^bits * CDF(v) — the same
    # occupancy-uniform rank quantization percent_rank gave, spread over
    # the full code range (deduping would compress codes into a corner of
    # the curve and misalign file splits with the Morton bit structure)
    return df.approxQuantile(col, probs, 1.0 / (4 * n))


def _bucket(col: str, boundaries: list[float]) -> Column:
    """Map-side bucket assignment: how many boundaries lie at or below the
    value.  Branch-free comparison fold over a broadcast literal array —
    no shuffle, stays inside whole-stage codegen."""
    if not boundaries:
        return F.lit(0).cast("long")
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.aggregate(
        arr,
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.when(F.col(col) >= b, 1).otherwise(0),
    )


def _interleave(qs: list[Column], bits: int) -> Column:
    """Morton code over d dimensions: bit i of dimension j → bit d*i + j
    (the textbook 2-D x→2i / y→2i+1 layout, generalized)."""
    d = len(qs)
    if d * bits > 62:
        raise ValueError(f"{d} dims x {bits} bits exceeds a signed long")
    # the shifted terms occupy disjoint bit positions, so summing == OR-ing
    # (and stays a plain long expression Column)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, q in enumerate(qs):
            z = z + F.shiftleft(F.shiftright(q, i) % 2, d * i + j)
    return z


def zorder_code(df: DataFrame, *cols: str, bits: int = _BITS) -> DataFrame:
    """Add a `z_code` column interleaving the rank-quantized bits of two or
    more numeric columns.  Costs one quantile-sketch pass per dimension
    plus a map-side projection — no shuffle, no window."""
    if len(cols) < 2:
        raise ValueError("z-ordering needs at least two columns")
    qs = [_bucket(c, _rank_boundaries(df, c, bits)) for c in cols]
    return df.withColumn("z_code", _interleave(qs, bits))


def zorder_write(
    df: DataFrame,
    out_dir: str,
    *cols: str,
    n_files: int = 8,
    bits: int = _BITS,
) -> None:
    """Write `df` as parquet clustered on the Morton curve of `cols`:
    split the curve into `n_files` EQUAL z ranges, one file each, sort
    within each, drop the helper columns.  Every output file then covers a
    compact hyper-rectangle of the column space — min/max stats prune on
    EVERY participating column.

    The file id is computed from the top z bits (`z * n_files >> 2*bits`)
    rather than letting `repartitionByRange(z_code)` sample its own split
    points: rank quantization already makes z occupancy uniform, and
    bit-aligned splits mean a filter band touches exactly the curve
    quadrants it must — sampled splits land off the Morton bit boundaries
    and overlap extra files."""
    total_bits = len(cols) * bits
    if n_files & (n_files - 1) == 0:
        # power-of-two file count: the split IS the top log2(n_files) bits
        # of the code — pure integer shift, exact at any d*bits <= 62
        shift = max(total_bits - (n_files.bit_length() - 1), 0)
        file_col = F.shiftright(F.col("z_code"), shift).cast("long")
    else:
        # z_code * n_files can exceed 2^53 (double mantissa) and even 2^63
        # when d*bits approaches 62 — compute the split in decimal(38,0)
        # so rounding can never shift rows across file boundaries
        file_col = F.floor(
            F.col("z_code").cast("decimal(38,0)") * n_files / F.lit(1 << total_bits)
        ).cast("long")
    (
        zorder_code(df, *cols, bits=bits)
        .withColumn("_file", file_col)
        .repartitionByRange(n_files, "_file")
        .sortWithinPartitions("z_code")
        .drop("z_code", "_file")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
