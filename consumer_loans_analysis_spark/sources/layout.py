"""Multi-dimensional file layout: Z-order (Morton) clustering.

Partition pruning skips on ONE column; sorting skips on a prefix. When
queries filter on TWO independent columns (user AND time, lang AND
length), Z-ordering interleaves the bits of both keys into one sort key
so that parquet row-group min/max statistics become tight on BOTH
dimensions simultaneously — the standard lakehouse data-skipping layout
(Delta/Iceberg `OPTIMIZE ZORDER BY`).

Everything here is pure Column bit arithmetic (whole-stage codegen);
`zorder_write` is the layout pass: compute the code, range-partition on
it (the one shuffle this layout costs, paid at write time), sort within
partitions, write. Readers need no special support — skipping comes from
ordinary parquet min/max stats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _spread_bits(v: Column, bits: int) -> Column:
    """Insert a zero between consecutive bits of ``v`` (lowest ``bits``
    bits): b_i moves to position 2i. Classic magic-number spreading needs
    fixed-width constants; an explicit fold over bit positions stays
    readable and is still codegen arithmetic."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)), 2 * i)
    return out


def morton_code(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the lowest ``bits`` bits of two non-negative int columns
    into a single Z-order key (x in even positions, y in odd). Out-of-range
    values SATURATE to [0, 2^bits): a wrap (plain bit-masking) would map an
    overflowing coordinate to a small code and destroy Z-curve locality.
    Callers should still quantile-bucket or scale each dimension to
    [0, 2^bits) — clamping is a safety net, not a normalizer."""
    hi = F.lit((1 << bits) - 1).cast("long")
    zero = F.lit(0).cast("long")
    xs = _spread_bits(F.least(F.greatest(x.cast("long"), zero), hi), bits)
    ys = _spread_bits(F.least(F.greatest(y.cast("long"), zero), hi), bits)
    return (xs + F.shiftleft(ys, 1)).alias("zorder")


def quantile_rank(df: DataFrame, col: str, bits: int = 16) -> Column:
    """Equi-depth bucket id in [0, 2^bits) for a numeric column — the
    dimension normalization step before Morton interleaving (equi-depth
    beats min/max scaling for skewed dimensions: every bucket carries the
    same row count, so the Z-curve is balanced). One ntile window; at
    100 TB use approx_percentile cutpoints broadcast as literals instead
    of a global window."""
    from pyspark.sql import Window

    return (F.ntile(1 << bits).over(Window.orderBy(F.col(col))) - 1).alias(
        f"{col}_rank"
    )


def zorder_write(
    df: DataFrame,
    path: str,
    dims: tuple[str, str],
    bits: int = 12,
    n_files: int = 32,
) -> None:
    """Write ``df`` Z-ordered on two dimensions: bucket both dims
    (equi-depth), interleave to a Morton key, range-partition + sort on
    it, write parquet. Each output file then covers a compact rectangle
    in (dim1, dim2) space, so min/max stats skip on either predicate."""
    a, b = dims
    keyed = df.withColumn("_za", quantile_rank(df, a, bits)).withColumn(
        "_zb", quantile_rank(df, b, bits)
    )
    keyed = keyed.withColumn(
        "_z", morton_code(F.col("_za"), F.col("_zb"), bits)
    )
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_za", "_zb", "_z")
        .write.mode("overwrite")
        .parquet(path)
    )
