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


def fixed_width_bucket(v: Column, vmin: Column, vmax: Column, bits: int) -> Column:
    """Fixed-width bucket id in [0, 2^bits) from EXACT integer arithmetic:
    ``(v - vmin) * 2^bits // (vmax - vmin + 1)``. The deterministic
    normalizer for the oracled layout query — ``quantile_rank``'s ntile is
    the better balancer for skewed dims but its global window and
    tie-ordering aren't engine-portable. ``floor`` over the double
    quotient is exact while the numerator stays below 2^53 (here:
    key-range × 2^bits ≪ 2^53; the same bound the dq5 chunk count relies
    on), so Spark and any SQL engine agree bucket-for-bucket."""
    num = (v.cast("long") - vmin.cast("long")) * F.lit(1 << bits).cast("long")
    den = vmax.cast("long") - vmin.cast("long") + F.lit(1).cast("long")
    return F.floor(num / den).cast("long")


def zorder_file_stats(
    df: DataFrame,
    dims: tuple[str, str],
    bits: int = 8,
    n_files: int = 64,
) -> DataFrame:
    """The data-skipping ledger behind `OPTIMIZE ZORDER BY`: assign every
    row to a file under (a) Z-order range partitioning on both dims and
    (b) linear partitioning on the second dim only, then report each
    file's row count, per-dimension (min, max), and span fractions —
    exactly the parquet footer stats a reader prunes with. A predicate on
    dim x scans ``x_span_frac`` of each file in expectation, so the two
    layouts' fractions side by side ARE the skipping benefit (Z-order:
    tight on both dims; linear: tight on y, ~1.0 on x).

    Scale shape: one scalar min/max aggregate broadcast back (the
    t8/t13 idiom), then ONE shuffle — both layouts' file assignments are
    computed map-side and exploded as (layout, file_id) pairs into a
    single groupBy. Everything is integer Column arithmetic inside
    whole-stage codegen; at 100 TB the scalar pass comes free from table
    metadata. File boundaries are fixed-width in Z space (deterministic;
    production writers range-partition on sampled quantiles instead —
    same files, different boundary source)."""
    a, b = dims
    z_bits = 2 * bits
    scalars = df.agg(
        F.min(a).alias("_amin"),
        F.max(a).alias("_amax"),
        F.min(b).alias("_bmin"),
        F.max(b).alias("_bmax"),
    )
    keyed = df.crossJoin(F.broadcast(scalars))
    xb = fixed_width_bucket(F.col(a), F.col("_amin"), F.col("_amax"), bits)
    yb = fixed_width_bucket(F.col(b), F.col("_bmin"), F.col("_bmax"), bits)
    z = morton_code(xb, yb, bits)
    fid_z = F.floor(z * F.lit(n_files).cast("long") / F.lit(1 << z_bits)).cast("long")
    fid_y = F.floor(yb * F.lit(n_files).cast("long") / F.lit(1 << bits)).cast("long")
    pairs = F.explode(
        F.array(
            F.struct(F.lit("zorder").alias("layout"), fid_z.alias("file_id")),
            F.struct(F.lit("linear_y").alias("layout"), fid_y.alias("file_id")),
        )
    ).alias("p")
    exploded = keyed.select(
        F.col(a).alias("_x"), F.col(b).alias("_y"),
        "_amin", "_amax", "_bmin", "_bmax", pairs,
    )
    agg = exploded.groupBy(F.col("p.layout").alias("layout"),
                           F.col("p.file_id").alias("file_id")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("_x").alias("x_min"),
        F.max("_x").alias("x_max"),
        F.min("_y").alias("y_min"),
        F.max("_y").alias("y_max"),
        F.max("_amin").alias("_amin"),
        F.max("_amax").alias("_amax"),
        F.max("_bmin").alias("_bmin"),
        F.max("_bmax").alias("_bmax"),
    )
    # one division of exact integers per fraction — bit-identical anywhere
    return agg.select(
        "layout", "file_id", "n_rows", "x_min", "x_max", "y_min", "y_max",
        (
            (F.col("x_max") - F.col("x_min") + 1).cast("double")
            / (F.col("_amax") - F.col("_amin") + 1).cast("double")
        ).alias("x_span_frac"),
        (
            (F.col("y_max") - F.col("y_min") + 1).cast("double")
            / (F.col("_bmax") - F.col("_bmin") + 1).cast("double")
        ).alias("y_span_frac"),
    )
