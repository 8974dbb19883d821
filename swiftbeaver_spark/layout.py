"""Data-layout operators: Z-order (Morton) clustering keys.

At 100 TB the scan cost of a query is decided by LAYOUT: parquet
row-group min/max statistics only prune when rows with nearby values
in the filter columns sit in the same files. Z-ordering interleaves
the bits of several columns into one sort key so that range-sorting
by it co-locates rows that are close in EVERY dimension — the
standard multi-dimensional clustering trick (used by Delta/Iceberg
OPTIMIZE ZORDER; public space-filling-curve literature).

Everything here is closed-form integer bit arithmetic in Catalyst
expressions — whole-stage codegen, no UDF, reproducible in any SQL
engine (the oracle replays it with div/mod arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton (Z-order) key: interleave the low `bits` bits of each
    column, column 0 in the least-significant position of each group.
    Inputs must be non-negative integers (pre-bucket real values with
    `F.floor`/`width_bucket`-style binning); values >= 2^bits wrap via
    masking, so callers should bucket into [0, 2^bits).

    len(cols) * bits must be <= 63 (the key is a signed BIGINT).
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed BIGINT")
    key = F.lit(0).cast("long")
    for i in range(bits):
        for c_idx, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(bit, i * n + c_idx).cast("long")
            )
    return key


def zorder_layout(
    df: DataFrame,
    by: list[str],
    bits: int = 16,
    num_partitions: int | None = None,
    key_name: str = "_z",
) -> DataFrame:
    """Cluster `df` for multi-dimensional locality: compute the Morton
    key over `by` and range-repartition + sort within partitions by
    it. A writer downstream (`df.write.parquet`) then produces files
    whose per-column min/max ranges are tight in ALL `by` columns, so
    selective filters on any of them prune row groups.

    Scale: rangepartitioning samples the key (one lightweight pass),
    then a single shuffle; the in-partition sort is the only other
    cost. This is exactly the OPTIMIZE ZORDER shape.
    """
    keyed = df.withColumn(key_name, zorder_key([F.col(c) for c in by], bits))
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return keyed.repartitionByRange(parts, key_name).sortWithinPartitions(key_name)
