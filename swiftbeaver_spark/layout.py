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


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    partition_col: str = "partition",
    path_col: str = "path",
    size_col: str = "size_bytes",
) -> DataFrame:
    """Small-file compaction planner: assign each file of a table
    partition to a rewrite group of ~`target_bytes`, the maintenance
    pass every 100 TB table needs (streaming sinks and incremental
    ingests leave thousands of KB-scale files; scan cost is then
    task-scheduling-bound, not IO-bound).

    Deterministic rolling-sum binning: files order by path inside
    their table partition, and a file joins group
    floor(cumulative_size_before / target) — every group except a
    partition's last lands >= target once it closes, and the plan is
    a pure function of the manifest (replayable in any SQL engine,
    no greedy loop). Output adds (compaction_group, group_seq).

    Scale: ONE window partitioned by the table-partition column —
    manifests are rows-per-FILE (a 100 TB table at 512 MiB files is
    ~200k rows), and no partition's file list funnels through a
    global sort. Skewed partitions (10^6 tiny files in one partition)
    stay a single task's worth of 16-byte rows, not data bytes.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(partition_col)
        .orderBy(path_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(size_col).over(w), F.lit(0).cast("long"))
    seq = Window.partitionBy(partition_col).orderBy(path_col)
    return (
        files.withColumn(
            "compaction_group",
            F.floor(before / F.lit(target_bytes)).cast("long"),
        )
        .withColumn("group_seq", F.row_number().over(seq).cast("long"))
    )


def compaction_summary(plan: DataFrame, partition_col: str = "partition") -> DataFrame:
    """Rewrite-group manifest: one row per (partition, group) with the
    file count and total bytes the rewrite task will read."""
    return plan.groupBy(partition_col, "compaction_group").agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum("size_bytes").cast("long").alias("group_bytes"),
        F.min("path").alias("first_path"),
        F.max("path").alias("last_path"),
    )
