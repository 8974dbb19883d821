"""Mergeable frequency sketches: count-min.

Companion to the KMV distinct sketch (q46): a count-min sketch whose
every arithmetic step is engine-neutral (md5-prefix bucket keys,
integer sums, min over rows), so the APPROXIMATE estimates themselves
can sit under a cross-engine hash gate — unlike opaque
`approx_count_distinct`-style sketches that only admit rows-only
checks.

Scale design: the sketch is a `(row, bucket) -> count` table of at
most `depth * 16^prefix_len` cells. Token instances explode by
`depth` before the shuffle, but partial aggregation collapses each
map task's output to at most the sketch size, so the shuffle moves
O(depth * width) rows per task regardless of corpus size — the
classic mergeable-sketch property, expressed as a plain groupBy.
Estimation for a probe set is a broadcast join against the sketch
(the sketch is small by construction) followed by a min over rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, row: int, prefix_len: int) -> Column:
    """Bucket key = first `prefix_len` hex chars of md5('{row}:' + v):
    a string key both Spark and any SQL oracle compute identically —
    no hex->int conversion, no engine-specific hash."""
    return F.substring(
        F.md5(F.concat(F.lit(f"{row}:"), col)), 1, prefix_len
    )


def countmin_build(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    prefix_len: int = 3,
) -> DataFrame:
    """Build a count-min sketch over the instances of `value_col`:
    one output row per (sketch row j, bucket) with the instance count.
    Width = 16^prefix_len buckets per row (4096 at the default)."""
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _bucket(F.col(value_col), j, prefix_len).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("cell")
    )
    return cells.groupBy("cell.j", "cell.bucket").agg(
        F.count("*").cast("long").alias("cnt")
    )


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    depth: int = 4,
    prefix_len: int = 3,
) -> DataFrame:
    """Estimate each probe's frequency: min over the sketch rows of
    the probe's bucket count. Guaranteed >= the true count; the
    overestimate is other values colliding into the same buckets.
    `probes` must be distinct on `value_col`."""
    keyed = probes.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _bucket(F.col(value_col), j, prefix_len).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("cell"),
    ).select("*", "cell.j", "cell.bucket")
    est = (
        keyed.join(F.broadcast(sketch.alias("sk")), ["j", "bucket"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cms_est"))
    )
    return est
