"""Parallelism pinning for compute-dense, byte-light kernel stages.

Single home for the repartition-if-fewer pattern (previously copied
inline in entropy.py / strings_scan.py from llm/dedup._spread — three
copies that had to evolve together).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(
    df: DataFrame,
    target: int | None = None,
    known_partitions: int | None = None,
) -> DataFrame:
    """Repartition `df` to cluster parallelism when it arrives in fewer
    partitions than the cluster has slots.

    Spark sizes partitions by BYTES (file splits, AQE advisory size),
    but signature/scan kernels cost per ROW or per BYTE-of-payload: a
    small corpus collapses to 1-2 tasks and runs an embarrassingly-
    parallel stage on 2 of N cores (measured 2.5x on the simhash
    pipeline at sf0.1, 16x on the 10x strings corpus). Repartition only
    when the input has fewer partitions; at 100 TB the file splits
    already exceed the core count and this is a no-op — no shuffle is
    added on the scale path.

    Pass `known_partitions` when the caller already knows the input's
    partition count arithmetically (e.g. chunks_from_file's task
    sizing): that avoids touching `.rdd` entirely. Without it, the
    count comes from df.rdd.getNumPartitions() — fine on scan-stage
    inputs (file reads, unions of reads), but for a df BEHIND a shuffle
    it reports the pre-AQE count and materializing .rdd can force
    upstream AQE stages to execute early; there, prefer the explicit
    hint or decide the repartition at the call site.
    """
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    current = (
        known_partitions if known_partitions is not None else df.rdd.getNumPartitions()
    )
    if current < target:
        return df.repartition(target)
    return df
