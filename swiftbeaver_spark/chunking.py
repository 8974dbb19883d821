"""Evidence ingest: linear byte space -> chunks DataFrame.

Semantics parity with reference build_chunks (src/chunk.rs:9-35):
- chunk i covers [i*chunk_size, min((i+1)*chunk_size, total))
- each chunk's `data` additionally carries up to `overlap` bytes past its
  valid region (capped at evidence end) so signatures and carve headers
  that straddle a boundary are seen by exactly one owner chunk
- valid_length = min(chunk_size, total - start); hits at
  local_offset >= valid_length are dropped downstream (overlap dedup)

Scale design: chunk *planning* is `spark.range` arithmetic (no driver
loop, no data movement); chunk *bytes* are fetched executor-side in
mapInPandas via positioned reads, so a 100 TB image on shared storage
fans out to as many parallel readers as there are range rows. For
repeated scans, `materialize_chunks` persists the chunk table to
parquet once and every later pass is a plain columnar scan with
partition pruning on `start`.
"""

from __future__ import annotations

import math
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swiftbeaver_spark import schemas
from swiftbeaver_spark.config import DEFAULT_CHUNK_SIZE, DEFAULT_OVERLAP

# minimum chunk bytes fetched per task when chunk_size is small; one
# chunk per task whenever chunk_size >= this (see chunks_from_file)
_MIN_TASK_BYTES = 4 * 1024 * 1024


def _plan_range(
    spark: SparkSession,
    first_chunk: int,
    end_chunk: int,
    evidence_len: int,
    chunk_size: int,
    overlap: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Chunk geometry for ids [first_chunk, end_chunk) — pure `range`
    arithmetic. `spark.range` splits the id space into CONTIGUOUS
    slices per partition, so downstream parquet files written from this
    plan hold contiguous evidence runs (the stream-carve strategy in
    carve_op.py depends on that; a hash repartition here would scatter
    evidence order across files)."""
    rng = (
        spark.range(first_chunk, end_chunk, 1, num_partitions)
        if num_partitions
        else spark.range(first_chunk, end_chunk)
    )
    return (
        rng.select(
            F.col("id").alias("chunk_id"),
            (F.col("id") * chunk_size).alias("start"),
        )
        .withColumn(
            "valid_length",
            F.least(F.lit(chunk_size), F.lit(evidence_len) - F.col("start")),
        )
        .withColumn(
            "read_length",
            F.least(F.lit(chunk_size + overlap), F.lit(evidence_len) - F.col("start")),
        )
    )


def plan_chunks(
    spark: SparkSession,
    evidence_len: int,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_OVERLAP,
    num_partitions: int | None = None,
) -> DataFrame:
    """Chunk geometry as a DataFrame — pure `range` arithmetic.

    Columns: chunk_id, start, valid_length, read_length (no bytes yet).
    """
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    n = max(0, math.ceil(evidence_len / chunk_size))
    return _plan_range(spark, 0, n, evidence_len, chunk_size, overlap, num_partitions)


def chunks_from_file(
    spark: SparkSession,
    path: str,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_OVERLAP,
    max_bytes: int | None = None,
    max_chunks: int | None = None,
    min_offset: int | None = None,
) -> DataFrame:
    """Evidence file -> chunks DataFrame with bytes fetched executor-side.

    The plan DataFrame is tiny (one row per chunk); bytes never touch the
    driver. Limits mirror the reference's bounded-read semantics
    (src/pipeline/mod.rs:328-416): max_bytes caps which chunk starts are
    read, max_chunks caps chunk count. min_offset is the resume
    watermark (skip chunks already scanned, reference mod.rs:343-345).
    """
    from swiftbeaver_spark.source import evidence_length, open_evidence

    total = evidence_length(path)
    # bounds become the range endpoints directly (not post-filters), so
    # partitions stay contiguous AND evenly sized over surviving ids
    lo = 0 if min_offset is None else math.ceil(min_offset / chunk_size)
    hi = math.ceil(total / chunk_size)
    if max_bytes is not None:
        hi = min(hi, math.ceil(max_bytes / chunk_size))
    if max_chunks is not None:
        hi = min(hi, max_chunks)
    hi = max(lo, hi)

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        reader = open_evidence(path)
        try:
            for pdf in batches:
                rows = []
                for cid, start, vlen, rlen in zip(
                    pdf["chunk_id"], pdf["start"], pdf["valid_length"], pdf["read_length"]
                ):
                    rows.append(
                        (int(cid), int(start), int(vlen), reader.read_at(int(start), int(rlen)))
                    )
                yield pd.DataFrame(rows, columns=["chunk_id", "start", "valid_length", "data"])
        finally:
            reader.close()

    # Task sizing: at the production 512 MiB chunk size one chunk per
    # task is right (each output row is chunk_size+overlap bytes), but
    # small chunk sizes must NOT fan out to one-task-per-chunk — a
    # 200 MB image at 4 KiB chunks would schedule 50k near-empty tasks
    # and pay pure overhead. Target at least _MIN_TASK_BYTES of chunk
    # bytes per task (the spark.sql.files.maxPartitionBytes idea applied
    # to the arithmetic plan); big chunks keep exactly one per task.
    # Partition count comes from arithmetic, not a count() job — and
    # partitions are CONTIGUOUS id slices straight from spark.range (no
    # hash repartition), so a materialized chunk table's files hold
    # contiguous evidence runs in row order, which is what lets the
    # stream-carve strategy (carve_op.py) walk them shuffle-free.
    n_chunks = hi - lo
    if n_chunks == 0:
        return spark.createDataFrame([], schemas.CHUNKS)
    n = min(n_chunks, math.ceil(n_chunks * chunk_size / _MIN_TASK_BYTES))
    plan = _plan_range(spark, lo, hi, total, chunk_size, overlap, n)
    return plan.mapInPandas(fetch, schemas.CHUNKS)


def chunks_from_bytes(
    spark: SparkSession,
    data: bytes,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_OVERLAP,
) -> DataFrame:
    """In-memory evidence -> chunks DataFrame (test/fixture path)."""
    total = len(data)
    rows = []
    n = max(0, math.ceil(total / chunk_size))
    for cid in range(n):
        start = cid * chunk_size
        rows.append(
            (
                cid,
                start,
                min(chunk_size, total - start),
                data[start : min(start + chunk_size + overlap, total)],
            )
        )
    return spark.createDataFrame(rows, schemas.CHUNKS)


def materialize_chunks(chunks: DataFrame, path: str) -> None:
    """Persist the chunk table for repeated scans (partition pruning on
    `start` ranges replaces re-reading evidence)."""
    chunks.write.mode("overwrite").parquet(path)


def read_chunks(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(schemas.CHUNKS).parquet(path)
