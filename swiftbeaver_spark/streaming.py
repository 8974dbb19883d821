"""Structured Streaming front-end: continuous carving over an arriving
chunk table.

The reference is a batch engine with streaming mechanics — bounded
channels, periodic flush, checkpoint/resume (SURVEY §2.6). Spark's
native continuous analog: the chunk table lands as parquet files (an
ingest job appends them as evidence is acquired), `readStream` picks
up new chunk files, the SAME scan/normalize logic runs per micro-batch
through `foreachBatch`, and the sink appends per-table outputs.
Checkpointing is Spark's own (`checkpointLocation`) — exactly replaces
the reference's next_offset resume file, including crash recovery.

foreachBatch (not a pure streaming DAG) because carving needs the
mapInPandas fan-out plus multi-table writes — both batch-only APIs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from swiftbeaver_spark import schemas
from swiftbeaver_spark.carve_op import carve_hits_with_chunks
from swiftbeaver_spark.config import EngineConfig
from swiftbeaver_spark.progress import ProgressSnapshot, ProgressTracker
from swiftbeaver_spark.scanner import scan_and_normalize


def stream_chunks(spark: SparkSession, chunk_dir: str, max_files_per_trigger: int = 4) -> DataFrame:
    """Streaming source over an append-only chunk-table directory."""
    return (
        spark.readStream.schema(schemas.CHUNKS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(chunk_dir)
    )


def start_scan_stream(
    spark: SparkSession,
    chunk_dir: str,
    out_dir: str,
    cfg: EngineConfig,
    checkpoint_dir: str,
    carve: bool = True,
    available_now: bool = False,
    on_batch: Callable[[int, int], None] | None = None,
    on_progress: Callable[[ProgressSnapshot], None] | None = None,
    total_bytes: int | None = None,
) -> StreamingQuery:
    """chunks stream -> hits (+ carved files) appended per micro-batch.

    Each micro-batch is a bounded chunk set, so the batch carve path
    (chunk-range join) applies unchanged — the stream IS the reference's
    pipelined chunk loop with Spark-managed backpressure and restart.

    `on_progress` receives a ProgressSnapshot per micro-batch (the
    reference's periodic MiB/s + ETA tick, src/pipeline/mod.rs:526-583);
    pass `total_bytes` (known evidence size) to get pct/ETA.
    """
    chunks_stream = stream_chunks(spark, chunk_dir)
    tracker = ProgressTracker(total_bytes=total_bytes)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        hits = scan_and_normalize(batch_df, cfg)
        hits.write.mode("append").parquet(f"{out_dir}/hits")
        n_hits = 0
        if carve:
            carved = carve_hits_with_chunks(hits, batch_df, cfg)
            carved.write.mode("append").parquet(f"{out_dir}/carved_files")
        if on_progress is not None:
            # partial-agg over the persisted batch — no source re-scan
            stats = batch_df.agg(
                F.count("*").alias("n"),
                F.coalesce(F.sum("valid_length"), F.lit(0)).alias("b"),
            ).collect()[0]
            on_progress(tracker.tick(batch_id, stats["n"], stats["b"]))
        if on_batch is not None:
            n_hits = spark.read.parquet(f"{out_dir}/hits").count()
            on_batch(batch_id, n_hits)
        batch_df.unpersist()

    writer = (
        chunks_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
