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
    # cumulative hit count lives driver-side: O(1) per tick like the
    # reference's progress counter (src/pipeline/mod.rs:526-583) — never
    # re-read the accumulated output directory, which would cost
    # O(total-written-so-far) per batch (quadratic over a long run)
    hits_total = [0]

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        hits = scan_and_normalize(batch_df, cfg)
        if on_batch is not None:
            hits = hits.persist()
        hits.write.mode("append").parquet(f"{out_dir}/hits")
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
            # count THIS batch's hits off the persisted frame (no output
            # re-scan) and fold into the driver-side running total
            hits_total[0] += hits.count()
            on_batch(batch_id, hits_total[0])
            hits.unpersist()
        batch_df.unpersist()

    writer = (
        chunks_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Custom stateful streaming operator: gap-based sessionization over
    an event stream (the event-time analog of the batch q05 sessionize).

    applyInPandasWithState keeps one (session_start, last_seen, count)
    record per user: a batch's events fold into the open session,
    emitting a closed session whenever the gap exceeds `gap_minutes`;
    the open session closes via EventTimeTimeout once the watermark
    passes last_seen + gap, so late data within the watermark still
    extends its session and sessions emit exactly once. State is O(1)
    per active user — nothing buffers unboundedly.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    gap_us = gap_minutes * 60 * 1_000_000
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_us", LongType()),
            StructField("last_us", LongType()),
            StructField("n", LongType()),
        ]
    )

    def fn(key, pdfs, state: GroupState):
        user = int(key[0])

        def session_row(s: int, l: int, n: int):
            return (
                user,
                pd.Timestamp(s, unit="us"),
                pd.Timestamp(l, unit="us"),
                n,
            )

        rows = []
        if state.hasTimedOut:
            s, l, n = state.get
            rows.append(session_row(s, l, n))
            state.remove()
        else:
            stamps: list[int] = []
            for pdf in pdfs:
                stamps.extend(int(v.value) // 1000 for v in pdf[ts_col])
            stamps.sort()
            if state.exists:
                s, l, n = state.get
            else:
                s, l, n = None, None, 0
            for tus in stamps:
                if s is None:
                    s, l, n = tus, tus, 1
                elif tus - l > gap_us:
                    rows.append(session_row(s, l, n))
                    s, l, n = tus, tus, 1
                else:
                    l, n = max(l, tus), n + 1
            if s is not None:
                state.update((s, l, n))
                # close the open session once the watermark passes the gap
                timeout_ms = (l + gap_us) // 1000 + 1
                state.setTimeoutTimestamp(
                    max(timeout_ms, state.getCurrentWatermarkMs() + 1)
                )
        yield pd.DataFrame(
            rows, columns=["user_id", "session_start", "session_end", "n_events"]
        )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col))
        .applyInPandasWithState(
            fn,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def neardup_probe_stream(
    batches: DataFrame,
    index_bands: DataFrame,
    corpus_texts: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.8,
    available_now: bool = True,
):
    """Continuous-ingest near-dup: each micro-batch of new documents
    probes the maintained MinHash-LSH band index
    (llm/dedup.py::incremental_minhash_near_dups) and appends its hits
    — the streaming face of the q95 batch probe, and the production
    loop a continuous crawl runs: the 100 TB corpus is banded once;
    only arriving documents compute signatures.

    foreachBatch (not a pure streaming DAG) because the probe needs a
    stream-batch -> static equi-join plus an Arrow/JVM verify — the
    same reason the scan pipeline uses it (see module docstring).
    Exactly-once: the parquet sink + checkpoint make batch replays
    idempotent."""
    from swiftbeaver_spark.llm.dedup import incremental_minhash_near_dups

    def process(batch_df: DataFrame, batch_id: int) -> None:
        hits = incremental_minhash_near_dups(
            batch_df, index_bands, corpus_texts, threshold=threshold
        )
        hits.write.mode("append").parquet(out_dir)

    writer = (
        batches.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def crawl_ingest_stream(
    archives: DataFrame,
    seen_digests: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Continuous CRAWL ingest: micro-batches of WARC archives are
    parsed by the real reader (llm/warc.py::warc_records), their
    response payloads content-digested, deduplicated IN-BATCH (min
    doc_id per digest), against the already-ingested corpus
    (`seen_digests`, the q58 incremental shape), AND against prior
    batches (the accepted table in `out_dir` is reread per batch),
    then appended exactly-once. This is q131's batch pipeline as the
    loop a crawler actually runs: the corpus is represented only by
    its digest table; arriving archives do all the work.

    foreachBatch for the same reason as the siblings above: the batch
    must run a mapInPandas parse plus static joins. Checkpoint +
    parquet append keep batch replays idempotent (re-runs of an
    already-committed batch re-reject their rows via the accepted
    table)."""
    from pyspark.sql import functions as F

    from swiftbeaver_spark.llm.warc import warc_records

    def _read_accepted(spark: SparkSession):
        """Probe the accepted table through Spark's own reader so the
        check works on ANY Hadoop-compatible filesystem (HDFS/S3/local),
        not just the driver's local disk. A missing or still-empty path
        raises AnalysisException ([PATH_NOT_FOUND] / unable to infer
        schema), which means 'no prior batches' — return None. Any
        OTHER failure (S3 hiccup, permissions, corrupt footer) must
        fail the batch rather than silently disable cross-batch dedup
        and append duplicates, so only AnalysisException is caught."""
        from pyspark.errors import AnalysisException

        try:
            return spark.read.parquet(out_dir).select("digest")
        except AnalysisException:  # path absent or no footer yet
            return None

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        recs = warc_records(batch_df)
        new = recs.select(
            F.substring(F.col("record_id"), 35, 12).cast("bigint").alias("doc_id"),
            F.md5(F.col("payload")).alias("digest"),
        )
        keep = new.groupBy("digest").agg(F.min("doc_id").alias("doc_id"))
        keep = keep.join(seen_digests, "digest", "left_anti")
        accepted = _read_accepted(spark)
        if accepted is not None:
            keep = keep.join(accepted, "digest", "left_anti")
        keep.select("doc_id", "digest").write.mode("append").parquet(out_dir)

    writer = (
        archives.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
