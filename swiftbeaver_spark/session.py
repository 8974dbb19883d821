"""SparkSession factory with scale-oriented defaults.

Local tests run on local[N]; the same conf translates to a 1000-executor
cluster: AQE handles skew/coalescing at runtime, Arrow keeps the
Python<->JVM boundary vectorized, UTC session timezone preserves the
reference's naive-UTC timestamp semantics (SwiftBeaver stores
NaiveDateTime, src/parsers/time.rs).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def get_spark(
    app_name: str = "swiftbeaver-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    rocksdb_state: bool | None = None,
) -> SparkSession:
    """`rocksdb_state` selects the RocksDB streaming state-store
    provider (ships in the Spark distribution with rocksdbjni). The
    default HDFS-backed store keeps every key in executor heap — fine
    locally, but the stateful streams (sessionization q37, dedup q52,
    near-dup probe q104, crawl frontier q140, stream joins q53/q149)
    carry state proportional to key cardinality, and at 100 TB that
    exceeds heap; RocksDB spills state to local SSD with only the
    working set resident and adds changelog/snapshot checkpointing.
    Off by default locally (HDFS store is faster at test state sizes);
    opt in per run via the arg or SPARK_GRAFT_ROCKSDB=1. Semantics are
    pinned identical by tests/test_engine_features.py::
    test_sessionize_stream_rocksdb_state_store. It is a plain SQL conf,
    so existing sessions can flip it per query with spark.conf.set."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if rocksdb_state is None:
        rocksdb_state = os.environ.get("SPARK_GRAFT_ROCKSDB", "0") == "1"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # deterministic timestamps: the reference stores naive UTC
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for every pandas UDF / mapInPandas crossing
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # byte bound on JVM->Python Arrow batches (batch closes when
        # EITHER limit is hit; a single oversized row still ships as a
        # one-row batch). Without it, batches are record-bounded only:
        # rows carrying reassembled carve windows (up to 128 MiB each,
        # carve_op.py strategy 2) or production 512 MiB chunks would
        # pack 2048 rows -> hundreds of GiB per batch on both sides of
        # the boundary (round-7 review finding)
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str(256 << 20))
        # AQE: runtime coalescing + skew-join handling; essential at scale
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # coalesce small shuffles by SIZE, not default parallelism:
        # the dedup pipelines' ~100k-row shuffles otherwise run 32
        # near-empty tasks per stage across ~6 AQE stage waves —
        # scheduling, not compute. Size-first coalescing collapses
        # them to a handful of tasks at bench SF and is a no-op at
        # 100 TB, where every shuffle partition exceeds the advisory
        # size anyway (VERDICT r5 item 3; measured in BASELINE.md r6)
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        # keep broadcast threshold default (10 MB); dims here are tiny
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))),
        )
        # binary chunk rows are large; keep file-split sizing in line
        .config("spark.sql.files.maxPartitionBytes", "256m")
        # local mode puts ALL executor threads in the driver JVM, so
        # size the heap by thread count: 32 threads x ~0.5 GB/thread —
        # the per-thread budget a real cluster executor gets (e.g.
        # 8 threads / 4 GB) — not a single-driver 8g. The one-pass
        # memory law (r14, measured bracket in SCALE.md): the floor is
        # 0.094-0.125 GB/thread at the 16 MiB granule now that scan
        # partitions are size-bounded, so 0.5 carries 4x margin and
        # survived 20 GiB evidence at HALF this default. Override via
        # SPARK_DRIVER_MEMORY.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
    )
    if rocksdb_state:
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
