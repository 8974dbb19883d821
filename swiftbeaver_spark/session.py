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


def get_spark(
    app_name: str = "swiftbeaver-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # deterministic timestamps: the reference stores naive UTC
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for every pandas UDF / mapInPandas crossing
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
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
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
