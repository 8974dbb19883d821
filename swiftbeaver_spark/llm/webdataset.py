"""WebDataset-style tar-shard reader: the standard multimodal training
input layout (one tar per shard; each sample = consecutive members
sharing a basename, e.g. `00042.jpg` + `00042.json` + `00042.txt`).

Spark-first shape: `binaryFile` lists and reads whole shards as rows
(path, content) — Spark distributes shard files across executors, one
task per shard, which is exactly WebDataset's own parallelism unit —
then an Arrow-batched pass untars in-memory and explodes members to
(sample_key, ext, payload) rows. Payloads never touch the driver; the
downstream multimodal ops (extract_media_meta) consume the rows
directly.

Scale: shards are the split unit (a 100 TB corpus = ~100k 1 GB
shards); `binaryFile` gives locality-aware scheduling and the untar is
pure per-shard CPU with no shuffle. Sample grouping is a narrow
per-shard operation because WebDataset guarantees members of a sample
are contiguous within one shard.
"""

from __future__ import annotations

import io
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WDS_SCHEMA = StructType(
    [
        StructField("shard", StringType(), False),
        StructField("sample_key", StringType(), False),
        StructField("ext", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("size", LongType(), False),
    ]
)


def _split_key(name: str) -> tuple[str, str]:
    """WebDataset key split: basename up to the FIRST dot is the
    sample key; the rest is the (possibly dotted) extension."""
    base = os.path.basename(name)
    if "." in base:
        key, ext = base.split(".", 1)
    else:
        key, ext = base, ""
    return key, ext


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """tar shards under `path` -> one row per member:
    (shard, sample_key, ext, payload, size). Group downstream by
    (shard, sample_key) to reassemble samples."""
    shards = spark.read.format("binaryFile").load(path)

    def untar(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    for m in tf:
                        if not m.isfile():
                            continue
                        fh = tf.extractfile(m)
                        if fh is None:
                            continue
                        data = fh.read()
                        key, ext = _split_key(m.name)
                        rows.append((str(p), key, ext, data, len(data)))
            yield pd.DataFrame(
                rows, columns=["shard", "sample_key", "ext", "payload", "size"]
            )

    return shards.select("path", "content").mapInPandas(untar, WDS_SCHEMA)


def samples(members: DataFrame) -> DataFrame:
    """Member rows -> one row per sample with a map ext -> payload.
    The groupBy key is (shard, sample_key): sample members live in one
    shard by the format's contract, so the shuffle moves each sample
    once and never crosses shard boundaries logically."""
    from pyspark.sql import functions as F

    return members.groupBy("shard", "sample_key").agg(
        F.map_from_entries(
            F.collect_list(F.struct("ext", "payload"))
        ).alias("parts"),
        F.sum("size").cast("long").alias("total_bytes"),
        F.count("*").cast("long").alias("n_parts"),
    )
