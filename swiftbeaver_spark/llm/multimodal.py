"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Arrow-batched decode/feature plumbing.

The container has no image/audio codecs, so the decode kernels are
STUBBED: `decode_image` raises NotImplementedError by design, and the
deterministic fake (`fake_decode_meta`) stands in so the Spark-side
plumbing — schema, partitioning, mapInPandas batch shape, feature
columns — is real and tested end-to-end. Swap `_DECODERS` entries for
Pillow/torchaudio/av kernels on a cluster with codecs installed.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# canonical multimodal row: opaque payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), False),
        StructField("source_uri", StringType(), True),
    ]
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("byte_size", LongType(), False),
        StructField("sha256", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)


def decode_image(payload: bytes) -> tuple[int, int]:
    """Real image decode — requires an imaging library not present in
    this container. Plug Pillow here on a real cluster."""
    raise NotImplementedError(
        "image decode requires an imaging library (e.g. Pillow); "
        "wire it into _DECODERS['image'] on a codec-enabled cluster"
    )


def fake_decode_meta(modality: str, payload: bytes) -> tuple[int | None, int | None, int | None]:
    """Deterministic stand-in decode: dimensions/duration derived from a
    content hash so tests are stable and the pipeline shape is real."""
    h = struct.unpack(">I", hashlib.sha256(payload).digest()[:4])[0]
    if modality == "image":
        return 64 + h % 1920, 64 + (h >> 8) % 1080, None
    if modality == "audio":
        return None, None, 1000 + h % 600_000
    if modality == "video":
        return 320 + h % 1600, 240 + (h >> 8) % 840, 1000 + (h >> 16) % 3_600_000
    return None, None, None


def fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic unit-norm feature vector from the payload digest —
    the stand-in for a real embedding model."""
    digest = hashlib.sha256(payload).digest()
    vals = [struct.unpack(">h", digest[2 * i : 2 * i + 2])[0] / 32768.0 for i in range(dim)]
    n = sum(v * v for v in vals) ** 0.5 or 1.0
    return [v / n for v in vals]


def extract_media_meta(media: DataFrame, feature_dim: int = 8) -> DataFrame:
    """media rows -> typed metadata + feature vector via one Arrow pass.

    At 100 TB the payloads never leave the executors: mapInPandas sees
    Arrow record batches; repartition upstream by byte_size buckets to
    balance skew from large videos."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, modality, payload in zip(pdf["media_id"], pdf["modality"], pdf["payload"]):
                blob = bytes(payload)
                w, h, dur = fake_decode_meta(str(modality), blob)
                rows.append(
                    (
                        int(mid),
                        str(modality),
                        len(blob),
                        hashlib.sha256(blob).hexdigest(),
                        w,
                        h,
                        dur,
                        fake_feature(blob, feature_dim),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "modality", "byte_size", "sha256",
                    "width", "height", "duration_ms", "feature",
                ],
            )

    return media.mapInPandas(work, MEDIA_META_SCHEMA)


def carved_files_as_media(carved: DataFrame, evidence_path: str) -> DataFrame:
    """Bridge: the forensic engine's carved_files table IS a multimodal
    table — binary payload ranges + typed metadata. Materialize payloads
    from evidence ranges for downstream media ops."""
    image_types = ("jpeg", "png", "gif", "bmp", "tiff", "webp", "ico")
    audio_types = ("mp3", "wav", "ogg")
    video_types = ("mp4", "mov", "avi", "webm", "wmv")
    modality = (
        F.when(F.col("file_type").isin(*image_types), "image")
        .when(F.col("file_type").isin(*audio_types), "audio")
        .when(F.col("file_type").isin(*video_types), "video")
    )
    rows = carved.withColumn("modality", modality).where(F.col("modality").isNotNull())

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from swiftbeaver_spark.source import open_evidence

        reader = open_evidence(evidence_path)
        try:
            for pdf in batches:
                out = []
                for i, (start, size, ftype, modality) in enumerate(
                    zip(pdf["global_start"], pdf["size"], pdf["file_type"], pdf["modality"])
                ):
                    out.append(
                        (
                            int(start),
                            str(modality),
                            str(ftype),
                            reader.read_at(int(start), int(size)),
                            None,
                        )
                    )
                yield pd.DataFrame(
                    out, columns=["media_id", "modality", "mime", "payload", "source_uri"]
                )
        finally:
            reader.close()

    return rows.select("global_start", "size", "file_type", "modality").mapInPandas(
        fetch, MEDIA_SCHEMA
    )
