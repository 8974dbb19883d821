"""Signature scan: chunks -> hits (the engine's core filter operator).

Reference parity: CPU multi-pattern scan (src/scanner/cpu.rs:40-69,
memchr-skip per pattern) + hit normalization & overlap dedup
(src/pipeline/workers.rs:136-155).

Spark design: one Arrow `mapInPandas` pass per chunk finds ALL
occurrences of every configured header pattern with C-speed
`bytes.find` loops (equivalent output to the reference's per-pattern
memchr scan, including overlapping matches and multiple patterns at
one offset). Normalization + overlap dedup stay DataFrame-native
(projection + filter) so Catalyst sees them.

Scale: scanning is embarrassingly parallel per chunk; no shuffle is
introduced — the only data movement is the (tiny) hits output. The
per-chunk hit cap mirrors the reference's gpu_max_hits_per_chunk
backstop against pathological inputs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from swiftbeaver_spark.config import EngineConfig

RAW_HITS_SCHEMA = StructType(
    [
        StructField("chunk_id", LongType(), False),
        StructField("start", LongType(), False),
        StructField("valid_length", LongType(), False),
        StructField("local_offset", LongType(), False),
        StructField("pattern_id", StringType(), False),
        StructField("file_type_id", StringType(), False),
    ]
)

MAX_HITS_PER_CHUNK = 1_000_000  # reference gpu_max_hits_per_chunk default


def compile_patterns(cfg: EngineConfig) -> list[tuple[bytes, str, str]]:
    """(pattern_bytes, pattern_id, file_type_id) triples. Distinct byte
    strings may map to several types (e.g. RIFF -> webp/wav/avi), exactly
    like the reference's per-type pattern lists."""
    out = []
    for ft in cfg.file_types:
        for pat in ft.header_patterns:
            out.append((pat.bytes, pat.pattern_id, ft.type_id))
    return out


def find_all(data: bytes, pattern: bytes, cap: int = MAX_HITS_PER_CHUNK) -> list[int]:
    """All (overlapping) occurrence offsets of `pattern` in `data`."""
    hits: list[int] = []
    pos = data.find(pattern)
    while pos != -1 and len(hits) < cap:
        hits.append(pos)
        pos = data.find(pattern, pos + 1)
    return hits


def scan_chunks(chunks: DataFrame, cfg: EngineConfig) -> DataFrame:
    """chunks(chunk_id, start, valid_length, data) -> raw hits."""
    patterns = compile_patterns(cfg)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, start, vlen, data in zip(
                pdf["chunk_id"], pdf["start"], pdf["valid_length"], pdf["data"]
            ):
                blob = bytes(data)
                budget = MAX_HITS_PER_CHUNK
                for pat, pat_id, ft_id in patterns:
                    if budget <= 0:
                        break
                    offs = find_all(blob, pat, budget)
                    budget -= len(offs)
                    for off in offs:
                        rows.append((int(cid), int(start), int(vlen), off, pat_id, ft_id))
            yield pd.DataFrame(
                rows,
                columns=[
                    "chunk_id",
                    "start",
                    "valid_length",
                    "local_offset",
                    "pattern_id",
                    "file_type_id",
                ],
            )

    return chunks.mapInPandas(scan, RAW_HITS_SCHEMA)


def normalize_hits(raw_hits: DataFrame) -> DataFrame:
    """Overlap dedup + globalization: drop hits whose local offset falls in
    the overlap tail (owned by the next chunk), project to global offsets.
    Pure projection+filter — fully Catalyst-visible."""
    return (
        raw_hits.where(F.col("local_offset") < F.col("valid_length"))
        .select(
            (F.col("start") + F.col("local_offset")).alias("global_offset"),
            F.col("file_type_id"),
            F.col("pattern_id"),
        )
    )


def scan_and_normalize(chunks: DataFrame, cfg: EngineConfig) -> DataFrame:
    return normalize_hits(scan_chunks(chunks, cfg))
