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


_SLAB = 8 * 1024 * 1024


def scan_blob(
    blob: bytes, patterns: list[tuple[bytes, str, str]], budget: int = MAX_HITS_PER_CHUNK
) -> list[tuple[int, str, str]]:
    """All pattern occurrences in one chunk: (local_offset, pattern_id,
    file_type_id), overlapping matches included.

    Two strategies by pattern class:
    - first byte != 0: C memmem (`bytes.find`) — skips at memory speed
      because the first byte is rare in typical evidence.
    - first byte == 0 and len >= 4 (the mp4/mov/ico signatures): memmem
      degenerates on zero-filled regions (every byte partially matches),
      so a numpy uint32-prefix compare finds candidate positions at
      vector speed, then each candidate verifies the full pattern.
      Slabbed to bound temp memory on 512 MiB chunks.
    """
    import numpy as np

    out: list[tuple[int, str, str]] = []
    vec_pats: list[tuple[bytes, str, str]] = []
    for pat, pid, ftid in patterns:
        if budget <= 0:
            break
        # vectorized path ONLY where memmem degenerates: zero-led
        # patterns over zero-filled regions. Nonzero-led patterns skip
        # at memory speed in C regardless of length, and the numpy set
        # machinery is pure overhead on small blobs.
        if len(pat) >= 4 and pat[0] == 0:
            vec_pats.append((pat, pid, ftid))
        else:
            offs = find_all(blob, pat, budget)
            budget -= len(offs)
            out.extend((o, pid, ftid) for o in offs)

    if vec_pats and len(blob) >= 4 and budget > 0:
        arr = np.frombuffer(blob, dtype=np.uint8)
        n = len(blob)
        prefixes = np.array(
            sorted({int.from_bytes(p[:4], "little") for p, _, _ in vec_pats}),
            dtype=np.uint32,
        )
        candidates: list[int] = []
        # zero-copy uint32 views at the 4 byte alignments: position
        # p = a + 4*i is covered by view a — no casts, no temp arrays;
        # one np.isin pass per alignment covers every >=4-byte pattern
        for a in range(4):
            usable = (n - a) // 4 * 4
            if usable < 4:
                continue
            w = arr[a : a + usable].view("<u4")
            mask = np.isin(w, prefixes) if prefixes.size > 1 else w == prefixes[0]
            idx = np.nonzero(mask)[0]
            if idx.size:
                candidates.extend((idx * 4 + a).tolist())
        for absolute in sorted(candidates):
            if budget <= 0:
                break
            for pat, pid, ftid in vec_pats:
                if blob.startswith(pat, absolute):
                    out.append((absolute, pid, ftid))
                    budget -= 1
    return out


def _pad_byte(patterns: list[tuple[bytes, str, str]]) -> int | None:
    """A byte value absent from every pattern — joining chunk blobs with
    a run of it (max pattern length - 1) makes cross-blob matches
    impossible, so one C-speed scan covers a whole Arrow batch."""
    used = set()
    for pat, _, _ in patterns:
        used.update(pat)
    for b in range(256):
        if b not in used:
            return b
    return None


def scan_chunks(chunks: DataFrame, cfg: EngineConfig) -> DataFrame:
    """chunks(chunk_id, start, valid_length, data) -> raw hits.

    Batch-fused: each Arrow batch's blobs are joined with a pad run and
    scanned in ONE pass per pattern (C memmem / numpy), then hit offsets
    map back to their chunk by searchsorted. Amortizes per-chunk Python
    overhead — identical hits to per-chunk scan_blob (the pad byte
    occurs in no pattern, so no match can cross a boundary)."""
    import numpy as np

    patterns = compile_patterns(cfg)
    max_len = max((len(p) for p, _, _ in patterns), default=1)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pad = _pad_byte(patterns)
        for pdf in batches:
            rows = []
            blobs = [bytes(d) for d in pdf["data"]]
            if blobs and pad is not None:
                sep = bytes([pad]) * (max_len - 1)
                buf = sep.join(blobs)
                starts = np.cumsum([0] + [len(b) + len(sep) for b in blobs[:-1]])
                cids = pdf["chunk_id"].to_numpy()
                gstarts = pdf["start"].to_numpy()
                vlens = pdf["valid_length"].to_numpy()
                counts: dict[int, int] = {}
                for off, pat_id, ft_id in scan_blob(buf, patterns, budget=1 << 62):
                    i = int(np.searchsorted(starts, off, side="right")) - 1
                    if counts.get(i, 0) >= MAX_HITS_PER_CHUNK:
                        continue
                    counts[i] = counts.get(i, 0) + 1
                    rows.append(
                        (
                            int(cids[i]),
                            int(gstarts[i]),
                            int(vlens[i]),
                            off - int(starts[i]),
                            pat_id,
                            ft_id,
                        )
                    )
            else:
                for cid, start, vlen, data in zip(
                    pdf["chunk_id"], pdf["start"], pdf["valid_length"], pdf["data"]
                ):
                    for off, pat_id, ft_id in scan_blob(bytes(data), patterns):
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


def scan_evidence(spark, path: str, cfg: EngineConfig, plan: DataFrame | None = None) -> DataFrame:
    """Fused fetch+scan straight off the evidence file: the chunk *plan*
    (pure arithmetic rows) distributes, each task does positioned reads
    and scans in the same Python pass — chunk bytes never cross the
    JVM<->Python boundary (2x less serialization than fetch-then-scan;
    the dominant cost at local scale, and still the right shape on a
    cluster with shared storage)."""
    import os

    from swiftbeaver_spark.chunking import plan_chunks

    patterns = compile_patterns(cfg)
    if plan is None:
        total = os.path.getsize(path)
        plan = plan_chunks(spark, total, cfg.chunk_size, cfg.overlap)
        if cfg.max_bytes is not None:
            plan = plan.where(F.col("start") < int(cfg.max_bytes))
        if cfg.max_chunks is not None:
            plan = plan.where(F.col("chunk_id") < int(cfg.max_chunks))

    def fused(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with open(path, "rb") as fh:
            for pdf in batches:
                rows = []
                for cid, start, vlen, rlen in zip(
                    pdf["chunk_id"], pdf["start"], pdf["valid_length"], pdf["read_length"]
                ):
                    fh.seek(int(start))
                    blob = fh.read(int(rlen))
                    for off, pat_id, ft_id in scan_blob(blob, patterns):
                        rows.append(
                            (int(cid), int(start), int(vlen), off, pat_id, ft_id)
                        )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "chunk_id", "start", "valid_length",
                        "local_offset", "pattern_id", "file_type_id",
                    ],
                )

    n_parts = max(plan.sparkSession.sparkContext.defaultParallelism, 1)
    raw = plan.repartition(n_parts).mapInPandas(fused, RAW_HITS_SCHEMA)
    return normalize_hits(raw)
