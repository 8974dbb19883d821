"""Carve operator: hits DataFrame -> carved_files DataFrame.

Reference parity: carve worker threads dispatching per-hit handlers
(src/pipeline/workers.rs:208-297). The per-format end-detection state
machines stay Python (SURVEY §2.3 — inherently sequential per hit);
the fan-out is Spark.

Two evidence-access strategies (SURVEY §7.3):

1. `carve_hits_with_evidence` — each task opens the evidence path and
   does positioned reads. Right when evidence is a POSIX/shared path
   (local runs, NFS, fuse-mounted object store). No shuffle at all:
   hits stream through mapInPandas.

2. `carve_hits_with_chunks` — pure-DataFrame: hits are range-joined to
   the chunk table (equi-join on exploded chunk ids — no O(n^2) range
   join), grouped per hit, reassembled into a bounded window, carved.
   This is the 100 TB path: chunk rows are co-partitioned by chunk_id,
   the join is a shuffle on narrow keys, and each hit only ever
   materializes `min(max_size, window_cap)` bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from swiftbeaver_spark import schemas
from swiftbeaver_spark.carvers import build_registry, carve_hit
from swiftbeaver_spark.carvers.base import FileReader, Reader
from swiftbeaver_spark.config import EngineConfig

_CARVE_COLUMNS = [f.name for f in schemas.CARVED_FILES.fields]

# largest per-type window the chunk-join strategy accepts: one hit's
# reassembled window is a single row, and Arrow record batches keep
# 32-bit offsets per binary column — stay safely under 2 GiB
_ROW_CAP_LIMIT = 3 * (1 << 29)  # 1.5 GiB


def _record_to_tuple(rec) -> tuple:
    return (
        rec.file_type,
        rec.path,
        rec.extension,
        rec.global_start,
        rec.global_end,
        rec.size,
        rec.md5,
        rec.sha256,
        rec.validated,
        rec.truncated,
        rec.errors,
        rec.pattern_id,
    )


def carve_hits_with_evidence(
    hits: DataFrame, evidence_path: str, cfg: EngineConfig
) -> DataFrame:
    """Carve via positioned reads against the evidence path (strategy 1)."""

    def carve(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from swiftbeaver_spark.source import open_evidence

        registry = build_registry(cfg)
        reader = open_evidence(evidence_path)
        try:
            for pdf in batches:
                rows = []
                for off, ft_id, pat_id in zip(
                    pdf["global_offset"], pdf["file_type_id"], pdf["pattern_id"]
                ):
                    rec = carve_hit(reader, int(off), str(ft_id), str(pat_id), registry, cfg)
                    if rec is not None:
                        rows.append(_record_to_tuple(rec))
                yield pd.DataFrame(rows, columns=_CARVE_COLUMNS)
        finally:
            reader.close()

    # spread hits across tasks; carving cost varies by type, so round-robin
    # by offset avoids one task owning all expensive hits
    n = max(hits.sparkSession.sparkContext.defaultParallelism, 1)
    return hits.repartition(n).mapInPandas(carve, schemas.CARVED_FILES)


class WindowReader(Reader):
    """Reader over a reassembled byte window anchored at a global offset.
    Reads outside the window return empty (treated as EOF by handlers,
    which then mark truncation — same as the reference at evidence end).

    Tracks `hit_window_end`: a read ran past the window's data while the
    evidence itself continues — i.e. the window cap, not evidence EOF,
    is what cut the handler short. Callers surface that as an explicit
    `over_cap` error instead of letting it masquerade as truncation at
    end-of-evidence."""

    def __init__(self, window_start: int, data: bytes, evidence_len: int):
        self._start = window_start
        self._data = data
        self._len = evidence_len
        self.hit_window_end = False

    def length(self) -> int:
        return self._len

    def read_at(self, offset: int, length: int) -> bytes:
        rel = offset - self._start
        if rel < 0 or length <= 0:
            return b""
        # a read wanting bytes past the window while the EVIDENCE
        # continues past the window means the cap (not EOF) cut it —
        # regardless of how far past the end the read asked to go
        if rel + length > len(self._data) and self._start + len(self._data) < self._len:
            self.hit_window_end = True
        if rel >= len(self._data):
            return b""
        return self._data[rel : rel + length]


def carve_hits_with_chunks(
    hits: DataFrame,
    chunks: DataFrame,
    cfg: EngineConfig,
    window_cap: int | None = None,
    evidence_len: int | None = None,
    window_caps: dict[str, int] | None = None,
) -> DataFrame:
    """Carve from the chunk table alone (strategy 2, no evidence re-read).

    Each hit claims the chunk range [offset, offset + window) where
    window = min(type max_size, per-type cap); candidate chunk ids are an
    exploded `sequence`, so the range join is an equi-join on chunk_id.

    `evidence_len`: total evidence length — the chunk *plan* knows it
    arithmetically, so callers thread it in rather than paying a full
    aggregation job over the chunk table mid-plan. When None, each
    group uses its own window extent as EOF (same truncation outcome,
    but over-cap cuts can't be told apart from evidence end).

    `window_caps`: per-type overrides of `window_cap` — big-media types
    (mov/webm/wmv, max_size 10 GiB) can be given a larger window than
    the default without inflating every hit's claimed range. A hit the
    window still cuts short gets an explicit `over_cap` error instead
    of a silent eof-style truncation.

    Memory bounds: each grouped row carries one hit's whole window, so
    JVM->Python transfer relies on the session's
    spark.sql.execution.arrow.maxBytesPerBatch (session.py sets 256 MiB
    — without it, record-bounded batching would pack 2048 windows of up
    to 128 MiB into one Arrow batch). A single row must also stay under
    Arrow's 2 GiB per-record-batch column limit, so per-type caps are
    rejected past _ROW_CAP_LIMIT — types genuinely needing multi-GiB
    windows belong on strategy 1 (positioned reads).
    """
    registry_types = {ft.type_id: ft.max_size for ft in cfg.file_types}
    cap = window_cap if window_cap is not None else 128 * 1024 * 1024
    caps = window_caps or {}
    worst = max(
        (min(ms, caps.get(tid, cap)) for tid, ms in registry_types.items()),
        default=0,
    )
    if worst > _ROW_CAP_LIMIT:
        raise ValueError(
            f"effective carve window {worst} exceeds the {_ROW_CAP_LIMIT}-byte "
            "single-row bound of the chunk-join strategy (Arrow 2 GiB "
            "record-batch limit); carve such types via "
            "carve_hits_with_evidence instead"
        )
    chunk_size = cfg.chunk_size

    max_size_map = F.create_map(
        *[
            item
            for tid, ms in registry_types.items()
            for item in (F.lit(tid), F.lit(min(ms, caps.get(tid, cap))))
        ]
    )
    window_end = (F.col("global_offset") + max_size_map[F.col("file_type_id")]).alias("window_end")
    hit_rows = hits.select(
        "global_offset",
        "file_type_id",
        "pattern_id",
        window_end,
        F.monotonically_increasing_id().alias("hit_id"),
    )
    claimed = hit_rows.select(
        "*",
        F.explode(
            F.sequence(
                # back up 512 bytes: tar/mobi anchor their carve start before
                # the hit offset (signature sits inside the header)
                F.greatest(F.lit(0), (F.col("global_offset") - 512) / chunk_size).cast("long"),
                ((F.col("window_end") - 1) / chunk_size).cast("long"),
            )
        ).alias("chunk_id"),
    )
    joined = claimed.join(chunks, "chunk_id", "inner").select(
        "hit_id",
        "global_offset",
        "file_type_id",
        "pattern_id",
        "start",
        "valid_length",
        "data",
    )

    # Reassemble each hit's window JVM-side (collect_list + sort_array —
    # struct ordering sorts by `start` first, and starts are unique per
    # hit), then carve whole ARROW BATCHES of hits per Python call.
    # NOT groupBy().applyInPandas(carve_one_group): that invokes Python
    # once per hit and rebuilds the carver registry each time — measured
    # 106x slower than positioned reads on the 50k-hit jpeg-dense image
    # (tools/bench_carve_scale.py, round 7) purely from per-group
    # overhead. Batched, the registry builds once per task and the
    # per-hit cost is the state machine itself.
    grouped = joined.groupBy(
        "hit_id", "global_offset", "file_type_id", "pattern_id"
    ).agg(
        F.sort_array(
            F.collect_list(F.struct("start", "valid_length", "data"))
        ).alias("parts")
    )

    def carve_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        registry = build_registry(cfg)
        for pdf in batches:
            rows = []
            for off, ft_id, pat_id, parts in zip(
                pdf["global_offset"],
                pdf["file_type_id"],
                pdf["pattern_id"],
                pdf["parts"],
            ):
                window_start = int(parts[0]["start"])
                # valid (non-overlap) regions concatenate contiguously;
                # the final chunk contributes its overlap tail too
                segs = [
                    bytes(p["data"])[: int(p["valid_length"])] for p in parts[:-1]
                ]
                segs.append(bytes(parts[-1]["data"]))
                data = b"".join(segs)
                ev_len = (
                    evidence_len
                    if evidence_len is not None
                    else window_start + len(data)
                )
                reader = WindowReader(window_start, data, ev_len)
                rec = carve_hit(
                    reader, int(off), str(ft_id), str(pat_id), registry, cfg
                )
                if rec is not None:
                    if reader.hit_window_end:
                        rec.errors = [*rec.errors, "over_cap"]
                    rows.append(_record_to_tuple(rec))
            yield pd.DataFrame(rows, columns=_CARVE_COLUMNS)

    return grouped.mapInPandas(carve_batches, schemas.CARVED_FILES)
