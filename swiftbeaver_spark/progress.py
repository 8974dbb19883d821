"""Progress reporting: per-tick throughput + ETA snapshots.

Reference parity: the native pipeline emits bytes-scanned, MiB/s, and
ETA on a periodic tick while workers drain the chunk queue
(src/pipeline/mod.rs:526-583). Spark's analog of the tick is the
micro-batch boundary: each foreachBatch invocation reports the bytes
it processed and the tracker folds that into cumulative rate/ETA.

The tracker is driver-side and O(1) per tick — it never touches
executor data beyond the per-batch byte count the batch plan already
aggregates (a partial-agg over the persisted batch, no extra scan of
the source).
"""

from __future__ import annotations

import time
from dataclasses import dataclass


@dataclass(frozen=True)
class ProgressSnapshot:
    """One progress tick (reference ProgressUpdate, mod.rs:526-583)."""

    batch_id: int
    chunks_done: int
    bytes_scanned: int
    total_bytes: int | None  # None when the stream is unbounded
    elapsed_sec: float
    mib_per_s: float
    eta_sec: float | None  # None when total unknown or rate is 0
    pct: float | None  # None when total unknown

    def __str__(self) -> str:  # the reference's human tick line
        pct = f"{self.pct:5.1f}%" if self.pct is not None else "  ?  "
        eta = f"{self.eta_sec:6.0f}s" if self.eta_sec is not None else "    ?s"
        return (
            f"[batch {self.batch_id}] {pct} "
            f"{self.bytes_scanned / (1 << 20):.1f} MiB "
            f"@ {self.mib_per_s:.1f} MiB/s eta {eta}"
        )


class ProgressTracker:
    """Folds per-batch byte counts into cumulative rate + ETA."""

    def __init__(self, total_bytes: int | None = None):
        self.total_bytes = total_bytes
        # anchored at pipeline construction so the first tick's rate
        # covers the work that produced it, not a zero-length interval
        self._t0 = time.monotonic()
        self._bytes = 0
        self._chunks = 0

    def tick(self, batch_id: int, batch_chunks: int, batch_bytes: int) -> ProgressSnapshot:
        self._bytes += int(batch_bytes)
        self._chunks += int(batch_chunks)
        elapsed = max(time.monotonic() - self._t0, 1e-9)
        rate = self._bytes / elapsed  # bytes/s
        eta = None
        pct = None
        if self.total_bytes:
            pct = min(100.0, 100.0 * self._bytes / self.total_bytes)
            if rate > 0:
                eta = max(0.0, (self.total_bytes - self._bytes) / rate)
        return ProgressSnapshot(
            batch_id=batch_id,
            chunks_done=self._chunks,
            bytes_scanned=self._bytes,
            total_bytes=self.total_bytes,
            elapsed_sec=elapsed,
            mib_per_s=rate / (1 << 20),
            eta_sec=eta,
            pct=pct,
        )
