"""Chunk-join carve operator mechanics: plan laziness (no driver-side
action while building the plan), per-type window caps, and the explicit
`over_cap` error when the reassembly window — not evidence EOF — is what
cut a carve short (reference parity: the native engine positioned-reads
the full file, src/pipeline/workers.rs:208-297, so it has no cap at all;
our cap bounds executor memory and must therefore be honest)."""

from __future__ import annotations

import dataclasses
import struct

import pytest
from pyspark.sql import DataFrame

from swiftbeaver_spark.carve_op import carve_hits_with_chunks
from swiftbeaver_spark.chunking import chunks_from_bytes
from swiftbeaver_spark.config import DEFAULT_CONFIG

CFG = dataclasses.replace(DEFAULT_CONFIG, chunk_size=4096, overlap=512)


def big_bmp() -> bytes:
    """Valid BMP declaring 12,342 bytes (64x64x24bpp) — larger than the
    4 KiB test window cap, smaller than the per-type override."""
    width = height = 64
    row = ((width * 24 + 31) // 32) * 4
    file_size = 54 + row * height
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, row * height, 0, 0, 0, 0)
    return (
        b"BM" + struct.pack("<I", file_size) + b"\x00" * 4 + struct.pack("<I", 54)
        + dib + b"\xa5" * (row * height)
    )


def _hits(spark, offset: int):
    return spark.createDataFrame(
        [(offset, "bmp", "bmp_header")],
        "global_offset long, file_type_id string, pattern_id string",
    )


def _evidence() -> bytes:
    bmp = big_bmp()
    return bmp + b"\x00" * (32768 - len(bmp))


def test_plan_is_lazy_no_driver_action(spark, monkeypatch):
    """Building the carve plan must not trigger a Spark job (round-1
    version ran chunks.agg(...).collect() mid-plan — a full extra pass
    over the chunk table per call)."""
    chunks = chunks_from_bytes(spark, _evidence(), CFG.chunk_size, CFG.overlap)
    hits = _hits(spark, 0)

    def boom(self, *a, **k):  # pragma: no cover - must not run
        raise AssertionError("driver-side action during plan construction")

    monkeypatch.setattr(DataFrame, "collect", boom)
    monkeypatch.setattr(DataFrame, "count", boom)
    monkeypatch.setattr(DataFrame, "toPandas", boom)
    out = carve_hits_with_chunks(hits, chunks, CFG, evidence_len=32768)
    assert isinstance(out, DataFrame)


def test_over_cap_is_explicit(spark):
    """A carve the window cap cuts short (while evidence continues) must
    say `over_cap`, not pretend the evidence ended."""
    chunks = chunks_from_bytes(spark, _evidence(), CFG.chunk_size, CFG.overlap)
    rec = carve_hits_with_chunks(
        chunks=chunks,
        hits=_hits(spark, 0),
        cfg=CFG,
        window_cap=4096,
        evidence_len=32768,
    ).collect()
    assert len(rec) == 1
    assert rec[0].truncated
    assert "over_cap" in rec[0].errors


def test_per_type_cap_override_carves_fully(spark):
    """window_caps lifts the cap for one type without inflating every
    hit's claimed chunk range."""
    chunks = chunks_from_bytes(spark, _evidence(), CFG.chunk_size, CFG.overlap)
    rec = carve_hits_with_chunks(
        chunks=chunks,
        hits=_hits(spark, 0),
        cfg=CFG,
        window_cap=4096,
        window_caps={"bmp": 32768},
        evidence_len=32768,
    ).collect()
    assert len(rec) == 1
    assert rec[0].size == len(big_bmp())
    assert not rec[0].truncated
    assert "over_cap" not in rec[0].errors


def test_no_evidence_len_falls_back_to_window_extent(spark):
    """Without evidence_len the window extent is EOF: still truncated,
    but no over_cap claim (can't distinguish cap from evidence end)."""
    chunks = chunks_from_bytes(spark, _evidence(), CFG.chunk_size, CFG.overlap)
    rec = carve_hits_with_chunks(
        chunks=chunks,
        hits=_hits(spark, 0),
        cfg=CFG,
        window_cap=4096,
    ).collect()
    assert len(rec) == 1
    assert rec[0].truncated
    assert "over_cap" not in rec[0].errors


def test_chunk_join_rejects_multi_gib_window(spark):
    """Per-type caps whose effective window passes the Arrow single-row
    bound must be rejected loudly — one hit's reassembled window is a
    single row, and a >=2 GiB row breaks Arrow record batches (round-7
    review finding); such types belong on positioned reads."""
    chunks = chunks_from_bytes(spark, _evidence(), CFG.chunk_size, CFG.overlap)
    with pytest.raises(ValueError, match="single-row"):
        carve_hits_with_chunks(
            _hits(spark, 0),
            chunks,
            CFG,
            window_caps={"mov": 4 << 30},
            evidence_len=32768,
        )
