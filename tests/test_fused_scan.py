"""One-pass multi-scan differentials (round 11, fused_scan.py).

scan_all_from_evidence must produce BYTE-IDENTICAL results to the
three standalone evidence paths it fuses — signature hits
(scanner.scan_evidence), string spans (strings_scan.
spans_from_evidence) and entropy regions (entropy.
entropy_regions_from_evidence) — on raw and EWF/E01 evidence, across
content engineered to cross every sub-chunk boundary class (runs,
patterns and high-entropy regions straddling granule edges).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

from swiftbeaver_spark.config import DEFAULT_CONFIG
from swiftbeaver_spark.entropy import entropy_regions_from_evidence
from swiftbeaver_spark.fused_scan import scan_all_from_evidence
from swiftbeaver_spark.jvm import ensure_kernel
from swiftbeaver_spark.scanner import scan_evidence
from swiftbeaver_spark.strings_scan import spans_from_evidence

from tests.fixtures import mk_jpeg, mk_png, mk_sqlite


@pytest.fixture(autouse=True)
def require_kernel(spark):
    assert ensure_kernel(spark), "JVM kernel must register in the test env"


CFG = dataclasses.replace(
    DEFAULT_CONFIG,
    file_types=tuple(
        dataclasses.replace(ft, min_size=5)
        for ft in DEFAULT_CONFIG.file_types
        if ft.type_id in ("jpeg", "png", "sqlite")
    ),
    enable_string_scan=True,
    enable_entropy_detection=True,
    chunk_size=4 << 20,
    overlap=4096,
    entropy_window_size=4096,
    entropy_threshold=7.5,
    string_scan_utf16=True,
)
GRANULE = 512 << 10  # 8 sub-chunks per parent; window-aligned


def build_image(seed: int, size: int) -> bytes:
    """Mixed textures with planted files and boundary-straddling
    content: ASCII/UTF-8 runs and per-window byte permutations
    (entropy exactly 8.0) placed across granule and parent edges."""
    rng = np.random.default_rng(seed)
    buf = bytearray(size)
    # text stripes with artefact-bearing lines
    text = (
        b"lorem ipsum dolor sit amet https://example.com/x "
        b"mail bob@example.org call +1-555-01" + b"23 " + "héllo wörld ".encode()
    ) * 40
    for off in range(0, size, 1 << 20):
        buf[off : off + len(text)] = text[: max(0, min(len(text), size - off))]
    # high-entropy spans straddling sub-chunk boundaries
    perm = b"".join(bytes(rng.permutation(256).astype(np.uint8)) for _ in range(64))
    for off in (GRANULE - 8192, 3 * GRANULE - 100, (4 << 20) - 8192):
        if off + len(perm) < size:
            buf[off : off + len(perm)] = perm
    # planted files, including one straddling a granule edge
    for blob, off in (
        (mk_jpeg(), 70_000),
        (mk_png(), GRANULE - 10),
        (mk_sqlite(), 2 * GRANULE + 12345),
        (mk_jpeg(), (4 << 20) + 777),
    ):
        if off + len(blob) < size:
            buf[off : off + len(blob)] = blob
    return bytes(buf)


def _cmp(spark, path):
    t = scan_all_from_evidence(spark, path, CFG, granule=GRANULE)
    t["raw"].persist()
    try:
        fused_hits = sorted(map(tuple, t["hits"].collect()))
        base_hits = sorted(map(tuple, scan_evidence(spark, path, CFG).collect()))
        assert fused_hits == base_hits and fused_hits
        fused_spans = sorted(map(tuple, t["string_spans"].collect()))
        base_spans = sorted(
            map(tuple, spans_from_evidence(spark, path, CFG, granule=GRANULE).collect())
        )
        assert fused_spans == base_spans and fused_spans
        fr = sorted(map(tuple, t["entropy_regions"].collect()))
        br = sorted(
            map(tuple, entropy_regions_from_evidence(spark, path, CFG).collect())
        )
        assert fr == br and fr
    finally:
        t["raw"].unpersist()


@pytest.mark.parametrize("seed", [1, 2])
def test_fused_equals_standalone_raw(spark, tmp_path, seed):
    data = build_image(seed, 9 << 20)  # ragged tail past 2 parents
    p = tmp_path / "ev.raw"
    p.write_bytes(data)
    _cmp(spark, str(p))


def test_fused_equals_standalone_e01(spark, tmp_path):
    from swiftbeaver_spark.ewf import write_ewf

    data = build_image(3, 6 << 20)
    p = str(tmp_path / "ev.E01")
    write_ewf(p, data, sectors_per_chunk=8)
    _cmp(spark, p)


def test_misaligned_entropy_geometry_raises(spark, tmp_path):
    p = tmp_path / "ev.raw"
    p.write_bytes(b"\x00" * (1 << 20))
    bad = dataclasses.replace(CFG, entropy_window_size=3000)  # !| granule
    with pytest.raises(ValueError, match="aligned"):
        scan_all_from_evidence(spark, str(p), bad, granule=GRANULE)


def test_requires_jvm_kernel(spark, tmp_path):
    import swiftbeaver_spark.jvm as jvm_mod

    p = tmp_path / "ev.raw"
    p.write_bytes(b"\x00" * (1 << 20))
    saved = getattr(spark, jvm_mod._MARKER, None)
    try:
        setattr(spark, jvm_mod._MARKER, False)
        with pytest.raises(ValueError, match="JVM kernel"):
            scan_all_from_evidence(spark, str(p), CFG, granule=GRANULE)
    finally:
        setattr(spark, jvm_mod._MARKER, saved)


def test_partition_count_scales_with_corpus_bytes(spark, tmp_path):
    """r14: the one-pass scan's partition count must grow with corpus
    bytes (ONE_PASS_PARTITION_BYTES of evidence per partition), not
    stay pinned at defaultParallelism — a fixed split makes each
    partition's persisted cache block corpus-proportional, the term
    that OOMed 20 GiB at a heap 10 GiB survived (BENCH_SCALE_r14).
    Plan-level check over a SPARSE file: no bytes are read."""
    import math
    import os

    from swiftbeaver_spark.fused_scan import ONE_PASS_PARTITION_BYTES

    size = 5 * 1024 * 1024 * 1024  # 5 GiB sparse
    path = str(tmp_path / "sparse.raw")
    with open(path, "wb") as fh:
        fh.truncate(size)

    scans = scan_all_from_evidence(spark, path, CFG)
    want = max(
        spark.sparkContext.defaultParallelism,
        math.ceil(size / ONE_PASS_PARTITION_BYTES),
    )
    assert scans["raw"].rdd.getNumPartitions() == want
    assert want == 40  # 5 GiB / 128 MiB > the local[32] floor
    os.unlink(path)
