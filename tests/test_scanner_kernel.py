"""scan_blob kernel equivalence: the vectorized multi-pattern scan must
produce exactly the naive per-pattern memmem results (overlapping
matches, multiple patterns per offset, zero-region pathology)."""

from __future__ import annotations

import random

import pytest

from swiftbeaver_spark.config import DEFAULT_CONFIG
from swiftbeaver_spark.scanner import compile_patterns, find_all, scan_blob

from tests.fixtures import ALL_FIXTURES

PATTERNS = compile_patterns(DEFAULT_CONFIG)


def naive(blob: bytes) -> set[tuple[int, str, str]]:
    out = set()
    for pat, pid, ftid in PATTERNS:
        for o in find_all(blob, pat):
            out.add((o, pid, ftid))
    return out


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_with_planted_fixtures(seed):
    rng = random.Random(seed)
    blob = bytearray(rng.randbytes(150_000)) + bytearray(50_000)
    for name, (b, _, _, _) in ALL_FIXTURES.items():
        pos = rng.randrange(0, 180_000)
        blob[pos : pos + len(b)] = b
    blob = bytes(blob)
    assert set(scan_blob(blob, PATTERNS)) == naive(blob)


def test_zero_region():
    blob = b"\x00" * 100_000
    assert scan_blob(blob, PATTERNS) == []


def test_overlapping_and_shared_prefix():
    # RIFF maps to webp+wav+avi; mp4 prefix is a prefix of the mov pattern
    import struct

    riff = b"RIFF" + struct.pack("<I", 20) + b"WAVE" + b"\x00" * 12
    mov = struct.pack(">I", 0x14) + b"ftypqt  " + b"\x00" * 8
    blob = b"\x00" * 64 + riff + b"\x00" * 64 + mov + b"\x00" * 64
    got = set(scan_blob(blob, PATTERNS))
    assert got == naive(blob)
    types_at_riff = {ftid for (o, pid, ftid) in got if o == 64}
    assert types_at_riff == {"webp", "wav", "avi"}
    types_at_mov = {ftid for (o, pid, ftid) in got if o == 64 + len(riff) + 64}
    assert types_at_mov == {"mp4", "mov"}  # both signatures fire


def test_self_overlapping_pattern():
    # FF D8 FF D8 FF: jpeg_soi matches at 0 AND 2 (overlap allowed)
    blob = b"\xff\xd8\xff\xd8\xff" + b"\x00" * 32
    offs = sorted(o for (o, pid, _) in scan_blob(blob, PATTERNS) if pid == "jpeg_soi")
    assert offs == [0, 2]


def test_pattern_at_end_of_blob():
    blob = b"\x00" * 100 + bytes.fromhex("FFD8FF")
    offs = [o for (o, pid, _) in scan_blob(blob, PATTERNS) if pid == "jpeg_soi"]
    assert offs == [100]


def test_slab_boundary_equivalence():
    """Blobs beyond _SLAB process in bounded slabs; hits straddling the
    slab boundary and in overlap tails must match the naive scan."""
    import swiftbeaver_spark.scanner as sc

    old = sc._SLAB
    sc._SLAB = 64 * 1024  # shrink so the test is cheap
    try:
        rng = random.Random(3)
        blob = bytearray(rng.randbytes(5 * sc._SLAB + 123))
        sig = bytes.fromhex("FFD8FF")
        for k in range(1, 5):  # plant straddling every slab boundary
            pos = k * sc._SLAB - 1
            blob[pos : pos + len(sig)] = sig
        blob = bytes(blob)
        assert set(sc.scan_blob(blob, PATTERNS)) == naive(blob)
    finally:
        sc._SLAB = old
