"""FLAC codec: exact lossless round-trip across the subframe/stereo/
partition surface, CRC and MD5 rejection, fuzz totality, and the
Spark decode operator."""

import hashlib
import struct

import numpy as np
import pytest

from swiftbeaver_spark.llm.flac import (
    crc8,
    crc16,
    decode_flac,
    encode_flac,
    flac_decode_pcm,
    parse_streaminfo,
)


def _rng(seed):
    return np.random.default_rng(seed)


def _roundtrip(pcm, **kw):
    payload = encode_flac(pcm, **kw)
    dec = decode_flac(payload)
    assert dec is not None, "decode failed"
    info, out = dec
    ref = np.asarray(pcm)
    if ref.ndim == 1:
        ref = ref[:, None]
    assert out.shape == ref.shape
    assert np.array_equal(out, ref.astype(np.int64))
    return payload, info


def test_crc_check_values():
    # CRC-8 poly 0x07 and CRC-16 poly 0x8005 standard check values
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


def test_roundtrip_mono_random():
    pcm = _rng(1).integers(-32768, 32768, size=1000, dtype=np.int64)
    _, info = _roundtrip(pcm, sample_rate=16000, block_size=256)
    assert info["sample_rate"] == 16000
    assert info["channels"] == 1
    assert info["bits_per_sample"] == 16
    assert info["total_samples"] == 1000


def test_roundtrip_partial_tail_block():
    # length not a multiple of the block size exercises the 8/16-bit
    # blocksize-at-end header forms
    pcm = _rng(2).integers(-1000, 1000, size=777, dtype=np.int64)
    _roundtrip(pcm, block_size=256)
    pcm = _rng(3).integers(-1000, 1000, size=300, dtype=np.int64)
    _roundtrip(pcm, block_size=299)  # 16-bit end form for first block


def test_roundtrip_smooth_signal_fixed_predictors():
    # ramps/parabolas pick higher fixed orders
    t = np.arange(2000)
    for sig in (t * 3, (t * t) % 20000 - 10000, np.full(2000, -123)):
        _roundtrip(sig.astype(np.int64), block_size=512)


def test_roundtrip_forced_subframes():
    pcm = _rng(4).integers(-2000, 2000, size=512, dtype=np.int64)
    for force in ("verbatim", "fixed0", "lpc"):
        _roundtrip(pcm, block_size=256, force_subframe=force)


def test_roundtrip_lpc_on_sinusoid():
    t = np.arange(4096)
    pcm = (10000 * np.sin(t / 7.0)).astype(np.int64)
    payload, _ = _roundtrip(pcm, block_size=1024, force_subframe="lpc", lpc_order=8)
    # LPC on a sinusoid must beat verbatim by a wide margin
    verbatim = encode_flac(pcm, block_size=1024, force_subframe="verbatim")
    assert len(payload) < len(verbatim) * 0.7


def test_roundtrip_partition_orders():
    pcm = _rng(5).integers(-5000, 5000, size=1024, dtype=np.int64)
    blobs = set()
    for po in (0, 1, 2, 3):
        payload, _ = _roundtrip(pcm, block_size=512, partition_order=po)
        blobs.add(payload)
    assert len(blobs) > 1  # partitioning actually changes the stream


def test_residual_escape_and_rice2_forms():
    # pin the two rarely-hit residual forms at the bit level
    from swiftbeaver_spark.llm.flac import (
        _BitReader,
        _BitWriter,
        _read_residual,
        _write_residual,
    )

    # all-zero residual: the 0-bit raw escape (5 bits) must beat Rice
    # (1 bit/sample) — total stream 2+4+4+5 = 15 bits
    bw = _BitWriter()
    res = np.zeros(64, dtype=np.int64)
    _write_residual(bw, res, 64, 0, 0)
    bw.align()
    data = bw.bytes()
    assert len(data) == 2  # escape fired; Rice would need 10 bytes
    assert np.array_equal(_read_residual(_BitReader(data), 64, 0), res)

    # 23-bit noise: optimal Rice parameter > 14 forces method 1 (Rice2)
    bw = _BitWriter()
    res2 = _rng(62).integers(-(2**22), 2**22, size=64)
    _write_residual(bw, res2, 64, 0, 0)
    bw.align()
    data2 = bw.bytes()
    assert data2[0] >> 6 == 1  # first 2 bits = coding method = Rice2
    assert np.array_equal(_read_residual(_BitReader(data2), 64, 0), res2)


def test_roundtrip_escape_partitions():
    # an all-zero half makes raw 0-bit escape (5 bits/partition) beat
    # Rice (1 bit/sample); the other half stays Rice-coded. Assert the
    # escape actually fires: the escaped stream must be smaller than a
    # partition-order-0 encoding of the same data.
    pcm = np.zeros(512, dtype=np.int64)
    pcm[256:] = _rng(6).integers(-(2**20), 2**20, size=256)
    payload, _ = _roundtrip(
        pcm, bits_per_sample=24, block_size=512, partition_order=2
    )
    flat, _ = _roundtrip(pcm, bits_per_sample=24, block_size=512, partition_order=0)
    assert len(payload) < len(flat)


def test_roundtrip_rice2_method():
    # uniformly huge 24-bit noise needs Rice params > 14 -> method 1
    # (5-bit params); round-trip proves the Rice2 decode path
    pcm = _rng(61).integers(-(2**22), 2**22, size=512, dtype=np.int64)
    payload, _ = _roundtrip(pcm, bits_per_sample=24, block_size=256)
    # the stream must be near-incompressible but still exact
    assert len(payload) > 512 * 2


def test_roundtrip_short_tail_block_lpc():
    # 24 samples at block 16 leaves an 8-sample tail; forced LPC order 8
    # must clamp to the tail (order = n-1 = 7) and the partition order
    # must self-lower so the first partition stays non-empty
    pcm = (5000 * np.sin(np.arange(24) / 2.0)).astype(np.int64)
    _roundtrip(
        pcm, block_size=16, force_subframe="lpc", lpc_order=8, partition_order=3
    )


def test_roundtrip_single_sample_tail_block_lpc():
    # a 1-sample tail block cannot carry an LPC subframe (type code
    # encodes order-1, order >= 1): forced LPC must fall through to the
    # fixed predictor for that block instead of emitting a corrupt type
    pcm = (3000 * np.sin(np.arange(17) / 3.0)).astype(np.int64) + 7
    _roundtrip(pcm, block_size=16, force_subframe="lpc", lpc_order=4)


def test_roundtrip_wasted_bits():
    pcm = (_rng(7).integers(-500, 500, size=512) << 4).astype(np.int64)
    payload, _ = _roundtrip(pcm, block_size=512)
    plain = encode_flac((_rng(7).integers(-500, 500, size=512) << 4).astype(np.int64) | 1,
                        block_size=512)
    assert len(payload) < len(plain)  # wasted-bit detection saved bits


def test_roundtrip_stereo_modes():
    rng = _rng(8)
    left = rng.integers(-3000, 3000, size=700, dtype=np.int64)
    right = left + rng.integers(-50, 50, size=700)  # correlated channels
    pcm = np.stack([left, right], axis=1)
    sizes = {}
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        payload, info = _roundtrip(pcm, block_size=256, stereo_mode=mode)
        assert info["channels"] == 2
        sizes[mode] = len(payload)
    # decorrelation must win on correlated stereo
    assert min(sizes["left_side"], sizes["mid_side"]) < sizes["independent"]


def test_roundtrip_multichannel_and_depths():
    rng = _rng(9)
    pcm4 = rng.integers(-100, 100, size=(300, 4), dtype=np.int64)
    _roundtrip(pcm4, block_size=128)
    pcm8bit = rng.integers(-128, 128, size=400, dtype=np.int64)
    _, info = _roundtrip(pcm8bit, bits_per_sample=8, block_size=192)
    assert info["bits_per_sample"] == 8


def test_roundtrip_odd_bit_depths_ceil_byte_md5():
    # 12-bit hashes/serializes 2 bytes per sample, 20-bit 3 bytes
    # (ceil(bps/8), the libFLAC STREAMINFO-MD5 convention)
    rng = _rng(21)
    pcm12 = rng.integers(-(1 << 11), 1 << 11, size=300, dtype=np.int64)
    _, info = _roundtrip(pcm12, bits_per_sample=12, block_size=128)
    assert info["bits_per_sample"] == 12
    assert info["md5_hex"] == hashlib.md5(pcm12.astype("<i2").tobytes()).hexdigest()
    pcm20 = rng.integers(-(1 << 19), 1 << 19, size=300, dtype=np.int64)
    _, info = _roundtrip(pcm20, bits_per_sample=20, block_size=128)
    a = np.ascontiguousarray(pcm20.astype("<i4")).view(np.uint8).reshape(-1, 4)
    assert info["md5_hex"] == hashlib.md5(a[:, :3].tobytes()).hexdigest()


def test_roundtrip_full_range_32bit():
    # full-range 32-bit residuals exceed the escape's 31-bit width
    # field: the encoder must take the Rice path (unary handles any
    # magnitude), never truncate
    pcm = _rng(22).integers(-(1 << 31), 1 << 31, size=200, dtype=np.int64)
    _roundtrip(pcm, bits_per_sample=32, block_size=64)
    # and with partitions forced on
    _roundtrip(pcm, bits_per_sample=32, block_size=64, partition_order=2)


def test_streaminfo_truncated_body_total():
    # a STREAMINFO header whose declared 34-byte body is truncated must
    # give None, not EOFError (the q29 media-meta path needs totality):
    # 4 sig + 8 padding block + 4 STREAMINFO hdr + 28 of 34 body = 44
    blob = (
        b"fLaC"
        + bytes([0x01]) + (4).to_bytes(3, "big") + b"\x00" * 4
        + bytes([0x80]) + (34).to_bytes(3, "big") + b"\x01" * 28
    )
    assert len(blob) >= 42
    assert parse_streaminfo(blob) is None
    pcm = _rng(23).integers(-100, 100, size=64, dtype=np.int64)
    good = encode_flac(pcm, block_size=64)
    for cut in range(len(good)):
        parse_streaminfo(good[:cut])  # never raises


def test_streaminfo_md5_and_fields():
    pcm = _rng(10).integers(-32768, 32768, size=600, dtype=np.int64)
    payload = encode_flac(pcm, sample_rate=44100, block_size=256)
    info = parse_streaminfo(payload)
    assert info["sample_rate"] == 44100
    expect = hashlib.md5(pcm.astype("<i2").tobytes()).hexdigest()
    assert info["md5_hex"] == expect


def test_corruption_rejected():
    pcm = _rng(11).integers(-32768, 32768, size=512, dtype=np.int64)
    payload = bytearray(encode_flac(pcm, block_size=256))
    info = parse_streaminfo(bytes(payload))
    # flip a bit inside the first frame's audio data: CRC-16 must fail
    payload[info["frames_offset"] + 12] ^= 0x10
    assert decode_flac(bytes(payload)) is None
    # corrupt the stored MD5: frames decode, signature must fail
    payload2 = bytearray(encode_flac(pcm, block_size=256))
    payload2[8 + 18] ^= 0xFF
    assert decode_flac(bytes(payload2)) is None
    assert decode_flac(bytes(payload2), verify_md5=False) is not None


def test_fuzz_totality():
    rng = _rng(12)
    pcm = rng.integers(-32768, 32768, size=256, dtype=np.int64)
    good = encode_flac(pcm, block_size=128)
    # truncations and random corruptions never raise
    for cut in range(0, len(good), 7):
        decode_flac(good[:cut])
    for _ in range(200):
        blob = bytearray(good)
        for _ in range(rng.integers(1, 6)):
            blob[rng.integers(0, len(blob))] ^= int(rng.integers(1, 256))
        decode_flac(bytes(blob))
    for _ in range(100):
        decode_flac(bytes(rng.integers(0, 256, size=rng.integers(0, 200), dtype=np.uint8)))


def test_flac_in_media_duration_path():
    from swiftbeaver_spark.llm.multimodal import header_media_duration_ms

    pcm = _rng(14).integers(-1000, 1000, size=32000, dtype=np.int64)
    payload = encode_flac(pcm, sample_rate=16000, block_size=4096)
    assert header_media_duration_ms(payload) == 2000  # 32000/16000 s
    assert header_media_duration_ms(b"fLaC truncated junk") is None


def test_spark_flac_decode_operator(spark):
    rng = _rng(13)
    rows = []
    expected = {}
    for mid in range(6):
        pcm = rng.integers(-32768, 32768, size=100 + mid * 37, dtype=np.int64)
        payload = encode_flac(pcm, sample_rate=8000, block_size=64)
        rows.append((mid, bytearray(payload)))
        expected[mid] = pcm.astype("<i2").tobytes().hex()
    rows.append((99, bytearray(b"not a flac stream at all")))
    rows.append((100, None))  # NULL payload must not fail the task
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r for r in flac_decode_pcm(media).collect()}
    assert out[100].status == "unsupported"
    for mid in range(6):
        r = out[mid]
        assert r.status == "ok"
        assert r.sample_rate == 8000
        assert r.channels == 1
        assert r.pcm_hex == expected[mid]
    assert out[99].status == "unsupported"
    assert out[99].pcm_hex is None


def test_empty_pcm_streaminfo_block_size_floor():
    """ADVICE r6: encode_flac with empty PCM must not write STREAMINFO
    min/max block size 0 (below the format's 16-sample floor); strict
    external decoders reject that. The configured block size is written
    even with zero frames, and the stream still round-trips."""
    payload = encode_flac(np.zeros((0,), dtype=np.int64), block_size=4096)
    info = parse_streaminfo(payload)
    assert info is not None
    assert info["min_block"] >= 16
    assert info["max_block"] >= 16
    dec = decode_flac(payload)
    assert dec is not None
    _, out = dec
    assert out.shape[0] == 0
