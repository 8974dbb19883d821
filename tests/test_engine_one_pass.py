"""Engine one-pass adoption (round 12, VERDICT r11 task 1) + ADVICE
r11 closures.

Engine.run(one_pass=True) must produce IDENTICAL tables to the default
multi-pass fused path on raw and E01 evidence (the scans are the
differential-pinned fused kernels; this file pins the ENGINE wiring:
table graph, limits, persist lifetime, auto-switch rule), and the
fused module must honor enable_entropy_detection=False (no entropy
tables, no alignment gate — ADVICE r11) and the
SPARK_GRAFT_NO_VEC_KERNEL hatch (loud ValueError — ADVICE r11).
"""

from __future__ import annotations

import dataclasses

import pytest

from swiftbeaver_spark.config import DEFAULT_CONFIG
from swiftbeaver_spark.engine import Engine
from swiftbeaver_spark.fused_scan import scan_all_from_evidence
from swiftbeaver_spark.jvm import ensure_kernel

from tests.fixtures import mk_jpeg, mk_png
from tests.test_fused_scan import CFG as FUSED_CFG
from tests.test_fused_scan import GRANULE, build_image


@pytest.fixture(autouse=True)
def require_kernel(spark):
    assert ensure_kernel(spark), "JVM kernel must register in the test env"


# engine geometry: PY_SCAN_GRANULE (16 MiB) >= chunk_size, so the
# sub-chunk tiling degenerates to one sub-chunk per parent — window
# aligned for any window size dividing chunk_size
CFG = dataclasses.replace(FUSED_CFG, chunk_size=2 << 20)

TABLES = (
    "hits",
    "string_spans",
    "string_artefacts",
    "entropy_regions",
    "carved_files",
    "chunks",
    "run_summary",
)


def _tables(result):
    out = {}
    for name in TABLES:
        out[name] = sorted(map(tuple, result[name].collect()))
    return out


def _assert_same_run(spark, path, cfg=CFG):
    eng = Engine(spark, cfg)
    one = eng.run(evidence_path=path, one_pass=True)
    assert one.persisted, "one-pass must persist the raw metadata frame"
    try:
        got = _tables(one)
    finally:
        one.unpersist()
    base = _tables(eng.run(evidence_path=path, one_pass=False))
    for name in TABLES:
        assert got[name] == base[name], name
    assert got["hits"] and got["carved_files"] and got["entropy_regions"]


def test_one_pass_matches_default_raw(spark, tmp_path):
    p = tmp_path / "ev.raw"
    p.write_bytes(build_image(11, 7 << 20))
    _assert_same_run(spark, str(p))


def test_one_pass_matches_default_e01(spark, tmp_path):
    from swiftbeaver_spark.ewf import write_ewf

    p = str(tmp_path / "ev.E01")
    write_ewf(p, build_image(12, 5 << 20), sectors_per_chunk=8)
    _assert_same_run(spark, p)


def test_one_pass_matches_default_with_limits(spark, tmp_path):
    p = tmp_path / "ev.raw"
    p.write_bytes(build_image(13, 7 << 20))
    cfg = dataclasses.replace(CFG, max_bytes=3 << 20, max_chunks=3)
    _assert_same_run(spark, str(p), cfg)


def test_auto_selects_one_pass_when_ready(spark, tmp_path):
    """r12 rule: one-pass is the DEFAULT whenever the preconditions
    hold — raw and E01 alike (the cold-cache A/B showed no regime
    where multi-pass wins); misaligned geometry falls back quietly."""
    import warnings as warnings_mod

    from swiftbeaver_spark.ewf import write_ewf

    raw = tmp_path / "ev.raw"
    raw.write_bytes(build_image(14, 2 << 20))
    eng = Engine(spark, CFG)
    with warnings_mod.catch_warnings():
        warnings_mod.simplefilter("always")  # defeat once-per-process dedup
        with pytest.warns(UserWarning, match="one-pass"):
            res = eng.run(evidence_path=str(raw))
    assert res.persisted  # raw auto-selects one-pass too
    res.unpersist()
    e01 = str(tmp_path / "ev.E01")
    write_ewf(e01, build_image(14, 2 << 20), sectors_per_chunk=8)
    res = eng.run(evidence_path=e01)
    assert res.persisted
    res.unpersist()
    # misaligned entropy geometry: quiet multi-pass fallback
    bad = Engine(spark, dataclasses.replace(CFG, entropy_window_size=3000))
    res = bad.run(evidence_path=str(raw))
    assert not res.persisted


def test_one_pass_true_rejects_other_strategies(spark, tmp_path):
    eng = Engine(spark, CFG)
    with pytest.raises(ValueError, match="one_pass"):
        eng.run(evidence_bytes=b"\x00" * 1024, one_pass=True)
    p = tmp_path / "ev.raw"
    p.write_bytes(b"\x00" * (1 << 20))
    with pytest.raises(ValueError, match="one_pass"):
        eng.run(evidence_path=str(p), chunk_join=True, one_pass=True)


def test_detection_off_omits_entropy_tables(spark, tmp_path):
    """ADVICE r11: with enable_entropy_detection False the fused scan
    must not return entropy tables (previously they were built anyway,
    with the alignment gate off — silent divergence), and misaligned
    geometry must be accepted since no entropy windows are computed."""
    p = tmp_path / "ev.raw"
    p.write_bytes(build_image(15, 3 << 20))
    cfg = dataclasses.replace(
        CFG, enable_entropy_detection=False, entropy_window_size=3000
    )
    t = scan_all_from_evidence(spark, str(p), cfg, granule=GRANULE)
    assert "entropy_windows" not in t and "entropy_regions" not in t
    t["raw"].persist()
    try:
        assert t["hits"].count() > 0
        assert t["string_spans"].count() > 0
    finally:
        t["raw"].unpersist()
    # engine auto-switch also declines (no string scan -> default path)
    eng = Engine(spark, dataclasses.replace(CFG, enable_string_scan=False))
    assert not eng._one_pass_auto(str(p))


def test_no_vec_kernel_hatch_disables_fused(spark, tmp_path, monkeypatch):
    """ADVICE r11: the whole-kernel-family escape hatch must disable
    sb_scan_all loudly (no Python fallback exists to mix in)."""
    p = tmp_path / "ev.raw"
    p.write_bytes(b"\x00" * (1 << 20))
    monkeypatch.setenv("SPARK_GRAFT_NO_VEC_KERNEL", "1")
    with pytest.raises(ValueError, match="JVM kernel"):
        scan_all_from_evidence(spark, str(p), CFG, granule=GRANULE)
    eng = Engine(spark, CFG)
    assert not eng._one_pass_auto(str(p))


def test_zip_bucket_cache_batch_split_parity(spark, tmp_path):
    """ADVICE r11: carve_zips' per-bucket EOCD index now caches across
    Arrow batches; forcing one-row batches (maximal bucket splitting)
    must yield byte-identical carves to the default batch size."""
    import io
    import zipfile

    from swiftbeaver_spark.carve_op import carve_hits_with_evidence
    from swiftbeaver_spark.scanner import scan_evidence

    def mk_zip(tag: bytes) -> bytes:
        bio = io.BytesIO()
        with zipfile.ZipFile(bio, "w") as z:
            z.writestr("a.txt", tag * 40)
        return bio.getvalue()

    buf = bytearray(2 << 20)
    for i, off in enumerate((100, 5_000, 9_000, 300_000, 1_500_000)):
        blob = mk_zip(bytes([65 + i]))
        buf[off : off + len(blob)] = blob
    p = tmp_path / "zips.raw"
    p.write_bytes(bytes(buf))
    cfg = dataclasses.replace(
        CFG,
        file_types=tuple(
            ft for ft in DEFAULT_CONFIG.file_types if ft.type_id == "zip"
        ),
    )
    hits = scan_evidence(spark, str(p), cfg)
    base = sorted(map(tuple, carve_hits_with_evidence(hits, str(p), cfg).collect()))
    assert len(base) == 5
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    saved = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "1")
        split = sorted(
            map(tuple, carve_hits_with_evidence(hits, str(p), cfg).collect())
        )
    finally:
        if saved is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, saved)
    assert split == base


def test_one_pass_jpeg_png_carve_content(spark, tmp_path):
    """The one-pass carves recover the planted files byte-for-byte
    (sha256 parity with the fixtures), not just row-count parity."""
    import hashlib

    jpeg, png = mk_jpeg(), mk_png()
    buf = bytearray(2 << 20)
    buf[1000 : 1000 + len(jpeg)] = jpeg
    buf[500_000 : 500_000 + len(png)] = png
    p = tmp_path / "ev.raw"
    p.write_bytes(bytes(buf))
    eng = Engine(spark, CFG)
    res = eng.run(evidence_path=str(p), one_pass=True)
    try:
        rows = {
            r["file_type"]: r
            for r in res["carved_files"].collect()
        }
    finally:
        res.unpersist()
    assert rows["jpeg"]["sha256"] == hashlib.sha256(jpeg).hexdigest()
    assert rows["png"]["sha256"] == hashlib.sha256(png).hexdigest()
