"""YAML config surface + config_hash (reference src/config.rs:87-105,
config/default.yml shape)."""

from __future__ import annotations

import hashlib

import pytest

from swiftbeaver_spark.config import DEFAULT_CONFIG
from swiftbeaver_spark.config_yaml import default_yaml, load_config, parse_config


def test_defaults_roundtrip():
    loaded = load_config(None)
    assert loaded.config == DEFAULT_CONFIG
    assert loaded.config_hash == hashlib.sha256(default_yaml().encode()).hexdigest()
    # hash is stable across calls (canonical serialization)
    assert load_config(None).config_hash == loaded.config_hash


def test_file_from_default_yaml_matches(tmp_path):
    p = tmp_path / "cfg.yml"
    p.write_text(default_yaml())
    loaded = load_config(str(p))
    assert loaded.config == DEFAULT_CONFIG
    assert loaded.config_hash == load_config(None).config_hash


def test_overrides_and_reference_shape(tmp_path):
    p = tmp_path / "cfg.yml"
    p.write_text(
        """
run_id: "case42"
overlap_bytes: 1024
enable_string_scan: true
string_min_len: 8
gpu_max_hits_per_chunk: 1000000
opencl_platform_index:
zip_allowed_kinds: [docx, epub]
file_types:
  - id: "jpeg"
    extensions: ["jpg"]
    header_patterns:
      - id: "jpeg_soi"
        hex: "FFD8FF"
    footer_patterns: []
    max_size: 104857600
    min_size: 500
    validator: "jpeg"
"""
    )
    cfg = load_config(str(p)).config
    assert cfg.run_id == "case42"
    assert cfg.overlap == 1024
    assert cfg.enable_string_scan and cfg.string_min_len == 8
    assert cfg.zip_allowed_kinds == ("docx", "epub")
    assert [ft.type_id for ft in cfg.file_types] == ["jpeg"]
    assert cfg.file_types[0].header_patterns[0].bytes == b"\xff\xd8\xff"
    # untouched scalars keep defaults
    assert cfg.entropy_threshold == DEFAULT_CONFIG.entropy_threshold


def test_unknown_key_rejected():
    with pytest.raises(ValueError, match="unknown config key"):
        parse_config("entropy_treshold: 7.0")  # typo must not silently pass


def test_bad_hex_rejected():
    with pytest.raises(ValueError):
        parse_config(
            "file_types:\n"
            "  - id: x\n"
            "    header_patterns:\n"
            "      - id: p\n"
            "        hex: 'GG'\n"
        )


def test_distinct_configs_distinct_hashes(tmp_path):
    a = tmp_path / "a.yml"
    b = tmp_path / "b.yml"
    a.write_text("overlap_bytes: 1024\n")
    b.write_text("overlap_bytes: 2048\n")
    assert load_config(str(a)).config_hash != load_config(str(b)).config_hash
