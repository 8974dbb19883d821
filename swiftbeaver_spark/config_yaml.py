"""YAML config surface + config_hash provenance.

Reference parity: `load_config` reads a YAML file shaped exactly like
the reference's config/default.yml (scalar scan options + the
file_types registry; struct src/config.rs:7-79) and records
`config_hash` = sha256 over the raw config bytes (src/config.rs:87-105)
so a run's output is traceable to the exact configuration text that
produced it. With no path, the built-in defaults are serialized to
canonical YAML and hashed — the analog of the reference embedding
config/default.yml at compile time.

GPU/OpenCL keys (gpu_max_*, opencl_*) are accepted and ignored: the
cluster replaces the GPU in this engine (SURVEY §2.2). Unknown keys
raise, so typos don't silently fall back to defaults.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, replace

import yaml

from swiftbeaver_spark.config import (
    DEFAULT_CONFIG,
    EngineConfig,
    FileType,
    Pattern,
)

# accepted-and-ignored (reference knobs with no analog here; documented)
_IGNORED_KEYS = {
    "max_memory_mib",
    "max_open_files",
    "gpu_max_hits_per_chunk",
    "gpu_max_string_spans_per_chunk",
    "parquet_row_group_size",
    "opencl_platform_index",
    "opencl_device_index",
}

# yaml key -> EngineConfig field for 1:1 scalars
_SCALARS = {
    "run_id": "run_id",
    "overlap_bytes": "overlap",
    "chunk_size": "chunk_size",
    "max_files": "max_files",
    "max_bytes": "max_bytes",
    "max_chunks": "max_chunks",
    "enable_string_scan": "enable_string_scan",
    "enable_url_scan": "enable_url_scan",
    "enable_email_scan": "enable_email_scan",
    "enable_phone_scan": "enable_phone_scan",
    "string_scan_utf16": "string_scan_utf16",
    "string_min_len": "string_min_len",
    "string_max_len": "string_max_len",
    "enable_entropy_detection": "enable_entropy_detection",
    "entropy_window_size": "entropy_window_size",
    "entropy_threshold": "entropy_threshold",
    "enable_sqlite_page_recovery": "enable_sqlite_page_recovery",
    "quicktime_mode": "quicktime_mode",
}


@dataclass(frozen=True)
class LoadedConfig:
    config: EngineConfig
    config_hash: str  # sha256 hex over the raw config bytes


def _parse_file_type(d: dict) -> FileType:
    pats = tuple(
        Pattern(p["id"], p["hex"]) for p in d.get("header_patterns") or ()
    )
    for p in pats:
        p.bytes  # validates hex early
    return FileType(
        type_id=d["id"],
        extensions=tuple(d.get("extensions") or ()),
        header_patterns=pats,
        footer_patterns=tuple(
            Pattern(p["id"], p["hex"]) for p in d.get("footer_patterns") or ()
        ),
        max_size=int(d.get("max_size") or 0),
        min_size=int(d.get("min_size") or 0),
        validator=d.get("validator") or "",
        require_eocd=bool(d.get("require_eocd", True)),
    )


def parse_config(text: bytes | str) -> EngineConfig:
    doc = yaml.safe_load(text) or {}
    if not isinstance(doc, dict):
        raise ValueError("config root must be a mapping")
    cfg = DEFAULT_CONFIG
    updates: dict = {}
    for key, val in doc.items():
        if key in _IGNORED_KEYS:
            continue
        if key in _SCALARS:
            if val is not None:
                updates[_SCALARS[key]] = val
            elif key in ("max_files", "max_bytes", "max_chunks"):
                updates[_SCALARS[key]] = None
        elif key in ("zip_allowed_kinds", "ole_allowed_kinds"):
            updates[key] = tuple(val) if val else None
        elif key == "file_types":
            updates["file_types"] = tuple(_parse_file_type(d) for d in val or ())
        else:
            raise ValueError(f"unknown config key: {key!r}")
    return replace(cfg, **updates)


def default_yaml() -> str:
    """Canonical YAML text of the built-in defaults — the same shape a
    user would write, so `load_config(None)` and a round-tripped file
    produce identical configs and a stable hash."""
    cfg = DEFAULT_CONFIG
    doc = {
        "run_id": cfg.run_id,
        "chunk_size": cfg.chunk_size,
        "overlap_bytes": cfg.overlap,
        "max_files": cfg.max_files,
        "max_bytes": cfg.max_bytes,
        "max_chunks": cfg.max_chunks,
        "enable_string_scan": cfg.enable_string_scan,
        "enable_url_scan": cfg.enable_url_scan,
        "enable_email_scan": cfg.enable_email_scan,
        "enable_phone_scan": cfg.enable_phone_scan,
        "string_scan_utf16": cfg.string_scan_utf16,
        "string_min_len": cfg.string_min_len,
        "string_max_len": cfg.string_max_len,
        "enable_entropy_detection": cfg.enable_entropy_detection,
        "entropy_window_size": cfg.entropy_window_size,
        "entropy_threshold": cfg.entropy_threshold,
        "enable_sqlite_page_recovery": cfg.enable_sqlite_page_recovery,
        "zip_allowed_kinds": list(cfg.zip_allowed_kinds) if cfg.zip_allowed_kinds else None,
        "ole_allowed_kinds": list(cfg.ole_allowed_kinds) if cfg.ole_allowed_kinds else None,
        "quicktime_mode": cfg.quicktime_mode,
        "file_types": [
            {
                "id": ft.type_id,
                "extensions": list(ft.extensions),
                "header_patterns": [
                    {"id": p.pattern_id, "hex": p.hex} for p in ft.header_patterns
                ],
                "footer_patterns": [
                    {"id": p.pattern_id, "hex": p.hex} for p in ft.footer_patterns
                ],
                "max_size": ft.max_size,
                "min_size": ft.min_size,
                "validator": ft.validator,
                "require_eocd": ft.require_eocd,
            }
            for ft in cfg.file_types
        ],
    }
    return yaml.safe_dump(doc, sort_keys=False)


def load_config(path: str | None = None) -> LoadedConfig:
    """YAML file (or built-in defaults) -> (EngineConfig, config_hash).
    An empty run_id stays empty here; callers generate one at run start
    (engine.make_run_id), matching the reference's load-then-generate."""
    if path is not None:
        with open(path, "rb") as fh:
            raw = fh.read()
    else:
        raw = default_yaml().encode()
    return LoadedConfig(
        config=parse_config(raw),
        config_hash=hashlib.sha256(raw).hexdigest(),
    )
