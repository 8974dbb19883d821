"""One-pass multi-scan over evidence: a single positioned read per
sub-chunk feeds the signature scan, the string-span scan AND the
entropy window scan (java/src/sbspark/ScanAllEvidenceUdf.java).

Why: the default fused engine path runs each scan as its own
positioned-read pass, so a full run reads the evidence three times —
free on a page-cached local image, 3x corpus egress against object
storage at 100 TB. The chunk-table strategy (`Engine.run(chunk_join=
True)`) removes the re-reads by materializing chunk BYTES, which costs
executor memory (see the Engine docstring's heap-economics note). This
module is the third point on that trade-off curve: ONE read per
sub-chunk, NO chunk-byte materialization — the UDF returns the three
stages' METADATA rows (packed hits, span rows, entropy islands) in one
struct, and callers persist that small frame instead of the bytes.

Semantics are byte-identical to the three standalone paths (pinned by
tests/test_fused_scan.py differentials on raw + E01 evidence):

- hits: fresh-state Aho-Corasick over [start, start+vlen+overlap) per
  sub-chunk with ownership dedup (local_offset < valid_length) — the
  parent-geometry chunk scan's own cross-boundary rule, so the union
  over sub-chunks equals scanner.scan_evidence. Reference parity: the
  same scan loop as src/scanner/cpu.rs:40-69.
- spans: Strs.scanEvidence on the identical subchunk_plan rows that
  strings_scan.spans_from_evidence drives — identical by construction
  (continuation-aware sub-chunk semantics included).
- ents: Ent.scanEvidence per sub-chunk. Identical to
  entropy.entropy_windows_from_evidence when the sub-chunk tiling is
  window-aligned — `scan_all_from_evidence` verifies the geometry and
  raises otherwise (entropy windows must not straddle plan boundaries,
  else the dropped-partial-window set differs between tilings).

Opt-in in round 11 (the engine's default path is unchanged); the
natural consumer is a full multi-table run over remote evidence.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from swiftbeaver_spark.config import (
    EVIDENCE_PARTITION_BYTES,
    PY_SCAN_GRANULE,
    EngineConfig,
)

# Evidence bytes per one-pass scan partition (r14): bounds the persisted
# raw frame's per-partition cache block — and the unroll/serialization
# working set of the task building it — independently of corpus size.
# 128 MiB of evidence is ~8 sub-chunk rows per task and at worst (a
# fully-text corpus, span content ~ evidence bytes) a ~150 MiB block:
# small enough that a block under construction is a footnote against
# the storage pool, large enough that a 10 GiB image still packs its
# scan into ~3 task waves at 32 threads. Shared with the standalone
# strings/entropy evidence paths via config.EVIDENCE_PARTITION_BYTES.
ONE_PASS_PARTITION_BYTES = EVIDENCE_PARTITION_BYTES


def one_pass_geometry_ok(cfg: EngineConfig, granule: int | None = None) -> bool:
    """True when the sub-chunk tiling is entropy-window aligned (the
    scan_all_from_evidence precondition) — shared with Engine.run's
    auto-switch so the quiet fallback and the loud ValueError can
    never disagree about the same geometry. Trivially True when
    entropy detection is off (the fused scan then skips the Ent
    sub-scan entirely and returns no entropy tables)."""
    if not cfg.enable_entropy_detection:
        return True
    g = granule if granule is not None else PY_SCAN_GRANULE
    g = min(cfg.chunk_size, g)
    n_sub = max(1, math.ceil(cfg.chunk_size / g))
    g2 = math.ceil(cfg.chunk_size / n_sub)
    ws = cfg.entropy_window_size
    return g2 % ws == 0 and cfg.chunk_size % ws == 0


def scan_all_from_evidence(
    spark,
    path: str,
    cfg: EngineConfig,
    granule: int | None = None,
    max_bytes: int | None = None,
    max_chunks: int | None = None,
) -> dict[str, DataFrame]:
    """Build the one-pass multi-scan frame and its three derived stage
    tables. Returns {"raw", "hits", "string_spans", "entropy_windows",
    "entropy_regions"}; `raw` holds one row per sub-chunk with the
    three metadata arrays — PERSIST IT (the caller owns the lifetime)
    before driving more than one derived table, or each table's action
    re-runs the scan:

        tables = scan_all_from_evidence(spark, path, cfg)
        tables["raw"].persist()
        try:
            ... drive tables["hits"] / ["string_spans"] / ...
        finally:
            tables["raw"].unpersist()

    `max_bytes`/`max_chunks` truncate the PARENT chunk plan exactly as
    Engine.run's fused path does (a parent whose start clears the byte
    limit is included whole), so the derived tables match the standalone
    limit-filtered paths row for row.

    With `cfg.enable_entropy_detection` False the Ent sub-scan is
    skipped inside the UDF (empty third spec line) and the returned
    dict has NO entropy tables — previously they were built anyway
    while the alignment gate was off, the silent-divergence hazard the
    gate exists to prevent (ADVICE r11).

    Requires the JVM kernel (this is the scale path — there is no
    Python fallback; the three standalone paths serve that role) and
    entropy-window-aligned sub-chunk geometry; raises ValueError on
    either precondition so misuse is loud, never silently divergent.
    The SPARK_GRAFT_NO_VEC_KERNEL incident hatch disables this path
    the same loud way (ADVICE r11): there is no fallback to mix in,
    so under the hatch callers must run the standalone paths.
    """
    from swiftbeaver_spark.entropy import _entropy_spec, merge_regions
    from swiftbeaver_spark.jvm import spec_for, vec_kernel_active
    from swiftbeaver_spark.scanner import (
        MAX_HITS_PER_CHUNK,
        _decode_packed_hits,
        compile_patterns,
        normalize_hits,
    )
    from swiftbeaver_spark.source import evidence_length
    from swiftbeaver_spark.strings_scan import _strings_spec, subchunk_plan

    if not vec_kernel_active(spark):
        raise ValueError(
            "scan_all_from_evidence requires the JVM kernel (and is "
            "disabled by SPARK_GRAFT_NO_VEC_KERNEL — there is no Python "
            "fallback); use the standalone scan_evidence/"
            "spans_from_evidence/entropy_*_from_evidence paths"
        )
    total = evidence_length(path)
    g = granule if granule is not None else PY_SCAN_GRANULE
    g = min(cfg.chunk_size, g)
    # entropy-grid gate: sub-chunks tile each parent at g2 boundaries;
    # windows must not straddle them (or the dropped-partial set would
    # differ from the entropy path's own tiling)
    if not one_pass_geometry_ok(cfg, granule):
        n_sub = max(1, math.ceil(cfg.chunk_size / g))
        g2 = math.ceil(cfg.chunk_size / n_sub)
        raise ValueError(
            f"sub-chunk granule {g2} / chunk_size {cfg.chunk_size} are not "
            f"entropy-window ({cfg.entropy_window_size}) aligned; run the "
            "standalone entropy path for this geometry"
        )

    from swiftbeaver_spark.scanner import scan_gate_indexes

    patterns = compile_patterns(cfg)
    spec = "\n".join(
        [
            spec_for(patterns, MAX_HITS_PER_CHUNK, scan_gate_indexes(cfg)),
            _strings_spec(cfg),
            _entropy_spec(cfg, merged=True) if cfg.enable_entropy_detection else "",
        ]
    )
    plan = subchunk_plan(spark, total, cfg.chunk_size, g)
    # parent-chunk limit rules, identical to Engine.run's fused path:
    # the parent plan keeps chunks with start < max_bytes / chunk_id <
    # max_chunks, so sub-chunks filter on their PARENT's start/id
    if max_bytes is not None:
        plan = plan.where(
            F.floor(F.col("start") / cfg.chunk_size) * cfg.chunk_size
            < int(max_bytes)
        )
    if max_chunks is not None:
        plan = plan.where(
            F.floor(F.col("start") / cfg.chunk_size) < int(max_chunks)
        )
    # Partition count scales with CORPUS SIZE, floored at the thread
    # count (r14): a fixed defaultParallelism split makes each
    # partition's evidence share — and therefore the persisted raw
    # frame's per-partition cache block and its unroll/serialization
    # working set — grow LINEARLY with the corpus (20 GiB at a fixed
    # 32 split = 640 MiB of evidence per block, which OOMed the 8 GiB
    # heap that 10 GiB's 320 MiB blocks survived; BENCH_SCALE_r14).
    # Bounding partitions at ONE_PASS_PARTITION_BYTES of evidence
    # keeps the block size flat no matter the corpus, which is what
    # makes the per-executor memory law size-independent — the same
    # rule a 1000-executor/100 TB run needs, since corpus bytes per
    # executor grow there too.
    scan_span = min(total, max_bytes) if max_bytes is not None else total
    n_parts = max(
        spark.sparkContext.defaultParallelism,
        1,
        math.ceil(scan_span / ONE_PASS_PARTITION_BYTES),
    )
    raw = plan.repartition(n_parts).select(
        "start",
        "valid_length",
        F.call_udf(
            "sb_scan_all",
            F.lit(path),
            F.col("start").cast("long"),
            F.col("valid_length").cast("long"),
            F.lit(spec),
        ).alias("r"),
    )

    # hits: sub-chunk rows satisfy the same normalize contract as the
    # chunk-planned scan (local offsets relative to `start`, ownership
    # = valid_length), so decode+normalize are shared verbatim
    hit_cols = raw.select(
        F.floor(F.col("start") / cfg.chunk_size).alias("chunk_id"),
        "start",
        "valid_length",
        F.col("r.hits").alias("hits"),
    )
    hits = normalize_hits(_decode_packed_hits(hit_cols, F.col("hits"), patterns))
    spans = raw.select(F.inline("r.spans"))
    out = {"raw": raw, "hits": hits, "string_spans": spans}
    if cfg.enable_entropy_detection:
        ents = raw.select(F.inline("r.ents"))
        out["entropy_windows"] = ents
        out["entropy_regions"] = merge_regions(ents, cfg.entropy_window_size)
    return out
