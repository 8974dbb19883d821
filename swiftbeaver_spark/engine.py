"""Engine: the reference pipeline re-expressed as a DataFrame dataflow.

Reference lifecycle (src/pipeline/mod.rs:168-524): chunk reader ->
scan workers -> carve workers -> metadata writer, over bounded
channels. Spark trace of the same plan (SURVEY §3.2):

    chunks = ingest(evidence)                  # mapInPandas ranged reads
    hits = scan(chunks) |> normalize           # mapInPandas + where/select
    carved = carve(hits)                       # mapInPandas per hit
    strings/entropy = scan(chunks)             # same single pass over chunks
    browser_* = parse(carved sqlite)           # sqlite3-in-UDF + joins
    sinks: parquet/jsonl/csv per table

Thread boundaries become stage boundaries; bounded-channel
backpressure becomes Spark scheduling; the single-writer metadata
thread becomes parallel columnar writes.
"""

from __future__ import annotations

import os
import secrets
from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swiftbeaver_spark import chunking, schemas
from swiftbeaver_spark.carve_op import carve_hits_with_chunks, carve_hits_with_evidence
from swiftbeaver_spark.config import DEFAULT_CONFIG, EngineConfig
from swiftbeaver_spark.entropy import entropy_regions
from swiftbeaver_spark.scanner import scan_and_normalize
from swiftbeaver_spark.strings_scan import scan_string_artefacts, scan_string_spans

from pyspark.storagelevel import StorageLevel

# Storage level for the one-pass raw metadata frame (see _run_one_pass);
# module-level so tools/bench_persist_level.py can A/B levels in-session.
ONE_PASS_RAW_STORAGE = StorageLevel.MEMORY_AND_DISK


def make_run_id() -> str:
    """`YYYYMMDDTHHMMSSZ_<hex>` (reference src/config.rs:114-126)."""
    now = datetime.now(timezone.utc).strftime("%Y%m%dT%H%M%SZ")
    return f"{now}_{secrets.token_hex(8)}"


def _observation_filled(obs) -> bool:
    """Non-blocking probe: has this Observation been filled by an
    action? Uses the private PySpark handle (there is no public
    non-blocking probe as of 4.1.2); the guard is NARROW — only
    AttributeError, i.e. the private attribute moved — so any other
    failure propagates loudly instead of silently degrading every
    observed summary to the second-evidence-pass fallback (ADVICE r10
    low). tests/test_engine_features.py pins that the probe returns
    True after an action, so a PySpark API change fails CI visibly."""
    try:
        jo = obs._jo
    except AttributeError:
        return False
    if jo is None:  # observation never attached to a DataFrame
        return False
    return bool(jo.getRowOrEmpty().isDefined())


@dataclass
class RunResult:
    tables: dict[str, DataFrame]
    # stage frames persisted by run(cache_intermediates=True); the
    # CALLER owns their lifetime — repeated runs in one session leak
    # executor storage unless unpersist() frees them (ADVICE r9)
    persisted: list[DataFrame] = field(default_factory=list)

    # per-stage Observation objects (CollectMetrics riding the stage
    # plans): counters captured as a BYPRODUCT of whatever action first
    # drives each table — the Spark analog of the reference's
    # single-pass counters (src/pipeline/mod.rs:256-264)
    observations: dict = field(default_factory=dict)

    def __getitem__(self, name: str) -> DataFrame:
        return self.tables[name]

    def observed_summary(self) -> DataFrame | None:
        """run_summary built from the stage observations instead of
        re-deriving every consumed subtree — with caching OFF that
        re-derivation is a second full evidence scan on the fused path
        (round-9: 32.5 s of a 61 s 1 GiB run). Valid only after an
        action has driven every observed stage table TO COMPLETION:
        CollectMetrics captures whatever rows flowed through the FIRST
        action on the observed frame, so a partial pre-drive (show(3)/
        take — limit short-circuits the scan) fills an observation with
        an undercount this probe cannot distinguish (ADVICE r10 medium).
        Callers that fully count every stage themselves (the stress
        bench) may use this; write_tables does NOT — it builds the
        summary from row counts its own write actions produced
        (summary_from_counts). Returns None — callers fall back to the
        lazy run_summary — if any observation is still unfilled, probed
        non-blockingly (Observation.get would otherwise wait forever).
        The chunks-side counters stay a real aggregate — on the fused
        path the chunk plan is pure range arithmetic (no evidence
        read), on the chunk-table path the table is cached."""
        if "hits" not in self.observations:
            return None
        if not all(_observation_filled(o) for o in self.observations.values()):
            return None
        got = {k: int(o.get["n"]) for k, o in self.observations.items()}
        return self._summary_select(got)

    def summary_from_counts(self, counts: dict[str, int]) -> DataFrame | None:
        """run_summary from per-stage row counts the CALLER itself
        produced (one per full stage action — write_tables records the
        count of every stage write via a fresh write-time Observation).
        Unlike observed_summary this cannot be poisoned by a partial
        pre-drive between run() and the write (ADVICE r10 medium): the
        counts come from the very actions that produced the output.
        Returns None if any summary-feeding stage table lacks a count."""
        needed = [
            n
            for n in ("hits", "carved_files", "string_spans", "string_artefacts")
            if n in self.tables
        ]
        if any(n not in counts for n in needed):
            return None
        return self._summary_select({k: int(v) for k, v in counts.items()})

    def _summary_select(self, got: dict[str, int]) -> DataFrame:
        def n(name: str) -> int:
            return got.get(name, 0)

        return self.tables["chunks"].agg(
            F.coalesce(F.sum("valid_length"), F.lit(0)).cast("long").alias("bytes_scanned"),
            F.count("*").alias("chunks_processed"),
        ).select(
            "bytes_scanned",
            "chunks_processed",
            F.lit(n("hits")).cast("long").alias("hits_found"),
            F.lit(n("carved_files")).cast("long").alias("files_carved"),
            F.lit(n("string_spans")).cast("long").alias("string_spans"),
            F.lit(n("string_artefacts")).cast("long").alias("artefacts_extracted"),
        )

    def unpersist(self) -> None:
        """Free the stage caches created by run(cache_intermediates=
        True). Call once every consumer of the tables has materialised
        (lazy frames read through the cache while it is live).

        Blocking on purpose (r13): DataFrame.unpersist defaults to
        async block dropping, so back-to-back runs (stress bench,
        repeated write_tables) would build the next run's caches while
        the previous run's blocks were still draining — transient
        DOUBLE storage residency, measured as the 10 GiB one-pass OOM
        on an 8 GiB heap."""
        for df in self.persisted:
            df.unpersist(blocking=True)
        self.persisted.clear()


class Engine:
    """Public API analog of `run_pipeline` (reference src/pipeline/mod.rs:98-129).

    Carve strategy selection (`carve`): pass `evidence_path` to use
    positioned reads — each task re-opens the evidence (right whenever
    executors can reach it as a path: local, NFS, fuse-mounted object
    store), with no window cap at all. Pass `chunks` to carve from the
    materialized chunk table alone (the 100 TB path: the one-pass
    columnar copy replaces all later evidence reads) — a shuffle-free
    stream pass plus a bucketed-cogroup fallback for windows crossing
    partition boundaries (carve_op.py). Heap sizing for the chunk-table
    strategy (run(chunk_join=True) / carve(chunks=...)): the working
    set is the chunk CACHE plus, per concurrent task, a chunk row AND
    its Arrow copy crossing the stream-carve boundary — roughly
    cache_bytes + 3 x concurrent_tasks x chunk_size. Measured on
    local[32] at 4 GiB evidence: an 8 GiB heap OOMs at 512 MiB chunks
    (cache unroll), a 16 GiB heap OOMs at 64 MiB chunks (32 concurrent
    Arrow conversions on top of the 4 GiB cache). This is the CLUSTER
    strategy — the budget is per-executor on a many-node cluster
    (100 TB / 1000 nodes = 100 GB/node, disk-backed) — single-JVM
    local runs should use the default fused/positioned path, which
    never materializes chunk bytes. The chunk path bounds each
    in-flight hit's window at carve_op._WINDOW_CAP_LIMIT (1.5 GiB):
    per-type windows above that are rejected at plan time, and a carve
    the window cut short (while evidence continues) carries an explicit
    `over_cap` error — file types that genuinely need multi-GiB windows
    (mov/webm at 10 GiB max_size) must carve via `evidence_path`."""

    def __init__(self, spark: SparkSession, cfg: EngineConfig = DEFAULT_CONFIG):
        self.spark = spark
        self.cfg = cfg

    # -- ingestion -----------------------------------------------------------

    def chunks_from_file(self, path: str, resume_from: int | None = None) -> DataFrame:
        """resume_from: checkpoint next_offset (skip already-scanned
        chunks; see swiftbeaver_spark.checkpoint)."""
        return chunking.chunks_from_file(
            self.spark,
            path,
            self.cfg.chunk_size,
            self.cfg.overlap,
            max_bytes=self.cfg.max_bytes,
            max_chunks=self.cfg.max_chunks,
            min_offset=resume_from,
        )

    def chunks_from_bytes(self, data: bytes) -> DataFrame:
        return chunking.chunks_from_bytes(self.spark, data, self.cfg.chunk_size, self.cfg.overlap)

    # -- stages ---------------------------------------------------------------

    def hits(self, chunks: DataFrame) -> DataFrame:
        return scan_and_normalize(chunks, self.cfg)

    def carve(
        self,
        hits: DataFrame,
        evidence_path: str | None = None,
        chunks: DataFrame | None = None,
        evidence_len: int | None = None,
        chunk_strategy: str = "stream",
    ) -> DataFrame:
        """`chunk_strategy` (chunks path only): "stream" broadcasts hit
        metadata onto the chunk scan — right whenever the hit set fits
        a broadcast (tens of bytes per hit; virtually always).
        "cogroup" instead shuffles chunk bytes once on bucket keys —
        the escape hatch for hit sets too large to broadcast (billions
        of hits), where a forced broadcast would pressure executor
        memory. Results are identical (differential-tested)."""
        if evidence_path is not None:
            carved = carve_hits_with_evidence(hits, evidence_path, self.cfg)
        elif chunks is not None:
            carved = carve_hits_with_chunks(
                hits,
                chunks,
                self.cfg,
                evidence_len=evidence_len,
                strategy=chunk_strategy,
            )
        else:
            raise ValueError("need evidence_path or chunks")
        if self.cfg.max_files is not None:
            # global cap is sequential semantics in the reference
            # (src/pipeline/mod.rs:328-416); distributed approximation
            carved = carved.orderBy("global_start").limit(self.cfg.max_files)
        return carved

    # -- full run --------------------------------------------------------------

    def run(
        self,
        evidence_path: str | None = None,
        evidence_bytes: bytes | None = None,
        chunk_join: bool = False,
        cache_intermediates: bool = False,
        one_pass: bool | None = None,
    ) -> RunResult:
        """`cache_intermediates=True` persists each stage output
        (MEMORY_AND_DISK — recomputable on executor loss, unlike
        localCheckpoint) so multi-consumer reads evaluate each stage
        ONCE: the reference's single pass computes its run counters
        for free, but the Spark analog's run_summary otherwise
        re-derives every consumed subtree — on the fused evidence
        path that is a second full evidence scan through the Python
        strings kernel (measured: 32.5 s of a 61 s 1 GiB end-to-end
        run). The setting for full runs that drive several tables
        (write_tables, the stress bench); OFF by default so
        single-table uses stay cache-free. Stage outputs are metadata
        rows (spans/hits/carves), orders of magnitude smaller than
        evidence. Under one-pass the string_spans table is NOT
        re-persisted — it is a projection of the already-persisted raw
        frame, and double-storing the span content bytes OOMed an
        8 GiB heap at 10 GiB evidence (r13). The caches are
        CALLER-owned: call RunResult.unpersist() when done, or
        repeated runs in one session accumulate executor storage.

        `one_pass=True` runs the scans through the fused one-pass
        multi-scan (fused_scan.scan_all_from_evidence): ONE positioned
        read per sub-chunk feeds signature + strings + entropy, instead
        of each scan re-reading the evidence — 3x less corpus egress at
        object-store scale and, on E01, 3x less re-decompression (the
        round-11 measurement: each pass on compressed containers pays
        the full inflate again, which is why default-path E01 ran ~2x
        raw). Requires the JVM kernel and entropy-window-aligned
        geometry (ValueError otherwise — same loud contract as the
        fused module). The raw metadata frame persists for the
        RunResult's lifetime (it is what makes the read happen once);
        RunResult.unpersist() frees it. `one_pass=None` (default)
        resolves via _one_pass_auto: one-pass whenever the
        preconditions hold (raw AND EWF — the r12 cold-cache A/B
        measured 0.16-0.27x the multi-pass walls with no regime where
        multi-pass wins), multi-pass otherwise (JRE-only hosts, the
        kernel escape hatch, misaligned geometry, string scan off).
        Results are byte-identical either way (differential-pinned in
        tests/test_fused_scan.py and tests/test_engine_one_pass.py)."""
        if one_pass and (evidence_path is None or chunk_join):
            raise ValueError(
                "one_pass=True requires evidence_path and excludes "
                "chunk_join (the one-pass scan reads the evidence "
                "directly; the chunk-table strategy materializes bytes)"
            )
        if evidence_path is not None and not chunk_join:
            use_one_pass = one_pass
            if use_one_pass is None:
                use_one_pass = self._one_pass_auto(evidence_path)
            if use_one_pass:
                return self._run_one_pass(evidence_path, cache_intermediates)
        if evidence_path is not None and not chunk_join:
            # fused path: the chunk *plan* (arithmetic rows) distributes;
            # each scan reads its own byte ranges — chunk bytes never
            # cross the JVM<->Python boundary nor get cached
            from swiftbeaver_spark.chunking import plan_chunks
            from swiftbeaver_spark.entropy import entropy_regions_from_evidence
            from swiftbeaver_spark.scanner import scan_evidence
            from swiftbeaver_spark.strings_scan import spans_from_evidence

            from swiftbeaver_spark.source import evidence_length

            total = evidence_length(evidence_path)
            plan = plan_chunks(self.spark, total, self.cfg.chunk_size, self.cfg.overlap)
            if self.cfg.max_bytes is not None:
                plan = plan.where(F.col("start") < int(self.cfg.max_bytes))
            if self.cfg.max_chunks is not None:
                plan = plan.where(F.col("chunk_id") < int(self.cfg.max_chunks))
            hits = scan_evidence(self.spark, evidence_path, self.cfg, plan=plan)
            carved = self.carve(hits, evidence_path=evidence_path)
            tables = {"chunks": plan, "hits": hits, "carved_files": carved}
            if self.cfg.enable_string_scan:
                spans = spans_from_evidence(self.spark, evidence_path, self.cfg)
                tables["string_spans"] = spans
                tables["string_artefacts"] = scan_string_artefacts(spans, self.cfg)
            if self.cfg.enable_entropy_detection:
                tables["entropy_regions"] = entropy_regions_from_evidence(
                    self.spark, evidence_path, self.cfg
                )
        else:
            if evidence_path is not None:
                from swiftbeaver_spark.source import evidence_length

                chunks = self.chunks_from_file(evidence_path)
                total = evidence_length(evidence_path)
            elif evidence_bytes is not None:
                chunks = self.chunks_from_bytes(evidence_bytes)
                total = len(evidence_bytes)
            else:
                raise ValueError("need evidence_path or evidence_bytes")
            chunks = chunks.cache()  # one pass feeds scan, strings, entropy, carve

            hits = self.hits(chunks)
            # evidence_len from the plan's arithmetic — no aggregation job.
            # Scan limits truncate the chunk table, so the byte horizon for
            # over_cap-vs-EOF attribution is the last INCLUDED chunk's end,
            # not the full media length (else a limit-cut carve would claim
            # withheld-by-cap bytes that were never scanned).
            horizon = total
            if self.cfg.max_bytes is not None and self.cfg.max_bytes < total:
                last = (max(self.cfg.max_bytes, 1) - 1) // self.cfg.chunk_size
                horizon = min(horizon, (last + 1) * self.cfg.chunk_size)
            if self.cfg.max_chunks is not None:
                horizon = min(horizon, self.cfg.max_chunks * self.cfg.chunk_size)
            carved = self.carve(hits, chunks=chunks, evidence_len=horizon)
            tables = {"chunks": chunks, "hits": hits, "carved_files": carved}
            if self.cfg.enable_string_scan:
                spans = scan_string_spans(chunks, self.cfg)
                tables["string_spans"] = spans
                tables["string_artefacts"] = scan_string_artefacts(spans, self.cfg)
            if self.cfg.enable_entropy_detection:
                tables["entropy_regions"] = entropy_regions(chunks, self.cfg)
        return self._finish(tables, evidence_path, cache_intermediates)

    def _one_pass_auto(self, evidence_path: str) -> bool:
        """Auto rule for run(one_pass=None): one-pass IS the default
        strategy whenever its preconditions hold (JVM kernel, entropy-
        window-aligned geometry, string scan on) — for BOTH raw and EWF
        evidence. The r12 cold-cache A/B (drop_caches before every run,
        alternating modes in one session, 2 GiB) measured one-pass at
        0.16x multi-pass on raw and 0.27x on E01 — the object-store
        regime where every pass is real egress — while warm-page-cache
        runs tie within host noise; there is no regime where multi-pass
        wins, so it is the fallback, not the default. Results are
        byte-identical (differential-pinned). Warns once per process
        (warnings module default dedup) so the strategy is never
        switched silently — the IVF auto-switch contract; pass
        one_pass=False to force the multi-pass path."""
        from swiftbeaver_spark.fused_scan import one_pass_geometry_ok
        from swiftbeaver_spark.jvm import vec_kernel_active

        if not self.cfg.enable_string_scan:
            # the fused UDF always runs the span kernel; no spec form
            # disables it, so string-scan-off runs keep the default path
            return False
        if not (one_pass_geometry_ok(self.cfg) and vec_kernel_active(self.spark)):
            return False
        import warnings

        warnings.warn(
            "evidence run: using the one-pass multi-scan (one positioned "
            "read feeds signature+strings+entropy; measured 2.6-6x the "
            "multi-pass path on a cold cache, a wash warm). Pass "
            "one_pass=False to force the multi-pass path.",
            stacklevel=3,
        )
        return True

    def _run_one_pass(self, evidence_path: str, cache_intermediates: bool) -> RunResult:
        """One-pass table graph: scan_all_from_evidence's raw metadata
        frame (persisted — that persist IS the single read) feeds hits/
        spans/entropy; carve stays on targeted positioned reads (hit
        windows only — the one stage whose reads are sparse)."""
        from swiftbeaver_spark.chunking import plan_chunks
        from swiftbeaver_spark.fused_scan import scan_all_from_evidence
        from swiftbeaver_spark.source import evidence_length

        if not self.cfg.enable_string_scan:
            raise ValueError(
                "one_pass=True requires enable_string_scan (the fused "
                "UDF always runs the span kernel); use the default path"
            )
        total = evidence_length(evidence_path)
        scans = scan_all_from_evidence(
            self.spark,
            evidence_path,
            self.cfg,
            max_bytes=self.cfg.max_bytes,
            max_chunks=self.cfg.max_chunks,
        )
        # the persist is what makes the evidence read happen ONCE: every
        # derived table reads through this metadata cache (one row per
        # sub-chunk: packed hits + span rows + entropy islands). The
        # frame is the one SIZE-PROPORTIONAL intermediate (span content
        # ~ the text share of the corpus); MEMORY_AND_DISK lets Spark
        # degrade it to disk partition-by-partition when it outgrows
        # the storage pool — the in-session persist-level A/B
        # (tools/bench_persist_level.py, r13) measured MEMORY_AND_DISK
        # vs DISK_ONLY within noise at 4 GiB on local[32], so the
        # graceful default keeps the memory-hit fast path where the
        # frame fits and the disk shape where it does not. Module
        # constant so the A/B tool can swap levels in one session.
        raw = scans["raw"].persist(ONE_PASS_RAW_STORAGE)
        plan = plan_chunks(self.spark, total, self.cfg.chunk_size, self.cfg.overlap)
        if self.cfg.max_bytes is not None:
            plan = plan.where(F.col("start") < int(self.cfg.max_bytes))
        if self.cfg.max_chunks is not None:
            plan = plan.where(F.col("chunk_id") < int(self.cfg.max_chunks))
        hits = scans["hits"]
        carved = self.carve(hits, evidence_path=evidence_path)
        tables = {"chunks": plan, "hits": hits, "carved_files": carved}
        spans = scans["string_spans"]
        tables["string_spans"] = spans
        tables["string_artefacts"] = scan_string_artefacts(spans, self.cfg)
        if self.cfg.enable_entropy_detection:
            tables["entropy_regions"] = scans["entropy_regions"]
        return self._finish(
            tables, evidence_path, cache_intermediates, persisted_pre=[raw]
        )

    def _finish(
        self,
        tables: dict[str, DataFrame],
        evidence_path: str | None,
        cache_intermediates: bool,
        persisted_pre: list[DataFrame] | None = None,
    ) -> RunResult:
        # Persist FIRST (on the raw stage plans), THEN attach the
        # counter observations on top. Order matters: Spark's cache
        # manager substitutes by LOGICAL-PLAN equality, and the derived
        # stages (carve from hits, artefacts from spans, browser from
        # carved) were built from the RAW frames — persisting a
        # CollectMetrics-wrapped plan instead would leave those
        # subtrees cache-MISSING and re-run the full evidence scans the
        # cache exists to avoid (caught by round-10 self-review; the
        # raw-vs-observed mismatch was verified real on PySpark 4.1.2).
        persisted: list[DataFrame] = list(persisted_pre or [])
        if cache_intermediates:
            # Under one-pass (persisted_pre holds the raw metadata
            # frame) string_spans is a cheap PROJECTION of that
            # already-persisted frame, and it carries the dominant
            # cache bytes (the span content strings — ~1.4M rows/GiB
            # on text-heavy evidence). Re-persisting it stores those
            # bytes TWICE (raw struct arrays + exploded rows); at
            # 10 GiB the doubled residency OOMed an 8 GiB heap (r13).
            # Skipping it costs one cached-columnar re-read + explode
            # per drive — no evidence I/O. hits / entropy_regions stay
            # persisted: they are metadata-small (thousands of rows
            # per GiB) and their caches save a decode/merge-shuffle
            # per extra drive; real-compute stages (carve, artefact
            # regexes) persist as before.
            skip = {"string_spans"} if persisted_pre else set()
            for name in (
                "hits",
                "carved_files",
                "string_spans",
                "string_artefacts",
                "entropy_regions",
            ):
                if name in tables and name not in skip:
                    tables[name] = tables[name].persist(
                        StorageLevel.MEMORY_AND_DISK
                    )
                    persisted.append(tables[name])
        # browser stage reads the (possibly persisted) stage frame, NOT
        # the observation-wrapped one below: a browser-table drive must
        # not fill the carve observation (observed_summary's contract)
        carved = tables["carved_files"]
        # counter observations ride the stage plans (CollectMetrics):
        # whatever action first drives a table also yields its count,
        # so multi-table flows (write_tables, the stress bench) can
        # build run_summary via RunResult.observed_summary() without
        # re-deriving any subtree. Reads THROUGH the persisted frame.
        from pyspark.sql import Observation

        observations = {}
        for name in ("hits", "carved_files", "string_spans", "string_artefacts"):
            if name in tables:
                obs = Observation()
                tables[name] = tables[name].observe(obs, F.count(F.lit(1)).alias("n"))
                observations[name] = obs
        if evidence_path is not None and any(
            ft.type_id == "sqlite" for ft in self.cfg.file_types
        ):
            from swiftbeaver_spark.parsers.browser import extract_browser_tables
            from swiftbeaver_spark.parsers.sqlite_pages import recover_history_from_pages

            carved_sqlite = carved.where(F.col("file_type") == "sqlite")
            browser = extract_browser_tables(carved_sqlite, evidence_path)
            history = browser["browser_history"]
            if self.cfg.enable_sqlite_page_recovery:
                # recovery augments history for DBs whose intact parse found
                # nothing (reference gates per-DB on 0 rows,
                # src/pipeline/workers.rs:300-368): anti-join on source_file
                recovered = recover_history_from_pages(carved_sqlite, evidence_path)
                parsed_sources = history.select("source_file").distinct()
                history = history.unionByName(
                    recovered.join(parsed_sources, "source_file", "left_anti").select(
                        *[f.name for f in schemas.BROWSER_HISTORY.fields]
                    )
                )
            tables["browser_history"] = history
            tables["browser_cookies"] = browser["browser_cookies"]
            tables["browser_downloads"] = browser["browser_downloads"]
        # the lazy run_summary DataFrame stays the standalone form
        # (single-table users); multi-table flows use observed_summary()
        tables["run_summary"] = self.run_summary(tables)
        return RunResult(tables, persisted, observations)

    def run_summary(self, tables: dict[str, DataFrame]) -> DataFrame:
        """Single-row counters table (reference src/pipeline/mod.rs:256-264,
        434-448). Declarative aggregation — Catalyst folds these into
        partial aggregates per table."""
        chunks = tables["chunks"]
        counts = chunks.agg(
            F.coalesce(F.sum("valid_length"), F.lit(0)).cast("long").alias("bytes_scanned"),
            F.count("*").alias("chunks_processed"),
        )
        hits_n = tables["hits"].agg(F.count("*").alias("hits_found"))
        carved_n = tables["carved_files"].agg(F.count("*").alias("files_carved"))
        spans = tables.get("string_spans")
        spans_n = (
            spans.agg(F.count("*").alias("string_spans"))
            if spans is not None
            else self.spark.range(1).select(F.lit(0).cast("long").alias("string_spans"))
        )
        arts = tables.get("string_artefacts")
        arts_n = (
            arts.agg(F.count("*").alias("artefacts_extracted"))
            if arts is not None
            else self.spark.range(1).select(F.lit(0).cast("long").alias("artefacts_extracted"))
        )
        return counts.crossJoin(hits_n).crossJoin(carved_n).crossJoin(spans_n).crossJoin(arts_n)


def write_tables(
    result: RunResult,
    out_dir: str,
    fmt: str = "parquet",
    run_id: str | None = None,
) -> None:
    """Sinks (reference src/metadata/{jsonl,csv,parquet}.rs). Parquet is
    the scale path; JSONL/CSV parity formats for the reference's outputs.

    run_summary is built from row counts THIS function's own write
    actions produced (a fresh write-time Observation per stage write;
    dryrun uses the count directly) — one arithmetic chunks aggregate
    instead of re-deriving every subtree (the second-evidence-pass
    hazard, VERDICT r9 task 3), and immune to the undercount a partial
    pre-drive between run() and write_tables would plant in the
    run()-time observations (ADVICE r10 medium)."""
    from pyspark.sql import Observation

    run_id = run_id or make_run_id()
    write_counts: dict[str, int] = {}
    # summary last: its counts come from the stage writes above it
    names = sorted(
        (n for n in result.tables if n != "chunks"),
        key=lambda n: n == "run_summary",
    )
    for name in names:
        df = result.tables[name]
        if name == "run_summary":
            counted = result.summary_from_counts(write_counts)
            if counted is not None:
                df = counted
        if fmt == "dryrun":
            # reference DryRun sink (src/metadata/mod.rs:129-171):
            # execute the pipeline, count, write nothing
            write_counts[name] = df.count()
            continue
        obs = None
        if name != "run_summary":
            obs = Observation()
            df = df.observe(obs, F.count(F.lit(1)).alias("n"))
        out = df.withColumn("run_id", F.lit(run_id))
        writer = out.write.mode("overwrite")
        path = f"{out_dir}/{name}"
        if fmt == "parquet":
            writer.parquet(path)
        elif fmt == "jsonl":
            writer.json(path)
        elif fmt == "csv":
            # csv can't nest arrays; flatten errors like the reference's
            # single nullable error column (src/metadata/parquet.rs:910)
            if "errors" in out.columns:
                out = out.withColumn("error", F.array_join("errors", "; ")).drop("errors")
            out.write.mode("overwrite").option("header", True).csv(path)
        else:
            raise ValueError(f"unknown sink format: {fmt}")
        if obs is not None:
            # the write action just drove the observed frame end to end
            write_counts[name] = int(obs.get["n"])
