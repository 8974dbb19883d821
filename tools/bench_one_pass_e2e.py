"""Cold-cache engine A/B: one-pass vs multi-pass, raw vs E01 (VERDICT
r11 tasks 1+4). The warm-page-cache stress rows cannot show what the
one-pass adoption buys — re-reads of a cached local file are nearly
free, so multi-pass and one-pass tie within host noise there. The
regime the adoption targets is object storage / cold media, where
every pass is real egress and, on E01, real re-decompression. This
tool drops the page cache (echo 3 > /proc/sys/vm/drop_caches) before
EVERY measured run and alternates modes A/B/A/B in ONE Spark session,
so a host-load drift hits both modes equally (the in-session
discipline that produced the r11 2.16x fused-scan number).

Each measured run drives ALL engine tables to completion (carve
collect + counts + summary — the bench_engine_1gib e2e shape) and
asserts the two modes' table counts match.

Usage: python tools/bench_one_pass_e2e.py [mib] [reps] -> one JSON line.
"""
import dataclasses
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftbeaver_spark.config import DEFAULT_CONFIG
from swiftbeaver_spark.engine import Engine
from swiftbeaver_spark.session import get_spark
from tools.bench_engine_1gib import MIB, build_image
from tools.hostinfo import host_snapshot

SIZE_MIB = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def drop_caches() -> bool:
    try:
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
        return True
    except OSError:
        return False


def run_all(engine: Engine, path: str, one_pass: bool) -> tuple[float, dict]:
    t0 = time.time()
    run = engine.run(evidence_path=path, cache_intermediates=True, one_pass=one_pass)
    counts = {"carved_files": len(run["carved_files"].collect())}
    for t in ("hits", "string_spans", "string_artefacts", "entropy_regions"):
        counts[t] = run[t].count()
    run["run_summary"].collect()
    wall = round(time.time() - t0, 3)
    run.unpersist()
    return wall, counts


def main() -> None:
    spark = get_spark(app_name="swiftbeaver-onepass-ab")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="sbab_")
    raw_path = os.path.join(tmp, "ev.raw")
    manifest = build_image(raw_path, SIZE_MIB)
    from swiftbeaver_spark.ewf import write_ewf

    e01_path = os.path.join(tmp, "ev.E01")
    with open(raw_path, "rb") as fh:
        write_ewf(e01_path, fh.read(), sectors_per_chunk=64)

    planted_types = {m["type"] for m in manifest}
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        file_types=tuple(
            dataclasses.replace(ft, min_size=5)
            for ft in DEFAULT_CONFIG.file_types
            if ft.type_id in planted_types
        ),
        enable_string_scan=True,
        enable_entropy_detection=True,
    )
    engine = Engine(spark, cfg)
    # warm the session (jar, python pool, codegen) on a small prefix so
    # the first COLD measurement isn't charged session start-up
    warm_cfg = dataclasses.replace(cfg, max_chunks=1)
    Engine(spark, warm_cfg).run(evidence_path=raw_path, one_pass=True)[
        "hits"
    ].count()

    cold = drop_caches()
    out = {
        "image_mib": SIZE_MIB,
        "cold_cache": cold,
        "reps": REPS,
        "host_start": host_snapshot(),
        "walls": {},
    }
    if not cold:
        print("# WARNING: cannot drop page cache; runs are warm", file=sys.stderr)
    ref_counts: dict | None = None
    for container, path in (("raw", raw_path), ("e01", e01_path)):
        for rep in range(REPS):
            for mode, one_pass in (("multipass", False), ("onepass", True)):
                drop_caches()
                wall, counts = run_all(engine, path, one_pass)
                if ref_counts is None:
                    ref_counts = counts
                assert counts == ref_counts, (mode, container, counts, ref_counts)
                key = f"{container}_{mode}"
                out["walls"].setdefault(key, []).append(wall)
                print(f"# {key} rep{rep}: {wall}s {counts}", file=sys.stderr)
    out["counts"] = ref_counts
    out["best"] = {k: min(v) for k, v in out["walls"].items()}
    b = out["best"]
    out["ratios"] = {
        "e01_onepass_vs_multipass": round(b["e01_onepass"] / b["e01_multipass"], 3),
        "raw_onepass_vs_multipass": round(b["raw_onepass"] / b["raw_multipass"], 3),
        "e01_onepass_vs_raw_onepass": round(b["e01_onepass"] / b["raw_onepass"], 3),
    }
    out["host_end"] = host_snapshot()
    print(json.dumps({"one_pass_cold_ab": out}))
    os.unlink(raw_path)
    os.unlink(e01_path)


if __name__ == "__main__":
    main()
