"""One-pass multi-scan vs three standalone evidence passes.

Measures, on the stress-texture image, (a) the standalone walls:
scan_evidence + spans_from_evidence + entropy_regions_from_evidence
each driven to completion (three positioned-read passes over the
evidence), and (b) the fused wall: scan_all_from_evidence with the
raw frame persisted, all three tables driven (ONE positioned-read
pass; the persisted frame holds metadata rows only). Result parity is
asserted, not assumed.

Usage: python tools/bench_fused_scan.py [mib]
  -> one JSON line {"fused_scan_bench": {...}}
"""
import dataclasses
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftbeaver_spark.config import DEFAULT_CONFIG
from swiftbeaver_spark.entropy import entropy_regions_from_evidence
from swiftbeaver_spark.fused_scan import scan_all_from_evidence
from swiftbeaver_spark.scanner import scan_evidence
from swiftbeaver_spark.session import get_spark
from swiftbeaver_spark.strings_scan import spans_from_evidence
from tools.bench_engine_1gib import build_image

MIB = 1 << 20
SIZE_MIB = int(sys.argv[1]) if len(sys.argv) > 1 else 1024


def main() -> None:
    spark = get_spark(app_name="swiftbeaver-fused-scan")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="sbfused_")
    path = os.path.join(tmp, "stress.raw")
    build_image(path, SIZE_MIB)
    planted = {"jpeg", "png", "sqlite", "pdf", "zip", "bmp"}
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        file_types=tuple(
            dataclasses.replace(ft, min_size=5)
            for ft in DEFAULT_CONFIG.file_types
            if ft.type_id in planted
        ),
        enable_string_scan=True,
        enable_entropy_detection=True,
    )

    out = {"image_mib": SIZE_MIB, "reps": []}
    for rep in range(2):
        t0 = time.time()
        n_hits = scan_evidence(spark, path, cfg).count()
        n_spans = spans_from_evidence(spark, path, cfg).count()
        n_regions = entropy_regions_from_evidence(spark, path, cfg).count()
        three = round(time.time() - t0, 3)

        t0 = time.time()
        t = scan_all_from_evidence(spark, path, cfg)
        t["raw"].persist()
        try:
            f_hits = t["hits"].count()
            f_spans = t["string_spans"].count()
            f_regions = t["entropy_regions"].count()
            fused = round(time.time() - t0, 3)
        finally:
            t["raw"].unpersist()
        assert (n_hits, n_spans, n_regions) == (f_hits, f_spans, f_regions), (
            (n_hits, n_spans, n_regions),
            (f_hits, f_spans, f_regions),
        )
        out["reps"].append(
            {
                "three_pass_sec": three,
                "one_pass_sec": fused,
                "speedup": round(three / fused, 2),
            }
        )
        print(f"# rep {rep}: three-pass {three}s, one-pass {fused}s "
              f"({three / fused:.2f}x), rows hits={n_hits} spans={n_spans} "
              f"regions={n_regions}", file=sys.stderr)
    print(json.dumps({"fused_scan_bench": out}))
    os.unlink(path)


if __name__ == "__main__":
    main()
