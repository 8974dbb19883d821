"""Simhash blocking-layout A/B (VERDICT r6 item 5): measure keep =
n_segments - k in {1, 2, 3} at the published k<=4 regime on BOTH the
sf0.1 corpus and the 10x sf1 corpus, interleaved in one JVM (the only
comparison the host-variance band allows — BASELINE.md convention).
Pair sets must be IDENTICAL across layouts (exact recall by pigeonhole
at any layout); only candidate volume and wall move. The winning
thresholds feed _auto_segments in llm/dedup.py.

Usage: python tools/bench_simhash_layout.py [k] [passes]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftbeaver_spark.llm.dedup import simhash_near_dups
from swiftbeaver_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".scale", "sf1")

K = int(sys.argv[1]) if len(sys.argv) > 1 else 3
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def main() -> None:
    spark = get_spark(app_name="swiftbeaver-bench-simhash-layout")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
            "doc_id", "text"
        )
        rows = {}
        for p in range(PASSES):
            for keep in (1, 2, 3):
                pairs = simhash_near_dups(
                    docs, max_hamming=K, n_segments=K + keep
                )
                t0 = time.time()
                n = pairs.count()  # inner self-join: not count-eliminable
                wall = round(time.time() - t0, 3)
                spark.catalog.clearCache()  # sims.persist() inside
                rec = rows.setdefault(keep, {"pairs": n, "walls": []})
                assert rec["pairs"] == n, f"pair set drifted at keep={keep}"
                rec["walls"].append(wall)
                print(f"# {label} k={K} keep={keep} pass={p}: {wall}s, {n} pairs",
                      file=sys.stderr)
        pair_counts = {rows[k]["pairs"] for k in rows}
        assert len(pair_counts) == 1, f"layouts disagree: {pair_counts}"
        results[label] = {
            f"keep{k}": {"pairs": rows[k]["pairs"],
                         "best_wall_sec": min(rows[k]["walls"]),
                         "walls": rows[k]["walls"]}
            for k in rows
        }
    print(json.dumps({"simhash_layout_ab": {"k": K, **results}}))


if __name__ == "__main__":
    main()
