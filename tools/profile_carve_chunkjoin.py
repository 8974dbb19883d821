"""Decompose the chunk-join carve wall at sf1 (VERDICT r8 task 1).

Measures, over the round-7 jpeg-dense sf1 artifacts (204.8 MB image,
50k hits), cumulative walls for successive prefixes of the strategy-2
plan so the dominant term is identified before any rework:

  scan_only   : parquet chunk scan, JVM-side length sum (no join)
  join_only   : claimed-ranges equi-join, JVM-side length sum (no group)
  grouped     : + groupBy collect_list/sort_array (no Python)
  arrow_xfer  : + mapInPandas passthrough (Arrow transfer, no carve)
  full        : the production carve_hits_with_chunks
  positioned  : strategy-1 baseline

Usage: python tools/profile_carve_chunkjoin.py [sf0.1|sf1]
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from swiftbeaver_spark.carve_op import carve_hits_with_chunks, carve_hits_with_evidence
from swiftbeaver_spark.chunking import read_chunks
from swiftbeaver_spark.config import DEFAULT_CONFIG
from swiftbeaver_spark.scanner import scan_evidence
from swiftbeaver_spark.session import get_spark

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BLOCK = 4096


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "sf1"
    img = os.path.join(ROOT, ".scale", "carve", f"jpeg_dense_{label}.raw")
    chunk_pq = os.path.join(ROOT, ".scale", "carve", f"chunks_{label}.parquet")
    spark = get_spark(app_name="carve-profile")
    spark.sparkContext.setLogLevel("ERROR")
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        chunk_size=BLOCK,
        overlap=0,
        file_types=tuple(ft for ft in DEFAULT_CONFIG.file_types if ft.type_id == "jpeg"),
    )
    hits = scan_evidence(spark, img, cfg).persist()
    n_hits = hits.count()
    chunks = read_chunks(spark, chunk_pq)
    out = {"label": label, "hits": n_hits}

    def timed(name, fn):
        t0 = time.time()
        r = fn()
        out[name] = round(time.time() - t0, 3)
        print(f"# {name}: {out[name]}s ({r})", file=sys.stderr)

    # rebuild the strategy-2 plan prefix by prefix (mirrors carve_op.py)
    cap = 2 * BLOCK
    window_end = (F.col("global_offset") + F.lit(cap)).alias("window_end")
    hit_rows = hits.select(
        "global_offset", "file_type_id", "pattern_id", window_end,
        F.monotonically_increasing_id().alias("hit_id"),
    )
    claimed = hit_rows.select(
        "*",
        F.explode(
            F.sequence(
                F.greatest(F.lit(0), (F.col("global_offset") - 512) / BLOCK).cast("long"),
                ((F.col("window_end") - 1) / BLOCK).cast("long"),
            )
        ).alias("chunk_id"),
    )
    joined = claimed.join(chunks, "chunk_id", "inner").select(
        "hit_id", "global_offset", "file_type_id", "pattern_id",
        "start", "valid_length", "data",
    )
    grouped = joined.groupBy(
        "hit_id", "global_offset", "file_type_id", "pattern_id"
    ).agg(
        F.sort_array(F.collect_list(F.struct("start", "valid_length", "data"))).alias("parts")
    )

    timed("scan_only", lambda: chunks.select(F.sum(F.length("data"))).collect()[0][0])
    timed("join_only", lambda: joined.select(F.sum(F.length("data"))).collect()[0][0])
    timed("grouped", lambda: grouped.select(
        F.sum(F.aggregate("parts", F.lit(0), lambda a, p: a + F.length(p["data"])))
    ).collect()[0][0])

    import pandas as pd

    def passthrough(batches):
        n = 0
        for pdf in batches:
            n += len(pdf)
        yield pd.DataFrame({"n": [n]})

    timed("arrow_xfer", lambda: grouped.mapInPandas(
        passthrough, "n long").select(F.sum("n")).collect()[0][0])
    timed("full", lambda: len(
        carve_hits_with_chunks(hits, chunks, cfg, window_cap=cap).collect()))
    timed("positioned", lambda: len(
        carve_hits_with_evidence(hits, img, cfg).collect()))
    hits.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
