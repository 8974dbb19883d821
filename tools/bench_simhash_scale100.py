"""Simhash keep-regime crossover beyond sf1 (VERDICT r8 task 2).

The round-7 layout A/B measured keep = n_segments - k at sf0.1 (5e4
docs) and sf1 (5e5); the keep=3 / 1e9-doc regime in `_auto_segments`
was extrapolated. This sweep measures the BLOCKING stage itself —
`simhash_pairs_from_signatures`, no text, no simhash kernel — on
signature tables of 5e5 (sf1 real), 5e6 (10x) and 5e7 (100x) rows, so
the measured crossover can be pinned into `_auto_segments`.

Synthetic signatures preserve the skew that drives candidate volume:
each real sf1 signature is replicated R times XORed with ~8 hashed bit
flips (xxhash64-derived, deterministic) — marginal bit biases and key
correlations survive, while replicas of one doc stay far outside
hamming<=3 of each other, so the pair set doesn't explode. Pair counts
must be IDENTICAL across keeps at each size (exact recall by
pigeonhole); only candidate volume and wall move.

Usage: python tools/bench_simhash_scale100.py [k] [sizes...]
  -> one JSON line {"simhash_keep_regime": {...}}
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from swiftbeaver_spark.llm.dedup import _auto_segments, simhash, simhash_pairs_from_signatures
from swiftbeaver_spark.session import get_spark

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(ROOT, ".scale", "sf1")
K = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SIZES = [int(s) for s in sys.argv[2:]] or [1, 10, 100]


def replicate(sims, reps: int):
    """Each replica flips ~8 hashed bit positions of a real signature
    (eight 1-bit masks; hash collisions just mean fewer flips)."""
    if reps == 1:
        return sims.select("doc_id", "simhash")
    rep = F.explode(F.sequence(F.lit(0), F.lit(reps - 1))).alias("rep")
    flips = None
    for j in range(8):
        bit = F.expr(
            f"shiftleft(1L, cast(pmod(xxhash64(doc_id, rep, {j}), 64) as int))"
        )
        flips = bit if flips is None else flips.bitwiseXOR(bit)
    return (
        sims.select("doc_id", "simhash", rep)
        .select(
            (F.col("doc_id") * reps + F.col("rep")).alias("doc_id"),
            F.when(F.col("rep") == 0, F.col("simhash"))
            .otherwise(F.col("simhash").bitwiseXOR(flips))
            .alias("simhash"),
        )
    )


def main() -> None:
    spark = get_spark(app_name="swiftbeaver-simhash-scale100")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF1, "documents.parquet")).select(
        "doc_id", "text"
    )
    base = simhash(docs).persist()
    n_base = base.count()
    out = {"k": K, "base_docs": n_base, "sizes": {}}
    for reps in SIZES:
        sims = replicate(base, reps).persist()
        n = sims.count()
        row = {"docs": n, "keeps": {}}
        for keep in (1, 2, 3):
            # uniform-key candidate estimate (skew inflates ~1.3-5x);
            # a layout that would stream >3e9 candidates has already
            # lost the A/B — record the estimate instead of burning
            # minutes proving it
            from math import comb

            nseg = K + keep
            key_bits = keep * 64 / nseg
            est = comb(nseg, keep) * n * n / 2**key_bits
            if est > 3e9:
                row["keeps"][f"keep{keep}"] = {"skipped_est_candidates": int(est)}
                print(f"# reps={reps} keep={keep}: skipped (est {est:.2e})",
                      file=sys.stderr)
                continue
            pairs = simhash_pairs_from_signatures(
                sims, max_hamming=K, n_segments=K + keep
            )
            t0 = time.time()
            cnt = pairs.count()
            wall = round(time.time() - t0, 3)
            row["keeps"][f"keep{keep}"] = {"pairs": cnt, "wall_sec": wall}
            print(f"# reps={reps} n={n} keep={keep}: {wall}s, {cnt} pairs",
                  file=sys.stderr)
        counts = {v["pairs"] for v in row["keeps"].values() if "pairs" in v}
        assert len(counts) == 1, f"pair sets diverge at reps={reps}: {counts}"
        walls = {k2: v["wall_sec"] for k2, v in row["keeps"].items() if "wall_sec" in v}
        row["best"] = min(walls, key=walls.get)
        row["auto_picks"] = f"keep{_auto_segments(K, n) - K}"
        out["sizes"][f"x{reps}"] = row
        sims.unpersist()
    base.unpersist()
    print(json.dumps({"simhash_keep_regime": out}))


if __name__ == "__main__":
    main()
