"""MinHash band-layout crossover to ~100x sf1 (VERDICT r8 task 2a).

`minhash_near_dups` shipped with a fixed 64-hash x 16-band (r=4)
layout at every scale; q26's 4.83x wall at 10x data was candidate-
volume-driven. This sweep measures the BLOCKING stage
(`minhash_lsh_pairs`, no text, no verify) across layouts on signature
tables of 5e4 (sf1 real), 5e5 (10x) and 5e6 (100x) rows so the
narrow->wide crossover can be pinned into `_auto_minhash_layout`,
exactly the way tools/bench_simhash_scale100.py pinned
`_auto_segments`.

Layouts (contiguous band slices, so the r=8 candidate set over the
same 64 values is a SUBSET of r=4's):

  r4_h64   : values[0:64],  16 bands x 4 rows  (the historical fixed layout)
  r8_h64   : values[0:64],   8 bands x 8 rows  (volume floor at recall cost)
  r8_h128  : values[0:128], 16 bands x 8 rows  (the wide regime: recall kept
                                                by doubling signature width)

Synthetic replication preserves the two volume drivers of real
corpora: (a) each replica rep-hashes every value (xxhash64(v, rep)) so
equality WITHIN a replica is isomorphic to the real corpus — per-copy
volume scales linearly; (b) a deterministic per-(doc, position) coin
keeps ~q of positions UNCHANGED across replicas, so replicas of one
base doc share positions the way boilerplate shingles are shared on
natural text — background Jaccard ~q^2 between same-base replicas,
the superlinear C(R,2) term that r=4 admits (q^8 per band) and r=8
squares away (q^16). Planted ' tail'-style twins (4 of 64 / 8 of 128
positions re-randomized, J~0.94 analog) measure layout recall at x1.

Usage: python tools/bench_minhash_bands.py [sizes...]
  -> one JSON line {"minhash_band_regime": {...}}
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from swiftbeaver_spark.llm.dedup import (
    _auto_minhash_layout,
    minhash_lsh_pairs,
    minhash_signatures,
)
from swiftbeaver_spark.session import get_spark

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(ROOT, ".scale", "sf1")
SIZES = [int(s) for s in sys.argv[1:]] or [1, 10, 100]
Q_MILLI = 500  # shared-position probability q = 0.5
TWIN_EVERY = 10  # 1 planted twin per 10 base docs
LAYOUTS = {
    "r4_h64": (64, 16, 4),
    "r8_h64": (64, 8, 8),
    "r8_h128": (128, 16, 8),
}


def replicate(sigs, reps: int):
    """R isomorphic corpus copies with q-shared positions (see module
    docstring). rep=0 keeps the real signatures verbatim."""
    if reps == 1:
        return sigs.select("doc_id", "signature")
    rep = F.explode(F.sequence(F.lit(0), F.lit(reps - 1))).alias("rep")
    # per (base doc, position) coin decides SHARED (kept verbatim in
    # every replica) vs rep-hashed; deterministic so every replica of
    # one doc agrees on which positions are shared
    shared = (
        f"transform(signature, (v, i) -> "
        f"pmod(xxhash64(doc_id, i, 777), 1000) < {Q_MILLI})"
    )
    remap = (
        "zip_with(signature, _shared, (v, s) -> "
        "case when rep = 0 or s then v else xxhash64(v, rep) end)"
    )
    return (
        sigs.select("doc_id", "signature", rep)
        .withColumn("_shared", F.expr(shared))
        .select(
            (F.col("doc_id") * reps + F.col("rep")).alias("doc_id"),
            F.expr(remap).alias("signature"),
        )
    )


def plant_twins(sigs, num_hashes: int):
    """Planted near-dup twins: every TWIN_EVERY-th doc gets a copy at
    doc_id + 1e9 with num_hashes//16 positions re-randomized (the
    J~0.94 ' tail'-suffix analog)."""
    flip_every = num_hashes // (num_hashes // 16)
    twin = (
        f"transform(signature, (v, i) -> case when pmod(i + doc_id, {flip_every}) = 0 "
        f"then xxhash64(v, 31337) else v end)"
    )
    twins = sigs.where(F.col("doc_id") % TWIN_EVERY == 0).select(
        (F.col("doc_id") + 1_000_000_000).alias("doc_id"),
        F.expr(twin).alias("signature"),
    )
    return sigs.unionByName(twins)


def main() -> None:
    spark = get_spark(app_name="swiftbeaver-minhash-bands")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF1, "documents.parquet")).select(
        "doc_id", "text"
    )
    # one real 128-hash signature pass; narrow layouts slice [0:64].
    # (the first 64 affine multipliers coincide with the 64-hash
    # family's; the offsets differ — equally-distributed either way,
    # and the sweep compares layouts on ONE shared table)
    t0 = time.time()
    # densify doc_ids to 0..n-1 FIRST: sf1 ids run to ~9e7, and
    # replicated ids (doc_id * reps + rep) must stay below the 1e9
    # planted-twin offset at reps=100 (the first run of this sweep
    # left sparse ids in and poisoned the x100 twin space)
    from pyspark.sql import Window

    dense = F.row_number().over(Window.orderBy("doc_id")) - 1
    docs = docs.withColumn("doc_id", dense)
    base = minhash_signatures(docs, num_hashes=128).persist()
    n_base = base.count()
    sig128_wall = round(time.time() - t0, 3)
    # signature-width surcharge at x1 (the wide regime's linear price)
    t0 = time.time()
    minhash_signatures(docs, num_hashes=64).count()
    sig64_wall = round(time.time() - t0, 3)
    out = {
        "base_docs": n_base,
        "q_shared": Q_MILLI / 1000,
        "sig_wall_h64": sig64_wall,
        "sig_wall_h128": sig128_wall,
        "sizes": {},
    }
    for reps in SIZES:
        sims = plant_twins(replicate(base, reps), 128).persist()
        n = sims.count()
        n_twins = sims.where(F.col("doc_id") >= 1_000_000_000).count()
        row = {"docs": n, "planted": n_twins, "layouts": {}}
        for name, (h, b, r) in LAYOUTS.items():
            sl = sims.select(
                "doc_id", F.slice("signature", 1, h).alias("signature")
            )
            pairs = minhash_lsh_pairs(sl, num_bands=b, rows_per_band=r).persist()
            t0 = time.time()
            cnt = pairs.count()
            wall = round(time.time() - t0, 3)
            recall_pairs = pairs.where(
                F.col("doc_b") - F.col("doc_a") == 1_000_000_000
            ).count()
            pairs.unpersist()
            row["layouts"][name] = {
                "candidates": cnt,
                "wall_sec": wall,
                "planted_recall": round(recall_pairs / n_twins, 4),
            }
            print(
                f"# reps={reps} n={n} {name}: {wall}s, {cnt} candidates, "
                f"recall {recall_pairs}/{n_twins}",
                file=sys.stderr,
            )
        walls = {k: v["wall_sec"] for k, v in row["layouts"].items()}
        row["best_blocking"] = min(walls, key=walls.get)
        ah, ab = _auto_minhash_layout(n)
        row["auto_picks"] = f"h{ah}_b{ab}"
        out["sizes"][f"x{reps}"] = row
        sims.unpersist()
    base.unpersist()
    print(json.dumps({"minhash_band_regime": out}))


if __name__ == "__main__":
    main()
