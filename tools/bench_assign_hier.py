"""Measure the flat-vs-hierarchical IVF assignment crossover
(VERDICT r9 task 4): wall + cell-agreement of assign_cells_arrow's
two-level coarse quantizer against the flat matmul, on a CLUSTERED
synthetic corpus with a TRAINED quantizer (the production shape at the
scales where the switch fires — random pinned quantizers carry no
cluster structure and are documented as a hier=False case).

The flat assignment is n x nlist flops — ~n^1.5 at the auto_nlist
optimum (SCALE.md r9 known ceiling). The two-level path costs
~(1+probe_super) * sqrt(nlist) flops/vector. This tool records where
it actually wins, which sets _HIER_NLIST_MIN.

Usage: python tools/bench_assign_hier.py [n_vectors] [out_json]
  -> one JSON line {"assign_hier": {...}}
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import (  # noqa: E402
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from swiftbeaver_spark.llm.similarity import assign_cells_arrow  # noqa: E402
from swiftbeaver_spark.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
DIM = 64
N_CENTERS = 200
NLISTS = [int(x) for x in os.environ.get("SPARK_GRAFT_NLISTS", "1024,2048,4096").split(",")]


def corpus_df(spark, n):
    """Clustered vectors: center (id % N_CENTERS) + hash-seeded noise,
    generated executor-side (no driver materialisation)."""
    rng = np.random.RandomState(20260816)
    centers = (rng.randn(N_CENTERS, DIM) * 2.0).astype(np.float64)
    schema = StructType(
        [
            StructField("vec_id", LongType(), False),
            StructField("vec", ArrayType(DoubleType()), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            local = np.random.RandomState((int(ids[0]) % (1 << 31)) or 1)
            noise = local.randn(len(ids), DIM) * 0.5
            mat = centers[ids % N_CENTERS] + noise
            yield pd.DataFrame({"vec_id": ids, "vec": list(mat)})

    return spark.range(n).mapInPandas(gen, schema)


def train_centroids(df, nlist, sample=30_000):
    """numpy kmeans over a corpus sample — the trained-quantizer shape
    (ivf_train semantics, offline for bench speed)."""
    rows = df.limit(sample).collect()
    data = np.array([r.vec for r in rows])
    rng = np.random.RandomState(7)
    c = data[rng.choice(len(data), min(nlist, len(data)), replace=False)].copy()
    for _ in range(4):
        d2 = (data**2).sum(1)[:, None] - 2 * data @ c.T + (c**2).sum(1)[None, :]
        lab = d2.argmin(1)
        for s in range(len(c)):
            m = lab == s
            if m.any():
                c[s] = data[m].mean(0)
    return [[round(float(x), 6) for x in row] for row in c]


def main():
    spark = get_spark(
        app_name="sb-assign-hier",
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.storagelevel import StorageLevel

    df = corpus_df(spark, N).persist(StorageLevel.DISK_ONLY)
    df.count()
    out = {"n": N, "dim": DIM, "rows": []}
    for nlist in NLISTS:
        cents = train_centroids(df, nlist)
        row = {"nlist": nlist}
        for mode, kw in (
            ("flat", {"hier": False}),
            ("hier_p8", {"hier": True, "probe_super": 8}),
        ):
            t0 = time.time()
            assigned = assign_cells_arrow(df, cents, vec_col="vec", **kw)
            # agg over cells drives the assignment without collecting rows
            n_cells = assigned.select("cell").distinct().count()
            row[mode] = {
                "wall_sec": round(time.time() - t0, 2),
                "cells_used": n_cells,
            }
            print(f"# nlist={nlist} {mode}: {row[mode]}", file=sys.stderr)
        # agreement on a 200k sample (full-join agreement would double-read)
        sample = df.limit(100_000)
        flat = assign_cells_arrow(sample, cents, vec_col="vec", hier=False).select(
            "vec_id", F.col("cell").alias("cf")
        )
        hier = assign_cells_arrow(
            sample, cents, vec_col="vec", hier=True, probe_super=8
        ).select("vec_id", F.col("cell").alias("ch"))
        j = flat.join(hier, "vec_id")
        agree = j.agg(
            F.avg((F.col("cf") == F.col("ch")).cast("double")).alias("a")
        ).collect()[0]["a"]
        row["agreement_p8"] = round(float(agree), 5)
        print(f"# nlist={nlist} agreement={row['agreement_p8']}", file=sys.stderr)
        out["rows"].append(row)
    print(json.dumps({"assign_hier": out}))
    if len(sys.argv) > 2:
        with open(sys.argv[2], "w") as fh:
            json.dump({"assign_hier": out}, fh)


if __name__ == "__main__":
    main()
