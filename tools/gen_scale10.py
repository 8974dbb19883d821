"""Generate a deterministic 10x-sf0.1 ("sf1-equivalent") dataset for
the heavy-family scale measurement (VERDICT r5 item 6): documents
(50,000 rows) and embeddings (20,000 rows) derived from the read-only
driver data at /root/testdata/sf0.1 — never modifying it.

Replication is PERTURBED so the workload shape stays realistic:
10 exact copies per doc would put every replica group in the same
LSH band bucket and quadratically inflate the candidate stage into a
shape the real corpus does not have. Instead replica k>0 rotates the
word stream by k and appends a replica token — word frequencies and
the ORIGINAL near-dup structure are preserved, replicas are distinct
documents. Embeddings get deterministic small Gaussian noise
(rng seeded by replica index), so IVF cell occupancy scales ~10x
without collapsing onto duplicate points.

Usage: python tools/gen_scale10.py [out_dir]   (default .scale/sf1)
"""
import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1"
)
REPLICAS = 10
ID_STRIDE = 10_000_000

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

docs = con.execute(f"SELECT * FROM read_parquet('{SRC}/documents.parquet')").df()
frames = []
for k in range(REPLICAS):
    d = docs.copy()
    d["doc_id"] = d["doc_id"] + k * ID_STRIDE
    if k > 0:
        def rot(t: str, k=k) -> str:
            w = t.split()
            if not w:
                return t
            r = k % len(w)
            return " ".join(w[r:] + w[:r]) + f" replica{k}"
        d["text"] = d["text"].map(rot)
        d["n_chars"] = d["text"].str.len().astype("int64")
    frames.append(d)
big_docs = pd.concat(frames, ignore_index=True)
pq.write_table(pa.Table.from_pandas(big_docs, preserve_index=False),
               os.path.join(OUT, "documents.parquet"))
print(f"documents: {len(big_docs)} rows -> {OUT}/documents.parquet")

emb = con.execute(f"SELECT * FROM read_parquet('{SRC}/embeddings.parquet')").df()
frames = []
for k in range(REPLICAS):
    e = emb.copy()
    e["vec_id"] = e["vec_id"] + k * ID_STRIDE
    if k > 0:
        rng = np.random.default_rng(1000 + k)
        mat = np.stack(e["embedding"].to_numpy())
        mat = mat + rng.normal(0.0, 0.02, size=mat.shape).astype(np.float32)
        e["embedding"] = list(mat.astype(np.float32))
    frames.append(e)
big_emb = pd.concat(frames, ignore_index=True)
emb_type = pa.list_(pa.float32())
tbl = pa.Table.from_arrays(
    [
        pa.array(big_emb["vec_id"], type=pa.int64()),
        pa.array([list(map(float, v)) for v in big_emb["embedding"]], type=emb_type),
        pa.array(big_emb["label"], type=pa.int32()),
    ],
    names=["vec_id", "embedding", "label"],
)
pq.write_table(tbl, os.path.join(OUT, "embeddings.parquet"))
print(f"embeddings: {len(big_emb)} rows -> {OUT}/embeddings.parquet")

# --- relational / events side (round 6 extension): facts replicate 10x
# with consistent key striding (lineitem.l_orderkey follows orders), dims
# copy verbatim — the real cluster shape: facts grow, dimensions don't.
orders = con.execute(f"SELECT * FROM read_parquet('{SRC}/orders.parquet')").df()
frames = []
for k in range(REPLICAS):
    d = orders.copy()
    d["o_orderkey"] = d["o_orderkey"] + k * ID_STRIDE
    frames.append(d)
big = pd.concat(frames, ignore_index=True)
pq.write_table(pa.Table.from_pandas(big, preserve_index=False),
               os.path.join(OUT, "orders.parquet"))
print(f"orders: {len(big)} rows")

li = con.execute(f"SELECT * FROM read_parquet('{SRC}/lineitem.parquet')").df()
frames = []
for k in range(REPLICAS):
    d = li.copy()
    d["l_orderkey"] = d["l_orderkey"] + k * ID_STRIDE
    frames.append(d)
big = pd.concat(frames, ignore_index=True)
pq.write_table(pa.Table.from_pandas(big, preserve_index=False),
               os.path.join(OUT, "lineitem.parquet"))
print(f"lineitem: {len(big)} rows")

ev = con.execute(f"SELECT * FROM read_parquet('{SRC}/events.parquet')").df()
frames = []
for k in range(REPLICAS):
    d = ev.copy()
    d["event_id"] = d["event_id"] + k * ID_STRIDE
    frames.append(d)
big = pd.concat(frames, ignore_index=True)
pq.write_table(pa.Table.from_pandas(big, preserve_index=False),
               os.path.join(OUT, "events.parquet"))
print(f"events: {len(big)} rows")

import shutil
for dim in ("region", "nation", "customer", "supplier", "part"):
    shutil.copyfile(f"{SRC}/{dim}.parquet", os.path.join(OUT, f"{dim}.parquet"))
    print(f"{dim}: copied verbatim")
