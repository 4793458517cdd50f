#!/usr/bin/env python3
"""Build a 10x replication of sf0.1 for the data-dominated bench probe
(dev-only tooling, like check.py — the engine never reads this code).

Structure-preserving, cross-replica-orthogonal:
  - documents: replica k gets doc_id + 5000k and a per-replica TOKEN
    BIJECTION (every token suffixed "~k" for k>0). A bijective rename
    preserves every within-replica relationship exactly (tf/df shape,
    shingle sets, minhash/simhash pair structure, span repeats) while
    making cross-replica token overlap ZERO — so dedup/decontamination
    workloads scale linearly, as a real 10x corpus would, instead of
    exploding quadratically on exact copies. Caveat recorded in
    BENCH_NOTES: stopword/langid selectivity degrades in replicas k>0
    (suffixed tokens match no profile), so screen drop-rates shift;
    the scans/joins being timed are unchanged.
  - embeddings: replica k gets vec_id + 2000k and a CIRCULAR DIMENSION
    ROTATION by k. Rotation is orthogonal: all within-replica cosines/
    L2 distances are bit-preserved, cross-replica similarity is that of
    unrelated vectors. queryIds (vec_id < 5) stay in replica 0.
"""
import sys
import numpy as np
import pandas as pd

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/tmp/sf1.0"
SRC = "/root/testdata/sf0.1"
K = 10

import os
os.makedirs(OUT, exist_ok=True)

docs = pd.read_parquet(f"{SRC}/documents.parquet")
n_docs = len(docs)
reps = []
for k in range(K):
    r = docs.copy()
    r["doc_id"] = r["doc_id"] + 5000 * k
    if k > 0:
        suf = f"~{k}"
        r["text"] = r["text"].map(
            lambda t: " ".join(w + suf if w else w for w in t.split(" ")))
    reps.append(r)
big = pd.concat(reps, ignore_index=True)
big.to_parquet(f"{OUT}/documents.parquet", index=False)
print(f"documents: {n_docs} -> {len(big)}")

emb = pd.read_parquet(f"{SRC}/embeddings.parquet")
n_emb = len(emb)
mat = np.stack(emb["embedding"].to_numpy())
reps = []
for k in range(K):
    r = emb.copy()
    r["vec_id"] = r["vec_id"] + 2000 * k
    rolled = np.roll(mat, k, axis=1)
    r["embedding"] = [rolled[i].copy() for i in range(len(r))]
    reps.append(r)
big = pd.concat(reps, ignore_index=True)
big.to_parquet(f"{OUT}/embeddings.parquet", index=False)
print(f"embeddings: {n_emb} -> {len(big)}")

# the probe's query set never reads the other tables, but the harness
# creates views for all of them — symlink the sf0.1 originals
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events"]:
    dst = f"{OUT}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{SRC}/{t}.parquet", dst)
print("done")
