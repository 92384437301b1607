"""Natural-geometry BIG embedding corpus for the production-default
two-level activation point (SCALE_r14 addendum): N unit-norm 64-dim
vectors from 10 anisotropic Gaussian clusters — the make_sf1.py
embedding generator at a size where ivf_multiprobe_neardup's
UNFORCED production thresholds fire (needs_cell_split at
cap * per_cell = 64k vectors; real cell splits need skewed cells
past 4 * per_cell = 500 occupancy, which the natural clusters
provide at 256k vectors over the 512-cell cap). Rotated replicas are
the WRONG corpus here: their rotations repeat past x32
(make_scaled.py's guard) and identical copies would make pair volume
an artifact.

Usage: python .scale/make_bigvec.py [N] [OUT_DIR]   (default 256000,
/root/repo/.scale/bigvec) — OUT_DIR for e.g. the 128k build-slope
sibling. Writes OUT_DIR/embeddings.parquet (embeddings only — the
consumer query touches no other table).
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256_000
DIM = 64
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/bigvec"
os.makedirs(OUT, exist_ok=True)

rng = np.random.default_rng(8)
centers = rng.normal(0, 1, (10, DIM))
centers /= np.linalg.norm(centers, axis=1, keepdims=True)
labels = rng.integers(0, 10, N)
spread = rng.uniform(0.15, 0.45, 10)[labels][:, None]
vecs = centers[labels] + rng.normal(0, 1, (N, DIM)) * spread
vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
pq.write_table(
    pa.table({
        "vec_id": pa.array(np.arange(N), pa.int64()),
        "embedding": pa.array(
            [v for v in vecs.astype(np.float32)], pa.list_(pa.float32())
        ),
        "label": pa.array(labels, pa.int32()),
    }),
    f"{OUT}/embeddings.parquet",
)
print(f"bigvec done -> {OUT} ({N} vectors)")
