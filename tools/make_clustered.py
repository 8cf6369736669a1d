#!/usr/bin/env python3
"""Generate a CLUSTERED embeddings slice for coverage-adaptive probing
measurements (VERDICT r14 #1 / round 15).

The driver testdata's synthetic embeddings are near-uniform on the
sphere: recall tracks probe COVERAGE almost linearly there
(bench_runs/r14_recall_curve_10x.txt), so a fixed-coverage policy is
already optimal and a mass-threshold policy has nothing to show. Real
corpora concentrate — most queries' neighbors live in a few heavy
cells — and that concavity is exactly what this slice provides:

- `clusters` Gaussian components on the unit sphere (random unit
  means, per-component sigma drawn in [0.05, 0.12] — tight relative
  to the ~sqrt(2) typical inter-point distance on S^63).
- component WEIGHTS follow a Zipf(s=1.2) law: the head components
  hold most of the mass, the tail is thin. A mass-threshold probe
  policy on such a corpus reaches tau coverage-of-mass with far
  fewer than tau-of-k cells; a count-threshold policy cannot.
- schema matches /root/testdata/*/embeddings.parquet exactly
  (vec_id int64, embedding list<float32> L2-normalized, label int32 =
  the component id mod 10 — so the filtered serves work unchanged).

Deterministic (fixed numpy seed). NOT part of the driver's oracle
testdata — a measurement instrument, like the scale_up.py replicas.

Usage: python3 tools/make_clustered.py /tmp/graft_clustered 20000 [clusters=48]
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

def main():
    out = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 48
    dim = 64
    rng = np.random.default_rng(421)
    means = rng.normal(size=(c, dim))
    means /= np.linalg.norm(means, axis=1, keepdims=True)
    sigma = rng.uniform(0.05, 0.12, size=c)
    # Zipf-ish component weights: w_i ~ 1 / rank^1.2
    w = 1.0 / np.power(np.arange(1, c + 1), 1.2)
    w /= w.sum()
    comp = rng.choice(c, size=n, p=w)
    vecs = means[comp] + rng.normal(size=(n, dim)) * sigma[comp, None]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype(np.float32)
    os.makedirs(out, exist_ok=True)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        "label": pa.array((comp % 10).astype(np.int32)),
    })
    pq.write_table(tbl, os.path.join(out, "embeddings.parquet"))
    # mass concentration report: fraction of rows in the heaviest cells
    counts = np.sort(np.bincount(comp, minlength=c))[::-1]
    cum = np.cumsum(counts) / n
    print(f"wrote {n} rows, {c} components -> {out}")
    for frac in (0.5, 0.8, 0.9, 0.95):
        k_needed = int(np.searchsorted(cum, frac) + 1)
        print(f"  {frac:.0%} of mass in top {k_needed} / {c} components "
              f"({k_needed / c:.0%} of cells)")

if __name__ == "__main__":
    main()
