#!/usr/bin/env python3
"""Independent reimplementation of graft.embed.TextEmbed for the
embed_text_golden oracle: computes pinned e6-stabilized embedding
components for a few sf0.01 documents WITHOUT touching the Scala code
path, so embedder drift breaks a hash compare instead of a property
spec. Mirrors the documented algorithm (Embedder.scala): lowercase
A-Z, tokens = [a-z0-9]+ runs, 31-polynomial hash -> splitmix64,
+/-1 into hash mod dim, L2-normalize in float64, cast components to
float32, e6-stabilize.

Usage: python3 tools/golden_embed.py [sf_dir] [doc_id ...]
"""
import sys

import numpy as np
import pyarrow.parquet as pq

MASK = (1 << 64) - 1
DIM = 64


def mix64(z):
    z = (z + 0x9E3779B97F4A7C15) & MASK
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK
    return (z ^ (z >> 31)) & MASK


def embed(text, dim=DIM):
    vec = np.zeros(dim, dtype=np.float64)
    h = 0
    in_tok = False
    for c0 in text + " ":
        c = chr(ord(c0) + 32) if "A" <= c0 <= "Z" else c0
        alnum = "a" <= c <= "z" or "0" <= c <= "9"
        if alnum:
            h = (h * 31 + ord(c)) & MASK
            in_tok = True
        elif in_tok:
            hh = mix64(h)
            signed = hh - (1 << 64) if hh >= (1 << 63) else hh
            b = signed % dim  # Python % == Java floorMod on signed
            vec[b] += 1.0 if ((hh >> 7) & 1) == 0 else -1.0
            h = 0
            in_tok = False
    norm = float(np.sqrt(np.dot(vec, vec)))
    inv = 0.0 if norm == 0.0 else 1.0 / norm
    return (vec * inv).astype(np.float32)


def e6(x):
    import math

    return int(math.floor(float(x) * 1e6 + 0.5))


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    ids = [int(a) for a in sys.argv[2:]] or [0, 7, 123]
    tbl = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    docs = {r["doc_id"]: r["text"] for r in tbl.to_pylist() if r["doc_id"] in ids}
    for doc_id in ids:
        v = embed(docs[doc_id])
        for idx in range(DIM):
            print(f"  ({doc_id}, {idx + 1}, {e6(v[idx])}),")


if __name__ == "__main__":
    main()
