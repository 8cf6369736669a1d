#!/usr/bin/env python3
"""Independent BPE-merge reference for the `bpe_train` golden oracle.

Implements classic Sennrich-style byte-pair-encoding merge training
over the corpus word-frequency table, with the exact conventions the
Spark operator documents:
  - words = lower → split [^a-z0-9]+ → drop empties (the shared
    tokenizer), no end-of-word marker;
  - pair counts weight every adjacent symbol position (overlapping)
    by word frequency;
  - best pair = max by (count, then lexicographic (left, right)
    ascending) — fully deterministic;
  - merge applies left-to-right greedily (a merged position is not
    reused: "aaa" + (a,a) -> ["aa", "a"]).

Usage: python3 tools/golden_bpe.py [sf_dir] [num_merges]
Prints the merge table as SQL VALUES rows for SparkEntry.oracleSql.
"""
import collections
import re
import sys

import duckdb


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    num_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    rows = duckdb.sql(
        f"SELECT text FROM '{sf_dir}/documents.parquet'").fetchall()
    freq = collections.Counter()
    for (text,) in rows:
        for w in re.split(r"[^a-z0-9]+", text.lower()):
            if w:
                freq[w] += 1
    vocab = {w: list(w) for w in freq}
    out = []
    for rank in range(1, num_merges + 1):
        pairs = collections.Counter()
        for w, c in freq.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = a + b
        for w in vocab:
            syms = vocab[w]
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            vocab[w] = res
        out.append((rank, a, b, merged, cnt))
    for rank, a, b, merged, cnt in out:
        print(f"({rank}, '{a}', '{b}', '{merged}', {cnt}),")


if __name__ == "__main__":
    main()
