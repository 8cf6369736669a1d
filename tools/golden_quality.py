#!/usr/bin/env python3
"""Independent reference trainer/scorer for the `quality_train` /
`quality_score` golden oracles (graft.text.Quality).

From-scratch reimplementation — own tokenizer, md5 hashing,
perceptron — sharing only the documented conventions:
  - tokens = lower -> split [^a-z0-9]+ -> drop empties;
  - features = word unigrams + bigrams (space-joined), each hashed to
    int(md5(g)[:15 hex], 16) % 4096 (the shared hash60 % B);
  - training sample = docs with hash60(str(doc_id)) % (n//512 + 1)
    == 0, processed in doc_id order;
  - perceptron, 3 epochs, integer updates (w += y*tf, bias += y),
    margin tie predicts NEGATIVE (score 0 -> -1), y = +1 iff
    lang == 'en';
  - quality_train rows: rank 0 = (bucket -1, bias, mistakes), then
    top-32 weights by (|w| desc, bucket asc), mistakes = -1;
  - quality_score rows: per-doc (doc_id, n_feats, score, keep) for
    doc_id < 8 plus the doc_id=-1 corpus total (sum, sum,
    majority-keep).

Usage: python3 tools/golden_quality.py [train|score] [sf_dir]
Prints SQL VALUES rows for SparkEntry.oracleSql.
"""
import collections
import hashlib
import re
import sys

import duckdb

B = 4096
TRAIN_CAP = 512
EPOCHS = 3


def hash60(s):
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def feats(text):
    toks = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
    grams = toks + [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]
    tf = collections.Counter(hash60(g) % B for g in grams)
    return tf


def load(sf_dir):
    rows = duckdb.sql(
        f"SELECT doc_id, lang, text FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    return [(d, 1 if lang == "en" else -1, feats(t)) for d, lang, t in rows]


def fit(docs):
    n = len(docs)
    m = n // TRAIN_CAP + 1
    sample = [(d, y, tf) for d, y, tf in docs if hash60(str(d)) % m == 0]
    w = collections.defaultdict(int)
    bias = 0
    mistakes = 0
    for _ in range(EPOCHS):
        for _, y, tf in sample:
            s = bias + sum(w[b] * c for b, c in tf.items())
            pred = 1 if s > 0 else -1
            if pred != y:
                mistakes += 1
                for b, c in tf.items():
                    w[b] += y * c
                bias += y
    return {b: v for b, v in w.items() if v != 0}, bias, mistakes


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "train"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    docs = load(sf_dir)
    w, bias, mistakes = fit(docs)
    if mode == "train":
        print(f"(0, -1, {bias}, {mistakes}),")
        top = sorted(w.items(), key=lambda kv: (-abs(kv[1]), kv[0]))[:32]
        for i, (b, v) in enumerate(top):
            print(f"({i + 1}, {b}, {v}, -1),")
    elif mode == "pr":
        # quality_pr_curve rows: (thresh, tp, fp, fn, precision_e6,
        # recall_e6) vs the TRUE lang=='en' label at each threshold;
        # truncating integer division, zero-denominator guarded to 1
        scores = [(y, bias + sum(w.get(b, 0) * c for b, c in tf.items()))
                  for _, y, tf in docs if tf]
        for t in (-40, -20, 0, 20, 40):
            tp = sum(1 for y, s in scores if s > t and y == 1)
            fp = sum(1 for y, s in scores if s > t and y == -1)
            fn = sum(1 for y, s in scores if s <= t and y == 1)
            prec = tp * 1000000 // max(tp + fp, 1)
            rec = tp * 1000000 // max(tp + fn, 1)
            print(f"({t}, {tp}, {fp}, {fn}, {prec}, {rec}),")
    else:
        tot_f = tot_s = n_keep = n_docs = 0
        for d, _, tf in docs:
            if not tf:
                continue
            nf = sum(tf.values())
            s = bias + sum(w.get(b, 0) * c for b, c in tf.items())
            keep = s > 0
            n_docs += 1
            tot_f += nf
            tot_s += s
            n_keep += 1 if keep else 0
            if d < 8:
                print(f"({d}, {nf}, {s}, {str(keep).lower()}),")
        print(f"(-1, {tot_f}, {tot_s}, {str(n_keep * 2 > n_docs).lower()}),")


if __name__ == "__main__":
    main()
