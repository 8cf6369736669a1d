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

Apply mode (`bpe_apply` oracle): python3 tools/golden_bpe.py apply
[sf_dir] [num_merges] — trains the same merges, then ENCODES every
document with them and prints per-doc VALUES rows (pinned doc ids +
the doc_id=-1 corpus-total row): doc_id, n_words, n_chars,
n_bpe_tokens, cpt_e6 (chars-per-token * 1e6, floored), head_toks
(the first three words' token segmentation, space-joined).
"""
import collections
import re
import sys

import duckdb

PINNED = [7, 58, 123, 250, 487, 490]


def train(sf_dir, num_merges):
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
    return out, vocab


def train_batched(sf_dir, num_merges, batch):
    """Batched merge selection (`bpe_train_batched` oracle): per round,
    rank pairs by (-count, a, b) and greedily keep up to `batch`
    mutually non-interacting pairs (no shared symbol, no pair touching
    another's merged token), then apply them in rank order. Where picks
    don't interact the old counts are exact, so each batch equals that
    many sequential rounds."""
    rows = duckdb.sql(
        f"SELECT text FROM '{sf_dir}/documents.parquet'").fetchall()
    freq = collections.Counter()
    for (text,) in rows:
        for w in re.split(r"[^a-z0-9]+", text.lower()):
            if w:
                freq[w] += 1
    vocab = {w: list(w) for w in freq}
    out = []
    rank = 1
    while rank <= num_merges:
        pairs = collections.Counter()
        for w, c in freq.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        ranked = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        ranked = ranked[:max(1, 8 * batch)]
        budget = min(batch, num_merges - rank + 1)
        touched, picked = set(), []
        for (a, b), n in ranked:
            if len(picked) >= budget:
                break
            if {a, b, a + b} & touched:
                continue
            picked.append((a, b, n))
            touched |= {a, b, a + b}
        for a, b, n in picked:
            out.append((rank, a, b, a + b, n))
            rank += 1
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
    return out


def apply_mode(sf_dir, num_merges):
    _, vocab = train(sf_dir, num_merges)
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
        " ORDER BY doc_id").fetchall()
    tw = tc = tt = 0
    out = []
    for doc_id, text in rows:
        words = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
        if not words:
            continue
        n_chars = sum(len(w) for w in words)
        n_toks = sum(len(vocab[w]) for w in words)
        tw += len(words)
        tc += n_chars
        tt += n_toks
        if doc_id in PINNED:
            head = " ".join(t for w in words[:3] for t in vocab[w])
            out.append((doc_id, len(words), n_chars, n_toks,
                        n_chars * 1000000 // n_toks, head))
    out.append((-1, tw, tc, tt, tc * 1000000 // tt, ""))
    for r in out:
        print(f"({r[0]}, {r[1]}, {r[2]}, {r[3]}, {r[4]}, '{r[5]}'),")


def fertility_mode(sf_dir, num_merges):
    """tok_fertility oracle: per-language BPE fertility (tokens per
    whitespace word) and chars-per-token, truncating integer e6."""
    _, vocab = train(sf_dir, num_merges)
    rows = duckdb.sql(
        f"SELECT lang, text FROM '{sf_dir}/documents.parquet'").fetchall()
    agg = {}
    for lang, text in rows:
        words = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
        if not words:
            continue
        w, c, t = agg.get(lang, (0, 0, 0))
        agg[lang] = (w + len(words),
                     c + sum(len(x) for x in words),
                     t + sum(len(vocab[x]) for x in words))
    for lang in sorted(agg):
        w, c, t = agg[lang]
        print(f"('{lang}', {w}, {c}, {t}, {t * 1000000 // w}, {c * 1000000 // t}),")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "batched":
        sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
        num_merges = int(sys.argv[3]) if len(sys.argv) > 3 else 64
        batch = int(sys.argv[4]) if len(sys.argv) > 4 else 8
        for rank, a, b, merged, cnt in train_batched(sf_dir, num_merges, batch):
            print(f"({rank}, '{a}', '{b}', '{merged}', {cnt}),")
        return
    if len(sys.argv) > 1 and sys.argv[1] in ("apply", "fertility"):
        sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
        num_merges = int(sys.argv[3]) if len(sys.argv) > 3 else 20
        if sys.argv[1] == "apply":
            apply_mode(sf_dir, num_merges)
        else:
            fertility_mode(sf_dir, num_merges)
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    num_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    out, _ = train(sf_dir, num_merges)
    for rank, a, b, merged, cnt in out:
        print(f"({rank}, '{a}', '{b}', '{merged}', {cnt}),")


if __name__ == "__main__":
    main()
