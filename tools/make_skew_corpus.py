#!/usr/bin/env python
"""Adversarially-skewed fixture for the pair-family gates (round-10
verdict #6): the scale corpora (`make_scale_corpus.py`) are
generator-bounded — every blocking/banding key stays comfortably
spread — so the gates' hot-key regimes have never been exercised WITH
DATA. This builds a deliberately pathological corpus:

- ``documents.parquet`` (default 500k rows = the sf10 convention):
  * 30% of docs are ONE exact duplicate cluster (the real-world
    boilerplate page): identical text, so they agree in EVERY MinHash
    band and every SimHash block subset — the worst hot bucket either
    family can see (C(150k,2) candidates per band/subset).
  * 0.2% are planted near-dup PAIRS (shared base + divergent tail per
    pair) — the recall canary: a remedied run must still find them.
  * the rest are unique Zipf-vocabulary docs.
- ``names_left.parquet`` / ``names_right.parquet`` (150k / 50k rows):
  30% of BOTH sides carry the mega-token "holdings" (df 30% vs the
  fuzzy blocking cap's 5%) — the quadratic back door the r8
  df-cap closed; planted argmax pairs ride distinctive tokens.
- ``embeddings.parquet`` (200k rows): one label holds 30% of vectors
  (semantic_dedup's within-label hot block).

Usage: python tools/make_skew_corpus.py [--n-docs 500000]
         [--dst .scratch/skew10]
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260816


def _vocab(rng, size: int, lo: int = 4, hi: int = 11) -> np.ndarray:
    lens = rng.integers(lo, hi, size=size)
    letters = rng.integers(0, 26, size=int(lens.sum()))
    out, off = [], 0
    for ln in lens:
        out.append("".join(chr(97 + c) for c in letters[off:off + ln]))
        off += ln
    return np.array(out)


def build_documents(dst: str, n_docs: int, rng) -> None:
    vocab = _vocab(rng, 80_000)
    n_hot = int(n_docs * 0.30)
    n_planted = max(2, int(n_docs * 0.002)) // 2 * 2   # even: pairs
    n_unique = n_docs - n_hot - n_planted

    hot_text = " ".join(vocab[rng.integers(0, len(vocab), size=60)])
    texts = [hot_text] * n_hot

    # planted near-dup pairs: 52 shared tokens + 8 divergent per member
    for _ in range(n_planted // 2):
        base = vocab[rng.integers(0, len(vocab), size=52)]
        for _m in range(2):
            tail = vocab[rng.integers(0, len(vocab), size=8)]
            texts.append(" ".join(np.concatenate([base, tail])))

    ranks = rng.zipf(1.3, size=n_unique * 60) % len(vocab)
    for i in range(n_unique):
        texts.append(" ".join(vocab[ranks[i * 60:(i + 1) * 60]]))

    n = len(texts)
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(
            ["hot"] * n_hot + ["planted"] * n_planted + ["uniq"] * n_unique),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())})
    pq.write_table(tbl, os.path.join(dst, "documents.parquet"),
                   row_group_size=16384)


def build_names(dst: str, n_left: int, n_right: int, rng) -> None:
    vocab = _vocab(rng, 30_000, 5, 10)
    suffixes = np.array(["limited", "ltd", "plc", "llp", "group"])

    def names(n, mega_frac, planted_from=None):
        out = []
        for i in range(n):
            toks = list(vocab[rng.integers(0, len(vocab), size=2)])
            if i < int(n * mega_frac):
                toks.append("holdings")        # the mega token
            toks.append(str(suffixes[rng.integers(0, len(suffixes))]))
            out.append(" ".join(toks))
        if planted_from is not None:
            # 500 planted argmax pairs: right name = left name verbatim
            for j, nm in enumerate(planted_from[:500]):
                out[-(j + 1)] = nm
        return out

    left = names(n_left, 0.30)
    right = names(n_right, 0.30, planted_from=left)
    pq.write_table(
        pa.table({"lid": pa.array(range(n_left), pa.int64()),
                  "lname": pa.array(left)}),
        os.path.join(dst, "names_left.parquet"))
    pq.write_table(
        pa.table({"rid": pa.array(range(n_right), pa.int64()),
                  "rname": pa.array(right)}),
        os.path.join(dst, "names_right.parquet"))


def build_embeddings(dst: str, n_vecs: int, rng) -> None:
    dim = 32
    vecs = rng.standard_normal((n_vecs, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    # 500 planted near-dup PAIRS inside the hot label (cosine ~0.9996,
    # comfortably above any sane threshold so a miss is a blocking
    # split, not a threshold call) — the relabel remedy's recall canary
    n_pairs = 500
    for i in range(n_pairs):
        a, b = 2 * i, 2 * i + 1
        vecs[b] = vecs[a] + 0.005 * rng.standard_normal(dim).astype(np.float32)
        vecs[b] /= np.linalg.norm(vecs[b])
    labels = rng.integers(1, 10, size=n_vecs)
    labels[: int(n_vecs * 0.30)] = 0          # the hot label
    tbl = pa.table({
        "vec_id": pa.array(range(n_vecs), pa.int64()),
        "embedding": pa.array(vecs.tolist(),
                              pa.list_(pa.float32())),
        "label": pa.array(labels.astype("int32"))})
    pq.write_table(tbl, os.path.join(dst, "embeddings.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=500_000)
    ap.add_argument("--dst", default=".scratch/skew10")
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    rng = np.random.default_rng(SEED)
    build_documents(args.dst, args.n_docs, rng)
    build_names(args.dst, args.n_docs * 3 // 10, args.n_docs // 10, rng)
    build_embeddings(args.dst, args.n_docs * 2 // 5, rng)
    print("wrote", args.dst)


if __name__ == "__main__":
    main()
