#!/usr/bin/env python
"""BPE-at-realistic-vocabulary probe (round-9: records the r8 rework's
claim in SCALE.md with measured rows). The r8 verdict's only 'weak'
row was the BPE family's plan shape — one sequential Spark job per
merge, chained-REPLACE apply literals. The rework (text_analysis.py:
`bpe_merges` fast exact trainer + rank-order mapInPandas apply) must
train a REAL vocabulary (1k / 32k merges) in bounded wall time and
apply it in one corpus pass. This measures both on a scratch corpus.

Usage: python tools/run_bpe_probe.py .scratch/sf1 [n_merges ...]
       python tools/run_bpe_probe.py --synth --byte [n_merges ...]

``--byte`` trains/applies the GPT-2-style byte-level mode (round-10:
pre-tokenized byte symbols, every character covered) instead of the
char-level ^[a-z]+$ mode — same trainer core, so the probe measures
the byte mode's extra costs (pre-token vocabulary is larger and
case/punct-bearing; symbols per word comparable).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def synth_corpus(path: str, n_docs: int = 500_000,
                 words_per_doc: int = 90,
                 vocab_size: int = 212_000) -> None:
    """Deterministic Zipf corpus for the BPE probe (the scratch
    corpora suffix their tokens out of ^[a-z]+$, collapsing the
    trainable vocabulary to ~31 words — useless for a tokenizer
    probe). Seeded numpy: ``vocab_size`` random 3-12-char [a-z] words,
    Zipf(1.1)-ranked sampling, ``n_docs`` documents of
    ``words_per_doc`` words."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(20260816)
    lens = rng.integers(3, 13, size=vocab_size)
    letters = rng.integers(0, 26, size=int(lens.sum()))
    vocab, off = [], 0
    for ln in lens:
        vocab.append("".join(chr(97 + c) for c in letters[off:off + ln]))
        off += ln
    vocab = np.array(vocab)
    ranks = rng.zipf(1.1, size=n_docs * words_per_doc) % vocab_size
    texts = [" ".join(vocab[ranks[i * words_per_doc:(i + 1) * words_per_doc]])
             for i in range(n_docs)]
    tbl = pa.table({"doc_id": pa.array(range(n_docs), pa.int64()),
                    "lang": pa.array(["en"] * n_docs),
                    "text": pa.array(texts),
                    "n_chars": pa.array([len(t) for t in texts],
                                        pa.int32())})
    pq.write_table(tbl, path, row_group_size=16384)


def main() -> None:
    args = sys.argv[1:]
    byte_level = "--byte" in args
    args = [a for a in args if a != "--byte"]
    sf_dir = args[0] if args else ".scratch/sf1"
    merge_counts = [int(x) for x in args[1:]] or [1000, 32000]
    if sf_dir == "--synth":
        sf_dir = ".scratch/bpe_synth"
        os.makedirs(sf_dir, exist_ok=True)
        dest = os.path.join(sf_dir, "documents.parquet")
        if not os.path.exists(dest):
            synth_corpus(dest)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.driver.memory", "96g")
             .appName("bpe-probe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from database_convertor_spark.operators.text_analysis import (
        _bpe_pretoken_counts, _bpe_word_counts, bpe_merges,
        bpe_token_counts)

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    vocab = (_bpe_pretoken_counts(docs) if byte_level
             else _bpe_word_counts(docs))
    n_words = vocab.count()
    results = {"sf_dir": sf_dir, "n_docs": n_docs,
               "byte_level": byte_level,
               "n_distinct_words": n_words, "train": {}, "apply": {}}
    for nm in merge_counts:
        t0 = time.time()
        merges = bpe_merges(docs, n_merges=nm, byte_level=byte_level)
        got = merges.count()
        results["train"][nm] = {"s": round(time.time() - t0, 1),
                                "merges_emitted": got}
        print(f"[train n_merges={nm}] {results['train'][nm]}", flush=True)
    for nm in merge_counts:
        t0 = time.time()
        n = bpe_token_counts(docs, n_merges=nm,
                             byte_level=byte_level).count()
        results["apply"][nm] = {"s": round(time.time() - t0, 1), "rows": n}
        print(f"[apply n_merges={nm}] {results['apply'][nm]}", flush=True)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
