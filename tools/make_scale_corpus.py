#!/usr/bin/env python
"""Synthesize a larger-scale test corpus from the driver's read-only
sf0.1 parquet — the empirical leg of the 100x-scale story: every
blocking/banding/gate regime argued from plan shape (fuzzy
exact-rescue pair counts, LSH band mass, Misra-Gries candidate growth,
connected-components rounds) only engages with DATA, and the driver's
testdata stops at sf0.1 (~600k lineitems). This writes an
sf0.1 x MULT corpus into a scratch dir (never touching /root/testdata)
so bench.py and tools/plan_report.py can run at ~sf1+.

Construction (union of MULT copies, copy 0 verbatim):

- fixed-cardinality dims (region, nation) copy once — TPC-H dims do
  not grow with scale factor;
- every key column (PK and FK alike) is offset by copy * 10_000_000,
  so each copy is internally referentially consistent and keys stay
  globally unique;
- entity names get a per-copy suffix so name-blocked operators (ER,
  q-gram blocking) see new entities, not a 10-way pileup in every
  block;
- event timestamps shift by copy seconds (no cross-copy exact-ts
  ties); user_ids offset, so sessionization sees MULT x users with
  same-shaped sessions — how user-keyed state actually scales;
- documents: each copy's text is token-suffixed (token-set Jaccard ~0
  against every other copy) EXCEPT a deterministic ~1/10 slice per
  copy kept as a near-duplicate (original text + one extra token) —
  a corpus-realistic ~10% near-dup rate with cluster size ~2, so the
  pairwise dedup family does real work without degenerating into
  all-copies-identical;
- embeddings: vectors rotate by copy positions (norm-preserving,
  decorrelated across copies — no degenerate ANN ties); vec_ids
  offset.

Usage: python tools/make_scale_corpus.py [--mult 10]
         [--src /root/testdata/sf0.1] [--dst .scratch/sf1]
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFF = 10_000_000

# set by main() before the copy loop; the documents near-dup decade
# gate needs the total multiplier
_copy_mult = 10

KEY_OFFSETS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
NAME_SUFFIX = {
    "customer": "c_name",
    "supplier": "s_name",
    "part": "p_name",
}


def _copy_table(name: str, tbl: pa.Table, i: int) -> pa.Table:
    if i == 0:
        return tbl
    cols = {c: tbl.column(c) for c in tbl.column_names}
    for k in KEY_OFFSETS.get(name, []):
        cols[k] = pc.add(cols[k], i * OFF)
    if name in NAME_SUFFIX:
        c = NAME_SUFFIX[name]
        cols[c] = pc.binary_join_element_wise(
            cols[c], pa.scalar(f" c{i}"), "")
    if name == "events":
        ts = cols["ts"]
        cols["ts"] = pc.add(ts, pa.scalar(i * 1_000_000, type=pa.duration("us"))) \
            if pa.types.is_timestamp(ts.type) else ts
    if name == "documents":
        texts = cols["text"].to_pylist()
        ids = tbl.column("doc_id").to_pylist()
        suf = f"q{i}"
        # bound near-dup CLUSTER SIZE at ~10 regardless of mult: with
        # the bare `did % 10 == i % 10` rule, mult=1000 put 100
        # near-identical copies of each slice doc in the corpus —
        # quadratic TRUE pair mass (C(100,2) x 500 base docs) that
        # measures the fixture, not the engine (it filled 77 GB of
        # simhash shuffle at the r8 sf100 probe). The decade gate
        # keeps one 10-copy decade per base doc; identical behavior
        # for mult <= 100 (gate factor 1), so sf1/sf10 numbers stay
        # comparable across rounds.
        decades = max(1, _copy_mult // 100)
        out = []
        for did, t in zip(ids, texts):
            if t is None:
                out.append(t)
            elif (did % 10 == i % 10
                  and (i // 10) % decades == did % decades):
                # the near-dup slice: original text + one extra token
                out.append(t + f" extracopy{i}")
            else:
                out.append(" ".join(w + suf for w in t.split()))
        cols["text"] = pa.array(out, type=pa.string())
        cols["n_chars"] = pa.array(
            [len(t) if t is not None else None for t in out],
            type=tbl.schema.field("n_chars").type)
    if name == "embeddings":
        vecs = cols["embedding"].to_pylist()
        rot = i % 64
        cols["embedding"] = pa.array(
            [None if v is None else v[rot:] + v[:rot] for v in vecs],
            type=tbl.schema.field("embedding").type)
    return pa.table(cols, schema=tbl.schema)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=".scratch/sf1")
    ap.add_argument("--tables", default=None,
                    help="comma-separated subset (default: all) — a "
                         "third-decade spot-probe only needs its own "
                         "tables, not 21 GB of lineitem")
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    global _copy_mult
    _copy_mult = args.mult
    names = ["region", "nation", "customer", "supplier", "part",
             "orders", "lineitem", "events", "documents",
             "embeddings"]
    if args.tables:
        names = [n for n in names if n in args.tables.split(",")]
    for name in names:
        src = pq.read_table(os.path.join(args.src, f"{name}.parquet"))
        if name in ("region", "nation"):
            out = src
        else:
            out = pa.concat_tables(
                [_copy_table(name, src, i) for i in range(args.mult)])
        # small row groups so Spark's maxPartitionBytes can actually
        # split the file — a real corpus at this scale arrives as many
        # files/row-groups; a single-group file would serialize every
        # scan-side explode onto one core and measure the fixture, not
        # the engine
        pq.write_table(out, os.path.join(args.dst, f"{name}.parquet"),
                       row_group_size=16384)
        print(f"{name}: {src.num_rows} -> {out.num_rows}", flush=True)


if __name__ == "__main__":
    main()
