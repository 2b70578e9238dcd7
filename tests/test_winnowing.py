"""Winnowing fingerprints (Schleimer et al. 2003 / MOSS) and the
two-tokenizer token-count operator: golden tests against pure-Python
replicas + the paper's matching guarantee as a property."""
from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from database_convertor_spark.operators.dedup import (
    winnow_fingerprints,
    winnow_pairs,
)
from database_convertor_spark.operators.text_analysis import doc_token_counts


def _py_winnow(text: str, k: int = 10, w: int = 8) -> set[int]:
    """Pure-Python replica of winnow_fingerprints (ASCII fixtures)."""
    norm = re.sub(r"\s+", " ", text.lower()).strip(" ")
    m = len(norm) - k + 1
    hs = [int(hashlib.md5(norm[i:i + k].encode()).hexdigest()[:15], 16)
          for i in range(max(m, 0))]
    if not hs:
        return set()
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[j:j + w]) for j in range(len(hs) - w + 1)}


_DOCS = [
    # normal multi-window doc
    (0, "The quick brown fox jumps over the lazy dog near the river"),
    # exact duplicate of doc 0 modulo case/whitespace (same fp set)
    (1, "  THE  quick BROWN fox jumps over the lazy dog near the river "),
    # 1..w-1 k-grams: 15 normalized chars -> 6 ten-grams (< w=8)
    (2, "short doc here!"),
    # shorter than one k-gram -> no fingerprints
    (3, "tiny text"),
    # empty / whitespace-only -> no fingerprints
    (4, ""),
    (5, "    "),
    # unrelated content
    (6, "completely different words about databases and spark plans"),
]


def _docs_df(spark):
    return spark.createDataFrame(_DOCS, "doc_id long, text string")


def test_winnow_fingerprints_match_python_replica(spark):
    got = {
        (r.doc_id, r.fp)
        for r in winnow_fingerprints(_docs_df(spark)).collect()
    }
    want = {(i, fp) for i, t in _DOCS for fp in _py_winnow(t)}
    assert got == want
    # the edge conventions explicitly
    by_doc = {}
    for d, fp in got:
        by_doc.setdefault(d, set()).add(fp)
    assert by_doc[0] == by_doc[1]            # normalization-identical
    assert len(by_doc[2]) == 1               # short doc: global min only
    assert 3 not in by_doc and 4 not in by_doc and 5 not in by_doc


def test_winnow_shared_substring_guarantee(spark):
    """Any shared substring of length >= w + k - 1 (= 17 chars at
    defaults) yields at least one shared fingerprint — the paper's
    Theorem 1, exercised on a planted copy-paste."""
    shared = "this exact passage was copied verbatim into both docs"
    df = spark.createDataFrame(
        [(10, "intro words then " + shared + " and a unique tail here"),
         (11, shared + " with a completely different continuation text")],
        "doc_id long, text string")
    fps = winnow_fingerprints(df).collect()
    a = {r.fp for r in fps if r.doc_id == 10}
    b = {r.fp for r in fps if r.doc_id == 11}
    assert a & b, "shared 53-char substring must share a fingerprint"


def test_winnow_pairs_detects_planted_near_dups_only(spark):
    base = ("machine learning corpora need careful deduplication "
            "before any serious training run can begin at scale")
    df = spark.createDataFrame(
        [(0, base),
         (1, base + " with a tiny appended suffix"),   # near-dup of 0
         (2, "an entirely unrelated document about cooking pasta "
             "with garlic and fresh tomatoes tonight"),
         (3, "yet another independent text concerning medieval "
             "castle architecture and defensive walls")],
        "doc_id long, text string")
    rows = winnow_pairs(df, threshold=0.5).collect()
    assert {(r.doc_a, r.doc_b) for r in rows} == {(0, 1)}
    (row,) = [r for r in rows if (r.doc_a, r.doc_b) == (0, 1)]
    assert row.overlap >= 0.9                # containment of the copy
    assert row.n_shared >= 2


def test_winnow_pairs_max_df_drops_boilerplate(spark):
    """A fingerprint present in > max_df docs is boilerplate: with the
    cap at 2, a license line shared by 3 docs cannot pair them."""
    boiler = "creative commons attribution license applies to this work"
    df = spark.createDataFrame(
        [(i, f"unique document body number {i} talks about topic "
             f"{i * 17} at length. " + boiler) for i in range(3)],
        "doc_id long, text string")
    loose = winnow_pairs(df, threshold=0.3, max_df=50).collect()
    capped = winnow_pairs(df, threshold=0.3, max_df=2).collect()
    assert loose, "sanity: boilerplate pairs everything uncapped"
    assert not capped, "df cap must remove the boilerplate pairs"


def _py_bpe(text: str) -> int:
    return len(re.findall(r"[A-Za-z]{1,4}|\d|[^\sA-Za-z\d]", text))


def test_doc_token_counts_match_python_replica(spark):
    docs = [
        (0, "en", "Hello world, this is tokenization!"),
        (1, "en", "supercalifragilistic expialidocious 12345"),
        (2, "de", ""),
        (3, "fr", "   "),
        (4, "en", "a b c d e f"),
        (5, "en", "... --- ,,,"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    got = {r.doc_id: r for r in doc_token_counts(df).collect()}
    for doc_id, _lang, text in docs:
        r = got[doc_id]
        ws, bpe = len(text.split()), _py_bpe(text)
        assert r.n_ws_tokens == ws, (doc_id, r.n_ws_tokens, ws)
        assert r.n_bpe_ish_tokens == bpe, (doc_id, r.n_bpe_ish_tokens, bpe)
        if ws == 0:
            assert r.bpe_fertility is None
        else:
            assert abs(r.bpe_fertility - round(bpe / ws, 4)) < 1e-9


def test_winnow_fingerprint_plan_binds_arrays_below_generate(spark):
    """Generate-parent discipline: the k-gram hash array must be bound
    in a projection below the explode, never co-projected with it —
    the plan's Generate input must be a bare attribute."""
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    plan = winnow_fingerprints(df)._jdf.queryExecution().optimizedPlan().toString()
    gen_lines = [ln for ln in plan.splitlines() if "Generate explode" in ln]
    assert gen_lines, plan
    for ln in gen_lines:
        assert "md5" not in ln and "transform" not in ln, ln
