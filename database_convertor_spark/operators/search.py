"""Full-text relevance search — the Spark-native analog of the
reference's Elasticsearch search surface. The reference ships every
search through an external ES cluster: bool/match query construction
(api_clients.py:678-728 `/root/reference/DatabaseConverter/api_clients.py:678`)
and relevance-ranked hit pages rendered to the user. Here the same
capability runs IN the engine over the landed corpus: BM25
(Robertson/Sparck Jones — the exact scoring function Lucene/ES uses by
default) ranks documents against a query string, and TF-IDF keyword
extraction surfaces each document's most distinctive terms (the
"significant terms" ES aggregation, per document).

Scale shape (the whole point of doing it in-engine at 100 TB):

- ``bm25_search`` never shuffles corpus-sized data AT ALL. Per-row
  term frequencies for the (few) query terms and the document length
  come from ONE array traversal inside WholeStageCodegen
  (``F.aggregate`` with a struct accumulator — one tokenize, one
  pass, no explode). Corpus statistics (N, avgdl, per-term document
  frequencies) are ONE partial-aggregable all-reduce producing a
  single broadcast row; scoring is a per-row expression over the
  persisted narrow stats frame, and the top-k is a
  TakeOrderedAndProject (per-partition heads, never a global sort).

- ``tfidf_keywords`` is the classic inverted-index pipeline: one
  explode feeding a map-side-combining (doc, term) count, the two
  marginals (doc length, term document-frequency) re-aggregated FROM
  that persisted frame (never a second corpus scan), N as a broadcast
  row, and the per-document top-k as a window over the aggregated
  frame keyed by doc_id.

Determinism contract (both operators are value-oracled in DuckDB):
scores are rounded to 4dp IN the ordering key, ties break on the
lexically smallest term / smallest doc_id, and every sum folds in a
fixed term order — so a distributed run and a serial oracle agree
cell-for-cell.
"""

from __future__ import annotations

import re
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def query_terms(query: str) -> list[str]:
    """Distinct, lowercased, sorted query terms — the deterministic
    term order every BM25 sum folds in."""
    terms = sorted({t for t in re.split(r"\s+", query.lower()) if t})
    if not terms:
        raise ValueError("bm25_search: query has no terms")
    return terms


def bm25_search(documents: DataFrame, query: str,
                k1: float = 1.2, b: float = 0.75,
                top_k: int = 25) -> DataFrame:
    """Rank documents against ``query`` with BM25 (the Lucene/ES
    default scoring), entirely in-engine:

        idf(t)  = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
        score   = sum_t idf(t) * tf_t * (k1+1)
                               / (tf_t + k1 * (1 - b + b * dl/avgdl))

    with N = corpus size, df_t = documents containing t, dl = document
    token length, avgdl = mean dl over the corpus. Only documents
    matching at least one query term are returned, top_k by
    (score desc, doc_id) — the ES "match query" hit page.

    Distributed shape: per-row (dl, tf per query term) in ONE array
    traversal (struct-accumulator ``F.aggregate`` — one tokenize per
    row, no explode, no shuffle); the narrow per-doc stats frame is
    persisted once and feeds both the one-row global aggregate
    (broadcast back) and the scoring pass; the final top-k plans as
    TakeOrderedAndProject. At 100 TB the corpus is scanned exactly
    once and nothing wider than (doc_id, m+1 longs) ever moves.

    Reference analog: ES match-query search pages
    (api_clients.py:678-728); the scoring function is ES's own.
    """
    from pyspark.storagelevel import StorageLevel

    from ..functions.text import tokens
    from ..plans.persist_slots import swap_persisted

    terms = query_terms(query)
    m = len(terms)

    def _acc(dl, tfs):
        return F.struct(dl.alias("dl"),
                        *[c.alias(f"tf{i}") for i, c in enumerate(tfs)])

    zero = _acc(F.lit(0).cast("long"),
                [F.lit(0).cast("long")] * m)
    row = F.aggregate(
        tokens(F.lower(F.col("text"))), zero,
        lambda acc, t: _acc(
            acc["dl"] + 1,
            [acc[f"tf{i}"] + (t == F.lit(term)).cast("long")
             for i, term in enumerate(terms)]))
    per_doc = documents.select(
        "doc_id", F.coalesce(row, zero).alias("_s")).select(
        "doc_id", F.col("_s.dl").alias("_dl"),
        *[F.col(f"_s.tf{i}").alias(f"_tf{i}") for i in range(m)])
    per_doc = swap_persisted(
        "bm25_per_doc", per_doc.persist(StorageLevel.MEMORY_AND_DISK))

    gstats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum("_dl").cast("double").alias("_sumdl"),
        *[F.sum((F.col(f"_tf{i}") > 0).cast("long")).cast("double")
          .alias(f"_df{i}") for i in range(m)])

    avgdl = F.col("_sumdl") / F.col("_n")
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / avgdl)
    parts = []
    for i in range(m):
        idf = F.log(F.lit(1.0) + (F.col("_n") - F.col(f"_df{i}") + 0.5)
                    / (F.col(f"_df{i}") + 0.5))
        tf = F.col(f"_tf{i}").cast("double")
        parts.append(idf * tf * F.lit(k1 + 1.0) / (tf + norm))
    matched = reduce(lambda a, c: a + c,
                     [F.col(f"_tf{i}") for i in range(m)]) > 0
    score = reduce(lambda a, c: a + c, parts)
    return (per_doc.crossJoin(F.broadcast(gstats))
            .filter(matched)
            .select("doc_id", F.col("_dl").alias("n_tokens"),
                    F.round(score, 4).alias("bm25"))
            .orderBy(F.desc("bm25"), "doc_id")
            .limit(top_k))


def bm25_search_snippets(documents: DataFrame, query: str,
                         k1: float = 1.2, b: float = 0.75,
                         top_k: int = 25, window: int = 40) -> DataFrame:
    """The full ES hit page: BM25 top-k PLUS a highlight snippet per
    hit — a FIXED ``2 * window``-character excerpt starting ``window``
    characters before the first occurrence of any query term (the
    same fixed-fragment semantics as ES's highlighter
    ``fragment_size``: the budget is a character count, so a term
    longer than ``window`` is excerpted from its start, not padded —
    size ``window`` to the longest query term when that matters; the
    reference renders exactly these fragments from ES highlight
    fields). The snippet expression evaluates on
    ONLY the top_k rows: the ranked ids broadcast into a hash-join
    probe of the corpus (text fetched for matching rows; the text
    column never shuffles — a production deployment would serve this
    point fetch from a keyed row store).

    First-occurrence position = min over query terms of the term's
    position in the lowercased text (term order breaks nothing: min is
    order-free); the excerpt clamps at the document start. Output:
    (doc_id, n_tokens, bm25, snippet).
    """
    hits = bm25_search(documents, query, k1=k1, b=b, top_k=top_k)
    terms = query_terms(query)
    low = F.lower(F.col("text"))
    positions = F.array_compact(F.array(*[
        F.nullif(F.instr(low, term), F.lit(0)) for term in terms]))
    pos = F.array_min(positions)
    start = F.greatest(F.lit(1), pos - window)
    snippet = F.when(pos.isNull(), F.lit(None).cast("string")) \
        .otherwise(F.col("text").substr(start, F.lit(2 * window)))
    return (F.broadcast(hits)
            .join(documents.select("doc_id", "text"), "doc_id")
            .select("doc_id", "n_tokens", "bm25", snippet.alias("snippet")))


def tfidf_keywords(documents: DataFrame, k: int = 3) -> DataFrame:
    """Per-document top-k distinctive terms by TF-IDF — the ES
    "significant terms" idea applied per document (keyword extraction
    for tagging / faceting a landed corpus):

        tfidf(d, t) = (tf_{d,t} / dl_d) * ln(N / df_t)

    Ubiquitous terms (df = N) score exactly 0 and fall to the bottom
    on the tie-break — no stopword list needed.

    Distributed shape: one explode into a map-side-combining
    (doc_id, term) count (the inverted-index build — the ONLY
    corpus-sized shuffle); both marginals (dl by re-aggregating on
    doc_id, df by re-aggregating on term) read the PERSISTED counts
    frame, never the corpus again; N rides as a one-row broadcast; the
    top-k is a row_number window over the aggregated frame. Output
    (doc_id, term, rank, tfidf), ties broken by term asc; empty
    documents yield no rows.
    """
    from pyspark.storagelevel import StorageLevel

    from ..functions.text import tokens
    from ..plans.persist_slots import swap_persisted

    tf = (documents.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("_tf")))
    tf = swap_persisted("tfidf_tf", tf.persist(StorageLevel.MEMORY_AND_DISK))
    dl = tf.groupBy("doc_id").agg(F.sum("_tf").alias("_dl"))
    df_ = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("_df"))
    n = documents.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    scored = (tf.join(dl, "doc_id").join(df_, "term")
              .crossJoin(F.broadcast(n))
              .select("doc_id", "term", F.round(
                  (F.col("_tf").cast("double") / F.col("_dl"))
                  * F.log(F.col("_n") / F.col("_df")), 4).alias("tfidf")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select("doc_id", "term", "rank", "tfidf"))
