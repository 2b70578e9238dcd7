"""Text-analysis operators over the documents table: quality scoring,
language ID, token statistics, fingerprinting. Thin compositions of
the pure-expression building blocks in functions.text — the whole
layer stays inside WholeStageCodegen."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import (
    detect_language,
    fingerprint,
    mean_token_length,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
)


def doc_quality(documents: DataFrame) -> DataFrame:
    """Per-document quality signals + composite 0-100 score."""
    t = F.col("text")
    return documents.select(
        "doc_id",
        token_count(t).cast("int").alias("n_tokens"),
        F.round(mean_token_length(t), 4).alias("mean_token_len"),
        F.round(punct_ratio(t), 4).alias("punct_ratio"),
        F.round(stopword_ratio(t), 4).alias("stopword_ratio"),
        quality_score(t).alias("quality_score"),
    )


def lang_detect(documents: DataFrame) -> DataFrame:
    """Marker-word language ID vs the labeled lang column."""
    guess = detect_language(F.col("text"))
    return documents.select(
        "doc_id", F.col("lang").alias("labeled_lang"),
        guess.alias("detected_lang"),
        (guess == F.col("lang")).alias("agrees"),
    )


def token_stats_by_lang(documents: DataFrame) -> DataFrame:
    """Corpus token statistics per language bucket."""
    t = F.col("text")
    return (documents
            .select("lang", token_count(t).alias("_n"))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("_n").cast("long").alias("total_tokens"),
                 F.round(F.avg("_n"), 4).alias("avg_tokens")))


def top_terms_per_lang(documents: DataFrame, k: int = 5) -> DataFrame:
    """Term-frequency top-k per language: explode tokens -> two-key
    aggregate -> top-k window over the (small) aggregated table. The
    explode is the only wide fan-out and feeds straight into a
    map-side-combining aggregate."""
    from ..functions.text import tokens

    terms = documents.select(
        "lang", F.explode(tokens(F.lower(F.col("text")))).alias("term"))
    counts = terms.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), "term")
    return (counts.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k))


def fingerprint_docs(documents: DataFrame) -> DataFrame:
    """Content fingerprint + duplicate flag (count over the fingerprint
    window; the window shuffles on the fingerprint — same key as an
    exact-dedup groupBy)."""
    w = Window.partitionBy("fp")
    return (documents
            .select("doc_id", fingerprint(F.col("text")).alias("fp"))
            .withColumn("n_same_content", F.count(F.lit(1)).over(w))
            .withColumn("is_duplicate", F.col("n_same_content") > 1))
