"""Deduplication operators for the training-data pipeline layer:
exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine.

Scale design notes:
- exact dedup is a hash groupBy on a fingerprint — one shuffle, no
  pairwise work, the 100 TB default;
- pairwise near-dup detection NEVER materializes the O(n^2) cross
  product: n-gram Jaccard uses (lang, length-band) blocking; MinHash
  uses LSH banding (pairs only within a band bucket); SimHash uses
  16-bit chunk banding (Hamming <= 3 pigeonholes into 4 chunks);
  embedding near-dup uses the label partition (IVF-style bucket);
- all signatures are computed with deterministic JVM-side expressions
  (xxhash64 / md5 + higher-order array functions) — no Python in the
  per-document path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import cosine_similarity, token_jaccard
from ..functions.text import fingerprint, shingles, tokens


# ---------------------------------------------------------------- exact dedup
def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact duplicate groups by normalized-text MD5: keep the smallest
    doc_id as canonical, count members. Output one row per distinct
    content."""
    return (documents
            .select(fingerprint(F.col("text")).alias("fp"), "doc_id")
            .groupBy("fp")
            .agg(F.min("doc_id").alias("doc_id"),
                 F.count(F.lit(1)).alias("dup_count")))


def drop_exact_duplicates(documents: DataFrame) -> DataFrame:
    """Dedup the corpus itself: keep one row per content fingerprint
    (min doc_id wins — deterministic, unlike dropDuplicates)."""
    keep = exact_dedup(documents).select("doc_id")
    return documents.join(keep, "doc_id", "left_semi")


# ------------------------------------------------------- n-gram Jaccard pairs
def ngram_jaccard_pairs(documents: DataFrame, threshold: float = 0.5,
                        band_chars: int = 100) -> DataFrame:
    """Near-duplicate pairs by word-set Jaccard within (lang,
    length-band) blocks. The block join replaces the cross product; the
    Jaccard itself is array algebra (array_intersect/array_union)."""
    docs = documents.select(
        "doc_id", "lang",
        F.floor(F.col("n_chars") / band_chars).cast("int").alias("band"),
        F.array_distinct(tokens(F.lower(F.col("text")))).alias("toks"))
    docs = docs.withColumn("n_toks", F.size("toks"))
    # single-file inputs arrive as one partition; the (broadcast) self-
    # join would then run on one core — spread the probe side first
    par = documents.sparkSession.sparkContext.defaultParallelism
    a, b = docs.repartition(par).alias("a"), docs.alias("b")
    pairs = a.join(b, (F.col("a.lang") == F.col("b.lang"))
                   & (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
    # size-ratio prefilter: J(A,B) <= min(|A|,|B|)/max(|A|,|B|), so any
    # pair failing the ratio cannot reach the threshold — prunes before
    # the (expensive) intersect without changing results
    ratio_ok = (F.least("a.n_toks", "b.n_toks").cast("double")
                / F.greatest("a.n_toks", "b.n_toks") >= threshold)
    sim = token_jaccard(F.col("a.toks"), F.col("b.toks"))
    return (pairs.filter(ratio_ok)
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    F.round(sim, 4).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


# -------------------------------------------------------------- MinHash + LSH
def _minhash_signature(shingle_col: Column, num_hashes: int) -> Column:
    """num_hashes-wide MinHash signature: for seed i, min over shingles
    of xxhash64(i || shingle). Deterministic, JVM-side."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(shingle_col,
                        lambda s: F.xxhash64(F.concat(i.cast("string"),
                                                      F.lit("|"), s)))))


def minhash_signatures(documents: DataFrame, num_hashes: int = 32,
                       shingle_n: int = 3) -> DataFrame:
    # signature computation is the expensive projection — spread the
    # (possibly single-file) input before it, not after
    documents = documents.repartition(
        documents.sparkSession.sparkContext.defaultParallelism)
    return documents.select(
        "doc_id",
        shingles(F.col("text"), shingle_n).alias("sh")
    ).select("doc_id", "sh", _minhash_signature(F.col("sh"), num_hashes).alias("sig"))


def minhash_lsh_pairs(documents: DataFrame, threshold: float = 0.5,
                      num_hashes: int = 32, bands: int = 8,
                      shingle_n: int = 3) -> DataFrame:
    """MinHash-LSH near-dup pairs: shingle -> signature -> band buckets
    -> candidate pairs within a bucket -> verify true shingle Jaccard.

    bands=8 x rows=4 over 32 hashes targets ~0.5 Jaccard: P(candidate)
    = 1-(1-s^4)^8. The band join is an equi-join on (band_id, band
    hash) — no cross product at any scale. Verification recomputes
    exact Jaccard on the candidate pairs only."""
    rows_per_band = num_hashes // bands
    # materialize signatures once: the self-join below would otherwise
    # recompute the (expensive) signature projection on both sides
    sigs = minhash_signatures(documents, num_hashes, shingle_n).localCheckpoint()
    banded = sigs.select(
        "doc_id", "sh",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(",", F.transform(
                        F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                        lambda h: h.cast("string")))))
        ).alias("band_id", "band_hash"))
    par = documents.sparkSession.sparkContext.defaultParallelism
    a, b = banded.repartition(par).alias("a"), banded.alias("b")
    cands = (a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
                    & (F.col("a.band_hash") == F.col("b.band_hash"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"),
                     F.col("a.sh").alias("sh_a"), F.col("b.sh").alias("sh_b"))
             .dropDuplicates(["doc_a", "doc_b"]))
    sim = token_jaccard(F.array_distinct(F.col("sh_a")),
                        F.array_distinct(F.col("sh_b")))
    return (cands.select("doc_a", "doc_b", F.round(sim, 4).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


# -------------------------------------------------------------------- SimHash
def simhash64(text: Column) -> Column:
    """64-bit SimHash over word tokens: bit k of the hash is the
    majority vote of bit k across xxhash64(token). Expressed entirely
    with higher-order functions (per-bit signed sums)."""
    toks = F.array_distinct(tokens(F.lower(text)))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    # shift amounts must be literal ints -> unroll the 64 bits in Python;
    # each bit's vote is an aggregate over the token-hash array.
    # (nb: the lambda must be exactly 2-arg — pyspark maps every declared
    # parameter, defaults included, to a lambda variable — so bind k via
    # a factory, not a default argument.)
    def vote_for_bit(k: int) -> Column:
        return F.aggregate(
            hashes, F.lit(0),
            lambda acc, h: acc + F.when(
                F.shiftright(h, k).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1))

    out = F.lit(0).cast("long")
    for k in range(64):
        out = out.bitwiseOR(
            F.when(vote_for_bit(k) > 0, F.shiftleft(F.lit(1).cast("long"), k))
             .otherwise(F.lit(0).cast("long")))
    return out


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance via bit_count(xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(documents: DataFrame, max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs with chunk banding: split the 64-bit hash
    into 4x16-bit chunks; any pair within Hamming distance <= 3 must
    agree on at least one chunk (pigeonhole), so candidates come from
    an equi-join on (chunk_id, chunk_value)."""
    par = documents.sparkSession.sparkContext.defaultParallelism
    sh = (documents.repartition(par)
          .select("doc_id", simhash64(F.col("text")).alias("sh")))
    chunked = sh.select(
        "doc_id", "sh",
        F.posexplode(F.array(*[
            F.shiftright(F.col("sh"), c * 16).bitwiseAND(F.lit(0xFFFF))
            for c in range(4)])).alias("chunk_id", "chunk_val"))
    par = documents.sparkSession.sparkContext.defaultParallelism
    a, b = chunked.repartition(par).alias("a"), chunked.alias("b")
    cands = (a.join(b, (F.col("a.chunk_id") == F.col("b.chunk_id"))
                    & (F.col("a.chunk_val") == F.col("b.chunk_val"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"),
                     F.col("a.sh").alias("sh_a"), F.col("b.sh").alias("sh_b"))
             .dropDuplicates(["doc_a", "doc_b"]))
    return (cands.select("doc_a", "doc_b",
                         hamming64(F.col("sh_a"), F.col("sh_b"))
                         .cast("int").alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))


# ------------------------------------------------------ embedding near-dup
def embedding_neardup_pairs(embeddings: DataFrame,
                            threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicates within IVF-style buckets (the
    ``label`` column is the precomputed coarse quantizer assignment):
    pairs are generated only inside a bucket — the blocked join pattern
    again, this time in vector space."""
    e = embeddings.select("vec_id", "label", "embedding")
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    a, b = e.repartition(par).alias("a"), e.alias("b")
    pairs = a.join(b, (F.col("a.label") == F.col("b.label"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
    sim = cosine_similarity(F.col("a.embedding").cast("array<double>"),
                            F.col("b.embedding").cast("array<double>"))
    return (pairs.select(F.col("a.vec_id").alias("vec_a"),
                         F.col("b.vec_id").alias("vec_b"),
                         F.round(sim, 4).alias("cosine"))
            .filter(F.col("cosine") >= threshold))
