"""Distributed sketches with ENGINE-PORTABLE determinism.

Spark ships HyperLogLog++ (`approx_count_distinct`) and a private
Bloom implementation, but neither is replayable outside the JVM, so a
result built on them can only ever be range-checked. These twins hash
through ``md5_long`` (the engine's 60-bit cross-engine hash,
functions/text.py — the same base the MinHash/SimHash families ride),
which makes every register value, every bit position, and therefore
the final estimate REPRODUCIBLE bit-for-bit in the DuckDB oracle:
sketches under the full value-hash gate, not rows-only.

- ``hll_distinct`` — classic HyperLogLog (Flajolet et al. 2007,
  public): m registers from the low bits of the hash, rho from the
  remaining 54-bit window via binary-string length (no float log2 —
  ``bin()`` exists in both engines), harmonic mean over DYADIC
  register weights (2^-M_j sums are exact in double regardless of
  order — the one float-summation-order hazard a distributed sketch
  has, eliminated by construction), small-range linear counting
  below 2.5m.
- ``bloom_contamination`` — Bloom-filter decontamination: the
  benchmark's shingles set k md5-salted bit positions; a document is
  flagged when ANY of its shingles finds all k bits set. The filter
  is position-rows, not a bitmap — it broadcasts as a tiny dimension
  (m bits => at most m rows regardless of benchmark size), which is
  the 100 TB point: probing is an equi-join against a broadcast
  dim, with the documented Bloom false-positive rate
  (~(1-e^{-kn/m})^k) instead of shipping the whole benchmark.

Reference anchor: the reference has no sketches at all — these are
beyond-reference operators for the training-data layer, where
distinct-count monitoring (A1-A3 at 100 TB) and benchmark
decontamination both outgrow their exact forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_long, shingles



def hll_registers(df: DataFrame, col: str, m: int = 256) -> DataFrame:
    """(register, max_rho) rows — the mergeable sketch state. One
    map-side-combining groupBy over md5-hashed values; register
    count ``m`` must be a power of two in [4, 4096]."""
    if m & (m - 1) or not 4 <= m <= 4096:
        raise ValueError(f"m must be a power of two in [4, 4096], got {m}")
    reg_bits = m.bit_length() - 1
    win = 60 - reg_bits
    h = md5_long(F.col(col).cast("string"))
    # shiftright, NOT h/m: double division past 2^53 silently rounds
    w = F.shiftright(h, reg_bits)     # the upper 60-reg_bits bits
    rho = F.when(w > 0, F.lit(win) - F.length(F.bin(w)) + 1) \
        .otherwise(F.lit(win + 1)).cast("int")
    return (df.filter(F.col(col).isNotNull())
            .select((h % m).cast("int").alias("register"),
                    rho.alias("rho"))
            .groupBy("register").agg(F.max("rho").alias("max_rho")))


def hll_distinct(df: DataFrame, col: str, m: int = 256) -> DataFrame:
    """One-row HyperLogLog distinct estimate of ``col``:
    (n_registers, n_zero_registers, hll_estimate). Estimate is
    rounded to 2dp (the only non-exact float step is the final
    alpha*m^2/sum and the linear-counting ln — both rounded far
    above any libm ulp divergence; the register sum itself is a sum
    of dyadic 2^-M_j, EXACT in double in any order)."""
    regs = hll_registers(df, col, m)
    spark = df.sparkSession
    allm = spark.range(m).select(F.col("id").cast("int").alias("register"))
    filled = (allm.join(regs, "register", "left")
              .select(F.coalesce("max_rho", F.lit(0)).alias("max_rho")))
    alpha = 0.7213 / (1 + 1.079 / m)
    agg = filled.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("z"),
        F.sum(F.when(F.col("max_rho") == 0, 1).otherwise(0)).alias("v"))
    raw = F.lit(alpha) * m * m / F.col("z")
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v"))
    est = F.when((raw <= 2.5 * m) & (F.col("v") > 0), lc).otherwise(raw)
    return agg.select(
        F.lit(m).alias("n_registers"),
        F.col("v").cast("int").alias("n_zero_registers"),
        F.round(est, 2).alias("hll_estimate"))


def bloom_positions(frame: DataFrame, expr, m_bits: int = 65536,
                    k: int = 3) -> DataFrame:
    """Distinct Bloom bit positions for the array column ``expr``
    (k md5-salted hashes per element). The SET frame: at most
    ``m_bits`` rows regardless of input size — broadcastable."""
    el = frame.select(F.explode(expr).alias("e")).distinct()
    pos = None
    for i in range(k):
        p = el.select((md5_long(F.concat(F.col("e"), F.lit(f"#b{i}")))
                       % m_bits).cast("int").alias("pos"))
        pos = p if pos is None else pos.unionByName(p)
    return pos.distinct()


def bloom_contamination(documents: DataFrame, benchmark: DataFrame,
                        n: int = 5, m_bits: int = 65536,
                        k: int = 3) -> DataFrame:
    """Documents flagged by a Bloom filter of the benchmark's
    ``n``-token shingles: a doc shingle "hits" when ALL k of its bit
    positions are set; output (doc_id, n_hit_shingles) for docs with
    >= 1 hit. Superset-of-truth semantics (Bloom has false positives,
    never false negatives — every truly contaminated doc is flagged);
    the filter is a broadcast dimension of <= m_bits rows, so probing
    100 TB is one broadcast semi-join per salt, not a join against
    the benchmark corpus."""
    sh_expr = F.array_distinct(shingles(F.col("text"), n))
    bits = F.broadcast(bloom_positions(benchmark, sh_expr,
                                       m_bits=m_bits, k=k))
    doc_sh = documents.select(
        "doc_id", F.explode(sh_expr).alias("sh")).distinct()
    probed = None
    for i in range(k):
        p = (doc_sh.withColumn(
            "pos", (md5_long(F.concat(F.col("sh"), F.lit(f"#b{i}")))
                    % m_bits).cast("int"))
            .join(bits, "pos", "left_semi")
            .select("doc_id", "sh"))
        probed = p if probed is None else probed.intersect(p)
    return (probed.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_hit_shingles")))


def kmv_sketch(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """The k smallest distinct md5 hash values of ``col`` — the KMV
    (k-minimum-values) distinct sketch (Bar-Yossef et al. 2002,
    public). Mergeable (k smallest of a union of sketches) and, unlike
    HLL, INTERSECTABLE: the k smallest union hashes are a uniform
    sample of the union, so shared membership estimates Jaccard.
    One distinct-shuffle on the hash + a TakeOrdered top-k — never a
    global sort."""
    h = md5_long(F.col(col).cast("string"))
    return (df.filter(F.col(col).isNotNull())
            .select(h.alias("h")).distinct()
            .orderBy("h").limit(k))


def _kmv_est(n, hm, k: int):
    """Distinct estimate from sketch size ``n`` and kth-smallest hash
    ``hm``: exact below k (the sketch IS the distinct set), else the
    classic (k-1)/U_(k) with U normalized over the 60-bit hash space.
    int->double and one IEEE division — bit-identical across engines."""
    full = F.lit(float(k - 1)) * F.lit(1152921504606846976.0) / hm
    return F.when(n < k, n.cast("double")).otherwise(full)


def kmv_overlap(df_a: DataFrame, df_b: DataFrame, col: str,
                k: int = 64) -> DataFrame:
    """One-row KMV set-overlap estimate between ``col``'s distinct
    values in two frames: (k, est_a, est_b, est_union, jaccard_est,
    est_intersection). Jaccard is the shared-membership fraction of
    the k-smallest-union sample (denominator = union sketch size, so
    below k everything degrades to EXACT set arithmetic); the
    intersection estimate is jaccard x union — the inclusion-
    exclusion-free route HLL cannot take. All joins are over <=k-row
    frames; the only corpus-sized work is the two hash distincts."""
    sa = kmv_sketch(df_a, col, k).withColumn("in_a", F.lit(1))
    sb = kmv_sketch(df_b, col, k).withColumn("in_b", F.lit(1))
    un = (sa.select("h").unionByName(sb.select("h")).distinct()
          .orderBy("h").limit(k))
    joined = un.join(sa, "h", "left").join(sb, "h", "left")
    stats_a = sa.agg(F.count(F.lit(1)).alias("na"),
                     F.max("h").alias("ha"))
    stats_b = sb.agg(F.count(F.lit(1)).alias("nb"),
                     F.max("h").alias("hb"))
    stats_u = joined.agg(
        F.count(F.lit(1)).alias("nu"), F.max("h").alias("hu"),
        F.sum(F.when(F.col("in_a").isNotNull()
                     & F.col("in_b").isNotNull(), 1)
              .otherwise(0)).alias("n_both"))
    row = stats_u.crossJoin(stats_a).crossJoin(stats_b)  # 1x1x1 rows
    est_u = _kmv_est(F.col("nu"), F.col("hu"), k)
    jacc = F.col("n_both") / F.col("nu")
    return row.select(
        F.lit(k).alias("k"),
        F.round(_kmv_est(F.col("na"), F.col("ha"), k), 2).alias("est_a"),
        F.round(_kmv_est(F.col("nb"), F.col("hb"), k), 2).alias("est_b"),
        F.round(est_u, 2).alias("est_union"),
        F.round(jacc, 6).alias("jaccard_est"),
        F.round(jacc * est_u, 2).alias("est_intersection"))
