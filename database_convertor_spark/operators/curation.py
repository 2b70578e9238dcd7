"""Corpus-curation operators beyond dedup — the standard
training-data hygiene passes a 100 TB pipeline runs between ingest and
training, each as pure DataFrame algebra:

- **benchmark decontamination**: flag/drop corpus docs sharing word
  n-gram shingles with an evaluation set (the published
  train-test-overlap discipline, e.g. GPT-3 appendix C / PaLM
  contamination analysis — public methodology). The shingle join runs
  on 60-bit md5 hashes (engine-portable, narrow shuffle), never on
  raw strings, and never materializes doc x bench.
- **boilerplate line removal**: C4-style cross-document repeated-line
  filtering — lines appearing in >= min_docs distinct docs are
  boilerplate (nav bars, cookie banners); docs are reassembled with
  original line order preserved.
- **PII redaction**: email/phone scrubbing as regexp_replace column
  expressions (reference's contact-extraction regexes inverted:
  api_clients.py extract_contact_fields finds them, redact_pii
  removes them).
- **deterministic stratified sampling**: per-stratum keep rates via a
  content-independent md5 hash gate — reproducible across engines and
  runs (unlike sampleBy's RNG), the corpus-mixing primitive.

Scale notes: every op is one narrow projection + at most one
aggregate/join on a bounded key (shingle hash, trimmed line, stratum);
no op carries document text through a shuffle except line reassembly,
which shuffles each line exactly once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import md5_long, shingles, tokens

#: Sentinel fingerprint for NULL-text rows in corpus_diff — md5(NULL)
#: is NULL, which would read as "row absent" without this.
NULL_TEXT_FP = "fp:null-text"


# ------------------------------------------------------- decontamination
def _shingle_hashes(df: DataFrame, id_col: str, n: int) -> DataFrame:
    sh = F.explode(F.array_distinct(shingles(F.col("text"), n)))
    return (df.select(F.col(id_col), sh.alias("_sh"))
            .select(id_col, md5_long(F.col("_sh")).alias("_h")))


def benchmark_contamination(documents: DataFrame, benchmark: DataFrame,
                            shingle_n: int = 5,
                            min_shared: int = 1) -> DataFrame:
    """(doc_id, bench_id, n_shared_shingles) for every corpus/benchmark
    pair sharing >= min_shared distinct word-``shingle_n``-gram
    shingles. ``benchmark`` needs (bench_id, text)."""
    par = documents.sparkSession.sparkContext.defaultParallelism
    d = _shingle_hashes(documents, "doc_id", shingle_n).repartition(par)
    b = _shingle_hashes(benchmark, "bench_id", shingle_n)
    return (d.join(b, "_h")
            .groupBy("doc_id", "bench_id")
            .agg(F.count_distinct(F.col("_h")).alias("n_shared_shingles"))
            .filter(F.col("n_shared_shingles") >= min_shared))


def decontaminate(documents: DataFrame, benchmark: DataFrame,
                  shingle_n: int = 5, min_shared: int = 1) -> DataFrame:
    """Drop every corpus doc contaminated by the benchmark set."""
    hits = (benchmark_contamination(documents, benchmark,
                                    shingle_n, min_shared)
            .select("doc_id").distinct())
    return documents.join(hits, "doc_id", "left_anti")


def contamination_fraction(documents: DataFrame, benchmark: DataFrame,
                           shingle_n: int = 5) -> DataFrame:
    """The GPT-3 appendix-C "dirtiness" MEASURE (Brown et al. 2020 —
    public methodology) behind the binary hit flag: per corpus doc,
    the fraction of its DISTINCT word shingles that appear anywhere
    in the benchmark set. The published discipline removes docs above
    a dirtiness threshold and *reports* the residual overlap of what
    stays — this is the reporting column.

    Distributed shape: the doc shingle stream LEFT-joins the
    DISTINCT benchmark shingle set on the 60-bit hash (benchmark
    shingles are eval-set-sized — broadcastable in practice; the
    join key is the hash either way, never text), then ONE
    groupBy(doc_id) counts total and matched shingles — no doc x
    bench pair ever materializes, unlike the hit table which is
    per-pair by design.

    Output: (doc_id, n_shingles, n_contaminated, contamination_frac
    rounded 4dp; NULL for shingle-less docs).
    """
    # NULL-text docs produce a single NULL hash from the whole-text
    # shingle branch — filter it so they report (0, 0, NULL) like the
    # docstring (and the serial oracle, whose unnest drops them) says
    d = _shingle_hashes(documents, "doc_id", shingle_n).filter(
        F.col("_h").isNotNull())
    b = (_shingle_hashes(benchmark, "bench_id", shingle_n)
         .select("_h").distinct().withColumn("_hit", F.lit(1)))
    per = (d.join(b, "_h", "left")
           .groupBy("doc_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_shingles"),
                F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long")
                .alias("n_contaminated")))
    frac = F.when(
        F.col("n_shingles") > 0,
        F.round(F.col("n_contaminated").cast("double")
                / F.col("n_shingles"), 4))
    return (documents.select("doc_id").join(per, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
                    F.coalesce("n_contaminated", F.lit(0))
                    .alias("n_contaminated"),
                    frac.alias("contamination_frac")))


# -------------------------------------------------- boilerplate removal
def remove_boilerplate_lines(documents: DataFrame,
                             min_docs: int = 5) -> DataFrame:
    """Remove lines whose trimmed form appears in >= min_docs distinct
    documents (cross-document boilerplate); returns (doc_id, text)
    with surviving lines rejoined in original order. Blank lines are
    never counted as boilerplate. A document whose EVERY line is
    boilerplate is dropped (the C4 discipline: empty docs leave the
    corpus). Idempotent: survivors' line frequencies are < min_docs by
    construction, so a second pass removes nothing."""
    lines = documents.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), "\n")).alias("pos", "line"))
    keyed = lines.withColumn("_k", F.trim(F.col("line")))
    boiler = (keyed.filter(F.col("_k") != "")
              .groupBy("_k")
              .agg(F.count_distinct(F.col("doc_id")).alias("_df"))
              .filter(F.col("_df") >= min_docs)
              .select("_k"))
    kept = keyed.join(boiler, "_k", "left_anti")
    return (kept.groupBy("doc_id")
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col("pos"), F.col("line")))),
                    lambda s: s.getField("line")),
                "\n").alias("text")))


# ----------------------------------------------- line dedup (keep-first)
def dedup_lines_keep_first(documents: DataFrame) -> DataFrame:
    """Cross-document exact LINE dedup, keep-first-occurrence (the
    RefinedWeb/C4-family line-dedup discipline, distinct from
    ``remove_boilerplate_lines``: boilerplate removal deletes EVERY
    occurrence of a frequent line; this keeps exactly ONE — the
    occurrence with the smallest (doc_id, position) — and deletes the
    rest, so shared content survives once in the corpus).

    Blank lines — whitespace-only, tabs included (the blank test is a
    ``\\s``-class regex strip, NOT trim(), which strips only spaces) —
    are never deduplicated. Documents left with only blank content are
    dropped (empty docs leave the corpus).

    Scale shape: "first occurrence per line" is min(struct(doc_id,
    pos)) — a PARTIAL-AGGREGABLE aggregate, not a window. A line
    shared by millions of documents map-side-combines to one row per
    input partition before the shuffle, so the frequent-line skew that
    would stall a row_number window never reaches the reducer. The
    dedup key rides as a 60-bit md5 of the stripped line, so neither
    the aggregate nor the join back carries line TEXT as a KEY — on a
    long-line corpus that halves the shuffled bytes. The winner's
    stripped text does ride the min-struct VALUE (once per distinct
    line after map-side combine), because the join-back confirms text
    equality: at 100-TB distinct-line counts (2^30+) a 60-bit birthday
    collision is likely, and without the confirmation it would delete
    every occurrence of the losing line; with it, a collision merely
    leaves that line un-deduplicated. The join back is an equi-join on
    the hash; reassembly shuffles each surviving line once on doc_id.
    """
    lines = documents.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), "\n")).alias("pos", "line"))
    stripped = F.regexp_replace(F.col("line"), r"^\s+|\s+$", "")
    keyed = lines.withColumn("_h", md5_long(stripped)) \
                 .withColumn("_blank", stripped == "")
    # blank lines never dedup and never need the join — routing them
    # around it also keeps every blank in the corpus out of what would
    # be a single blank-hash mega-partition if the join falls back to
    # sort-merge at corpus scale
    blanks = keyed.filter(F.col("_blank")).drop("_h", "_blank")
    nonblank = keyed.filter(~F.col("_blank")).drop("_blank")
    # the winner's STRIPPED TEXT rides in the min-struct (last field —
    # (doc_id, pos) ordering unchanged): the join-back confirms text
    # equality, so a 60-bit hash collision degrades to a MISSED dedup
    # of the colliding line, never a silent corpus-wide deletion. The
    # text rides the aggregate once per (partition x distinct line)
    # after map-side combine — not per occurrence — and the join keys
    # stay hash-only.
    firsts = (nonblank
              .groupBy("_h")
              .agg(F.min(F.struct(F.col("doc_id"), F.col("pos"),
                                  stripped.alias("sline")))
                   .alias("_first")))
    kept = (nonblank.join(firsts, "_h")
            .filter(((F.col("doc_id") == F.col("_first.doc_id"))
                     & (F.col("pos") == F.col("_first.pos")))
                    | (stripped != F.col("_first.sline")))
            .select("doc_id", "pos", "line")
            .unionByName(blanks))
    docs = (kept.groupBy("doc_id")
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col("pos"), F.col("line")))),
                    lambda s: s.getField("line")),
                "\n").alias("text")))
    # a doc surviving on blank lines alone is whitespace-only text
    # (tabs/newlines included) — it leaves the corpus
    return docs.filter(~F.col("text").rlike(r"^\s*$"))


# ---------------------------------------- temperature-balanced sampling
def _hash_gated_sample(docs: DataFrame, gates: DataFrame,
                       salt: str) -> DataFrame:
    """Shared deterministic-gate tail for the sampling family: keep a
    doc when md5_long(salt || doc_id) % 1e6 falls under its stratum's
    integer gate (expected keep rate = gate / 1e6). The 6-dp frac
    rounding that produces ``_gate`` upstream and the 1e6 modulus here
    are ENGINE-PORTABILITY-CRITICAL — every DuckDB oracle twin
    replicates them digit for digit; keep both copies of the
    arithmetic in this one place."""
    h = md5_long(F.concat(F.lit(salt),
                          F.col("doc_id").cast("string"))) % 1_000_000
    return (docs.join(F.broadcast(gates), "_stratum")
            .filter(h < F.col("_gate"))
            .drop("_gate", "_stratum"))


def corpus_diff(old: DataFrame, new: DataFrame,
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Snapshot diff between two corpus versions — the migration-
    verification pass the reference's conversion workflows imply
    (after any batch rewrite/re-crawl: what was added, what vanished,
    what changed in place?). Rows are compared by CONTENT FINGERPRINT
    (whitespace-normalized md5, the dedup family's key), not raw
    text, so a 100 TB diff shuffles two narrow (id, 32-char) frames:

      added      id only in ``new``
      removed    id only in ``old``
      modified   id in both, fingerprints differ

    Unchanged rows are omitted (at corpus scale they are the bulk —
    emitting them would make the diff as large as the corpus). One
    full-outer equi-join on the id, pure column expressions after.

    Output: (<id_col>, change in {'added','removed','modified'},
    old_fp, new_fp) — fingerprints NULL on the missing side. Presence
    is decided by JOIN-SIDE FLAGS, never by fingerprint nullness: a
    NULL text would fingerprint to NULL (md5 of NULL) and masquerade
    as a missing row, so NULL texts get the sentinel fingerprint
    ``fp:null-text`` and the modified test compares null-safely.
    Reference analog: the migration key-remap verification
    (SURVEY J9; sources/sqlite.py migrates, this audits).
    """
    from ..functions.text import fingerprint

    def fp(col: str) -> Column:
        return F.coalesce(fingerprint(F.col(col)), F.lit(NULL_TEXT_FP))

    o = old.select(F.col(id_col), fp(text_col).alias("old_fp"),
                   F.lit(True).alias("_in_old"))
    n = new.select(F.col(id_col), fp(text_col).alias("new_fp"),
                   F.lit(True).alias("_in_new"))
    change = (F.when(F.col("_in_old").isNull(), F.lit("added"))
              .when(F.col("_in_new").isNull(), F.lit("removed"))
              .when(~F.col("old_fp").eqNullSafe(F.col("new_fp")),
                    F.lit("modified")))
    return (o.join(n, id_col, "full_outer")
            .withColumn("change", change)
            .filter(F.col("change").isNotNull())
            .select(id_col, "change", "old_fp", "new_fp"))


def source_cap(documents: DataFrame, cap: int,
               source_col: str = "source",
               oversample: int = 8, salt: str = "srccap") -> DataFrame:
    """Per-source frequency capping (the RefinedWeb/C4 discipline:
    no single domain may dominate the corpus — public methodology):
    keep at most ``cap`` documents per source, chosen
    deterministically by md5 rank (engine- and run-reproducible, like
    every sampler in this family).

    Scale shape — two phases so no single reducer ever sorts a
    mega-source:
      1. RATE GATE: each over-cap source is first thinned by the
         deterministic md5 gate to an EXPECTED ``cap * oversample``
         survivors (pure filter, per-source rates broadcast from one
         tiny count aggregate) — so the window below holds
         ~cap*oversample rows per source no matter how skewed the
         source distribution is (a 10%-of-corpus domain arrives at
         phase 2 pre-thinned, not as one giant sort partition);
      2. EXACT CAP: row_number per source ordered by (md5, doc_id)
         keeps the first ``cap``.
    Sources at or under cap pass phase 1 whole (gate = 1.0). The gate
    can in principle leave fewer than ``cap`` survivors for an
    over-cap source; at the default oversample=8 the shortfall
    probability is Chernoff-negligible, and it is deterministic —
    raise ``oversample`` for stricter fills. The gate is floored at 1
    (keep rate 1e-6): without the floor, a source past
    ~cap*oversample*2e6 docs would round its rate to ZERO and be
    dropped entirely instead of capped — the floored gate still
    expects >= cap survivors for any source the 60-bit hash can
    address.

    Output: the capped documents (all input columns).
    """
    docs = documents.withColumn("_src", F.col(source_col))
    counts = docs.groupBy("_src").agg(F.count(F.lit(1)).alias("_n"))
    frac = F.round(F.least(
        F.lit(1.0),
        F.lit(float(cap * oversample)) / F.col("_n")), 6)
    gates = counts.select(
        "_src", F.greatest(
            F.lit(1).cast("long"),
            F.round(frac * 1_000_000, 0).cast("long")).alias("_gate"))
    h = md5_long(F.concat(F.lit(salt), F.col("doc_id").cast("string")))
    surv = (docs.join(F.broadcast(gates), "_src")
            .filter((h % 1_000_000) < F.col("_gate"))
            .withColumn("_h", h))
    w = Window.partitionBy("_src").orderBy("_h", "doc_id")
    return (surv.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap)
            .drop("_src", "_gate", "_h", "_rn"))


def temperature_sample(documents: DataFrame, alpha: float = 0.5,
                       stratum_col: str = "lang",
                       salt: str = "temp",
                       null_stratum: bool = False) -> DataFrame:
    """Temperature-scaled corpus balancing (the multilingual-LM mixing
    rule, p_l ∝ n_l^alpha — XLM-R/mT5-style, public methodology):
    downsample each stratum so expected kept counts are proportional
    to n_l^alpha. With alpha < 1 large languages shrink toward the
    small ones; the SMALLEST stratum keeps 100% (a pure filter cannot
    upsample), i.e. keep_frac_l = (n_min / n_l)^(1-alpha).

    The gate is the deterministic md5 hash of (salt, doc_id) —
    engine-reproducible and partition-stable like stratified_sample,
    which this generalizes: there the caller dictates per-stratum
    rates; here the rates come from the corpus's own counts (one
    tiny groupBy broadcast back). Two scans of nothing: the counts
    aggregate is partial-aggregable and its output is |strata| rows.

    Rows with a NULL stratum are DROPPED by default (the rate join is
    inner): a language-less doc has no defensible rate under
    p ∝ n^alpha. Pass ``null_stratum=True`` to instead treat NULLs as
    one sentinel stratum of their own — they are counted, rated, and
    sampled like any language (internal coalesce key only; the output
    column keeps its NULLs).
    """
    key = F.coalesce(F.col(stratum_col).cast("string"),
                     F.lit("\u0001<null>")) if null_stratum \
        else F.col(stratum_col)
    docs = documents.withColumn("_stratum", key)
    counts = docs.groupBy("_stratum").agg(F.count(F.lit(1)).alias("_n"))
    nmin = counts.agg(F.min("_n").alias("_nmin"))
    frac = F.round(
        F.pow(F.col("_nmin").cast("double") / F.col("_n"),
              F.lit(1.0 - alpha)), 6)
    gates = (counts.crossJoin(F.broadcast(nmin))
             .select("_stratum",
                     F.round(frac * 1_000_000, 0).cast("long")
                     .alias("_gate")))
    return _hash_gated_sample(docs, gates, salt)


def unimax_sample(documents: DataFrame,
                  budget_frac: float = 0.3,
                  stratum_col: str = "lang",
                  salt: str = "unimax") -> DataFrame:
    """UniMax language sampling (Chung et al. 2023, arXiv:2304.09151),
    downsampling water-fill variant: allocate a total TOKEN budget
    (``budget_frac`` x corpus tokens) across languages as uniformly as
    possible — each language keeps min(n_l, theta) tokens, with the
    water level theta chosen so the kept totals sum to the budget.
    Small languages keep 100%; large ones are capped at the SAME
    absolute token count, the fairness property temperature scaling
    (kept ∝ n^alpha) lacks. The paper's epoch cap (> 1 epoch
    upsampling) is out of scope for a filter-only operator; this is
    the cap = 1 epoch allocation.

    Water level, computed relationally (no driver loop): languages
    sorted by token count ascending; at position i the fair share of
    the remaining budget is (B - csum_{i-1}) / (L - i + 1); every
    language whose n_l is at or below its share keeps everything, and
    theta is the share at the FIRST position that exceeds it — one
    window pass over an L-row frame, broadcast back as per-language
    keep fractions. The doc-level gate is the deterministic md5 of
    (salt, doc_id) — kept TOKENS hit the budget in expectation at doc
    granularity, the same contract as ``temperature_sample``.

    NULL-``stratum_col`` docs ride as a sentinel stratum (counted,
    rated, sampled; output column keeps its NULLs). Reference has no
    analog (beyond-reference training-data operator).
    """
    from ..functions.text import token_count

    # \x01-prefixed sentinel, matching temperature_sample: a corpus
    # whose real stratum VALUE is the string "<null>" must not merge
    # with NULL-stratum docs (the oracle twin uses chr(1) the same way)
    key = F.coalesce(F.col(stratum_col).cast("string"),
                     F.lit("\u0001<null>"))
    docs = documents.withColumn("_stratum", key)
    counts = (docs.groupBy("_stratum")
              .agg(F.sum(token_count(F.col("text"))).alias("_n")))
    # everything below counts is window algebra over the L-row frame —
    # corpus totals, cumulative sums, and the first-overflow water
    # level all ride TWO unpartitioned window specs, so the corpus is
    # scanned once for counts and once for the gated main pass (the
    # same two-scan budget as temperature_sample), never re-aggregated
    wl = Window.orderBy(F.asc("_n"), F.asc("_stratum"))
    wall = Window.partitionBy(F.lit(1))
    ranked = counts.select(
        "_stratum", "_n",
        F.row_number().over(wl).alias("_i"),
        F.sum("_n").over(wl).alias("_csum"),
        F.sum("_n").over(wall).cast("double").alias("_tot"),
        F.count(F.lit(1)).over(wall).alias("_L"))
    budget = F.col("_tot") * F.lit(float(budget_frac))
    share = ((budget - (F.col("_csum") - F.col("_n")).cast("double"))
             / (F.col("_L") - F.col("_i") + 1).cast("double"))
    # theta = the share at the first position whose n exceeds it (also
    # a window min over the same frame — no separate aggregate job);
    # if no position overflows (budget >= corpus) every language
    # keeps 100%
    overflow = F.when(F.col("_n").cast("double") > share,
                      F.struct(F.col("_i"), share.alias("_s")))
    theta = F.coalesce(F.min(overflow).over(wall).getField("_s"),
                       F.lit(float("inf")))
    # a zero-token stratum keeps everything: there is nothing for the
    # budget to allocate, and ANSI mode would throw on theta / 0
    frac = F.round(
        F.when(F.col("_n") > 0,
               F.least(F.lit(1.0), theta / F.col("_n").cast("double")))
        .otherwise(F.lit(1.0)), 6)
    gates = ranked.select(
        "_stratum",
        F.round(frac * 1_000_000, 0).cast("long").alias("_gate"))
    return _hash_gated_sample(docs, gates, salt)


def unimax_allocation(documents: DataFrame,
                      budget_frac: float = 0.8,
                      epoch_cap: float = 2.0,
                      stratum_col: str = "lang") -> DataFrame:
    """UniMax budget ALLOCATION with the paper's epoch cap (Chung et
    al. 2023, arXiv:2304.09151 — the full Algorithm 1, not just the
    downsampling special case): distribute a total token budget
    across languages as uniformly as possible where each language l
    may contribute at most ``epoch_cap`` x n_l tokens (i.e. be
    repeated for at most N epochs). ``unimax_sample`` is the
    epoch_cap = 1 case restated as a filter; an epoch cap above 1
    UPSAMPLES small languages, which no pure filter can do — so this
    operator emits the allocation PLAN (per-stratum allocated tokens
    and epoch counts) for the training loader to apply, closing the
    "epoch cap is out of scope for a filter-only operator" caveat in
    unimax_sample's contract the honest way.

    Same relational water-fill as unimax_sample over caps
    c_l = epoch_cap * n_l: strata sorted by c_l ascending, the share
    at position i is (B - csum_{i-1}(c)) / (L - i + 1), theta is the
    share at the first position whose cap exceeds it, and every
    stratum gets min(c_l, theta). If the budget exceeds the summed
    caps every stratum sits at its cap and the report shows the
    shortfall (allocated < budget) rather than silently over-running
    the epoch cap. One corpus scan + one window pass over the L-row
    frame; no shuffle beyond the count aggregate.

    Output: (<stratum_col>, n_tokens, allocated_tokens 4dp,
    epochs 4dp — NULL for a zero-token stratum). NULL strata ride as
    the sentinel stratum (output keeps the NULL). Reference has no
    analog (beyond-reference training-data operator).
    """
    from ..functions.text import token_count

    if epoch_cap <= 0:
        raise ValueError("epoch_cap must be positive")
    key = F.coalesce(F.col(stratum_col).cast("string"),
                     F.lit("\u0001<null>"))
    docs = documents.withColumn("_stratum", key)
    counts = (docs.groupBy("_stratum")
              .agg(F.sum(token_count(F.col("text"))).alias("_n"),
                   F.first(F.col(stratum_col)).alias("_orig")))
    cap = F.col("_n").cast("double") * F.lit(float(epoch_cap))
    wl = Window.orderBy(F.asc(cap), F.asc("_stratum"))
    wall = Window.partitionBy(F.lit(1))
    ranked = counts.select(
        "_orig", "_n", "_stratum", cap.alias("_c"),
        F.row_number().over(wl).alias("_i"),
        F.sum(cap).over(wl).alias("_csum"),
        F.sum("_n").over(wall).cast("double").alias("_tot"),
        F.count(F.lit(1)).over(wall).alias("_L"))
    budget = F.col("_tot") * F.lit(float(budget_frac))
    share = ((budget - (F.col("_csum") - F.col("_c")))
             / (F.col("_L") - F.col("_i") + 1).cast("double"))
    overflow = F.when(F.col("_c") > share,
                      F.struct(F.col("_i"), share.alias("_s")))
    theta = F.coalesce(F.min(overflow).over(wall).getField("_s"),
                       F.lit(float("inf")))
    alloc = F.least(F.col("_c"), theta)
    return ranked.select(
        F.col("_orig").alias(stratum_col),
        F.col("_n").cast("long").alias("n_tokens"),
        F.round(alloc, 4).alias("allocated_tokens"),
        F.when(F.col("_n") > 0,
               F.round(alloc / F.col("_n").cast("double"), 4))
        .alias("epochs"))


def mixture_sample(documents: DataFrame,
                   weights: dict[str | None, float],
                   budget_frac: float = 0.3,
                   stratum_col: str = "source",
                   salt: str = "mix") -> DataFrame:
    """Explicit-mixture sampling with a weighted water-fill: allocate
    a total TOKEN budget across strata in the caller's target
    PROPORTIONS (DoReMi / The-Pile-style explicit per-source mixture
    weights — Xie et al. 2023 arXiv:2305.10429, Gao et al. 2020;
    public methodology), downsampling only. Each stratum keeps
    min(n_s, w_s * theta) tokens with one shared water level theta, so
    a stratum too small for its target keeps everything and its unmet
    demand is re-spread over the others IN PROPORTION TO THEIR
    WEIGHTS — the weighted generalization of ``unimax_sample``
    (UniMax IS this operator at uniform weights). Strata absent from
    ``weights`` (or at weight 0) are DROPPED: an explicit mixture is a
    whitelist, which is also what makes the operator a pure filter.

    The budget is ``budget_frac`` x the tokens of the WEIGHTED
    universe (weight-0 strata don't inflate it). Water level computed
    relationally exactly like unimax_sample: strata sorted by
    saturation point n_s/w_s ascending, theta candidate at position i
    is (B - csum_{i-1}(n)) / (W - cumw_{i-1}), theta is the candidate
    at the first position whose n exceeds its share w_i * candidate —
    one window pass over the S-row count frame, broadcast back as
    md5-gated per-stratum keep fractions (same deterministic gate
    contract as the rest of the sampling family). NULL strata ride as
    the sentinel stratum keyed by ``None`` in ``weights``.
    Reference has no analog (beyond-reference training-data operator).
    """
    from ..functions.text import token_count

    if not weights or all(v <= 0 for v in weights.values()):
        raise ValueError("weights must contain a positive entry")
    if any(v < 0 for v in weights.values()):
        raise ValueError("weights must be non-negative")
    key = F.coalesce(F.col(stratum_col).cast("string"),
                     F.lit("\u0001<null>"))
    docs = documents.withColumn("_stratum", key)
    pairs: list = []
    for kk in sorted(weights, key=lambda x: (x is None, str(x))):
        skey = "\u0001<null>" if kk is None else str(kk)
        pairs += [F.lit(skey), F.lit(float(weights[kk]))]
    wmap = F.create_map(*pairs)
    counts = (docs.groupBy("_stratum")
              .agg(F.sum(token_count(F.col("text"))).alias("_n"))
              .withColumn("_w", F.coalesce(wmap[F.col("_stratum")],
                                           F.lit(0.0)))
              .filter(F.col("_w") > 0))
    sat = F.col("_n").cast("double") / F.col("_w")
    wl = Window.orderBy(F.asc(sat), F.asc("_stratum"))
    wall = Window.partitionBy(F.lit(1))
    ranked = counts.select(
        "_stratum", "_n", "_w",
        F.row_number().over(wl).alias("_i"),
        F.sum("_n").over(wl).alias("_csum"),
        F.sum("_w").over(wl).alias("_cw"),
        F.sum("_n").over(wall).cast("double").alias("_tot"),
        F.sum("_w").over(wall).alias("_wsum"))
    budget = F.col("_tot") * F.lit(float(budget_frac))
    cand = ((budget - (F.col("_csum") - F.col("_n")).cast("double"))
            / (F.col("_wsum") - (F.col("_cw") - F.col("_w"))))
    overflow = F.when(F.col("_n").cast("double") > F.col("_w") * cand,
                      F.struct(F.col("_i"), cand.alias("_th")))
    theta = F.coalesce(F.min(overflow).over(wall).getField("_th"),
                       F.lit(float("inf")))
    frac = F.round(
        F.when(F.col("_n") > 0,
               F.least(F.lit(1.0),
                       F.col("_w") * theta / F.col("_n").cast("double")))
        .otherwise(F.lit(1.0)), 6)
    gates = ranked.select(
        "_stratum",
        F.round(frac * 1_000_000, 0).cast("long").alias("_gate"))
    return _hash_gated_sample(docs, gates, salt)


# -------------------------------------------------- sequence packing
def assign_chunk_bins(chunks: DataFrame, documents: DataFrame | None,
                      budget: int = 512, n_shards: int = 4,
                      salt: str = "pack",
                      extra_partition_cols: tuple[str, ...] = ()
                      ) -> DataFrame:
    """Training-shard sequence packing: assign token chunks to
    fixed-token-budget bins by contiguous concatenation (the GPT-style
    pack-then-split discipline: chunks are laid end-to-end in
    deterministic (doc_id, chunk_id) order and a bin boundary falls
    every ``budget`` tokens; a chunk is assigned to the bin where it
    STARTS, so a bin may run over by at most one chunk's tail — which
    training consumes as the next sequence's head).

    Packing only needs LOCAL contiguity, so the stream is sharded:
    each document's chunks ride one of ``n_shards`` deterministic
    md5 shards within its language, and the running token offset is a
    window partitioned by (lang, shard) — at cluster scale n_shards
    rises with the input and every shard packs in parallel; no global
    sort, no single-task window.

    Output: the input chunk columns + (lang, shard, bin_id) — the
    write path partitions by (lang, shard) and sorts by bin_id to lay
    training shards on disk.

    ``documents=None`` skips the lang join when ``chunks`` already
    carries a ``lang`` column (a chunker that carried it through —
    one corpus pass instead of a re-join against the document
    frame's lineage). ``extra_partition_cols`` extends the packing
    window's partition key (e.g. a train/val ``split`` column): the
    running offset then restarts per extra-key value, so a fused
    single-pass run reproduces EXACTLY the bins of one run per value.
    """
    if documents is None:
        c = chunks
    else:
        lang = documents.select("doc_id", "lang")
        c = chunks.join(lang, "doc_id")
    shard = (md5_long(F.concat(F.lit(salt),
                               F.col("doc_id").cast("string")))
             % n_shards).alias("shard")
    c = c.withColumn("shard", shard)
    w = (Window.partitionBy(*extra_partition_cols, "lang", "shard")
         .orderBy("doc_id", "chunk_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("n_tokens").over(w)
    return c.withColumn(
        "bin_id", F.floor((cum - F.col("n_tokens")) / budget))


def pack_chunks(chunks: DataFrame, documents: DataFrame,
                budget: int = 512, n_shards: int = 4,
                salt: str = "pack") -> DataFrame:
    """Per-bin roll-up of ``assign_chunk_bins``: one row per training
    bin — (lang, shard, bin_id, n_chunks, bin_tokens, fill_frac)."""
    assigned = assign_chunk_bins(chunks, documents, budget, n_shards, salt)
    return (assigned
            .groupBy("lang", "shard", "bin_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_chunks"),
                 F.sum("n_tokens").cast("long").alias("bin_tokens"))
            .withColumn("fill_frac",
                        F.round(F.col("bin_tokens") / budget, 4)))


# ---------------------------------------------------------- PII redaction
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?\d[\d \-]{8,}\d"


def redact_pii(col: Column) -> Column:
    """Scrub emails then phone-shaped digit runs (order matters: an
    email's local part may contain digits)."""
    out = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")


def redact_documents(documents: DataFrame) -> DataFrame:
    return documents.withColumn("text", redact_pii(F.col("text")))


# ----------------------------------------------------- document chunking
def chunk_documents(documents: DataFrame, chunk_tokens: int = 128,
                    overlap: int = 16,
                    carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """Split each document into <=``chunk_tokens``-token chunks with
    ``overlap`` tokens of context carried between neighbors — the
    sequence-packing precursor every training pipeline runs. One
    projection + one explode; no shuffle at all (chunking is
    embarrassingly parallel), so it scales with the scan.

    A trailing chunk fully contained in its predecessor (start >
    n - overlap) is not emitted. Output: (doc_id, chunk_id, n_tokens,
    chunk_text) plus any ``carry_cols`` — per-document columns copied
    onto every chunk row (lets a caller chunk several logical
    sub-corpora, e.g. train and val, in ONE pass instead of one pass
    per label — chunking is per-row, so the fused output restricted
    to a label equals that label's separate run)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    carry = list(carry_cols)
    toks = tokens(F.col("text"))
    # tokenize ONCE per doc in a projection below the explode: written
    # in the same select as the generator, the token array would be
    # hoisted above Generate and re-split per CHUNK ROW (the round-6
    # Generate-parent plan audit's finding — same bug class as the
    # doc_nb_quality scan fix)
    base = documents.select("doc_id", toks.alias("_tk"),
                            F.size(toks).alias("_n"), *carry)
    n = F.col("_n")
    starts = F.filter(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride)),
        lambda s: (s == 1) | (s + overlap <= n))
    return (base
            .select("doc_id", "_tk", *carry,
                    F.posexplode(starts).alias("chunk_id", "start"))
            .select("doc_id", "chunk_id",
                    F.size(F.slice(F.col("_tk"), F.col("start"),
                                   chunk_tokens)).alias("n_tokens"),
                    F.array_join(F.slice(F.col("_tk"), F.col("start"),
                                         chunk_tokens), " ")
                    .alias("chunk_text"), *carry))


# ----------------------------------------------- leakage-safe train split
def leakage_safe_split(documents: DataFrame, pairs: DataFrame | None = None,
                       val_frac: float = 0.1,
                       salt: str = "split",
                       clusters: DataFrame | None = None) -> DataFrame:
    """Train/validation split that can never leak near-duplicate
    content across the boundary: the split is decided per DUP CLUSTER
    (connected components over the near-dup pairs), not per document —
    all members of a cluster land on the same side. Singleton docs are
    their own cluster. The gate is the deterministic md5 hash used by
    stratified_sample. Output: (doc_id, split) with split in
    {'train', 'val'}.

    Pass ``clusters`` — a precomputed (doc_id, cluster_id) frame — when
    the caller already ran connected components over the same pairs
    (prepare_training_corpus does): the iterative star rounds are the
    pipeline's most expensive stage after pair generation, and lineage
    reuse is NOT computation reuse — without this, handing ``pairs``
    here re-executes the whole components loop."""
    if clusters is None:
        if pairs is None:
            raise ValueError("leakage_safe_split needs pairs or clusters")
        from .components import dedup_clusters

        clusters = dedup_clusters(pairs, "doc_a", "doc_b")
    clusters = clusters.select("doc_id", "cluster_id")
    labeled = documents.select("doc_id").join(clusters, "doc_id", "left")
    split = split_expr(F.col("cluster_id"), F.col("doc_id"),
                       val_frac, salt)
    return labeled.select("doc_id", split.alias("split"))


def split_expr(cluster_id: Column, doc_id: Column, val_frac: float,
               salt: str = "split") -> Column:
    """The leakage-safe train/val gate as a bare Column — identical
    values to ``leakage_safe_split``. For callers that already joined
    the cluster map onto the document frame: computing the label
    in-place avoids re-executing the document lineage a second time
    inside a separate (doc_id, split) frame (the split frame is
    derived FROM the documents, so joining it back doubles the
    upstream subtree in one plan)."""
    key = F.coalesce(cluster_id, doc_id)
    gate = md5_long(F.concat(F.lit(salt), key.cast("string"))) % 1_000_000
    return F.when(gate < int(val_frac * 1_000_000),
                  F.lit("val")).otherwise(F.lit("train"))


# ------------------------------------------- quality-threshold selection
def select_top_quality(documents: DataFrame, score: Column,
                       keep_frac: float = 0.25) -> DataFrame:
    """Quality-based corpus selection: keep the documents whose
    ``score`` reaches the (1-keep_frac) exact interpolated percentile
    (ties at the threshold are kept). The threshold is ONE full
    aggregate pass materialized as a driver scalar — inherent to any
    global-quantile selection; at cluster scale swap ``percentile``
    for ``approx_percentile`` with a tolerance contract (identical
    plan shape, same as tests/test_approx_fallbacks.py).

    Output: input columns + ``quality_sel_score``."""
    scored = documents.withColumn("quality_sel_score", score)
    th = scored.agg(
        F.expr(f"percentile(quality_sel_score, {1.0 - keep_frac})")).first()[0]
    if th is None:  # empty input
        return scored
    return scored.filter(F.col("quality_sel_score") >= F.lit(th))


# ------------------------------------------------- stratified sampling
def stratified_sample(documents: DataFrame,
                      fractions: dict[str, float],
                      stratum_col: str = "lang",
                      default_fraction: float = 0.0,
                      salt: str = "strat") -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff
    md5(salt || doc_id) mod 10^6 < fraction * 10^6 for its stratum.
    Content-independent, engine-reproducible, and stable under
    re-partitioning — none of which holds for sampleBy's RNG. The
    corpus-mixing primitive (per-language/source weights)."""
    gate = md5_long(F.concat(F.lit(salt), F.col("doc_id").cast("string"))) % 1_000_000
    frac = F.lit(default_fraction)
    for stratum, f in sorted(fractions.items()):
        frac = F.when(F.col(stratum_col) == stratum, F.lit(f)).otherwise(frac)
    return documents.filter(gate < (frac * 1_000_000).cast("long"))
