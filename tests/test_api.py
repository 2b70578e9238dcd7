"""The user-facing Engine facade on a reference-shaped warehouse."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from database_convertor_spark.api import Engine
from database_convertor_spark.schemas import WAREHOUSE_SCHEMAS

TS = dt.datetime(2025, 1, 1)


def _pad(df, table):
    """Fill the warehouse table's missing columns with typed nulls."""
    missing = {f.name: F.lit(None).cast(f.dataType)
               for f in WAREHOUSE_SCHEMAS[table].fields
               if f.name not in df.columns}
    return df.withColumns(missing)


@pytest.fixture()
def engine(spark, tmp_path):
    eng = Engine(spark, str(tmp_path / "warehouse"))
    companies = spark.createDataFrame(
        [(1, "00000001", "ACME WIDGETS LIMITED", "active", TS),
         (2, "00000002", "BETA BUILDERS PLC", "active", TS),
         (3, "00000003", "GAMMA HOLDINGS LTD", "dissolved", TS)],
        ["id", "company_number", "company_name", "company_status", "updated_at"])
    eng.upsert("companies", _pad(companies, "companies"))
    officers = spark.createDataFrame(
        [(10, "o10"), (11, "o11"), (12, "o12")], ["id", "ch_officer_id"])
    eng.upsert("officers", officers)
    appointments = spark.createDataFrame(
        # officer 10 sits on companies 1+2; officer 11 on 2+3; 12 on 1
        [(100, 10, 1, "director", dt.date(2020, 1, 1)),
         (101, 10, 2, "director", dt.date(2020, 1, 1)),
         (102, 11, 2, "secretary", dt.date(2021, 1, 1)),
         (103, 11, 3, "director", dt.date(2021, 1, 1)),
         (104, 12, 1, "director", dt.date(2022, 1, 1))],
        ["id", "officer_id", "company_id", "role", "appointed_on"])
    eng.upsert("appointments", appointments)
    enrichment = spark.createDataFrame(
        [(1000, 1, "hunter", True, '{"domain":"acme.com"}', TS),
         (1001, 1, "apollo", False, None, TS),
         (1002, 2, "hunter", True, '{"domain":"beta.com"}', TS)],
        ["id", "company_id", "provider", "success", "enrichment_data",
         "created_at"])
    eng.upsert("enrichment_data", enrichment)
    contacts = spark.createDataFrame(
        [(1, 1, "email", "a@acme.com", "hunter", 0.9, "verified", TS),
         (2, 1, "email", "b@acme.com", "pattern", 0.5, "unverified", TS),
         (3, 2, "phone", "123", "scrape", 0.7, "unverified", TS)],
        ["id", "company_id", "contact_type", "contact_value", "source",
         "confidence_score", "verification_status", "created_at"])
    eng.upsert("contacts", contacts)
    return eng


def test_search_companies(engine):
    got = {r.company_number for r in
           engine.search_companies("acme").collect()}
    assert got == {"00000001"}
    # status filter (F3)
    got = {r.company_number for r in
           engine.search_companies("0000000", status="active").collect()}
    assert got == {"00000001", "00000002"}


def test_companies_with_enrichment_map(engine):
    rows = {r.company_number: r.enrichment
            for r in engine.companies_with_enrichment().collect()}
    assert set(rows["00000001"]) == {"hunter", "apollo"}
    assert rows["00000003"] is None  # left join keeps unenriched


def test_stats_and_success_rate(engine):
    stats = {r.table: r.n for r in engine.get_stats().collect()}
    assert stats["companies"] == 3 and stats["appointments"] == 5
    rate = engine.enrichment_success_rate().collect()[0]
    assert rate.n_total == 3
    assert rate.n_companies_enriched == 2
    assert rate.success_rate_pct == round(100.0 * 2 / 3, 2)


def test_officer_network(engine):
    engine.refresh_officer_edges(min_shared=1)
    net = {r.neighbor_id: r.shared_officer_count
           for r in engine.company_network(2).collect()}
    # company 2 shares officer 10 with company 1 and officer 11 with 3
    assert net == {1: 1, 3: 1}


def test_contact_breakdown_and_priority_pick(engine):
    bd = {(r.dimension, r.value): r.n
          for r in engine.contact_breakdown().collect()}
    assert bd[("contact_type", "email")] == 2
    assert bd[("source", "hunter")] == 1
    assert bd[("verification_status", "unverified")] == 2
    primary = {r.company_id: r.contact_value
               for r in engine.primary_contact_per_company().collect()}
    assert primary[1] == "a@acme.com"  # verified beats higher-anything


def test_sql_escape_hatch(engine):
    out = engine.sql("""
        SELECT company_status, count(*) AS n FROM companies GROUP BY 1
    """).collect()
    assert {(r.company_status, r.n) for r in out} == {("active", 2),
                                                      ("dissolved", 1)}


def test_upsert_is_idempotent_on_key(engine, spark):
    update = spark.createDataFrame(
        [(99, "00000001", "ACME WIDGETS (RENAMED) LIMITED", "active", TS)],
        ["id", "company_number", "company_name", "company_status", "updated_at"])
    merged = engine.upsert("companies", _pad(update, "companies"))
    rows = {r.company_number: r.company_name for r in merged.collect()}
    assert rows["00000001"] == "ACME WIDGETS (RENAMED) LIMITED"
    assert len(rows) == 3


def test_merged_enrichment_first_wins(engine, spark):
    # add an apollo success for company 1 so priority ordering matters:
    # clearbit absent, hunter (priority 2) beats apollo (priority 3)
    extra = spark.createDataFrame(
        [(1003, 1, "apollo", True,
          '{"domain":"acme.io","name":"Acme","technologies":["react"]}', TS),
         (1004, 2, "apollo", True,
          '{"technologies":["aws","go"]}', TS)],
        ["id", "company_id", "provider", "success", "enrichment_data",
         "created_at"])
    engine.upsert("enrichment_data", _pad(extra, "enrichment_data"))
    rows = {r.company_id: r for r in engine.merged_enrichment().collect()}
    assert rows[1].domain == "acme.com"          # hunter outranks apollo
    assert rows[1].domain_source == "hunter"
    assert rows[1].name == "Acme" and rows[1].name_source == "apollo"
    assert rows[1].technologies == ["react"]
    assert rows[2].technologies == ["aws", "go"]
    # failed rows are excluded entirely
    assert rows[1].n_providers == 2


def test_match_officer_emails_via_domains(spark, tmp_path):
    eng = Engine(spark, str(tmp_path / "wh2"))
    eng.upsert("officers", _pad(spark.createDataFrame(
        [(10, "o10", "John Smith"), (11, "o11", "Mary Jones")],
        ["id", "ch_officer_id", "name"]), "officers"))
    eng.upsert("appointments", _pad(spark.createDataFrame(
        [(100, 10, 1, "director", dt.date(2020, 1, 1), True),
         (101, 11, 2, "director", dt.date(2020, 1, 1), False)],
        ["id", "officer_id", "company_id", "role", "appointed_on",
         "is_active"]), "appointments"))
    domains = spark.createDataFrame(
        [(1, "acme.com"), (2, "beta.com")], ["company_id", "company_domain"])
    emails = spark.createDataFrame(
        [("john.smith@acme.com", "John", "Smith", "acme.com"),
         ("mary.jones@beta.com", "Mary", "Jones", "beta.com")],
        ["email", "first_name", "last_name", "company_domain"])
    got = {(r.officer_id, r.email): r.name_match_confidence
           for r in eng.match_officer_emails(emails, domains).collect()}
    assert got == {(10, "john.smith@acme.com"): 0.9}  # 11 is inactive


def test_pick_linkedin_profiles_facade(engine, spark):
    profiles = spark.createDataFrame(
        [(10, 1, "GB", "London", "https://uk.linkedin.com/in/a", "london"),
         (10, 2, "US", "London", "https://us.linkedin.com/in/b", "london")],
        ["officer_id", "seq", "country_code", "city", "url", "company_city"])
    got = {r.officer_id: r.linkedin_url
           for r in engine.pick_linkedin_profiles(profiles).collect()}
    assert got == {10: "https://uk.linkedin.com/in/a"}


def test_engine_excel_roundtrip_and_nb_quality(engine, spark, tmp_path):
    """The facade's S12/S17 pair round-trips in THIS image (stdlib
    codec path), and nb_quality surfaces the trained classifier."""
    df = spark.createDataFrame(
        [(1, "alpha", 2.5), (2, "beta & gamma", -1.0)],
        ["id", "name", "score"])
    path = str(tmp_path / "facade.xlsx")
    engine.export_excel(df, path)
    back = engine.import_excel(path)
    assert sorted(map(tuple, back.collect())) == [
        (1.0, "alpha", 2.5), (2.0, "beta & gamma", -1.0)]

    # repeated tokens on both sides so the min_count=2 vocabulary
    # carries signed weights (a single shared token degenerates to 0)
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog and then "
             "runs far away into the deep green forest tonight again"),
         (2, "zz!!! xx@@ zz!!! xx@@")],
        ["doc_id", "text"])
    out = {r.doc_id: r for r in engine.nb_quality(docs).collect()}
    assert out[1].seed_hq and not out[2].seed_hq
    assert out[1].nb_score > 0 > out[2].nb_score


def test_engine_winnow_dedup_and_token_counts(engine, spark):
    """The facade surfaces the winnowing pair detector and the
    two-tokenizer counts."""
    base = ("shared corpus content that repeats across these two "
            "documents nearly verbatim for the detector to find")
    docs = spark.createDataFrame(
        [(1, base), (2, base + " plus a small tail"),
         (3, "an unrelated piece of text about entirely other things "
             "with no overlap at all")],
        ["doc_id", "text"])
    pairs = engine.winnow_dedup(docs).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(1, 2)}

    counts = {r.doc_id: r for r in engine.token_counts(
        docs.withColumn("lang", F.lit("en"))).collect()}
    assert counts[1].n_ws_tokens == len(base.split())
    assert counts[1].n_bpe_ish_tokens >= counts[1].n_ws_tokens


def test_engine_search_and_keywords(engine, spark):
    """The facade surfaces BM25 ranked search (the ES match-query
    analog) and per-doc TF-IDF keywords."""
    docs = spark.createDataFrame(
        [(1, "merge join strategies for large tables"),
         (2, "broadcast join with a small build side join join"),
         (3, "window functions and ranking")],
        ["doc_id", "text"])
    hits = engine.search_documents(docs, "join", top_k=2).collect()
    assert [r.doc_id for r in hits] == [2, 1]  # tf saturation ranks 2 first
    kws = engine.keywords(docs, k=1).collect()
    by_doc = {r.doc_id: r.term for r in kws}
    assert by_doc[3] in {"and", "functions", "ranking", "window"}
    assert len(kws) == 3


def test_engine_train_bpe(engine, spark):
    """The facade surfaces BPE tokenizer training: the learned merge
    table starts from the corpus's most frequent adjacent pair."""
    docs = spark.createDataFrame(
        [(1, "the the cat"), (2, "the hat")], ["doc_id", "text"])
    merges = engine.train_bpe(docs, n_merges=3).collect()
    assert [(r["rank"], r.merged) for r in merges] == [
        (1, "e_"), (2, "he_"), (3, "the_")]


def test_engine_bpe_token_budget(engine, spark):
    """Train + apply in one facade call: the fixture's words each
    collapse to one learned token."""
    docs = spark.createDataFrame(
        [(1, "the the cat"), (2, "the hat")], ["doc_id", "text"])
    got = {r.doc_id: (r.n_words, r.n_bpe_tokens)
           for r in engine.bpe_token_budget(docs).collect()}
    assert got == {1: (3, 3), 2: (2, 2)}


def test_engine_ingest_documents_pins_pair_path(engine, spark):
    """Round-9 ADVICE closure: the facade exposes pair_path so a
    repeated caller can pin one pair semantics for a whole logical
    ingest (the 'auto' gate can flip semantics between batches). A
    pinned 'lsh' call must bypass the gate entirely — no budget raise
    even with max_block_pairs=0 — and match the pipeline function."""
    from database_convertor_spark.pipelines.corpus import ingest_documents

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta", "en", "s", 35),
         (2, "one two three four five six seven", "en", "s", 33)],
        ["doc_id", "text", "lang", "source", "n_chars"])
    new = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta", "en", "s", 35),
         (11, "totally different text with fresh words", "en", "s", 40)],
        ["doc_id", "text", "lang", "source", "n_chars"])
    got = sorted(r.doc_id for r in engine.ingest_documents(
        new, corpus, max_block_pairs=0, pair_path="lsh").collect())
    want = sorted(r.doc_id for r in ingest_documents(
        new, corpus, pair_path="lsh").collect())
    assert got == want == [11]   # the corpus near-dup is dropped


def test_engine_curate_corpus_keep_best(engine, spark):
    """keep='best_quality' flips the cluster survivor from min-id to
    highest-quality_score (the stopword-bearing twin scores 100 vs the
    stopword-free twin's 75), and rejects unknown policies. Both twins
    pass Gopher (>=50 alphabetic words, mean len in [3,10]) and land
    in the same (lang, n_chars//100) block with token Jaccard ~0.96."""
    import pytest

    content = [f"alpha{a}{b}" for a in "abcdefgh" for b in "abcdefg"][:55]
    low = " ".join(content)                       # no stopwords -> 75
    high = " ".join(content + ["the", "and"])     # stopwords -> 100
    other = " ".join(f"omega{a}{b}" for a in "abcdefgh"
                     for b in "abcdefg")[: len(low)] + " the"
    docs = spark.createDataFrame(
        [(1, low, "en", "s", len(low)),
         (2, high, "en", "s", len(high)),
         (3, other, "en", "s", len(other))],
        ["doc_id", "text", "lang", "source", "n_chars"])
    kept_min = sorted(r.doc_id for r in
                      engine.curate_corpus(docs, threshold=0.3).collect())
    best_df = engine.curate_corpus(docs, threshold=0.3,
                                   keep="best_quality")
    kept_best = sorted(r.doc_id for r in best_df.collect())
    assert kept_min == [1, 3]        # min-id survivor
    assert kept_best == [2, 3]       # quality survivor
    assert "__q" not in best_df.columns
    with pytest.raises(ValueError, match="keep="):
        engine.curate_corpus(docs, keep="longest")


def test_engine_ann_sq8_matches_operator(engine, spark):
    from database_convertor_spark.operators.similarity_search import sq8_topk
    from database_convertor_spark.sources.readers import read_table

    from .conftest import SF_SMALL

    emb = read_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(emb.vec_id < 3)
    got = sorted(map(tuple, engine.ann_sq8(queries, emb, k=3).collect()))
    want = sorted(map(tuple, sq8_topk(queries, emb, k=3).collect()))
    assert got == want
