"""Unit vectors for the scalar function library — the golden cases
SURVEY §5 extracts from the reference (name cleaning, company-number
validation, individual-vs-company classification, similarity ladder)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from database_convertor_spark.functions import cleaning, similarity, text
from database_convertor_spark.operators.entity_resolution import is_likely_individual


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def _eval_on(spark, data, fn):
    df = spark.createDataFrame([(d,) for d in data], ["s"])
    return [r.v for r in df.select(fn(F.col("s")).alias("v")).collect()]


def test_clean_officer_name(spark):
    # reference golden cases: app.py:805-842 ("MR JOHN MICHAEL SMITH" ->
    # "John Smith"; "Smith, John" -> "John Smith")
    out = _eval_on(spark, ["MR JOHN MICHAEL SMITH", "Smith, John", "DR JANE DOE OBE",
                           "MADONNA"], cleaning.clean_officer_name)
    assert out == ["John Smith", "John Smith", "Jane Doe", "Madonna"]


def test_clean_company_name(spark):
    out = _eval_on(spark, ["Acme Widgets Limited", "FOO BAR LTD.", "Plain Name"],
                   cleaning.clean_company_name)
    assert out == ["ACME WIDGETS", "FOO BAR", "PLAIN NAME"]


def test_normalize_company_name(spark):
    out = _eval_on(spark, ["  Acme,  Widgets! Ltd ", "O'Brien & Co-Op"],
                   cleaning.normalize_company_name)
    assert out == ["acme widgets ltd", "o'brien co-op"]


def test_validate_company_number(spark):
    # utils.py:18-24 patterns: 8 digits | 2 letters + 6 digits | letter + 7 digits
    out = _eval_on(spark, ["12345678", "SC123456", "R1234567", "1234", "ABC12345"],
                   cleaning.validate_company_number)
    assert out == [True, True, True, False, False]


def test_pad_company_number(spark):
    assert _eval_on(spark, ["1234"], cleaning.pad_company_number) == ["00001234"]


def test_extract_postcode(spark):
    out = _eval_on(spark, ["10 Downing St, London SW1A 2AA", "no postcode here"],
                   cleaning.extract_postcode)
    assert out == ["SW1A 2AA", ""]


def test_is_likely_individual(spark):
    # applicant_processor.py:104-125: title prefix OR (no suffix AND 2-3 words)
    out = _eval_on(spark, ["Mr John Smith", "John Smith", "Acme Developments Limited",
                           "John", "Barratt Homes Eastern Counties Division"],
                   is_likely_individual)
    assert out == [True, True, False, False, False]


def test_levenshtein_similarity(spark):
    df = spark.createDataFrame([("kitten", "sitting"), ("abc", "abc")], ["a", "b"])
    out = [round(r.v, 4) for r in df.select(
        similarity.levenshtein_similarity(F.col("a"), F.col("b")).alias("v")).collect()]
    assert out == [round(1 - 3 / 7, 4), 1.0]


def test_token_jaccard_subset_boost(spark):
    df = spark.createDataFrame([("acme widgets", "acme widgets limited"),
                                ("alpha beta", "gamma delta")], ["a", "b"])
    ts = similarity.token_set
    out = [round(r.v, 4) for r in df.select(
        similarity.token_jaccard_with_subset_boost(
            ts(F.col("a")), ts(F.col("b"))).alias("v")).collect()]
    # 2/3 + 0.2 subset boost; 0 overlap
    assert out == [round(2 / 3 + 0.2, 4), 0.0]


def test_sequence_ratio_matches_difflib(spark):
    from difflib import SequenceMatcher
    pairs = [("acme widgets", "acme wigets"), ("abc", "xyz")]
    df = spark.createDataFrame(pairs, ["a", "b"])
    out = [r.v for r in df.select(
        similarity.sequence_ratio(F.col("a"), F.col("b")).alias("v")).collect()]
    expected = [SequenceMatcher(None, a, b).ratio() for a, b in pairs]
    assert out == pytest.approx(expected)


def test_cosine_similarity(spark):
    df = spark.createDataFrame([([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])],
                               ["a", "b"])
    out = [round(r.v, 6) for r in df.select(
        similarity.cosine_similarity(F.col("a"), F.col("b")).alias("v")).collect()]
    assert out == [0.0, 1.0]


def test_shingles(spark):
    out = _eval_on(spark, ["a b c d", "a b"], lambda c: text.shingles(c, 3))
    assert out == [["a b c", "b c d"], ["a b"]]


def test_detect_language(spark):
    out = _eval_on(spark, ["the cat and the dog is here", "el perro es de la casa",
                           "xyzzy plugh"], text.detect_language)
    assert out == ["en", "es", "und"]


def test_format_address(spark):
    df = spark.createDataFrame([("1 Main St", "", "London")], ["a", "b", "c"])
    out = df.select(cleaning.format_address(
        F.col("a"), F.col("b"), F.col("c")).alias("v")).collect()[0].v
    assert out == "1 Main St, London"


def test_extract_contact_fields(spark):
    text = ("Applicant: Jane Doe\n"
            "Company: Acme Widgets Ltd\n"
            "Tel: 020 7946 0000\n"
            "reach us at jane.doe@acme.co.uk today")
    df = spark.createDataFrame([(text,), ("no contacts here",)], ["s"])
    out = [r.v for r in df.select(
        cleaning.extract_contact_fields(F.col("s")).alias("v")).collect()]
    assert out[0].name == "Jane Doe"
    assert out[0].company == "Acme Widgets Ltd"
    assert out[0].telephone == "020 7946 0000"
    assert out[0].email == "jane.doe@acme.co.uk"
    assert out[1] == ("", "", "", "")


def test_extract_city(spark):
    out = _eval_on(spark, ["1 High St, Greater London, SW1A 2AA",
                           "5 Deansgate, Manchester M1 1AA",
                           "Flat 2, 9 Side Rd, Sometown, XX1 1XX",
                           "no commas no city"], cleaning.extract_city)
    assert out == ["London", "Manchester", "Sometown", ""]


def test_format_officer_list(spark):
    df = spark.createDataFrame(
        [([("Jane Doe", "director"), ("John Roe", "secretary")],)],
        "officers: array<struct<name:string, role:string>>")
    out = df.select(cleaning.format_officer_list(
        F.col("officers")).alias("v")).collect()[0].v
    assert out == "Jane Doe (director); John Roe (secretary)"


def test_friendly_date(spark):
    import datetime as dt
    df = spark.createDataFrame(
        [(dt.date(2023, 6, 23),), (dt.date(2023, 6, 1),),
         (dt.date(2023, 6, 11),), (dt.date(2023, 6, 22),)], ["d"])
    out = [r.v for r in df.select(
        cleaning.friendly_date(F.col("d")).alias("v")).collect()]
    assert out == ["Friday 23rd June 2023", "Thursday 1st June 2023",
                   "Sunday 11th June 2023", "Thursday 22nd June 2023"]


def test_enrichment_cost(spark):
    df = spark.createDataFrame([(3, 10)], ["li", "em"])
    out = df.select(cleaning.enrichment_cost(
        F.col("li"), F.col("em")).alias("v")).collect()[0].v
    assert out == 0.80


def test_render_array_preview(spark):
    df = spark.createDataFrame([(["a", "b", "c", "d", "e"],), (["a"],)], ["arr"])
    out = [r.v for r in df.select(
        cleaning.render_array_preview(F.col("arr")).alias("v")).collect()]
    assert out == ["a b c +2 more", "a"]


def test_url_functions_c12_c30(spark):
    df = spark.createDataFrame(
        [("https://portal.gov.uk/planning/", "applicationDetails.do?keyVal=ABC123&amp;x=1"),
         ("https://portal.gov.uk/planning", "/search.do?activeTab=details&keyVal=XY9"),
         ("https://portal.gov.uk/", "http://other.com/app")],
        ["base", "href"])
    url = cleaning.fix_html_entities(
        cleaning.absolutize_url(F.col("base"), F.col("href")))
    out = df.select(url.alias("u"),
                    cleaning.extract_keyval(url).alias("kv"),
                    cleaning.ensure_summary_url(url).alias("s")).collect()
    # relative (no leading slash) joined against rstripped base, &amp; fixed
    assert out[0].u == "https://portal.gov.uk/planning/applicationDetails.do?keyVal=ABC123&x=1"
    assert out[0].kv == "ABC123"
    assert out[0].s.endswith("?keyVal=ABC123&x=1&activeTab=summary")
    # leading-slash relative; existing activeTab rewritten in place
    assert out[1].u == "https://portal.gov.uk/planning/search.do?activeTab=details&keyVal=XY9"
    assert out[1].kv == "XY9"
    assert "activeTab=summary" in out[1].s and "activeTab=details" not in out[1].s
    # absolute href passes through; no keyVal -> ''; '?' appended
    assert out[2].u == "http://other.com/app"
    assert out[2].kv == ""
    assert out[2].s == "http://other.com/app?activeTab=summary"


def test_select_gb_linkedin_c32(spark):
    from database_convertor_spark.operators.entity_resolution import (
        select_gb_linkedin,
    )
    rows = [
        # key 1: non-GB filtered out; direct city match beats earlier profile
        (1, 1, "US", "London", "https://uk.linkedin.com/in/a", "london"),
        (1, 2, "GB", "Bristol", "https://uk.linkedin.com/in/b", "london"),
        (1, 3, "GB", "Greater London", "https://uk.linkedin.com/in/c", "london"),
        # key 2: no direct, alias leeds<->west yorkshire
        (2, 1, "GB", "Somewhere", "https://uk.linkedin.com/in/d", "leeds"),
        (2, 2, "GB", "West Yorkshire", "https://uk.linkedin.com/in/e", "leeds"),
        # key 3: direct match has invalid URL -> falls back to first GB
        (3, 1, "GB", "Hull", "https://uk.linkedin.com/in/f", "york"),
        (3, 2, "GB", "York", "N/A", "york"),
        # key 4: nothing valid
        (4, 1, "GB", "York", "N/A", None),
    ]
    df = spark.createDataFrame(
        rows, ["k", "seq", "country_code", "city", "url", "company_city"])
    got = {r.k: r.linkedin_url
           for r in select_gb_linkedin(df, "k").collect()}
    assert got[1] == "https://uk.linkedin.com/in/c"
    assert got[2] == "https://uk.linkedin.com/in/e"
    assert got[3] == "https://uk.linkedin.com/in/f"
    assert got[4] is None


def test_gopher_signals_and_filter(spark):
    from database_convertor_spark.functions.text import (
        gopher_passes,
        gopher_signals,
    )
    clean = " ".join(f"word{i}" for i in range(60))
    repetitive = "same line\nsame line\nsame line\nother line"
    bullety = "- one\n- two\n- three"
    dotty = "first part...\nsecond part...\nthird"
    df = spark.createDataFrame(
        [(1, clean), (2, repetitive), (3, bullety), (4, dotty)],
        ["doc_id", "text"])
    s = gopher_signals(F.col("text"))
    out = {r.doc_id: r for r in df.select(
        "doc_id", *[c.alias(n) for n, c in s.items()],
        gopher_passes(F.col("text")).alias("passes")).collect()}
    assert out[1].n_words == 60 and out[1].dup_word_frac == 0.0
    assert out[1].passes                                    # clean doc kept
    assert out[2].dup_line_frac == 0.5                      # 4 lines, 2 distinct
    assert not out[2].passes                                # dup lines + short
    assert out[3].bullet_line_frac == 1.0
    assert out[4].ellipsis_line_frac == round(2 / 3, 4)


def test_normalize_text_for_training_goldens(spark):
    """Unicode NFC composition, control stripping, whitespace
    collapse, end trim — the pre-training normalization contract."""
    from database_convertor_spark.functions.text import (
        normalize_text_for_training,
    )
    rows = [
        ("cafe\u0301",),                     # decomposed -> composed
        ("a\x00b\x07c",),                   # C0 controls -> spaces,
                                              # then collapsed
        ("a\tb  c",),                        # tab + runs -> one space
        ("  line one  \n  line two  \n",),  # newline-adjacent trim
        ("da\u0085sh",),                     # C1 control stripped
        ("",),
    ]
    df = spark.createDataFrame(rows, ["text"])
    got = [r.out for r in df.select(
        normalize_text_for_training(F.col("text")).alias("out")).collect()]
    assert got[0] == "caf\u00e9" and len(got[0]) == 4
    assert got[1] == "a b c"
    assert got[2] == "a b c"
    assert got[3] == "line one\nline two"
    assert got[4] == "da sh"
    assert got[5] == ""


def test_top_terms_heavy_hitters_equals_exact_both_regimes(spark):
    """The two-pass Misra-Gries top-k must equal the exact aggregate in
    BOTH regimes: certificate-passing (generous capacity, sketch path)
    and certificate-failing (capacity=1 forces the exact fallback)."""
    from database_convertor_spark.operators.text_analysis import (
        top_terms_heavy_hitters,
        top_terms_per_lang,
    )
    from database_convertor_spark.sources.readers import read_table

    from .conftest import SF_SMALL

    docs = read_table(spark, SF_SMALL, "documents")
    exact = sorted(map(tuple, top_terms_per_lang(docs, k=5).collect()))
    sketch = sorted(map(tuple,
                        top_terms_heavy_hitters(docs, k=5,
                                                capacity=2048).collect()))
    fallback = sorted(map(tuple,
                          top_terms_heavy_hitters(docs, k=5,
                                                  capacity=1).collect()))
    assert sketch == exact
    assert fallback == exact


def test_top_terms_heavy_hitters_null_lang_group(spark):
    """A NULL-lang group can't ride the sketch's equi-join — it must
    arrive via the exact fallback, matching the exact aggregate."""
    from database_convertor_spark.operators.text_analysis import (
        top_terms_heavy_hitters,
        top_terms_per_lang,
    )
    docs = spark.createDataFrame(
        [(1, "alpha alpha beta", "en"),
         (2, "gamma gamma gamma delta", None),
         (3, "beta beta alpha", "en")],
        "doc_id long, text string, lang string")
    a = sorted(map(tuple, top_terms_heavy_hitters(docs, k=2).collect()),
               key=lambda r: (r[0] or "", r[1:]))
    b = sorted(map(tuple, top_terms_per_lang(docs, k=2).collect()),
               key=lambda r: (r[0] or "", r[1:]))
    assert a == b
    assert any(r[0] is None for r in a)


def test_top_terms_heavy_hitters_broadcast_guard_regime(spark):
    """Above the broadcast-candidate cap the sketch cannot pay for
    itself — the operator must return the plain exact aggregate."""
    from database_convertor_spark.operators.text_analysis import (
        top_terms_heavy_hitters,
        top_terms_per_lang,
    )
    from database_convertor_spark.sources.readers import read_table

    from .conftest import SF_SMALL

    docs = read_table(spark, SF_SMALL, "documents")
    a = sorted(map(tuple, top_terms_heavy_hitters(
        docs, k=5, max_broadcast_candidates=1).collect()))
    b = sorted(map(tuple, top_terms_per_lang(docs, k=5).collect()))
    assert a == b


def test_dsir_weights_match_python_reference(spark):
    """Exact twin check: the hashed-unigram log-ratio formula computed
    in pure Python (hashlib md5 bucket twin, add-1 smoothing) must
    reproduce dsir_logprob to the rounded 4dp, and empty docs carry
    n_tokens=0 with a NULL weight."""
    import math

    from pyspark.sql import functions as F

    from database_convertor_spark.functions.text import _hash_const
    from database_convertor_spark.operators.text_analysis import (
        dsir_importance_weights,
    )

    corpus = {1: ("en", "Alpha alpha beta"),
              2: ("fr", "gamma gamma gamma"),
              3: ("en", "beta gamma"),
              4: ("en", "")}
    docs = spark.createDataFrame(
        [(i, lang, text) for i, (lang, text) in corpus.items()],
        ["doc_id", "lang", "text"])
    B = 65536
    raw, tgt = {}, {}
    for _i, (lang, text) in corpus.items():
        for tok in text.lower().split():
            b = _hash_const(tok) % B
            raw[b] = raw.get(b, 0) + 1
            if lang == "en":
                tgt[b] = tgt.get(b, 0) + 1
    nr, nt = sum(raw.values()), sum(tgt.values())
    lr = {b: math.log((tgt.get(b, 0) + 1.0) / (nt + B))
          - math.log((c + 1.0) / (nr + B)) for b, c in raw.items()}
    expect = {}
    for i, (lang, text) in corpus.items():
        toks = text.lower().split()
        if not toks:
            expect[i] = (0, None)
        else:
            m = sum(lr[_hash_const(t) % B] for t in toks) / len(toks)
            expect[i] = (len(toks), round(m, 4))
    got = {r.doc_id: (r.n_tokens, r.dsir_logratio)
           for r in dsir_importance_weights(
               docs, F.col("lang") == "en", num_buckets=B).collect()}
    assert got == expect
    # direction: the all-target-token doc outranks the all-French doc
    assert got[1][1] > got[2][1]


def test_perplexity_buckets_golden(spark):
    """Tercile labels on a hand-built corpus: within each language the
    higher-logprob (more typical) docs land in 'head'; empty docs get
    a NULL bucket; a NULL-lang doc forms its own stratum (trivially
    'head' as its only member)."""
    from pyspark.sql import functions as F

    from database_convertor_spark.operators.text_analysis import (
        perplexity_buckets,
    )

    # lang en: doc 1 uses only the most frequent token -> highest
    # logprob; doc 3 uses a hapax -> lowest; doc 2 in between
    docs = spark.createDataFrame(
        [(1, "en", "common common common"),
         (2, "en", "common middling"),
         (3, "en", "rareword"),
         (4, None, "solo text here"),
         (5, "en", "")],
        ["doc_id", "lang", "text"])
    got = {r.doc_id: r.ppl_bucket
           for r in perplexity_buckets(docs).collect()}
    assert got[1] == "head" and got[2] == "middle" and got[3] == "tail"
    assert got[4] == "head"          # singleton stratum: t1 = t2 = own lp
    assert got[5] is None            # empty doc -> NULL bucket
    # row count preserved
    assert perplexity_buckets(docs).count() == 5


def _py_quality_score(text: str | None) -> int:
    """Pure-Python twin of functions.text.quality_score (the NB seed)."""
    import re

    if text is None:
        return 0
    toks = [t for t in re.split(r"\s+", text) if t]
    ltoks = [t for t in re.split(r"\s+", text.lower()) if t]
    n = len(toks)
    mtl = (sum(len(t) for t in toks) / n) if n else 0.0
    pr = (len(re.findall(r"[^\w\s]", text)) / len(text)) if text else 0.0
    from database_convertor_spark.functions.text import EN_STOPWORDS
    sw = set(EN_STOPWORDS)
    sr = (sum(1 for t in ltoks if t in sw) / len(ltoks)) if ltoks else 0.0
    return ((25 if n >= 20 else 0)
            + (25 if 3.0 <= mtl <= 12.0 else 0)
            + (25 if pr < 0.2 else 0)
            + (25 if sr > 0.01 else 0))


def _py_naive_bayes(corpus: dict[int, str | None], seed_threshold=100,
                    vocab_cap=50_000, min_count=2):
    """Pure-Python replica of operators.text_analysis.naive_bayes_quality."""
    import math

    seed = {i: _py_quality_score(t) >= seed_threshold
            for i, t in corpus.items()}
    doc_toks = {i: (t or "").lower().split() for i, t in corpus.items()}
    n_cnt: dict[str, int] = {}
    p_cnt: dict[str, int] = {}
    for i, toks in doc_toks.items():
        for t in toks:
            n_cnt[t] = n_cnt.get(t, 0) + 1
            if seed[i]:
                p_cnt[t] = p_cnt.get(t, 0) + 1
    vocab = sorted((t for t, c in n_cnt.items() if c >= min_count),
                   key=lambda t: (-n_cnt[t], t))[:vocab_cap]
    tp = float(sum(p_cnt.get(t, 0) for t in vocab))
    tn = float(sum(n_cnt[t] - p_cnt.get(t, 0) for t in vocab))
    v = float(len(vocab))
    w = {t: (math.log(p_cnt.get(t, 0) + 1) - math.log(tp + v)
             - math.log(n_cnt[t] - p_cnt.get(t, 0) + 1) + math.log(tn + v))
         for t in vocab}
    b = (math.log(sum(seed.values()) + 1)
         - math.log(sum(1 for s in seed.values() if not s) + 1))
    out = {}
    for i, toks in doc_toks.items():
        invocab = [t for t in toks if t in w]
        score = round(b + sum(w[t] for t in invocab), 4)
        out[i] = (seed[i], len(invocab), score, score > 0)
    return out


def test_naive_bayes_quality_match_python_reference(spark):
    """Golden twin: tiny corpus incl. empty, NULL-text, and OOV-only
    docs; the Spark operator must reproduce the pure-Python replica's
    seed_hq / n_vocab_tokens / nb_score / predicted_hq exactly."""
    from pyspark.sql import types as T

    from database_convertor_spark.operators.text_analysis import (
        naive_bayes_quality,
    )

    hq_text = ("the quick brown fox jumps over the lazy dog and then "
               "runs far away into the deep green forest tonight again")
    corpus: dict[int, str | None] = {
        1: hq_text,
        2: hq_text + " with some extra words appended for variety here",
        3: "zz!!! xx@@ yy##",                     # junk, seed-negative
        4: "",                                    # empty: prior-only row
        5: None,                                  # NULL text: prior-only
        6: "hapaxone hapaxtwo hapaxthree",        # OOV-only (min_count=2)
        7: "quick brown fox runs into the forest",  # short, HQ vocab
    }
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    docs = spark.createDataFrame(list(corpus.items()), schema)
    expect = _py_naive_bayes(corpus)
    got = {r.doc_id: (r.seed_hq, r.n_vocab_tokens, r.nb_score,
                      r.predicted_hq)
           for r in naive_bayes_quality(docs).collect()}
    assert got == expect
    # structural guarantees the docstring claims
    assert got[4][1] == 0 and got[5][1] == 0 and got[6][1] == 0
    assert got[4][2] == got[5][2] == got[6][2]    # all score the prior


def test_naive_bayes_generalizes_past_seed(spark):
    """The docstring's claim, tested: a doc too short to pass the
    4-ratio heuristic (seed_hq=False) but written in the positive
    class's vocabulary is predicted high-quality — the learned model
    scores tokens, not the heuristic's ratios."""
    from database_convertor_spark.operators.text_analysis import (
        naive_bayes_quality,
    )

    hq = ("the quick brown fox jumps over the lazy dog and then runs "
          "far away into the deep green forest tonight again my friend")
    junk = "zzz@@@ qqq### www$$$ zzz@@@ qqq### www$$$"
    rows = ([(i, hq) for i in range(1, 6)]
            + [(i, junk) for i in range(6, 11)]
            + [(11, "quick brown fox runs into the deep forest")])
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in naive_bayes_quality(docs).collect()}
    assert got[1].seed_hq and got[1].predicted_hq
    assert not got[6].seed_hq and not got[6].predicted_hq
    # the divergence row: heuristic says no (7 tokens < 20), model says yes
    assert not got[11].seed_hq
    assert got[11].predicted_hq
    assert got[11].n_vocab_tokens > 0


def test_bigram_logprob_matches_python_reference(spark):
    """Exact twin: JM-interpolated bigram scores computed in pure
    Python must reproduce avg_bigram_logprob to the rounded 4dp;
    1-token and empty docs carry n_bigrams=0 with a NULL score; the
    in-order doc must outscore its shuffled twin (the word-order
    signal a unigram LM cannot see)."""
    import math

    from database_convertor_spark.operators.text_analysis import (
        doc_bigram_logprob,
    )

    corpus = {1: "the cat sat on the mat",
              2: "the cat sat on the mat",
              3: "mat the on sat cat the",     # shuffled word order
              4: "solo",
              5: ""}
    docs = spark.createDataFrame(
        [(i, t) for i, t in corpus.items()], ["doc_id", "text"])
    toks = {i: t.lower().split() for i, t in corpus.items()}
    uni, big = {}, {}
    for ts in toks.values():
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    tot = sum(uni.values())
    expect = {}
    for i, ts in toks.items():
        bgs = list(zip(ts, ts[1:]))
        if not bgs:
            expect[i] = (0, None)
        else:
            s = sum(math.log(0.75 * big[(a, b)] / uni[a]
                             + 0.25 * uni[b] / tot) for a, b in bgs)
            expect[i] = (len(bgs), round(s / len(bgs), 4))
    got = {r.doc_id: (r.n_bigrams, r.avg_bigram_logprob)
           for r in doc_bigram_logprob(docs).collect()}
    assert got == expect
    assert got[1][1] > got[3][1]    # order carries the signal


def test_vocab_stats_golden(spark):
    """Pure-Python twin of the per-language vocabulary QA report,
    including the hapax and top-share edges."""
    from database_convertor_spark.operators.text_analysis import (
        vocab_stats_by_lang,
    )
    docs = spark.createDataFrame(
        [(1, "en", "a a a b c"),        # 5 tokens, 3 types, hapax b c
         (2, "en", "a d"),              # d hapax
         (3, "fr", "x x")],
        ["doc_id", "lang", "text"])
    got = {r.lang: (r.n_tokens, r.n_types, r.type_token_ratio,
                    r.hapax_frac, r.top_share)
           for r in vocab_stats_by_lang(docs).collect()}
    # en: tokens a*4 b c d -> 7 occurrences, 4 types, 3 hapax, top a=4/7
    assert got["en"] == (7, 4, round(4 / 7, 4), 0.75, round(4 / 7, 4))
    # fr: x x -> 2 occ, 1 type, 0 hapax, top 1.0
    assert got["fr"] == (2, 1, 0.5, 0.0, 1.0)


def test_bpe_merges_golden(spark):
    """Hand-computed BPE chain (Sennrich 2016 semantics): word freqs
    the*3 cat*1 hat*1; ties break (count desc, pair asc) with the
    end-of-word marker '_' sorting before letters; the loop stops
    early when no adjacent pair remains (every word fully merged)."""
    from database_convertor_spark.operators.text_analysis import bpe_merges

    docs = spark.createDataFrame(
        [(1, "the the cat"), (2, "the hat")], "doc_id int, text string")
    got = [tuple(r) for r in bpe_merges(docs, n_merges=8).collect()]
    assert got == [
        (1, "e", "_", "e_", 3), (2, "h", "e_", "he_", 3),
        (3, "t", "he_", "the_", 3), (4, "a", "t", "at", 2),
        (5, "at", "_", "at_", 2), (6, "c", "at_", "cat_", 1),
        (7, "h", "at_", "hat_", 1)]


def test_bpe_merges_all_nonoverlapping_occurrences(spark):
    """The double-space REPLACE detail: 'x a b a b' holds TWO disjoint
    (a, b) occurrences sharing a boundary space under single-space
    padding — both must merge in one pass (the classic greedy rule),
    and the overlapping triple 'z z z' merges left-to-right into
    (zz, z), never (z, zz)."""
    from database_convertor_spark.operators.text_analysis import bpe_merges

    # one word 'ababab': pairs (a,b)x3, (b,a)x2 -> rank 1 = (a,b);
    # all three occurrences merge in the same pass, so rank 2 sees
    # 'ab ab ab _' and counts (ab,ab)x2
    docs = spark.createDataFrame([(1, "ababab")], "doc_id int, text string")
    got = [tuple(r)[:4] for r in bpe_merges(docs, n_merges=2).collect()]
    assert got == [(1, "a", "b", "ab"), (2, "ab", "ab", "abab")]
    # 'zzz': pairs (z,z)x2 overlapping -> ONE merge left-to-right
    # ('zz z _', never 'z zz _'); round 2 ties (zz,z) with (z,_) at
    # count 1 and 'z' < 'zz' picks (z,_)
    docs2 = spark.createDataFrame([(1, "zzz")], "doc_id int, text string")
    got2 = [tuple(r)[:4] for r in bpe_merges(docs2, n_merges=2).collect()]
    assert got2 == [(1, "z", "z", "zz"), (2, "z", "_", "z_")]


def test_bpe_token_counts_apply(spark):
    """Train-then-apply round trip: after the fixture's 7 learnable
    merges every covered word collapses to ONE token (fertility 1.0);
    a document with no ^[a-z]+$ words reports 0 with NULL fertility
    (the n_merges=8 request past the 7th merge is a no-op, mirroring
    the oracle's sentinel stages)."""
    from database_convertor_spark.operators.text_analysis import (
        bpe_token_counts,
    )

    docs = spark.createDataFrame(
        [(1, "the the cat"), (2, "the hat"), (3, "123 456!")],
        "doc_id int, text string")
    got = {r.doc_id: (r.n_words, r.n_bpe_tokens, r.bpe_fertility)
           for r in bpe_token_counts(docs, n_merges=8).collect()}
    assert got == {1: (3, 3, 1.0), 2: (2, 2, 1.0), 3: (0, 0, None)}


def test_bpe_fast_trainer_matches_sequential_reference(spark):
    """r8 verdict item 1: the fast trainer (one corpus scan + driver-
    side incremental pair-delta training) must emit the IDENTICAL
    merge table to the one-aggregate-per-merge sequential reference —
    at the oracle's 8 merges and deep into a real merge chain (120),
    on the real fixture corpus."""
    from database_convertor_spark.operators.text_analysis import (
        bpe_merges,
        bpe_merges_sequential,
    )
    from database_convertor_spark.sources.readers import read_table

    from .conftest import SF_SMALL

    docs = read_table(spark, SF_SMALL, "documents")
    for n, floor in ((8, 8), (120, 100)):
        fast = [tuple(r) for r in bpe_merges(docs, n_merges=n).collect()]
        seq = [tuple(r) for r in
               bpe_merges_sequential(docs, n_merges=n).collect()]
        # the fixture's word pool fully merges at 105 ranks — both
        # formulations must stop at the SAME early exhaustion point
        assert fast == seq and len(fast) >= floor


def test_bpe_apply_matches_replace_semantics_at_depth(spark):
    """The mapInPandas apply (rank-order monotone-cursor segmentation
    over distinct words) must reproduce the chained-REPLACE spec —
    checked against a pure-Python unrolled REPLACE simulator at 60
    merges, per document, on the fixture corpus."""
    import re

    from database_convertor_spark.operators.text_analysis import (
        bpe_merges,
        bpe_token_counts,
    )
    from database_convertor_spark.sources.readers import read_table

    from .conftest import SF_SMALL

    docs = read_table(spark, SF_SMALL, "documents").filter("doc_id < 120")
    merges = [tuple(r) for r in bpe_merges(docs, n_merges=60).collect()]

    def seg_len(word):
        syms = list(word) + ["_"]
        for _, a, b, merged, _ in merges:   # strict rank order
            out, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    want = {}
    for r in docs.select("doc_id", "text").collect():
        ws = [w for w in re.split(r"\s+", r.text.lower())
              if re.fullmatch(r"[a-z]+", w)]
        want[r.doc_id] = (len(ws), sum(seg_len(w) for w in ws))
    got = {r.doc_id: (r.n_words, r.n_bpe_tokens)
           for r in bpe_token_counts(docs, n_merges=60).collect()}
    assert got == want


def test_bpe_train_gate_and_caps(spark):
    """The driver-working-set gate raises BEFORE collecting, naming
    its remedies; min_count / word_cap restrict which words feed
    training (documented truncation), and either one satisfies a
    budget the full vocabulary exceeds."""
    import pytest as _pytest

    from database_convertor_spark.operators.text_analysis import bpe_merges

    docs = spark.createDataFrame(
        [(1, "aaa aaa aaa bbb bbb ccc"), (2, "aaa bbb ddd eee")],
        "doc_id int, text string")   # 5 distinct words, aaa cnt 4
    with _pytest.raises(ValueError, match="min_count"):
        bpe_merges(docs, n_merges=2, max_train_words=3)
    capped = [tuple(r)[:4] for r in bpe_merges(
        docs, n_merges=1, word_cap=1, max_train_words=3).collect()]
    assert capped == [(1, "a", "a", "aa")]   # trained on 'aaa' alone
    mc = [tuple(r) for r in bpe_merges(
        docs, n_merges=1, min_count=2, max_train_words=3).collect()]
    # aaa(4) + bbb(3) survive: (a,a) 2 non-overlapping x4 =8, argmax
    assert mc[0][:4] == (1, "a", "a", "aa") and mc[0][4] == 8


def test_bpe_byte_level_golden(spark):
    """Hand-computed GPT-2-style byte-level chain on 'low/lower':
    pre-tokens carry their leading space as the 'Ġ' byte symbol
    (space=0x20 -> U+0120 under the standard byte table), there is no
    end-of-word marker, and ties break (count desc, left asc, right
    asc) with 'Ġ…' sorting after ASCII."""
    from database_convertor_spark.operators.text_analysis import bpe_merges

    docs = spark.createDataFrame(
        [(1, "low low low"), (2, "lower lower")], "doc_id int, text string")
    got = [tuple(r) for r in
           bpe_merges(docs, n_merges=8, byte_level=True).collect()]
    G = "Ġ"   # the byte-level space symbol
    assert got == [
        (1, "l", "o", "lo", 5),
        (2, "lo", "w", "low", 5),
        (3, G, "low", G + "low", 3),
        (4, "e", "r", "er", 2),
        (5, "low", "er", "lower", 1),
        (6, G + "low", "er", G + "lower", 1)]


def test_bpe_byte_level_covers_all_bytes(spark):
    """Byte-level mode covers EVERY character (digits, punctuation,
    non-ASCII) — the gap the char-level ^[a-z]+$ mode documents. A
    2-byte UTF-8 char ('é' -> 0xC3 0xA9 -> 'Ã' '©') trains and merges
    across the mapped byte plane, and token counts see all pre-tokens."""
    from database_convertor_spark.operators.text_analysis import (
        bpe_merges,
        bpe_token_counts,
    )

    docs = spark.createDataFrame(
        [(1, "éé é")], "doc_id int, text string")
    got = [tuple(r) for r in
           bpe_merges(docs, n_merges=1, byte_level=True).collect()]
    # pre-tokens: 'éé' (1), ' é' (1); pairs: (Ã,©)x3, (©,Ã)x1, (Ġ,Ã)x1
    assert got == [(1, "Ã", "©", "Ã©", 3)]

    # with no merges at all, the budget is raw byte counts over ALL
    # pre-tokens: '123'(3 bytes) + ' !'(2) + 'é'(2) = 7 over 3 words
    docs2 = spark.createDataFrame(
        [(1, "123 !é")], "doc_id int, text string")
    row = bpe_token_counts(docs2, n_merges=0, byte_level=True).collect()[0]
    assert (row.n_words, row.n_bpe_tokens, row.bpe_fertility) == (
        3, 7, 2.3333)


def test_bpe_byte_level_apply_roundtrip(spark):
    """Train-then-apply in byte mode: after the 6 learnable merges of
    the low/lower fixture every pre-token collapses to ONE token."""
    from database_convertor_spark.operators.text_analysis import (
        bpe_token_counts,
    )

    docs = spark.createDataFrame(
        [(1, "low low low"), (2, "lower lower")], "doc_id int, text string")
    got = {r.doc_id: (r.n_words, r.n_bpe_tokens, r.bpe_fertility)
           for r in bpe_token_counts(docs, n_merges=6,
                                     byte_level=True).collect()}
    assert got == {1: (3, 3, 1.0), 2: (2, 2, 1.0)}


def test_bpe_char_mode_untouched_by_byte_flag(spark):
    """The char-level default's output is identical with the flag's
    existence (the existing oracles must not move): same frame with
    byte_level=False explicit and absent."""
    from database_convertor_spark.operators.text_analysis import bpe_merges

    docs = spark.createDataFrame(
        [(1, "the the cat"), (2, "the hat")], "doc_id int, text string")
    a = [tuple(r) for r in bpe_merges(docs, n_merges=8).collect()]
    b = [tuple(r) for r in
         bpe_merges(docs, n_merges=8, byte_level=False).collect()]
    assert a == b
    assert a[0] == (1, "e", "_", "e_", 3)
