"""String / name / address cleaning — SURVEY §2.7 C1-C14, C26-C31.

Everything here is a pure Column expression (JVM-side, codegen'd).
The reference applies these per Python row; as column expressions
Catalyst folds constants, eliminates common subexpressions (replacing
the reference's lru_cache, applicant_processor.py:66) and keeps the
whole projection inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Personal titles stripped by clean_officer_name (reference app.py:805-842,
# winning definition; also contact_enrichment.py:270-287).
_TITLES = ["MR", "MRS", "MS", "MISS", "DR", "PROF", "SIR", "DAME",
           "LORD", "LADY", "OBE", "MBE", "CBE", "JP", "QC"]
_TITLE_RE = r"(?i)\b(" + "|".join(_TITLES) + r")\b\.?"

# Company suffixes stripped by clean_company_name (reference
# utils.py:181-200 and the 20-suffix table applicant_processor.py:31-51).
_COMPANY_SUFFIXES = [
    "LIMITED LIABILITY PARTNERSHIP", "PUBLIC LIMITED COMPANY",
    "LIMITED", "HOLDINGS", "GROUP", "LTD", "PLC", "LLP", "LP",
    "CO", "COMPANY", "CORP", "CORPORATION", "INC", "INCORPORATED",
    "& CO", "AND CO", "UK", "GB",
]
_SUFFIX_RE = (r"\b(" + "|".join(s.replace("&", r"\&") for s in _COMPANY_SUFFIXES)
              + r")\.?\s*$")


def clean_officer_name(col: Column) -> Column:
    """'MR JOHN MICHAEL SMITH' -> 'John Smith'; 'Smith, John' -> 'John Smith'.

    Port of the reference's clean_officer_name (app.py:805-842): strip
    titles, swap 'Last, First' ordering, keep first + last token only,
    title-case.
    """
    c = F.regexp_replace(col, _TITLE_RE, "")
    c = F.regexp_replace(c, r"\s+", " ")
    c = F.trim(c)
    # "Last, First" -> "First Last"
    c = F.when(c.contains(","),
               F.concat_ws(" ",
                           F.trim(F.element_at(F.split(c, ","), 2)),
                           F.trim(F.element_at(F.split(c, ","), 1)))
               ).otherwise(c)
    toks = F.split(F.trim(c), r"\s+")
    first_last = F.when(F.size(toks) >= 2,
                        F.concat_ws(" ", F.element_at(toks, 1), F.element_at(toks, -1))
                        ).otherwise(F.concat_ws(" ", toks))
    return F.initcap(first_last)


def clean_company_name(col: Column) -> Column:
    """Uppercase + strip legal suffixes + NBSP normalize (utils.py:181-200)."""
    c = F.upper(col)
    c = F.regexp_replace(c, " ", " ")
    c = F.regexp_replace(c, _SUFFIX_RE, "")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def normalize_company_name(col: Column) -> Column:
    """Lowercase, strip punctuation (keep '-' and apostrophe), collapse
    whitespace (applicant_processor.py:66-84)."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^a-z0-9\s'\-]", " ")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def normalize_borough_name(col: Column) -> Column:
    """'&'->'and', collapse whitespace, title-case (utils.py:323-365)."""
    c = F.regexp_replace(col, "&", " and ")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return F.initcap(c)


def validate_company_number(col: Column) -> Column:
    """UK company-number shape: 8 digits | 2 letters + 6 digits |
    1 letter + 7 digits (utils.py:10-26)."""
    cleaned = F.upper(F.regexp_replace(col, r"\s", ""))
    return cleaned.rlike(r"^(\d{8}|[A-Z]{2}\d{6}|[A-Z]\d{7})$")


def pad_company_number(col: Column) -> Column:
    """zfill(8) key normalization (app.py:2078)."""
    return F.lpad(col.cast("string"), 8, "0")


def guess_domain(col: Column) -> Column:
    """Company-name -> domain guess (utils.py:202-221): normalize, take
    first 3 tokens, join, append .com."""
    base = normalize_company_name(clean_company_name(col))
    toks = F.slice(F.split(base, r"\s+"), 1, 3)
    return F.concat(F.array_join(toks, ""), F.lit(".com"))


def extract_postcode(col: Column) -> Column:
    """UK postcode regex (data_enrichment.py:259-269)."""
    return F.regexp_extract(F.upper(col), r"([A-Z]{1,2}\d[A-Z\d]? ?\d[A-Z]{2})", 1)


def format_address(*cols: Column) -> Column:
    """Join non-empty address parts with ', ' (database.py:530-537)."""
    arr = F.array_compact(F.array(*[F.nullif(F.trim(c), F.lit("")) for c in cols]))
    return F.array_join(arr, ", ")


def fix_html_entities(col: Column) -> Column:
    """'&amp;' -> '&' (api_clients.py:914-916)."""
    return F.regexp_replace(col, "&amp;", "&")


def absolutize_url(base: Column, href: Column) -> Column:
    """Relative href -> absolute URL against a base (SURVEY C12,
    api_clients.py:1117-1123): absolute hrefs pass through; otherwise
    join base (trailing '/' stripped) with href ('/'-prefixed)."""
    slashed = F.when(href.startswith("/"), href).otherwise(
        F.concat(F.lit("/"), href))
    return F.when(href.startswith("http"), href).otherwise(
        F.concat(F.regexp_replace(base, "/+$", ""), slashed))


def extract_keyval(url: Column) -> Column:
    """keyVal query-parameter extraction (SURVEY C12,
    api_clients.py:1218-1222); '' when absent (regexp_extract's
    no-match convention)."""
    return F.regexp_extract(url, r"[?&]keyVal=([A-Za-z0-9]+)", 1)


def ensure_summary_url(url: Column) -> Column:
    """Force activeTab=summary for scrape stability (SURVEY C12,
    api_clients.py:1224-1233): rewrite an existing activeTab value,
    else append with the right separator."""
    return (F.when(url.contains("activeTab="),
                   F.regexp_replace(url, r"activeTab=[^&]+",
                                    "activeTab=summary"))
            .when(url.contains("?"),
                  F.concat(url, F.lit("&activeTab=summary")))
            .otherwise(F.concat(url, F.lit("?activeTab=summary"))))


def valid_linkedin_url(col: Column) -> Column:
    """linkedin_scraper.py:59-66."""
    return col.rlike(r"^https://[a-z]{2,3}\.linkedin\.com/in/.+")


_KNOWN_CITIES = ["london", "manchester", "birmingham", "leeds", "bristol",
                 "liverpool", "glasgow", "edinburgh", "cardiff", "belfast"]
_CITY_ALIASES = {"greater london": "london", "city of london": "london",
                 "gtr manchester": "manchester"}


def extract_city(col: Column) -> Column:
    """City extraction from a free-text address (SURVEY C11,
    api_clients.py:2447-2516): known-city containment first, alias
    table, else second-from-last comma segment title-cased."""
    lowered = F.lower(col)
    out = None
    for alias, canonical in _CITY_ALIASES.items():
        cond = lowered.contains(alias)
        out = F.when(cond, F.initcap(F.lit(canonical))) if out is None \
            else out.when(cond, F.initcap(F.lit(canonical)))
    for city in _KNOWN_CITIES:
        out = out.when(lowered.contains(city), F.initcap(F.lit(city)))
    parts = F.split(col, ",")
    fallback = F.when(F.size(parts) >= 2,
                      F.initcap(F.trim(F.element_at(parts, -2)))
                      ).otherwise(F.lit(""))
    return out.otherwise(fallback)


def format_officer_list(officers: Column) -> Column:
    """'Name (Role); Name (Role)' from array<struct<name,role>>
    (SURVEY C14, weekly_scheduler.py:955-966) — transform +
    format_string, no explode."""
    return F.array_join(
        F.transform(officers,
                    lambda o: F.format_string("%s (%s)", o["name"], o["role"])),
        "; ")


def friendly_date(col: Column) -> Column:
    """'Monday 23rd June 2025' with ordinal suffix (SURVEY C17,
    app.py:230-247)."""
    day = F.dayofmonth(col)
    suffix = (F.when(day.isin(11, 12, 13), "th")
              .when(day % 10 == 1, "st")
              .when(day % 10 == 2, "nd")
              .when(day % 10 == 3, "rd")
              .otherwise("th"))
    return F.concat(F.date_format(col, "EEEE "), day.cast("string"), suffix,
                    F.date_format(col, " MMMM yyyy"))


def enrichment_cost(linkedin_lookups: Column, email_verifications: Column,
                    linkedin_rate: float = 0.10,
                    email_rate: float = 0.05) -> Column:
    """Per-record enrichment cost (SURVEY C25, app.py:860-872)."""
    return F.round(linkedin_lookups * linkedin_rate
                   + email_verifications * email_rate, 2)


def extract_contact_fields(col: Column) -> Column:
    """Contact-block field extraction from scraped text (SURVEY C10,
    api_clients.py:1340-1378): key:value regex scan with per-field
    fallbacks, as one struct-producing expression. Returns struct
    (name, company, telephone, email); missing fields are ''."""
    def kv(key_pattern: str) -> Column:
        return F.regexp_extract(
            col, rf"(?im)^\s*(?:{key_pattern})\s*[:\-]\s*(.+?)\s*$", 1)

    email = F.regexp_extract(col, r"([\w.+-]+@[\w-]+\.[\w.]+)", 1)
    phone = F.regexp_extract(
        col, r"(?i)(?:tel|telephone|phone)\s*[:\-]?\s*([\d ()+-]{7,})", 1)
    return F.struct(
        kv("name|applicant|contact").alias("name"),
        kv("company|organisation|organization").alias("company"),
        F.trim(phone).alias("telephone"),
        email.alias("email"),
    )


def render_array_preview(col: Column, sep: str = " ", max_items: int = 3) -> Column:
    """SIC-array render with '+N more' truncation (app.py:645-650, C28)."""
    shown = F.array_join(F.slice(col, 1, max_items), sep)
    extra = F.size(col) - max_items
    return F.when(extra > 0,
                  F.concat(shown, F.lit(f"{sep}+"), extra.cast("string"), F.lit(" more"))
                  ).otherwise(shown)
