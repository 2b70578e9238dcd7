"""Golden tests for the S8 keyVal fetch ladder (sources/portal.py) —
the reference's resolve_keyval_planning_url semantics
(api_clients.py:1416-1481) behind the mock transport: rung order,
success predicates, URL normalization, caching, fail-closed paths."""

from __future__ import annotations

from database_convertor_spark.sources.portal import (
    MockTransport,
    PortalResolver,
    Response,
    ensure_summary_url,
    extract_keyval,
    normalize_authority,
    pick_first_app_details_link,
)

BASE = "https://planning.example.gov.uk/online-applications"
DETAILS = f"{BASE}/applicationDetails.do?keyVal=ABC123&activeTab=documents"


def _resolver(transport, custom=None):
    return PortalResolver(
        transport,
        idox_portals={"camden": BASE},
        custom_portals=custom or {
            "hackney": {"base": "https://hackney.example/",
                        "search_pattern": "search?q="}})


def test_rung_a_direct_reference_wins():
    t = MockTransport(get_responses={
        f"{BASE}/applicationDetails.do?reference=APP/1":
            Response(200, DETAILS)})
    got = _resolver(t).resolve("Camden", "APP/1")
    assert got == {"url": f"{BASE}/applicationDetails.do?keyVal=ABC123"
                          "&activeTab=summary",
                   "status": "resolved", "method": "direct_reference"}
    # one request: rungs B/C never fire once A succeeds
    assert len(t.calls) == 1


def test_rung_a_content_check_fallback():
    """Rung A's second predicate: 200 on a non-details URL whose body
    contains the whitespace-stripped reference."""
    landing = f"{BASE}/landing.do"
    t = MockTransport(get_responses={
        f"{BASE}/applicationDetails.do?reference=APP 42":
            Response(200, landing, text="Results for APP\n 42 here")})
    got = _resolver(t).resolve("camden", "APP 42")
    assert got["status"] == "resolved"
    assert got["method"] == "direct_reference"
    assert got["url"] == landing + "?activeTab=summary"


def test_rung_b_search_get_after_a_fails():
    html = ('<html><a class="x" href="/online-applications/'
            'applicationDetails.do?keyVal=XYZ9">row</a></html>')
    t = MockTransport(get_responses={
        f"{BASE}/search.do?action=search&searchType=Application"
        f"&reference=APP/2": Response(200, "u", text=html)})
    got = _resolver(t).resolve("camden", "APP/2")
    assert got["method"] == "search_get"
    # root-relative href absolutized against the portal HOST, summary forced
    assert got["url"] == ("https://planning.example.gov.uk"
                          "/online-applications/applicationDetails.do"
                          "?keyVal=XYZ9&activeTab=summary")
    assert extract_keyval(got["url"]) == "XYZ9"


def test_rung_c_search_post_is_last():
    html = f'<a href="{DETAILS}">found</a>'
    t = MockTransport(
        get_responses={
            f"{BASE}/search.do?action=advanced": Response(200, "adv")},
        post_responses={
            f"{BASE}/doSearch.do": Response(200, "p", text=html)})
    got = _resolver(t).resolve("camden", "APP/3")
    assert got["method"] == "search_post"
    assert got["url"].endswith("activeTab=summary")
    # ladder order: direct GET, search GET, advanced GET, then POST
    assert [m for m, _ in t.calls] == ["GET", "GET", "GET", "POST"]


def test_all_rungs_fail_closed_and_cache():
    t = MockTransport()            # every request 404s
    r = _resolver(t)
    got = r.resolve("camden", "APP/4")
    assert got == {"url": "N/A", "status": "keyval_failed",
                   "method": "none"}
    n = len(t.calls)
    assert r.resolve("camden", "APP/4") == got      # cached
    assert len(t.calls) == n                        # no new requests


def test_custom_portal_and_unknown_authority():
    t = MockTransport()
    r = _resolver(t)
    got = r.resolve("Hackney", "REF-9")
    assert got == {"url": "https://hackney.example/search?q=REF-9",
                   "status": "custom_portal", "method": "direct_url"}
    assert t.calls == []                            # no fetch at all
    assert r.resolve("Atlantis", "REF-9")["status"] == "keyval_failed"
    assert r.resolve("camden", None)["status"] == "invalid_input"
    assert r.resolve(None, "REF")["status"] == "invalid_input"
    assert r.resolve("camden", "N/A")["status"] == "invalid_input"


def test_url_helpers_golden():
    assert normalize_authority("Tower Hamlets") == "tower_hamlets"
    assert normalize_authority("Kingston-upon-Thames") == \
        "kingston_upon_thames"
    assert normalize_authority(None) == ""
    assert pick_first_app_details_link(
        "<a href='x.do'>n</a><A HREF=\"b/applicationDetails.do?k=1\">y"
        "</A>") == "b/applicationDetails.do?k=1"
    assert pick_first_app_details_link("<p>none</p>") is None
    assert ensure_summary_url("u.do?activeTab=documents&x=1") == \
        "u.do?activeTab=summary&x=1"
    assert ensure_summary_url("u.do") == "u.do?activeTab=summary"
    assert extract_keyval("a.do?foo=1&keyVal=Q8Z") == "Q8Z"
    assert extract_keyval("a.do") is None
