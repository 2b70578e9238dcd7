"""Planning-portal keyVal resolution (S8) — the reference's 3-strategy
fetch ladder ported behind an injectable transport.

Reference behavior (api_clients.py:1416-1481 `resolve_keyval_planning_url`
+ `_resolve_idox_portal`, strategies at api_clients.py:1132-1230):

  0. invalid input -> {'url': 'N/A', 'status': 'invalid_input'};
  1. per-(authority, reference) cache;
  2. authority name normalized (lower, spaces/hyphens -> underscores);
  3. Idox-portal authorities run the ladder:
       A direct reference   GET  {base}/applicationDetails.do?reference=R
       B search (GET)       GET  {base}/search.do?action=search&...
       C search (POST)      GET advanced page, then POST {base}/doSearch.do
     first rung yielding an applicationDetails URL wins; the URL is
     normalized to activeTab=summary (C12);
  4. custom-portal authorities build base + search_pattern + reference
     directly (no fetch);
  5. anything else fails closed ('keyval_failed' — the reference
     deliberately has NO fallback for unknown authorities).

The HTTP transport is an interface because this environment has no
network: ``MockTransport`` serves canned responses for golden tests;
a live deployment supplies a requests/urllib-backed transport with the
same three-method surface. The LADDER LOGIC — rung order, success
predicates, link picking, URL normalization, caching, fail-closed
semantics — is the ported, tested artifact.

This is a driver-side I/O client by nature (one lookup per
application, rate-limited upstream); the data-plane integration is
``operators/enrichment``-style mapInPandas over batches, with this
resolver as the per-row kernel.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


# ------------------------------------------------------------ responses
@dataclass(frozen=True)
class Response:
    status: int
    url: str          # final URL after redirects
    text: str = ""


class Transport:
    """Minimal HTTP surface the ladder needs. Implementations must
    follow redirects (the direct rung's success check reads the FINAL
    url) and never raise for HTTP error statuses — return them."""

    def get(self, url: str) -> Response:
        raise NotImplementedError

    def post(self, url: str, data: dict[str, str]) -> Response:
        raise NotImplementedError


class MockTransport(Transport):
    """Canned-response transport for golden tests: exact-URL matches
    for GETs, endpoint matches for POSTs; unknown URLs 404. Records
    the request sequence so tests can assert rung ORDER."""

    def __init__(self, get_responses: dict[str, Response] | None = None,
                 post_responses: dict[str, Response] | None = None):
        self.get_responses = get_responses or {}
        self.post_responses = post_responses or {}
        self.calls: list[tuple[str, str]] = []

    def get(self, url: str) -> Response:
        self.calls.append(("GET", url))
        return self.get_responses.get(url, Response(404, url))

    def post(self, url: str, data: dict[str, str]) -> Response:
        self.calls.append(("POST", url))
        return self.post_responses.get(url, Response(404, url))


# ------------------------------------------------- pure URL/html helpers
def normalize_authority(authority: str | None) -> str:
    """Lower + spaces/hyphens to underscores
    (api_clients.py:1235-1258; the reference's special-case map is an
    identity map, kept as documentation there, dropped here)."""
    if not authority:
        return ""
    return authority.lower().replace(" ", "_").replace("-", "_")


def pick_first_app_details_link(html: str) -> str | None:
    """First applicationDetails.do href in the HTML
    (api_clients.py:1119-1130 uses BeautifulSoup; an href-attribute
    regex over anchor tags is the dependency-free equivalent for the
    portal markup in question)."""
    m = re.search(
        r"<a\b[^>]*\bhref\s*=\s*[\"']([^\"']*applicationDetails\.do"
        r"[^\"']*)[\"']", html, flags=re.IGNORECASE)
    return m.group(1) if m else None


def absolutize(base_url: str, href: str) -> str:
    """Root-relative and bare hrefs against the portal base
    (the Python twin of functions/cleaning.absolutize_url, C12)."""
    if re.match(r"^https?://", href):
        return href
    if href.startswith("/"):
        root = re.match(r"^(https?://[^/]+)", base_url)
        return (root.group(1) if root else base_url) + href
    return base_url.rstrip("/") + "/" + href


def ensure_summary_url(url: str) -> str:
    """Force activeTab=summary (api_clients.py:1224-1233; the column
    twin is functions/cleaning.ensure_summary_url)."""
    if "activeTab=" in url:
        return re.sub(r"activeTab=[^&]+", "activeTab=summary", url)
    return url + ("&" if "?" in url else "?") + "activeTab=summary"


def extract_keyval(url: str) -> str | None:
    """keyVal query parameter (api_clients.py:1218-1222)."""
    m = re.search(r"[?&]keyVal=([A-Za-z0-9]+)", url)
    return m.group(1) if m else None


# ------------------------------------------------------------ the ladder
@dataclass
class PortalResolver:
    """The reference's resolver, transport-injected. ``idox_portals``
    maps normalized authority -> base URL; ``custom_portals`` maps
    normalized authority -> {'base': ..., 'search_pattern': ...}."""

    transport: Transport
    idox_portals: dict[str, str] = field(default_factory=dict)
    custom_portals: dict[str, dict[str, str]] = field(default_factory=dict)
    cache: dict[str, dict[str, str]] = field(default_factory=dict)

    def resolve(self, authority: str | None, reference: str | None
                ) -> dict[str, str]:
        if not reference or reference == "N/A" or not authority:
            return {"url": "N/A", "status": "invalid_input",
                    "method": "none"}
        cache_key = f"{authority}_{reference}"
        if cache_key in self.cache:
            return self.cache[cache_key]
        norm = normalize_authority(authority)
        if norm in self.idox_portals:
            result = self._resolve_idox(reference, self.idox_portals[norm])
            self.cache[cache_key] = result
            return result
        if norm in self.custom_portals:
            info = self.custom_portals[norm]
            return {"url": info["base"] + info["search_pattern"] + reference,
                    "status": "custom_portal", "method": "direct_url"}
        # the reference fails CLOSED for unknown authorities: keyVal
        # links only, no guessed URL (api_clients.py:1449-1451)
        return {"url": "N/A", "status": "keyval_failed", "method": "none"}

    def _resolve_idox(self, ref: str, base_url: str) -> dict[str, str]:
        try:
            # rungs run strictly in sequence — a later rung must never
            # fire (or fetch) once an earlier one resolved, matching
            # the reference's try-sleep-try structure
            url = self._try_direct(ref, base_url)
            if url:
                return {"url": ensure_summary_url(url),
                        "status": "resolved", "method": "direct_reference"}
            url = self._try_search_get(ref, base_url)
            if url:
                return {"url": ensure_summary_url(url),
                        "status": "resolved", "method": "search_get"}
            url = self._try_search_post(ref, base_url)
            if url:
                return {"url": ensure_summary_url(url),
                        "status": "resolved", "method": "search_post"}
            return {"url": "N/A", "status": "keyval_failed",
                    "method": "none"}
        except Exception as exc:  # noqa: BLE001 - reference fails closed
            return {"url": "N/A", "status": "keyval_failed",
                    "method": "none", "error": str(exc)}

    # rung A (api_clients.py:1132-1153): success = 200 and landed on an
    # applicationDetails page, OR 200 and the whitespace-stripped
    # reference appears in the whitespace-stripped body
    def _try_direct(self, ref: str, base_url: str) -> str | None:
        r = self.transport.get(
            f"{base_url}/applicationDetails.do?reference={ref}")
        if r.status == 200 and "applicationDetails" in r.url:
            return r.url
        if (r.status == 200 and ref.replace(" ", "").lower()
                in re.sub(r"\s+", "", r.text).lower()):
            return r.url
        return None

    # rung B (api_clients.py:1155-1177)
    def _try_search_get(self, ref: str, base_url: str) -> str | None:
        r = self.transport.get(
            f"{base_url}/search.do?action=search&searchType=Application"
            f"&reference={ref}")
        if r.status != 200:
            return None
        link = pick_first_app_details_link(r.text)
        return absolutize(base_url, link) if link else None

    # rung C (api_clients.py:1179-1216): establish the session on the
    # advanced-search page, then POST the reference criteria
    def _try_search_post(self, ref: str, base_url: str) -> str | None:
        init = self.transport.get(f"{base_url}/search.do?action=advanced")
        if init.status != 200:
            return None
        r = self.transport.post(
            f"{base_url}/doSearch.do",
            {"searchType": "Application",
             "searchCriteria.reference": ref,
             "date(applicationValidatedStart)": "",
             "date(applicationValidatedEnd)": "",
             "caseAddressType": "Application"})
        if r.status != 200:
            return None
        link = pick_first_app_details_link(r.text)
        return absolutize(base_url, link) if link else None
