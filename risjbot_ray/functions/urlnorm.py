"""URL canonicalization, fingerprinting and hashing.

Reference semantics:
- EquivalentDomains netloc rewrite (RISJbot/spmiddlewares/equivalentdomains.py:36-52)
- per-site URL normalizers (spiders/uk/dailymail.py:16-20 query strip,
  spiders/base/businessinsiderspider.py:13-29 IR=C)
- sha1 request fingerprint (spmiddlewares/refetchcontrol.py:329-336; Scrapy's
  request_fingerprint is sha1 over method+canonical-url+body — here requests
  are always bodyless GETs, so the key reduces to sha1 of the canonical URL)

url_hash (uint64) is the partitioning key for the seen-set shards and the
fetch join: the first 8 bytes of the sha1 fingerprint, so shard routing and
the ledger key always agree.
"""

from __future__ import annotations

import hashlib
from urllib.parse import parse_qsl, urlencode, urlparse, urlunparse

# settings.py:176 — the one shipped mapping; callers may extend.
DEFAULT_EQUIVALENT_DOMAINS = {"www.cnn.com": "edition.cnn.com"}


def apply_equivalent_domains(url: str, mappings: dict[str, str]) -> str:
    """Rewrite netloc per the equivalence map, preserving everything else
    (equivalentdomains.py:40-50). The lookup is case-insensitive (map
    keys are lowercase): this runs BEFORE canonicalization, so a
    'WWW.CNN.com' URL must still unify with the mapped domain or the
    same article gets two fingerprints."""
    try:
        u = urlparse(url)
    except ValueError:
        # hostile href ('http://[?x' → "Invalid IPv6 URL"): no netloc to
        # rewrite — pass through and let canonicalize_url's guarded path
        # handle it. A wave task must never die over one garbage link.
        return url
    key = u.netloc.lower()
    if key in mappings:
        return urlunparse(
            (u.scheme, mappings[key], u.path, u.params, u.query,
             u.fragment)
        )
    return url


def canonicalize_url(url: str) -> str:
    """Scrapy-style canonicalization (w3lib.url.canonicalize_url semantics,
    simplified): sort query params, drop fragment, normalize empty path to
    '/'. Used to build the request fingerprint.

    The single-pass kernel is iterated to a FIXED POINT: on degenerate
    hostile hrefs one urlparse/urlunparse round trip is not idempotent
    (urlunparse(('http', '', '//', ...)) collapses to 'http://', which
    reparses differently), and the seen-ledger key must be a function
    of a stable canonical form. Well-formed URLs hit the kernel's
    identity fast path, so the loop costs them one extra comparison at
    most; a parse/unparse CYCLE (never observed, but hostile input is
    hostile) resolves deterministically to the cycle's lexicographic
    minimum, which re-canonicalizes to itself."""
    seen: list = []
    cur = url
    for _ in range(8):
        nxt = _canon_once(cur)
        if nxt == cur:
            return cur
        if nxt in seen:
            cyc = seen[seen.index(nxt):] + [cur]
            return min(cyc)
        seen.append(cur)
        cur = nxt
    return cur


def _canon_once(url: str) -> str:
    """One canonicalization pass (see :func:`canonicalize_url`).

    Fast path: query/fragment-free http(s) URLs (the overwhelming crawl
    case) skip urlparse entirely — one split, no re-assembly."""
    url = url.strip()
    if "?" not in url and "#" not in url and ";" not in url:
        scheme_end = url.find("://")
        if scheme_end > 0:
            scheme = url[:scheme_end]
            ls = scheme.lower()   # urlparse lowercases the scheme too:
            #                       'HTTP://x/a' and 'http://x/a' must
            #                       share one fingerprint on EVERY path
            rest = url[scheme_end + 3:]
            slash = rest.find("/")
            if slash < 0:
                return ls + "://" + rest.lower() + "/"
            netloc = rest[:slash]
            lowered = netloc.lower()
            if lowered != netloc or ls != scheme:
                return ls + "://" + lowered + rest[slash:]
            return url
    try:
        u = urlparse(url)
    except ValueError:
        # hostile/garbage href ('http://[?x' raises "Invalid IPv6 URL"):
        # a crawl task must never die over one unparseable link — degrade
        # to fragment-drop and re-canonicalize the rest (idempotent: the
        # recursion input has no '#', so it cannot recurse again)
        base = url.split("#", 1)[0]
        return _canon_once(base) if base != url else url
    query = urlencode(sorted(parse_qsl(u.query, keep_blank_values=True)))
    path = u.path or "/"
    # strip the REASSEMBLY too: dropping ';params'/'#frag' can expose a
    # trailing space ('0 ;' -> '0 ') that the next pass's input-strip
    # would remove — the canonical form must be a fixed point
    return urlunparse((u.scheme, u.netloc.lower(), path, u.params,
                       query, "")).strip()


def url_fingerprint(url: str) -> bytes:
    """sha1 digest of the canonicalized URL — the seen-ledger key
    (refetchcontrol.py:329-336)."""
    return hashlib.sha1(canonicalize_url(url).encode("utf-8")).digest()


def url_hash64(url: str) -> int:
    """uint64 from the first 8 fingerprint bytes — shard/partition key."""
    return int.from_bytes(url_fingerprint(url)[:8], "big", signed=False)


def host_of(url: str) -> str:
    i = url.find("://")
    if i > 0:
        rest = url[i + 3:]
        end = len(rest)
        for sep in "/?#":
            j = rest.find(sep)
            if 0 <= j < end:
                end = j
        return rest[:end].lower()
    try:
        return urlparse(url).netloc.lower()
    except ValueError:      # '//[?' — unparseable netloc, not a crash
        return ""


def strip_query(url: str) -> str:
    """DailyMail normalizer: drop '?...' tracking junk
    (spiders/uk/dailymail.py:16-20)."""
    return url.split("?")[0]


def force_query_param(url: str, key: str, value: str) -> str:
    """BusinessInsider normalizer: force a query param (e.g. IR=C)
    (spiders/base/businessinsiderspider.py:13-29)."""
    u = urlparse(url)
    q = dict(parse_qsl(u.query, keep_blank_values=True))
    q[key] = value
    return urlunparse((u.scheme, u.netloc, u.path, u.params, urlencode(q), u.fragment))
