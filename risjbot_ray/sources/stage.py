"""Discovery stage: fetched robots/sitemap/rss/atom/csv bodies -> child
frontier rows (the ``flat_map`` expansion of SURVEY.md 2.1).

One batch of fetched discovery pages in, one batch of frontier child rows
out. Sitemapindex recursion is realized by the wave loop: a 'sitemap'
child re-enters the frontier and is expanded next wave (bounded-depth
driver loop, SURVEY.md S1 mapping).
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..extract.siterules import rules_for_host
from ..functions.urlnorm import host_of
from .discovery import (extract_links, maybe_gunzip, parse_atom,
                        parse_csv_urls, parse_rss, parse_sitemap,
                        parse_specified, sitemap_urls_from_robots)

DISCOVERY_KINDS = frozenset({"robots", "sitemap", "rss", "atom", "csv",
                             "urllist"})

CHILD_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("priority", pa.int32()),
    ("depth", pa.int32()),
    ("source_kind", pa.string()),
    ("meta", pa.string()),
])


def _children_of(kind: str, body: bytes, priority: int, depth: int,
                 sitemap_follow: list | None = None) -> list[dict]:
    out: list[dict] = []

    def child(url: str, k: str, meta: dict | None = None) -> None:
        out.append({"url": url.strip(), "priority": priority,
                    "depth": depth + 1, "source_kind": k,
                    "meta": json.dumps(meta) if meta else None})

    if kind == "robots":
        # newssitemapspider.py:36-39
        text = maybe_gunzip(body).decode("utf-8", errors="replace")
        for u in sitemap_urls_from_robots(text):
            child(u, "sitemap")
    elif kind == "sitemap":
        smtype, entries = parse_sitemap(body)
        if smtype == "sitemapindex":
            # newssitemapspider.py:50-53 — recurse, filtered by
            # sitemap_follow regexes (default: follow everything)
            import re as _re
            follow = [_re.compile(p) for p in (sitemap_follow or [""])]
            for d in entries:
                loc = d["loc"]
                if any(r.search(loc) for r in follow):
                    child(loc, "sitemap")
        elif smtype == "urlset":
            # newssitemapspider.py:54-101 — page URLs with Google-News meta
            for d in entries:
                loc = d["loc"]
                child(loc, "article",
                      {"NewsSitemap": d, "originalurl": loc})
    elif kind == "rss":
        # newsrssfeedspider.py:13-21
        for d in parse_rss(body):
            url = d.get("link")
            if url:
                child(url, "article", {"RSSFeed": d, "originalurl": url})
    elif kind == "atom":
        for url in parse_atom(body):
            child(url, "article", {"originalurl": url})
    elif kind == "csv":
        for url in parse_csv_urls(body):
            child(url, "article", {"originalurl": url})
    elif kind == "urllist":
        # specified list semantics: dont_filter=True ⇒ pass the seen gate
        # (newsspecifiedspider.py:29-36, refetchcontrol.py:234-237)
        for url in parse_specified(body):
            child(url, "article", {"refetchcontrol_pass": True})
    return out


def discover_batch(batch: pa.Table) -> pa.Table:
    """Expects fetched discovery rows with columns source_kind, html,
    priority, depth (+ canon_url when available, for per-site
    sitemap_follow filters). Emits child frontier rows."""
    kinds = batch.column("source_kind").to_pylist()
    htmls = batch.column("html").to_pylist()
    prios = batch.column("priority").to_pylist()
    depths = batch.column("depth").to_pylist()
    url_col = ("canon_url" if "canon_url" in batch.column_names
               else "url" if "url" in batch.column_names else None)
    urls = (batch.column(url_col).to_pylist()
            if url_col else [None] * len(kinds))
    rows: list[dict] = []
    for kind, body, prio, depth, url in zip(kinds, htmls, prios, depths,
                                            urls):
        if body is None:
            continue
        follow = None
        allowed: tuple[str, ...] = ()
        if url is not None:
            site = rules_for_host(host_of(url))
            follow = site.sitemap_follow
            allowed = site.allowed_domains
        children = _children_of(kind, body, int(prio or 0),
                                int(depth or 0),
                                sitemap_follow=list(follow) if follow
                                else None)
        if allowed:
            # offsite gate: drop children outside allowed_domains
            # (uk/independent.py:13-16 + OffsiteDownloaderShim role)
            children = [c for c in children
                        if any(host_of(c["url"]) == d
                               or host_of(c["url"]).endswith("." + d)
                               for d in allowed)]
        rows.extend(children)
    return pa.Table.from_pylist(rows, schema=CHILD_SCHEMA)


def harvest_links_batch(batch: pa.Table, max_depth: int = 3) -> pa.Table:
    """Link-following crawl (SURVEY.md 2.1 S7): harvest <a href> from
    fetched article pages of hosts that declare LinkExtractor-style rules
    (SiteRules.link_allow/deny/restrict); children enter the frontier as
    kind 'link' and pass the seen-gate like any other request."""
    urls = batch.column("canon_url" if "canon_url" in batch.column_names
                        else "url").to_pylist()
    htmls = batch.column("html").to_pylist()
    depths = (batch.column("depth").to_pylist()
              if "depth" in batch.column_names else [0] * len(urls))
    rows: list[dict] = []
    for url, body, depth in zip(urls, htmls, depths):
        if body is None or (depth or 0) >= max_depth:
            continue
        rules = rules_for_host(host_of(url))
        if not rules.link_allow and not rules.link_restrict_xpaths:
            continue
        links = extract_links(
            body, url,
            allow=list(rules.link_allow) or None,
            deny=list(rules.link_deny) or None,
            restrict_xpaths=list(rules.link_restrict_xpaths) or None)
        for u in links:
            rows.append({"url": u, "priority": 0,
                         "depth": int(depth or 0) + 1,
                         "source_kind": "link",
                         "meta": json.dumps({"originalurl": u})})
    return pa.Table.from_pylist(rows, schema=CHILD_SCHEMA)
