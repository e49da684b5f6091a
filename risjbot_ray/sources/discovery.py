"""URL-discovery parsers: sitemap / robots / RSS / Atom / CSV / link crawl.

Reference sources (SURVEY.md 2.1 S1-S7):
- recursive sitemap reader with Google-News metadata
  (spiders/newssitemapspider.py:19-101, utils.py:51-98)
- robots.txt ``Sitemap:`` discovery (newssitemapspider.py:36-39)
- RSS ``<item>`` reader passing the node as a recursive dict
  (spiders/newsrssfeedspider.py:9-29)
- Atom ``<entry><link href>`` reader (spiders/newsatomfeedspider.py:8-22)
- CSV url-column reader (spiders/newscsvfeedspider.py:9-29)
- specified URL lists (spiders/newsspecifiedspider.py:14-42)
- LinkExtractor-style crawl rules (spiders/base/buzzfeednewscrawlspider.py:15-19)

XML is parsed with stdlib ElementTree (namespace-stripped, like the
reference's NewsSitemap); gzipped sitemap bodies are transparently
decompressed (scrapy's _get_sitemap_body equivalent).
"""

from __future__ import annotations

import csv
import gzip
import zlib
import io
import re
import xml.etree.ElementTree as ET
from urllib.parse import urljoin

from ..html.dom import Node, parse_html
from ..html.select import xpath as xpath_select


def _local(tag: str) -> str:
    return tag.split("}", 1)[1] if "}" in tag else tag


def etree_to_recursive_dict(element: ET.Element):
    """Namespace-eliminating recursive dict, matching reference
    utils.py:81-98 (including the 'alternate{hreflang}' link collapsing)."""
    name = _local(element.tag)
    txt = element.text.strip() if element.text else None
    if name == "link" and "href" in element.attrib:
        return (f"alternate{element.get('hreflang')}", element.get("href"))
    child_items = dict(map(etree_to_recursive_dict, element))
    return name, (child_items or txt)


def maybe_gunzip(body: bytes) -> bytes:
    if body[:2] == b"\x1f\x8b":
        try:
            return gzip.decompress(body)
        except (OSError, EOFError, zlib.error):
            # truncated transfers raise EOFError and corrupt deflate
            # data zlib.error — neither is an OSError; the fallback
            # must cover them or one bad .xml.gz kills the task
            return body
    return body


def _parse_xml(body: bytes) -> ET.Element | None:
    body = maybe_gunzip(body)
    # strip NULs + leading junk before the XML declaration (recover-ish)
    body = body.replace(b"\x00", b"")
    start = body.find(b"<")
    if start > 0:
        body = body[start:]
    try:
        return ET.fromstring(body)
    except ET.ParseError:
        return None


def parse_sitemap(body: bytes) -> tuple[str | None, list[dict]]:
    """Returns (type, entries). type is 'sitemapindex' or 'urlset'; each
    entry is the recursive dict of one child having a 'loc'
    (utils.py:51-79)."""
    root = _parse_xml(body)
    if root is None:
        return None, []
    smtype = _local(root.tag)
    entries = []
    for child in root:
        d = etree_to_recursive_dict(child)[1]
        if isinstance(d, dict) and "loc" in d:
            entries.append(d)
    return smtype, entries


_SITEMAP_LINE = re.compile(r"^\s*sitemap\s*:\s*(\S+)", re.I | re.M)


def sitemap_urls_from_robots(text: str) -> list[str]:
    """Extract ``Sitemap:`` pointers (newssitemapspider.py:36-39)."""
    return _SITEMAP_LINE.findall(text)


def parse_rss(body: bytes) -> list[dict]:
    """RSS <item> nodes as recursive dicts; each must carry a 'link' URL
    (newsrssfeedspider.py:13-21)."""
    root = _parse_xml(body)
    if root is None:
        return []
    out = []
    for item in root.iter():
        if _local(item.tag) != "item":
            continue
        d = etree_to_recursive_dict(item)[1]
        if isinstance(d, dict) and d.get("link"):
            out.append(d)
    return out


def parse_atom(body: bytes) -> list[str]:
    """Atom <entry><link href> URLs (newsatomfeedspider.py:12-14)."""
    root = _parse_xml(body)
    if root is None:
        return []
    urls = []
    for entry in root.iter():
        if _local(entry.tag) != "entry":
            continue
        for child in entry:
            if _local(child.tag) == "link" and child.get("href"):
                urls.append(child.get("href"))
    return urls


def parse_csv_urls(body: bytes, field: str = "url") -> list[str]:
    """URL column of a fetched CSV (newscsvfeedspider.py:14-21).

    Row-tolerant: the csv module raises ``csv.Error`` mid-iteration on
    hostile rows (a field over the 128 KB limit, NULs in some modes) —
    one bad row must cost only itself and the unread tail, never the
    rows already parsed or the whole discovery task."""
    text = body.decode("utf-8", errors="replace")
    reader = csv.DictReader(io.StringIO(text))
    out: list[str] = []
    while True:
        try:
            row = next(reader)
        except StopIteration:
            break
        except csv.Error:
            break
        if row.get(field):
            out.append(row[field])
    return out


def parse_specified(body: bytes) -> list[str]:
    """Newline-separated URL list (newsspecifiedspider.py:30-36)."""
    return [u.strip() for u in body.decode("utf-8",
                                           errors="replace").splitlines()
            if u.strip()]


def extract_links(html: bytes | Node, base_url: str,
                  allow: list[str] | None = None,
                  deny: list[str] | None = None,
                  restrict_xpaths: list[str] | None = None) -> list[str]:
    """LinkExtractor semantics: <a href> harvesting with absolutization and
    allow/deny regex filters, optionally restricted to subtrees
    (buzzfeednewscrawlspider.py:15-19, de/bild.py:75-90). In-page dedup,
    order preserved (newssplashcrawlspider.py:57-64)."""
    root = html if isinstance(html, Node) else parse_html(html)
    scopes: list[Node] = [root]
    if restrict_xpaths:
        scopes = []
        for xp in restrict_xpaths:
            scopes.extend(n for n in xpath_select(root, xp)
                          if isinstance(n, Node))
    allow_re = [re.compile(p) for p in (allow or [])]
    deny_re = [re.compile(p) for p in (deny or [])]
    seen: set[str] = set()
    out: list[str] = []
    for scope in scopes:
        for node in scope.iter_nodes():
            if node.tag != "a":
                continue
            href = (node.get("href") or "").strip()
            # strip + lowercase BEFORE the scheme check: ' javascript:'
            # and 'JavaScript:' variants must not leak unfetchable
            # URLs into the frontier
            if not href or href.lower().startswith(
                    ("javascript:", "mailto:", "#")):
                continue
            url = urljoin(base_url, href)
            if allow_re and not any(r.search(url) for r in allow_re):
                continue
            if any(r.search(url) for r in deny_re):
                continue
            if url not in seen:
                seen.add(url)
                out.append(url)
    return out
