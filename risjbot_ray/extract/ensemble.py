"""The metadata-ensemble extractor: RISJbot's NewsLoader re-expressed as a
pure function over a parsed page.

Reference: RISJbot/loaders.py:71-423 (NewsLoader + add_* ensemble methods)
and RISJbot/metadata.py:45-79 (schema.org NewsArticle merge). Semantics:

- Every ``add_*`` call appends *input-processed* candidate values to a
  per-field list; the output processor (mostly first-non-empty) runs once at
  ``load_item`` time. Site rules may add candidates before the standard
  block (overriding, since TakeFirst picks the earliest non-empty) or after
  (gap-filling). See loaders.py:71-103 and e.g. spiders/uk/bbc.py:41-50.
- ``bodytext``: each attempt contributes ONE candidate,
  ``entities(escapes(' '.join(text_nodes)))`` — loaders.py:97-103. This is
  the byte-identical invariant per BASELINE.json.
"""

from __future__ import annotations

import gzip
import json
import re
from base64 import b64encode
from datetime import datetime
from typing import Callable, Sequence

from ..functions import text as T
from ..functions.dates import parse_date
from ..html.dom import Node
from ..html.select import css as css_select
from ..html.select import xpath as xpath_select

# Fields whose candidates accumulate as lists and export as lists
# (Identity() output processors, loaders.py:129-131).
_IDENTITY_OUT = {"notes", "rawcomments", "comments"}
_DATE_FIELDS = {"fetchtime", "modtime", "firstpubtime"}

Procs = Callable[[list], list]


class ItemBuilder:
    """Accumulates per-field candidate lists with the reference's input
    processors; ``load_item`` applies the output processors."""

    def __init__(self) -> None:
        self._values: dict[str, list] = {}

    # -- input side -------------------------------------------------------
    def _append(self, field: str, vals: list) -> None:
        self._values.setdefault(field, []).extend(vals)

    def add_value(self, field: str, value, procs: Procs | None = None) -> None:
        if value is None:
            return
        vals = list(value) if isinstance(value, (list, tuple)) else [value]
        if procs is not None:
            vals = list(procs(vals))
        vals = [v for v in vals if v is not None]
        if not vals:
            return
        self._append(field, self._input_process(field, vals))

    def add_xpath(self, field: str, root: Node, path: str,
                  procs: Procs | None = None) -> None:
        self.add_value(field, [v for v in xpath_select(root, path)
                               if isinstance(v, str)], procs)

    def add_css(self, field: str, root: Node, selector: str,
                procs: Procs | None = None) -> None:
        self.add_value(field, [v for v in css_select(root, selector)
                               if isinstance(v, str)], procs)

    def _input_process(self, field: str, vals: list) -> list:
        if field in _DATE_FIELDS:
            # MapCompose(wrapped_parse): parse each, drop failures
            # (loaders.py:77-82); datetimes pass through unchanged.
            out = []
            for v in vals:
                dt = v if isinstance(v, datetime) else parse_date(v)
                if dt is not None:
                    out.append(dt)
            return out
        if field in ("headline", "summary"):
            return T.clean_headline(vals)  # loaders.py:84-89
        if field == "bodytext":
            return [T.bodytext_candidate(vals)]  # loaders.py:97-103
        if field == "keywords":
            return [T.keywords_in(vals)]  # loaders.py:118
        if field == "bylines":
            return [T.bylines_in(vals)]  # loaders.py:119-122
        return vals

    # -- output side ------------------------------------------------------
    def get_output(self, field: str):
        """Current output value (used by the readability-fallback gate,
        loaders.py:405)."""
        vals = self._values.get(field, [])
        if field in _IDENTITY_OUT:
            return vals or None
        first = T.take_first(vals)
        if first is None:
            return None
        if field in _DATE_FIELDS:
            return first.isoformat()  # loaders.py:78,80,82
        if field in ("keywords", "bylines"):
            return T.list_out(first)  # loaders.py:123-126
        if field == "rawpagegzipb64":
            # gzip+b64, deterministic mtime (loaders.py:105-109)
            body = first if isinstance(first, bytes) else str(first).encode()
            return b64encode(gzip.compress(body, mtime=0)).decode("utf-8")
        return first

    def load_item(self) -> dict:
        item = {}
        for field in self._values:
            v = self.get_output(field)
            if v is not None and v != "" and v != []:
                item[field] = v
        return item


# ---------------------------------------------------------------------------
# JSON-LD handling (ExtractJSONLD middleware + RISJMetadataExtractor)
# ---------------------------------------------------------------------------

# escaped + anchored: 'https://schemaXorg' or 'schema.org.evil.example'
# contexts must NOT qualify a block as schema.org vocabulary
_SCHEMA_ORG_RE = re.compile(r"^https?://(www\.)?schema\.org/?$")


def extract_jsonld_blocks(root: Node) -> tuple[list, int]:
    """All parseable ``<script type="application/ld+json">`` payloads, plus a
    count of malformed blocks (spmiddlewares/extractjsonld.py:41-56). Must
    run on the *unpruned* tree, before script-stripping."""
    blocks, failed = [], 0
    for blob in xpath_select(root, '//script[@type="application/ld+json"]/text()'):
        try:
            blocks.append(json.loads(blob))
        except json.JSONDecodeError:
            failed += 1
    return blocks, failed


def newsarticle_from_jsonld(blocks: list) -> dict:
    """Merge every block with @context≈schema.org and @type=NewsArticle;
    later blocks override earlier (dict.update — metadata.py:61-69)."""
    out: dict = {}
    for d in blocks:
        try:
            if (_SCHEMA_ORG_RE.match(d["@context"])
                    and d["@type"] == "NewsArticle"):
                out.update(d)
        except (KeyError, TypeError):
            continue
    return out


# ---------------------------------------------------------------------------
# Standard ensemble steps (loaders.py:140-423)
# ---------------------------------------------------------------------------


class PageContext:
    """Offline stand-in for (Response, meta): the parsed page + the frontier
    metadata that rode along with the request. ``index`` is the one-pass
    DocIndex over the (pruned) tree answering the fixed standard-channel
    selectors without repeated tree scans."""

    __slots__ = ("url", "body", "fetchtime", "root", "jsonld", "meta",
                 "index")

    def __init__(self, url: str, body: bytes, fetchtime: datetime,
                 root: Node, jsonld: list, meta: dict, index=None):
        from .docindex import DocIndex
        self.url = url
        self.body = body
        self.fetchtime = fetchtime
        self.root = root
        self.jsonld = jsonld
        self.meta = meta
        self.index = index if index is not None else DocIndex(root)


def add_fromresponse(b: ItemBuilder, ctx: PageContext) -> None:
    """url, raw page, fetch time from the response itself
    (loaders.py:140-152; Date header ≙ warc_ts in the offline model)."""
    b.add_value("url", ctx.url)
    b.add_value("rawpagegzipb64", ctx.body)
    b.add_value("fetchtime", ctx.fetchtime)


def add_htmlmeta(b: ItemBuilder, ctx: PageContext) -> None:
    """Standard HTML meta tags (loaders.py:154-166)."""
    ix = ctx.index
    b.add_value("bylines", ix.meta_name_or_prop("author"))
    b.add_value("keywords", ix.meta_name("news_keywords"))
    b.add_value("keywords", ix.meta_name("keywords"))
    b.add_value("language", ix.lang)


def add_schemaorg(b: ItemBuilder, ctx: PageContext) -> None:
    """JSON-LD NewsArticle block then microdata/RDFa-Lite xpaths
    (loaders.py:168-174)."""
    add_schemaorg_jsonld(b, ctx)
    add_schemaorg_by_xpath(b, ctx)


def add_schemaorg_jsonld(b: ItemBuilder, ctx: PageContext) -> None:
    """Field mapping from the merged NewsArticle dict (loaders.py:183-208)."""
    data = newsarticle_from_jsonld(ctx.jsonld)

    def _s(v):
        # JSON-LD values are untyped JSON from the wild (numeric unix
        # timestamps, nested lists, dict headlines all occur): only
        # strings may reach the str-typed field processors — one bad
        # page must not AttributeError the whole extraction batch
        return v if isinstance(v, str) else None

    b.add_value("firstpubtime", _s(data.get("datePublished")))
    b.add_value("modtime", _s(data.get("dateModified")))
    kw = data.get("keywords")
    if isinstance(kw, list):
        kw = [x for x in kw if isinstance(x, str)] or None
        b.add_value("keywords", kw)
    else:
        b.add_value("keywords", _s(kw))
    b.add_value("headline", _s(data.get("headline")))
    body = data.get("articleBody")
    if isinstance(body, str):
        b.add_value("bodytext", body)
    b.add_value("section", _s(data.get("articleSection")))
    author = data.get("author")
    if isinstance(author, dict):
        b.add_value("bylines", author.get("name"))
    elif isinstance(author, str):
        b.add_value("bylines", [author])
    elif isinstance(author, list):
        b.add_value("bylines", [x for x in author if isinstance(x, str)])
    publisher = data.get("publisher")
    if isinstance(publisher, dict):
        b.add_value("source", _s(publisher.get("name")))
    else:
        b.add_value("source", _s(publisher))


def add_schemaorg_by_xpath(b: ItemBuilder, ctx: PageContext) -> None:
    """Microdata (@itemprop) / RDFa-Lite (@property) xpaths
    (loaders.py:211-256), answered from the one-pass DocIndex."""
    ix = ctx.index
    b.add_value("firstpubtime", ix.schema_content("datePublished"))
    b.add_value("modtime", ix.schema_content("dateModified"))
    b.add_value("keywords", ix.schema_content("keywords"))
    b.add_value("headline", ix.schema_text("headline"))
    b.add_value("section", ix.schema_content("articleSection"))
    b.add_value("bodytext", ix.schema_text("articleBody", "reviewBody"))


def add_opengraph(b: ItemBuilder, ctx: PageContext) -> None:
    """Open Graph protocol tags (loaders.py:265-296)."""
    ix = ctx.index
    b.add_value("source", ix.meta_prop("og:site_name"))
    b.add_value("headline", ix.meta_prop("og:title"))
    b.add_value("summary", ix.meta_prop("og:description"))
    b.add_value("modtime", ix.meta_prop("article:modified_time"))
    b.add_value("firstpubtime", ix.meta_prop("article:published_time"))
    b.add_value("section", ix.meta_prop("article:section"))
    b.add_value("bylines", ix.meta_prop("article:author"))
    b.add_value("keywords", ix.meta_prop("article:tag"))


def add_dublincore(b: ItemBuilder, ctx: PageContext) -> None:
    """Dublin Core meta tags (loaders.py:298-320)."""
    ix = ctx.index
    b.add_value("headline", ix.meta_name("dc.title", "DC.title"))
    b.add_value("summary", ix.meta_name("dcterms.abstract",
                                        "DCTERMS.abstract"))
    b.add_value("summary", ix.meta_name("dc.description", "DC.description"))
    b.add_value("modtime", ix.meta_name("dcterms.modified",
                                        "DCTERMS.modified"))
    b.add_value("firstpubtime", ix.meta_name("dcterms.created",
                                             "DCTERMS.created"))
    b.add_value("source", ix.meta_name("dc.publisher", "DC.publisher"))


def add_scrapymeta(b: ItemBuilder, ctx: PageContext) -> None:
    """Feed/sitemap metadata passthrough from the frontier row's meta blob
    (loaders.py:336-397)."""
    meta = ctx.meta
    if "originalurl" in meta:
        b.add_value("originalurl", meta["originalurl"])
    nm = meta.get("newsmeta")
    if nm:
        for k, v in nm.items():
            b.add_value(k, v)
    rss = meta.get("RSSFeed")
    if isinstance(rss, dict):
        b.add_value("headline", rss.get("title"))
        b.add_value("summary", rss.get("description"))
        b.add_value("section", rss.get("section"))
        b.add_value("firstpubtime", rss.get("pubDate"))
    sm = meta.get("NewsSitemap")
    if isinstance(sm, dict):
        b.add_value("modtime", sm.get("lastmod"))
        news = sm.get("news")
        if isinstance(news, dict):
            b.add_value("keywords", news.get("keywords"))
            b.add_value("firstpubtime", news.get("publication_date"))
            b.add_value("headline", news.get("title"))
    if "refetchcontrol_previous" in meta:
        b.add_value("previousfetches", meta["refetchcontrol_previous"])


STANDARD_STEPS: dict[str, Callable[[ItemBuilder, PageContext], None]] = {
    "fromresponse": add_fromresponse,
    "htmlmeta": add_htmlmeta,
    "schemaorg": add_schemaorg,
    "opengraph": add_opengraph,
    "dublincore": add_dublincore,
    "scrapymeta": add_scrapymeta,
}
