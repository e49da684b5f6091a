"""Per-page extraction: the full response path of the reference engine
(EP1 steps 4-8, SURVEY.md section 3.1) as one pure function.

Order of operations matches the reference middleware chain
(settings.py:108-126, low->high on responses):
1. NUL strip (dlmiddlewares/stripnull.py:31-44 — done inside parse_html)
2. Fake404 drop check (spmiddlewares/fake404.py:48-65)
3. ExtractJSONLD — collect ld+json blocks BEFORE script stripping
   (spmiddlewares/extractjsonld.py:30-61; ordering note settings.py:119-120)
4. UnwantedContent prune — skip for sitemap/feed responses
   (spmiddlewares/unwantedcontent.py:45-62, settings.py:140-143)
5. Site dispatch: per-site prunes + pre-adds + standard ensemble + post-adds
   (spiders/*/*.py parse_page; loaders.py:140-397)
6. Readability fallback when headline/bodytext still missing
   (loaders.py:399-423)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field
from datetime import datetime

from ..html.dom import Node, parse_html
from ..html.select import delete_nodes, xpath as xpath_select
from .ensemble import (ItemBuilder, PageContext, STANDARD_STEPS,
                       extract_jsonld_blocks)
from .readability import readability_bodytext_nodes, short_title
from .siterules import AddRule, SiteRules, rules_for_url

# settings.py:140-143
UNWANTED_XPATHS = ("//figure", "//script", "//style", "//form")
# the one-traversal prune tests tags directly; derived from the
# constant so editing UNWANTED_XPATHS actually changes the prune
_UNWANTED_TAGS = tuple(x.lstrip("/") for x in UNWANTED_XPATHS)

# settings.py:149-154 — (url regex, xpath) fake-404 signatures
FAKE404_SIGS: tuple[tuple[re.Pattern, str], ...] = (
    (re.compile(r"https?://(www\.)?foxnews\."),
     '//h1[contains(., "Something has gone wrong")]'),
    (re.compile(r"https?://(www\.)?nbcnews\."),
     '//h2[contains(., "This live stream has ended")]'),
)


@dataclass
class ExtractStats:
    """Per-batch partial counters (reference crawler.stats, SURVEY.md 2.6
    A1); summed across batches by the metrics stage."""
    pages: int = 0
    extracted: int = 0
    fake404_dropped: int = 0
    jsonld_extracted: int = 0
    jsonld_failed: int = 0
    no_bodytext: int = 0
    readability_used: int = 0

    def as_dict(self) -> dict[str, int]:
        return dict(self.__dict__)


def is_fake404(url: str, root: Node) -> bool:
    for regex, xp in FAKE404_SIGS:
        if regex.match(url) and xpath_select(root, xp):
            return True
    return False


def _apply_add(b: ItemBuilder, root: Node, rule: AddRule) -> None:
    if rule.cond is not None and not xpath_select(root, rule.cond):
        return
    if rule.method == "value":
        b.add_value(rule.field, rule.expr, rule.procs)
    elif rule.method == "xpath":
        b.add_xpath(rule.field, root, rule.expr, rule.procs)
    elif rule.method == "css":
        b.add_css(rule.field, root, rule.expr, rule.procs)
    else:  # pragma: no cover
        raise ValueError(f"Unknown add method {rule.method}")


def extract_page(url: str, body: bytes, fetchtime: datetime,
                 meta: dict | None = None,
                 rules: SiteRules | None = None,
                 stats: ExtractStats | None = None,
                 include_rawpage: bool = False) -> dict | None:
    """Parse + extract one page; returns the NewsItem dict or None when the
    page is dropped (fake 404). ``meta`` is the frontier meta blob
    (RSSFeed / NewsSitemap / originalurl / refetchcontrol_previous)."""
    stats = stats if stats is not None else ExtractStats()
    meta = meta or {}
    stats.pages += 1

    root = parse_html(body)

    if is_fake404(url, root):
        stats.fake404_dropped += 1
        return None

    jsonld, failed = extract_jsonld_blocks(root)
    stats.jsonld_extracted += len(jsonld)
    stats.jsonld_failed += failed
    jsonld = jsonld + list(meta.get("json-ld", []))

    if not meta.get("sitemap"):
        # the four fixed tag prunes (settings.py:140-143) in ONE traversal
        doomed = [n for n in root.iter_nodes()
                  if n.tag in _UNWANTED_TAGS]
        for n in doomed:
            n.remove()

    if rules is None:
        rules = rules_for_url(url)
    for method, expr in rules.prunes:
        delete_nodes(root, expr, method=method)

    ctx = PageContext(url=url, body=body, fetchtime=fetchtime, root=root,
                      jsonld=jsonld, meta=meta)
    b = ItemBuilder()

    if rules.source is not None:
        b.add_value("source", rules.source)
    for rule in rules.pre:
        _apply_add(b, root, rule)
    for step in rules.std:
        STANDARD_STEPS[step](b, ctx)
    for rule in rules.post:
        _apply_add(b, root, rule)

    if rules.readability and not (b.get_output("headline")
                                  and b.get_output("bodytext")):
        stats.readability_used += 1
        if not b.get_output("headline"):
            b.add_value("headline", short_title(root))
        if not b.get_output("bodytext"):
            b.add_value("bodytext", readability_bodytext_nodes(root))

    if not include_rawpage:
        # StripRawPage default: drop BEFORE load_item so the gzip+b64
        # output processor (loaders.py:105-109) never runs
        b._values.pop("rawpagegzipb64", None)
    item = b.load_item()

    # CheckContent validator (pipelines/checkcontent.py:7-12)
    if "bodytext" not in item:
        u = item.get("url", url)
        if ("picture" not in u and "video" not in u and "gallery" not in u):
            stats.no_bodytext += 1

    stats.extracted += 1
    return item
