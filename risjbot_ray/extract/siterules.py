"""Data-driven per-site parser specs (the reference's ~30 spider
``parse_page`` methods as a dispatch table — SURVEY.md section 2.3 M10).

Each reference spider is: optional DOM prunes + optional field adds placed
before the standard ensemble block (overrides) + the standard block + adds
after it (gap-fillers). That structure is encoded here as data; the one
extraction ``map_batches`` stage dispatches on the URL's host.

Citations per rule point into /root/reference/RISJbot/spiders/.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable

from ..functions.text import split_multiple_byline_string
from ..functions.urlnorm import host_of, strip_query, force_query_param
from ..functions.dates import repair_compact_tz


@dataclass(frozen=True)
class AddRule:
    field: str
    method: str  # 'xpath' | 'css' | 'value'
    expr: str
    procs: Callable[[list], list] | None = None
    cond: str | None = None  # xpath gate: rule runs iff selector non-empty


@dataclass(frozen=True)
class SiteRules:
    key: str
    hosts: tuple[str, ...] = ()
    source: str | None = None           # fixed source name added pre-block
    prunes: tuple[tuple[str, str], ...] = ()
    pre: tuple[AddRule, ...] = ()       # overrides (before standard block)
    std: tuple[str, ...] = ("fromresponse", "htmlmeta", "schemaorg",
                            "opengraph", "scrapymeta")
    post: tuple[AddRule, ...] = ()      # gap-fillers (after standard block)
    readability: bool = False
    url_normalizer: Callable[[str], str] | None = None
    # sitemapindex child filter regexes (SitemapSpider.sitemap_follow;
    # e.g. reuters' date-window regex, uk/reuters.py:11-19,40)
    sitemap_follow: tuple[str, ...] | None = None
    # LinkExtractor crawl rules for link-following sites
    # (base/buzzfeednewscrawlspider.py:15-19, de/bild.py:75-90)
    link_allow: tuple[str, ...] = ()
    link_deny: tuple[str, ...] = ()
    link_restrict_xpaths: tuple[str, ...] = ()
    # offsite gate (allowed_domains + OffsiteDownloaderShim,
    # uk/independent.py:13-16, dlmiddlewares/offsitedownloadershim.py:20-39):
    # discovered children outside these domains are dropped
    allowed_domains: tuple[str, ...] = ()


def _take_first_strip(vals: list) -> list:
    """TakeFirst() + strip, as passed inline to add_xpath
    (uk/guardian.py:40)."""
    for v in vals:
        if v is not None and v != "":
            return [v.strip()]
    return []


def _bbc_headline(vals: list) -> list:
    """Strip BBC title dross (uk/bbc.py:36)."""
    if not vals:
        return []
    return [re.sub(r" - BBC (News(beat)?|Sport)$", "", vals[0])]


_DAILYMAIL_DROSS = re.compile(
    r" for (Dailymail.com|The Daily Mail|Daily Mail Australia|MailOnline)")


def _dailymail_bylines(vals: list) -> list:
    """Split multi-bylines and drop publication fluff
    (uk/dailymail.py:45-53)."""
    out = []
    for v in vals:
        for tok in split_multiple_byline_string(v):
            out.append(_DAILYMAIL_DROSS.sub("", tok))
    return out


def _wapo_dates(vals: list) -> list:
    """Repair compact tz offsets like '-500' (us/washingtonpost.py:59-63)."""
    return [repair_compact_tz(v) for v in vals]


def _unique_preserve(vals: list) -> list:
    """set()-style byline uniquify, order-preserved
    (us/washingtonpost.py:40-42)."""
    seen: set = set()
    out = []
    for v in vals:
        if v not in seen:
            seen.add(v)
            out.append(v)
    return out


def _title_case(vals: list) -> list:
    """str.title() bylines (uk/sun.py:40)."""
    return [v.title() for v in vals]


def _strip_millis(vals: list) -> list:
    """USAToday millisecond strip (us/usatoday.py:66-68) — wrapped_parse
    also handles this; kept for explicit site parity."""
    return [re.sub(r"\.\d+Z$", "Z", v) for v in vals]


def _metro_bylines(vals: list) -> list:
    """Drop ' For Metro.co.uk' byline fluff (uk/metro.py:44)."""
    return [re.sub(r" For Metro\.co\.uk", "", v, flags=re.IGNORECASE)
            for v in vals]


def _abc_timestamp(vals: list) -> list:
    """Strip the leading 'Author — ' from ABC timestamps
    (us/abc.py:45-50)."""
    return [re.sub(r".* — ", "", v, count=1) for v in vals]


GENERIC = SiteRules(
    key="generic",
    std=("fromresponse", "htmlmeta", "schemaorg", "opengraph", "dublincore",
         "scrapymeta"),
    readability=True,
)


SITE_RULES: tuple[SiteRules, ...] = (
    # --- uk/guardian.py:10-60 ---------------------------------------------
    SiteRules(
        key="guardian",
        hosts=("www.theguardian.com", "theguardian.com", "guardian.example"),
        source="The Guardian",
        prunes=(("xpath", '//div[contains(@class, "submeta")]'),
                ("xpath", "//aside")),
        std=("fromresponse", "htmlmeta", "schemaorg", "opengraph"),
        post=(
            AddRule("section",
                    "xpath", '//a[@data-link-name="article section"]/text()',
                    procs=_take_first_strip),
            AddRule("bodytext", "xpath",
                    '//article//div[contains(@class, "content__main-column")]'
                    '/*[not(contains(@class, "meta"))]//text()'),
        ),
    ),
    # --- uk/bbc.py:17-73 ---------------------------------------------------
    SiteRules(
        key="bbc",
        hosts=("www.bbc.co.uk", "bbc.co.uk", "www.bbc.com", "bbc.example"),
        source="BBC News",
        prunes=(("xpath", '//*[@class="off-screen"]'),),
        pre=(AddRule("headline", "xpath", "head/title/text()",
                     procs=_bbc_headline),),
        std=("fromresponse", "htmlmeta", "schemaorg", "opengraph",
             "scrapymeta"),
        post=(
            AddRule("bodytext", "xpath",
                    '//div[contains(@class, "main_article_text")]//text()'),
            AddRule("bodytext", "xpath",
                    '//div[contains(@class, "map-body")]//text()'),
            AddRule("bodytext", "xpath",
                    '//div[contains(@class, "story-body")]//text()'),
            AddRule("summary", "xpath",
                    '//div[contains(@class, "vxp-media__summary")]//text()'),
            AddRule("bodytext", "xpath",
                    '//div[contains(@class, "vxp-media__summary")]//text()'),
            AddRule("section", "value", "Newsbeat",
                    cond='//div[contains(@class, "newsbeatlogo")]'),
            AddRule("bylines", "xpath",
                    '//span[contains(@class, "byline__name")]/text()'),
            AddRule("bylines", "xpath",
                    '//p[contains(@class, "byline")]/text()'),
            AddRule("bylines", "xpath",
                    '//*[contains(@class, "story__byline")]'
                    '//p[contains(@class, "gel-long-primer") and '
                    'not(contains(@class, "gel-long-primer-bold"))]/text()'),
        ),
    ),
    # --- us/nytimes.py:16-54 ----------------------------------------------
    SiteRules(
        key="nytimes",
        hosts=("www.nytimes.com", "nytimes.com", "nytimes.example"),
        source="New York Times",
        prunes=(("xpath", '//footer[contains(@class, "story-footer")]'),
                ("css", ".nocontent"),
                ("css", ".visually-hidden"),
                ("css", ".newsletter-signup")),
        pre=(AddRule("url", "xpath", 'head/link[@rel="canonical"]/@href'),),
        std=("fromresponse", "htmlmeta", "schemaorg", "opengraph",
             "scrapymeta"),
        post=(
            AddRule("headline", "xpath",
                    '//*[contains(@class, "Post__headline")]//text()'),
            AddRule("section", "xpath",
                    '//*[contains(@class, "Post__kicker")]//text()'),
            AddRule("bodytext", "xpath",
                    '//*[contains(@class, "story-body") or '
                    'contains(@class, "Post__body")]//text()'),
            AddRule("bodytext", "xpath",
                    '//div[contains(@class, "body--story")]//p//text()'),
            AddRule("bodytext", "css", ".interactive-graphic ::text"),
        ),
    ),
    # --- us/cnn.py:15-43 ---------------------------------------------------
    SiteRules(
        key="cnn",
        hosts=("edition.cnn.com", "www.cnn.com", "cnn.example",
               "edition.cnn.example"),
        prunes=(("xpath", '//div[contains(@class, "read-more-button")]'),
                ("xpath", '//div[contains(@class, "el__embedded")]'),
                ("xpath", '//div[contains(@class, "owl-carousel")]')),
        std=("fromresponse", "htmlmeta", "schemaorg", "opengraph",
             "scrapymeta"),
        post=(
            AddRule("headline", "xpath",
                    '//article//meta[@itemprop="alternativeHeadline"]'
                    "/@content"),
            AddRule("headline", "xpath",
                    '//h1[contains(@class, "headline")]/text()'),
        ),
    ),
    # --- uk/dailymail.py:11-73 --------------------------------------------
    SiteRules(
        key="dailymail",
        hosts=("www.dailymail.co.uk", "dailymail.co.uk", "dailymail.example"),
        prunes=(("xpath", "//script"),
                ("xpath", '//*[@style="display:none"]'),
                ("xpath", '//div[contains(@class, "related-carousel")]')),
        pre=(
            AddRule("url", "xpath", 'head/link[@rel="canonical"]/@href'),
            AddRule("bylines", "xpath",
                    'head/meta[@property="article:author"]/@content',
                    procs=_dailymail_bylines),
        ),
        std=("fromresponse", "htmlmeta", "schemaorg", "opengraph"),
        url_normalizer=strip_query,  # uk/dailymail.py:16-20
    ),
    # --- us/washingtonpost.py:16-63 ---------------------------------------
    SiteRules(
        key="washingtonpost",
        hosts=("www.washingtonpost.com", "washingtonpost.com",
               "washingtonpost.example"),
        source="Washington Post",
        pre=(
            AddRule("bylines", "xpath",
                    '//a[@rel="author"]//text()', procs=_unique_preserve),
            AddRule("firstpubtime", "xpath",
                    '//*[@itemprop="datePublished" or '
                    '@property="datePublished"]/@content', procs=_wapo_dates),
        ),
        std=("fromresponse", "htmlmeta", "schemaorg", "opengraph",
             "scrapymeta"),
        post=(
            AddRule("bodytext", "xpath",
                    '//article[@itemprop="articleBody"]//text()'),
        ),
    ),
    # --- us/usatoday.py:19-68 ---------------------------------------------
    SiteRules(
        key="usatoday",
        hosts=("www.usatoday.com", "usatoday.com", "usatoday.example"),
        source="USA Today",
        pre=(
            AddRule("firstpubtime", "xpath",
                    'head/meta[@itemprop="datePublished"]/@content',
                    procs=_strip_millis),
        ),
        std=("fromresponse", "htmlmeta", "schemaorg", "opengraph",
             "scrapymeta"),
        post=(
            AddRule("bodytext", "xpath",
                    '//div[contains(@class, "story-asset") or '
                    'contains(@class, "article-wrapper")]//p//text()'),
            AddRule("section", "xpath",
                    'head/meta[@itemprop="articleSection"]/@content',
                    procs=lambda vals: [v.title() for v in vals]),
        ),
    ),
    # --- us/foxnews.py:15-47 ----------------------------------------------
    SiteRules(
        key="foxnews",
        hosts=("www.foxnews.com", "foxnews.com", "foxnews.example"),
        source="Fox News",
        std=("fromresponse", "htmlmeta", "schemaorg", "opengraph",
             "dublincore", "scrapymeta"),
        post=(
            AddRule("bodytext", "xpath",
                    '//div[contains(@class, "article-body")]//text()'),
        ),
    ),
    # --- uk/sun.py ---------------------------------------------------------
    SiteRules(
        key="sun",
        hosts=("www.thesun.co.uk", "thesun.co.uk", "sun.example"),
        source="The Sun",
        std=("fromresponse", "htmlmeta", "schemaorg", "opengraph",
             "scrapymeta"),
        post=(
            AddRule("bylines", "xpath",
                    '//span[contains(@class, "article__author-name")]'
                    "//text()", procs=_title_case),
            AddRule("bodytext", "xpath",
                    '//div[contains(@class, "article__content")]//text()'),
        ),
    ),
    # --- de/bild.py:11-94 (readability + fallbacks) ------------------------
    SiteRules(
        key="bild",
        hosts=("www.bild.de", "bild.de", "bild.example"),
        source="Bild",
        std=("fromresponse", "htmlmeta", "schemaorg", "opengraph",
             "dublincore", "scrapymeta"),
        readability=True,
    ),
    # --- base/businessinsiderspider.py:13-65 -------------------------------
    SiteRules(
        key="businessinsider",
        hosts=("www.businessinsider.com", "businessinsider.com",
               "businessinsider.example"),
        source="Business Insider",
        std=("fromresponse", "htmlmeta", "schemaorg", "opengraph",
             "dublincore", "scrapymeta"),
        post=(
            AddRule("bodytext", "xpath",
                    '//div[contains(@class, "post-content")]//text()'),
        ),
        url_normalizer=lambda u: force_query_param(u, "IR", "C"),
    ),
    # --- uk/telegraph.py:15-48 --------------------------------------------
    SiteRules(
        key="telegraph",
        hosts=("www.telegraph.co.uk", "telegraph.co.uk",
               "telegraph.example"),
        pre=(
            AddRule("section", "xpath",
                    '//a[contains(@class, "header-breadcrumbs__link")]'
                    "//text()", procs=_take_first_strip),
            AddRule("bylines", "xpath",
                    '//main//*[@itemprop="author"]'
                    '//*[@itemprop="name"]//text()'),
        ),
        post=(
            AddRule("notes", "value", "Premium paywall",
                    cond='//div[contains(@class, "premium-paywall")]'),
        ),
    ),
    # --- uk/metro.py:16-45 -------------------------------------------------
    SiteRules(
        key="metro",
        hosts=("metro.co.uk", "www.metro.co.uk", "metro.example"),
        pre=(
            AddRule("bodytext", "xpath",
                    '//div[contains(@class, "article-body")]//text()'),
        ),
        post=(
            AddRule("bylines", "xpath",
                    '//span[contains(@class, "byline")]'
                    '//a[@rel="author"]//text()', procs=_metro_bylines),
        ),
    ),
    # --- uk/mirror.py:15-40 ------------------------------------------------
    SiteRules(
        key="mirror",
        hosts=("www.mirror.co.uk", "mirror.co.uk", "mirror.example"),
        prunes=(("xpath", "//form"),
                ("xpath", '//aside[contains(@class,"read-more-links")]')),
        post=(AddRule("bodytext", "css", ".article-body ::text"),),
    ),
    # --- uk/independent.py:17-50 ------------------------------------------
    SiteRules(
        key="independent",
        hosts=("www.independent.co.uk", "independent.co.uk",
               "independent.example"),
        prunes=(("css", ".type-gallery"),
                ("xpath",
                 '//li[contains(text(), "More about")]/'
                 'parent::*[contains(@class, "inline-pipes-list")]')),
        pre=(
            AddRule("bylines", "xpath",
                    '//article//*[@itemprop="author"]'
                    '//*[@itemprop="name"]//text()'),
        ),
        # "Don't accept off-domain redirects to thinly-branded content"
        # (uk/independent.py:13-16)
        allowed_domains=("independent.co.uk", "independent.example"),
    ),
    # --- uk/reuters.py:20-77 (date-window sitemap follow) ------------------
    SiteRules(
        key="reuters",
        hosts=("uk.reuters.com", "reuters.example"),
        source="Reuters [UK]",
        prunes=(("css", "div.related-content"),),
        std=("fromresponse", "htmlmeta", "schemaorg", "scrapymeta"),
        post=(
            AddRule("bodytext", "xpath",
                    '//span[@id="article-text"]/'
                    '*[not(contains(@class, "author"))]//text()'),
            AddRule("summary", "xpath",
                    '//meta[@name="description"]/@content'),
            AddRule("notes", "value", "fetchtime delayed by slow feed"),
        ),
        sitemap_follow=(r"\.xml$",),  # date-window regex injected by config
    ),
    # --- us/abc.py:16-50 ---------------------------------------------------
    SiteRules(
        key="abc",
        hosts=("abcnews.go.com", "abc.example"),
        post=(
            AddRule("section", "xpath", "//article/@data-section"),
            AddRule("modtime", "xpath",
                    'head/meta[@name="Last-Modified"]/@content'),
            AddRule("firstpubtime", "xpath",
                    '//div[contains(@class, "article-meta")]'
                    '//span[contains(@class, "timestamp")]/text()',
                    procs=_abc_timestamp),
        ),
    ),
    # --- us/cbs.py:15-43 ---------------------------------------------------
    SiteRules(
        key="cbs",
        hosts=("www.cbsnews.com", "cbsnews.com", "cbs.example"),
        post=(
            AddRule("bodytext", "xpath",
                    '//div[contains(@class, "post")]//text()'),
            AddRule("bodytext", "xpath",
                    '//div[@itemid="#article-entry"]//text()'),
        ),
    ),
    # --- us/nbc.py:15-39 ---------------------------------------------------
    SiteRules(
        key="nbc",
        hosts=("www.nbcnews.com", "nbcnews.com", "nbc.example"),
        post=(
            AddRule("bodytext", "xpath",
                    '//div[contains(@class, "article-body")]//text()'),
        ),
    ),
    # --- us/yahoo.py:16-48 (no schemaorg!) ---------------------------------
    SiteRules(
        key="yahoo",
        hosts=("www.yahoo.com", "yahoo.example"),
        source="Yahoo! News [US]",
        std=("fromresponse", "htmlmeta", "opengraph", "scrapymeta"),
        post=(
            AddRule("bodytext", "xpath",
                    '//div[contains(@class, "canvas-body")]/p/text()'),
            AddRule("firstpubtime", "xpath",
                    '//div[contains(@class, "auth-attr")]'
                    "//time/@datetime"),
            AddRule("bylines", "xpath",
                    '//div[contains(@class, "auth-attr")]'
                    '//div[contains(@class, "author-name")]//text()'),
        ),
    ),
    # --- us/prnewswire.py + uk/prnewswireuk.py ------------------------------
    SiteRules(
        key="prnewswire",
        hosts=("www.prnewswire.com", "www.prnewswire.co.uk",
               "prnewswire.example"),
        source="PR Newswire",
        pre=(
            AddRule("summary", "xpath",
                    '//meta[@name="description"]/@content'),
            AddRule("bylines", "xpath", '//meta[@name="author"]/@content'),
        ),
        post=(
            AddRule("firstpubtime", "xpath",
                    '//meta[@name="date"]/@content'),
        ),
    ),
    # --- base/huffpospider.py:10-34 ----------------------------------------
    SiteRules(
        key="huffpo",
        hosts=("www.huffingtonpost.co.uk", "www.huffingtonpost.com",
               "www.huffingtonpost.de", "huffpo.example"),
        pre=(
            AddRule("bylines", "xpath",
                    '//*[contains(@class, "author-card__details__name")]'
                    "//text()"),
            AddRule("bodytext", "xpath",
                    '//div[contains(@class, "entry__body")]//text()'),
            AddRule("bodytext", "xpath",
                    '//div[@id="mainentrycontent"]//text()'),
        ),
    ),
    # --- base/buzzfeedspider.py:10-36 + buzzfeednewscrawlspider ------------
    SiteRules(
        key="buzzfeed",
        hosts=("www.buzzfeed.com", "buzzfeed.example"),
        prunes=(("xpath",
                 '//*[contains(@class, "print") or '
                 'contains(@class, "hidden")]'),),
        pre=(AddRule("url", "xpath", 'head/link[@rel="canonical"]/@href'),),
        post=(
            AddRule("bodytext", "xpath",
                    '//div[@data-print="body"]/'
                    '*[not(contains(@class, "user-bio") or '
                    'contains(@class, "_shares") or '
                    'contains(@class, "inline-promo"))]//text()'),
            AddRule("bodytext", "xpath",
                    '//div[contains(@class, "_item_text")]//text()'),
            AddRule("bodytext", "xpath",
                    '//article//*[contains(@class, "subbuzz-text") or '
                    'contains(@class, "subbuzz__title")]//text()'),
        ),
        # CrawlSpider rules (base/buzzfeednewscrawlspider.py:15-19)
        link_allow=(r"buzzfeed[^/]*/[^/]+/[a-z0-9-]+$",),
        link_deny=(r"/(about|contact|jobs|press)",),
    ),
    # --- base/vicespider.py:29-58 ------------------------------------------
    SiteRules(
        key="vice",
        hosts=("news.vice.com", "www.vice.com", "vice.example"),
        source="Vice News",
        std=("fromresponse", "htmlmeta", "schemaorg", "opengraph",
             "dublincore", "scrapymeta"),
        post=(
            AddRule("bodytext", "xpath",
                    '//div[contains(@class, "article-content")]//text()'),
        ),
        link_allow=(r"vice[^/]*/article/",),
    ),
    # --- uk/liverpoolecho.py:54-190 (articleid; comments join via J5) -------
    SiteRules(
        key="liverpoolecho",
        hosts=("www.liverpoolecho.co.uk", "liverpoolecho.example"),
        prunes=(("xpath", "//form"),
                ("xpath", '//aside[contains(@class,"read-more-links")]')),
        pre=(
            AddRule("articleid", "xpath", "//article/@data-article-id"),
        ),
        post=(AddRule("bodytext", "css", ".article-body ::text"),),
    ),
)


_HOST_INDEX: dict[str, SiteRules] = {}
for rules in SITE_RULES:
    for h in rules.hosts:
        _HOST_INDEX[h] = rules


def rules_for_url(url: str) -> SiteRules:
    """Host → SiteRules dispatch (the spider-per-site design as a lookup;
    unknown hosts get the generic ensemble + readability fallback)."""
    return _HOST_INDEX.get(host_of(url), GENERIC)


def rules_for_host(host: str) -> SiteRules:
    return _HOST_INDEX.get(host, GENERIC)
