"""Deterministic synthetic pages + golden expected values (FIXTURES.md).

Generates the Common-Crawl-style ``pages`` table (BASELINE.json input_hint
shape) whose rows exercise every extraction channel of the reference
(SURVEY.md 2.3 M8), plus the matching ``expected`` table of golden NewsItem
fields. Goldens are computed HERE from the plant values and the reference's
*documented* semantics (loaders.py transforms), not by running the engine —
the engine must independently reproduce them byte-for-byte.

Everything derives from (seed, row-index); no wall clock, no global RNG.
"""

from __future__ import annotations

import html as _html
import json
import random
from datetime import datetime, timedelta, timezone

import pyarrow as pa

BASE_TS = datetime(2017, 3, 1, 0, 0, 0, tzinfo=timezone.utc)

# FIXTURES.md section 5 — Zipf-ish host skew: 2 hot, 8 warm, 50 cold.
HOT_HOSTS = ("bbc.example", "nytimes.example")
WARM_HOSTS = ("guardian.example", "cnn.example", "dailymail.example",
              "foxnews.example", "washingtonpost.example", "usatoday.example",
              "sun.example", "bild.example")
COLD_HOSTS = tuple(f"site{i:02d}.example" for i in range(50))

_WORDS = ("market regulation economy policy minister council committee "
          "report growth deficit industry housing election debate border "
          "science climate research hospital school transport energy trade "
          "union court justice media technology network culture").split()

_SENT_TAILS = (
    "officials said on Tuesday",
    "according to people familiar with the matter",
    "the committee concluded after a lengthy review",
    "despite objections from opposition members",
    "in a move welcomed by industry groups",
)

FAMILIES = ("jsonld", "jsonld_broken", "microdata", "opengraph", "dublincore",
            "htmlmeta", "bodyxpath", "readability_fallback",
            "ensemble_priority", "unwanted", "fake404", "nulbytes",
            "entities_escapes", "dates_dirty", "bylines_fluff")

# Site container markup for the bodyxpath family: host -> (before, after)
# wrapping the paragraph run so the site's own selector (siterules.py) finds
# it. Written with no inter-tag whitespace so text nodes == paragraphs.
_SITE_BODY = {
    "guardian.example": (
        '<article><div class="content__main-column"><div>{paras}</div>'
        "</div></article>"),
    "bbc.example": '<div class="story-body">{paras}</div>',
    "nytimes.example": '<div class="story-body">{paras}</div>',
    "cnn.example": '<div itemprop="articleBody">{paras}</div>',
    "dailymail.example": '<div itemprop="articleBody">{paras}</div>',
    "foxnews.example": '<div class="article-body">{paras}</div>',
    "washingtonpost.example": (
        '<article itemprop="articleBody">{paras}</article>'),
    "usatoday.example": '<div class="article-wrapper">{paras}</div>',
    "sun.example": '<div class="article__content">{paras}</div>',
    "bild.example": '<div itemprop="articleBody">{paras}</div>',
    # second-tranche sites (siterules.py citations per entry)
    "metro.example": '<div class="article-body">{paras}</div>',
    "mirror.example": '<div class="article-body">{paras}</div>',
    "cbs.example": '<div class="post">{paras}</div>',
    "nbc.example": '<div class="article-body">{paras}</div>',
    "yahoo.example": '<div class="canvas-body">{paras}</div>',
    "huffpo.example": '<div class="entry__body">{paras}</div>',
    "vice.example": '<div class="article-content">{paras}</div>',
    "reuters.example": '<span id="article-text">{paras}</span>',
    "telegraph.example": '<div itemprop="articleBody">{paras}</div>',
    "independent.example": '<div itemprop="articleBody">{paras}</div>',
}

_SITE_SOURCE = {
    "guardian.example": "The Guardian",
    "bbc.example": "BBC News",
    "nytimes.example": "New York Times",
    "foxnews.example": "Fox News",
    "washingtonpost.example": "Washington Post",
    "usatoday.example": "USA Today",
    "sun.example": "The Sun",
    "bild.example": "Bild",
    "reuters.example": "Reuters [UK]",
    "vice.example": "Vice News",
    "yahoo.example": "Yahoo! News [US]",
}


def _rng(seed: int, i: int, salt: str = "") -> random.Random:
    return random.Random(f"{seed}:{salt}:{i}")


def _pick_host(r: random.Random) -> str:
    roll = r.random()
    if roll < 0.4:
        return HOT_HOSTS[r.randrange(len(HOT_HOSTS))]
    if roll < 0.8:
        return WARM_HOSTS[r.randrange(len(WARM_HOSTS))]
    return COLD_HOSTS[r.randrange(len(COLD_HOSTS))]


def _sentence(r: random.Random) -> str:
    words = [r.choice(_WORDS) for _ in range(r.randint(6, 12))]
    return (" ".join(words)).capitalize() + ", " + r.choice(_SENT_TAILS) + "."


def _paragraphs(r: random.Random, n: int) -> list[str]:
    return [" ".join(_sentence(r) for _ in range(r.randint(2, 4)))
            for _ in range(n)]


def _clean(s: str) -> str:
    """The documented headline/summary/bodytext normalization: escape chars
    -> ' ', entities decoded (loaders.py:84-102)."""
    for ch in ("\n", "\t", "\r"):
        s = s.replace(ch, " ")
    return _html.unescape(s)


def make_page(seed: int, i: int) -> tuple[dict, dict]:
    """Build one synthetic article page. Returns (page_row, expected_row)."""
    r = _rng(seed, i)
    family = FAMILIES[i % len(FAMILIES)]
    host = _pick_host(r)
    if family == "fake404":
        host = "foxnews.example"
    elif family == "ensemble_priority":
        host = "bbc.example"
    elif family == "bylines_fluff":
        host = "dailymail.example"
    elif family == "dates_dirty":
        host = "washingtonpost.example"
    elif family == "bodyxpath":
        # i // len(FAMILIES) walks every site in turn (i % len(_SITE_BODY)
        # would only hit gcd-many residues)
        host = list(_SITE_BODY)[(i // len(FAMILIES)) % len(_SITE_BODY)]
    elif family in ("jsonld", "jsonld_broken", "microdata", "opengraph",
                    "dublincore", "htmlmeta", "readability_fallback",
                    "nulbytes", "entities_escapes"):
        host = COLD_HOSTS[r.randrange(len(COLD_HOSTS))]

    section = r.choice(("politics", "business", "science", "sport", "world"))
    yyyy, mm, dd = 2017, 3, 1 + (i % 28)
    slug = "-".join(r.choice(_WORDS) for _ in range(3))
    url = f"https://{host}/{section}/{yyyy}/{mm:02d}/{dd:02d}/{slug}-{i}"
    warc_ts = BASE_TS + timedelta(seconds=137 * i)
    pub = BASE_TS + timedelta(seconds=100 * i)
    mod = pub + timedelta(hours=2)
    headline = f"Headline {i}: {r.choice(_WORDS).capitalize()} {r.choice(_WORDS)}"
    summary = f"Summary {i}: {_sentence(r)}"
    author = f"{r.choice(('Alex', 'Sam', 'Jo', 'Chris', 'Pat'))} {r.choice(('Smith', 'Jones', 'Brown', 'Taylor', 'Wilson'))}"
    keywords = [r.choice(_WORDS) for _ in range(3)]
    paras = _paragraphs(r, r.randint(2, 4))
    body_expected = _clean(" ".join(paras))
    lang = "de" if host == "bild.example" else "en"

    exp: dict = {
        "url": url, "family": family, "dropped": False,
        "headline": headline, "bodytext": body_expected,
        "summary": None, "source": None, "section": None,
        "bylines": None, "keywords": None,
        "firstpubtime": None, "modtime": None, "language": None,
    }

    ptags = "".join(f"<p>{p}</p>" for p in paras)
    head_extra = ""
    body_html = f'<div class="article-content">{ptags}</div>'
    title = headline

    if family == "jsonld":
        ld = {
            "@context": "https://schema.org",
            "@type": "NewsArticle",
            "headline": headline,
            "articleBody": " ".join(paras),
            "articleSection": section,
            "datePublished": pub.isoformat(),
            "dateModified": mod.isoformat(),
            "keywords": ",".join(keywords),
            "author": {"@type": "Person", "name": author},
            "publisher": {"@type": "Organization", "name": "Example Org"},
        }
        head_extra = ('<script type="application/ld+json">'
                      + json.dumps(ld) + "</script>")
        body_html = f"<div>{ptags}</div>"
        exp.update(source="Example Org", section=section,
                   bylines=[author], keywords=keywords,
                   firstpubtime=pub.isoformat(), modtime=mod.isoformat(),
                   language=lang)
    elif family == "jsonld_broken":
        head_extra = ('<script type="application/ld+json">{broken'
                      "</script>"
                      f'<meta property="og:title" content="{headline}">'
                      f'<meta property="og:description" content="{summary}">')
        exp.update(summary=summary, language=lang)
    elif family == "microdata":
        head_extra = (
            f'<meta itemprop="datePublished" content="{pub.isoformat()}">'
            f'<meta itemprop="dateModified" content="{mod.isoformat()}">'
            f'<meta itemprop="keywords" content="{",".join(keywords)}">'
            f'<meta itemprop="articleSection" content="{section}">')
        body_html = (f'<h1 itemprop="headline">{headline}</h1>'
                     f'<div itemprop="articleBody">{ptags}</div>')
        exp.update(section=section, keywords=keywords,
                   firstpubtime=pub.isoformat(), modtime=mod.isoformat(),
                   language=lang)
    elif family == "opengraph":
        head_extra = (
            f'<meta property="og:site_name" content="Example Site">'
            f'<meta property="og:title" content="{headline}">'
            f'<meta property="og:description" content="{summary}">'
            f'<meta property="article:published_time" content="{pub.isoformat()}">'
            f'<meta property="article:modified_time" content="{mod.isoformat()}">'
            f'<meta property="article:section" content="{section}">'
            f'<meta property="article:author" content="{author}">'
            f'<meta property="article:tag" content="{keywords[0]}">')
        exp.update(source="Example Site", summary=summary, section=section,
                   bylines=[author], keywords=[keywords[0]],
                   firstpubtime=pub.isoformat(), modtime=mod.isoformat(),
                   language=lang)
    elif family == "dublincore":
        head_extra = (
            f'<meta name="dc.title" content="{headline}">'
            f'<meta name="dcterms.abstract" content="{summary}">'
            f'<meta name="dcterms.modified" content="{mod.isoformat()}">'
            f'<meta name="dcterms.created" content="{pub.isoformat()}">'
            f'<meta name="dc.publisher" content="Example Pub">')
        exp.update(source="Example Pub", summary=summary,
                   firstpubtime=pub.isoformat(), modtime=mod.isoformat(),
                   language=lang)
    elif family == "htmlmeta":
        head_extra = (
            f'<meta name="author" content="{author}">'
            f'<meta name="news_keywords" content="{",".join(keywords)}">')
        exp.update(bylines=[author], keywords=keywords, language=lang)
    elif family == "bodyxpath":
        og_name = _SITE_SOURCE.get(host) or "Site Name"
        head_extra = (f'<meta property="og:title" content="{headline}">'
                      f'<meta property="og:site_name" content="{og_name}">')
        body_html = _SITE_BODY[host].format(paras=ptags)
        if host == "reuters.example":
            # reuters skips opengraph (uk/reuters.py:64): headline must
            # come through the schema.org channel instead
            body_html = (f'<h1 itemprop="headline">{headline}</h1>'
                         + body_html)
        exp.update(source=_SITE_SOURCE.get(host, og_name), language=lang)
    elif family == "readability_fallback":
        body_html = (f'<div class="sidebar"><p>Related links and promo '
                     f"items live here, {i}.</p></div>"
                     f'<div class="article-content">{ptags}</div>')
        exp.update(language=lang)
    elif family == "ensemble_priority":
        # pre-add (title strip) beats og:title; schema.org articleBody
        # (std block) beats the site's story-body post-add.
        title = f"{headline} - BBC News"
        alt_body = "WRONG body from late fallback."
        head_extra = (f'<meta property="og:title" content="OG {headline}">'
                      f'<meta property="og:site_name" content="BBC og">')
        body_html = (f'<div itemprop="articleBody">{ptags}</div>'
                     f'<div class="story-body"><p>{alt_body}</p></div>')
        exp.update(source="BBC News", language=lang)
    elif family == "unwanted":
        junk = ('<figure>caption junk</figure><script>var x=1;</script>'
                '<style>.a{color:red}</style><form>input junk</form>'
                "<aside>aside junk</aside>")
        head_extra = f'<meta property="og:title" content="{headline}">'
        body_html = ('<article><div class="content__main-column">'
                     f"<div>{junk}{ptags}</div>"
                     '<div class="submeta"><p>submeta junk</p></div>'
                     "</div></article>")
        # guardian body selector; pruned nodes must not appear
        exp.update(source="The Guardian", language=lang)
        if host != "guardian.example":
            url = url.replace(host, "guardian.example")
            exp["url"] = url
            host = "guardian.example"
    elif family == "fake404":
        body_html = "<h1>Something has gone wrong</h1>"
        exp = {"url": url, "family": family, "dropped": True,
               "headline": None, "bodytext": None, "summary": None,
               "source": None, "section": None, "bylines": None,
               "keywords": None, "firstpubtime": None, "modtime": None,
               "language": None}
        body_expected = ""
    elif family == "nulbytes":
        nul_paras = [p[: len(p) // 2] + "\x00" + p[len(p) // 2:]
                     for p in paras]
        ptags = "".join(f"<p>{p}</p>" for p in nul_paras)
        body_html = f'<div class="article-content">{ptags}</div>'
        exp.update(language=lang)  # NULs stripped -> same expected body
    elif family == "entities_escapes":
        dirty = [p.replace(", ", ",\n\t").replace(" and ", " &amp; ", 1)
                 + " It&#8217;s fine." for p in paras]
        ptags = "".join(f"<p>{p}</p>" for p in dirty)
        body_html = f'<div itemprop="articleBody">{ptags}</div>'
        body_expected = _clean(" ".join(
            p.replace(", ", ",\n\t").replace(" and ", " & ", 1)
            + " It’s fine." for p in paras))
        exp.update(bodytext=body_expected, language=lang)
    elif family == "dates_dirty":
        # WaPo: compact tz repaired by the site rule; millis variant parsed
        compact = pub.strftime("%Y-%m-%dT%H:%M:%S") + "-500"
        millis = mod.strftime("%Y-%m-%dT%H:%M:%S") + ".787Z"
        head_extra = (
            f'<meta itemprop="datePublished" content="{compact}">'
            f'<meta itemprop="dateModified" content="{millis}">'
            f'<meta property="og:title" content="{headline}">')
        body_html = f'<article itemprop="articleBody">{ptags}</article>'
        fixed_pub = pub.replace(tzinfo=timezone(timedelta(hours=-5)))
        exp.update(source="Washington Post",
                   firstpubtime=fixed_pub.isoformat(),
                   modtime=mod.isoformat(), language=lang)
    elif family == "bylines_fluff":
        fluffy = f"{author} and Jane Doe, Chief Reporter for MailOnline"
        head_extra = (
            f'<meta property="article:author" content="{fluffy}">'
            f'<meta property="og:title" content="{headline}">'
            f'<meta property="og:site_name" content="Daily Mail">')
        body_html = f'<div itemprop="articleBody">{ptags}</div>'
        # split_multiple_byline_string keeps 'Jane Doe' and drops only the
        # ', Chief Reporter ...' token (reference utils.py:43-49)
        exp.update(source="Daily Mail", bylines=[author, "Jane Doe"],
                   language=lang)

    html_doc = (f'<html lang="{lang}"><head><title>{title}</title>'
                f"{head_extra}</head><body>{body_html}</body></html>")

    page = {"url": url, "warc_ts": warc_ts,
            "html": html_doc.encode("utf-8"),
            "text": "" if exp.get("dropped") else body_expected,
            "lang": lang}
    return page, exp


PAGE_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us", tz="UTC")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

EXPECTED_SCHEMA = pa.schema([
    ("url", pa.string()), ("family", pa.string()), ("dropped", pa.bool_()),
    ("headline", pa.string()), ("bodytext", pa.string()),
    ("summary", pa.string()), ("source", pa.string()),
    ("section", pa.string()),
    ("bylines", pa.list_(pa.string())), ("keywords", pa.list_(pa.string())),
    ("firstpubtime", pa.string()), ("modtime", pa.string()),
    ("language", pa.string()),
])


def gen_pages(n: int, seed: int = 42,
              start: int = 0) -> tuple[pa.Table, pa.Table]:
    """Generate ``n`` article pages (indices start..start+n) and their
    goldens as Arrow tables."""
    pages, exps = [], []
    for i in range(start, start + n):
        p, e = make_page(seed, i)
        pages.append(p)
        exps.append(e)
    return (pa.Table.from_pylist(pages, schema=PAGE_SCHEMA),
            pa.Table.from_pylist(exps, schema=EXPECTED_SCHEMA))


# ---------------------------------------------------------------------------
# Discovery fixtures (FIXTURES.md section 3): robots / sitemaps / feeds
# ---------------------------------------------------------------------------

# Hosts whose discovery channel is a feed rather than a sitemap, mirroring
# the reference's spider types (bbc = RSS, dailymail = RSS w/ tracking junk)
RSS_HOSTS = ("bbc.example", "dailymail.example")
ATOM_HOSTS = ("sun.example",)

# EquivalentDomains fixture: discovery lists article URLs under an alias
# netloc that must be canonicalized back to the page host
# (spmiddlewares/equivalentdomains.py:36-52, settings.py:176).
EQUIVALENT_DOMAINS = {"www.cnn.example": "cnn.example"}
_ALIASED_HOSTS = {"cnn.example": "www.cnn.example"}


def _alias(url: str, host: str) -> str:
    alias = _ALIASED_HOSTS.get(host)
    return url.replace(f"https://{host}/", f"https://{alias}/") if alias else url


def gen_discovery_pages(article_urls_by_host: dict[str, list[str]],
                        seed: int = 42,
                        headline_of: dict[str, str] | None = None
                        ) -> list[dict]:
    """Discovery pages (robots.txt + sitemapindex + urlset shards, or
    RSS/Atom feeds) whose entries point at the given article URLs.

    ``headline_of`` maps article url -> its real headline: like real news
    sitemaps/feeds, the <news:title>/<item><title> carries the article's
    actual title (the reference's scrapymeta channel surfaces it when no
    page channel yields a headline, loaders.py:336-397)."""
    headline_of = headline_of or {}
    rows: list[dict] = []
    ts = BASE_TS

    def page(url: str, body: str) -> None:
        rows.append({"url": url, "warc_ts": ts,
                     "html": body.encode("utf-8"), "text": "", "lang": "en"})

    # real sitemaps cap at 50k URLs; we shard at 5k so big corpora get
    # many parse-parallel shards, and feeds cap like real RSS (the rest
    # of a feed host's articles are covered by its sitemap — union of
    # sources, reference uk/guardian.py:62-67 pattern)
    SITEMAP_SHARD = 5000
    FEED_CAP = 2000

    def emit_sitemaps(host: str, urls: list[str]) -> None:
        page(f"https://{host}/robots.txt",
             "User-agent: *\nDisallow: /private/\n"
             f"Sitemap: https://{host}/sitemap.xml\n")
        shard_urls = []
        for k in range(0, max(1, -(-len(urls) // SITEMAP_SHARD))):
            shard = urls[k * SITEMAP_SHARD:(k + 1) * SITEMAP_SHARD]
            if not shard:
                continue
            su = f"https://{host}/sitemap-{k}.xml"
            shard_urls.append(su)
            entries = []
            for j, u in enumerate(shard):
                lastmod = (BASE_TS + timedelta(seconds=90 * j)).isoformat()
                entries.append(
                    f"<url><loc>{_alias(u, host)}</loc>"
                    f"<lastmod>{lastmod}</lastmod>"
                    f"<news:news><news:keywords>newskw</news:keywords>"
                    f"<news:publication_date>{lastmod}"
                    f"</news:publication_date>"
                    f"<news:title>{headline_of.get(u) or f'News title {j}'}"
                    f"</news:title>"
                    f"</news:news></url>")
            page(su,
                 '<?xml version="1.0"?>'
                 '<urlset xmlns="http://www.sitemaps.org/schemas/'
                 'sitemap/0.9" xmlns:news="http://www.google.com/'
                 'schemas/sitemap-news/0.9">'
                 f"{''.join(entries)}</urlset>")
        index = "".join(f"<sitemap><loc>{su}</loc></sitemap>"
                        for su in shard_urls)
        page(f"https://{host}/sitemap.xml",
             '<?xml version="1.0"?>'
             '<sitemapindex xmlns="http://www.sitemaps.org/schemas/'
             f'sitemap/0.9">{index}</sitemapindex>')

    for host in sorted(article_urls_by_host):
        urls = article_urls_by_host[host]
        if host in RSS_HOSTS:
            items = []
            for j, u in enumerate(urls[:FEED_CAP]):
                link = _alias(u, host)
                if host == "dailymail.example":
                    link += "?ITO=1490"  # tracking junk -> strip_query
                pub = (BASE_TS + timedelta(seconds=60 * j)).strftime(
                    "%a, %d %b %Y %H:%M:%S GMT")
                items.append(
                    f"<item><title>"
                    f"{headline_of.get(u) or f'Feed title {j}'}"
                    f"</title><link>{link}</link>"
                    f"<description>Feed desc {j}</description>"
                    f"<category>feedcat</category>"
                    f"<pubDate>{pub}</pubDate></item>")
            page(f"https://{host}/feed.rss",
                 '<?xml version="1.0"?><rss version="2.0"><channel>'
                 f"<title>{host}</title>{''.join(items)}</channel></rss>")
            if len(urls) > FEED_CAP:
                emit_sitemaps(host, urls)
        elif host in ATOM_HOSTS:
            entries = "".join(
                f'<entry><link href="{_alias(u, host)}"/></entry>'
                for u in urls[:FEED_CAP])
            page(f"https://{host}/feed.atom",
                 '<?xml version="1.0"?>'
                 '<feed xmlns="http://www.w3.org/2005/Atom">'
                 f"{entries}</feed>")
            if len(urls) > FEED_CAP:
                emit_sitemaps(host, urls)
        else:
            emit_sitemaps(host, urls)
    return rows


def gen_corpus(n_articles: int, seed: int = 42
               ) -> tuple[pa.Table, pa.Table, list[dict], dict[str, str]]:
    """Full crawl corpus: article pages + discovery pages + seed list.

    Returns (pages, expected, seeds, robots_bodies). Seeds are robots.txt
    URLs for sitemap hosts and feed URLs for RSS/Atom hosts — EP1/EP2 of
    SURVEY.md section 3.1.
    """
    art_pages, expected = gen_pages(n_articles, seed=seed)
    by_host: dict[str, list[str]] = {}
    for row in art_pages.select(["url"]).to_pylist():
        url = row["url"]
        host = url.split("/", 3)[2]
        by_host.setdefault(host, []).append(url)
    headline_of = {r["url"]: r["headline"]
                   for r in expected.to_pylist()}
    disc_rows = gen_discovery_pages(by_host, seed=seed,
                                    headline_of=headline_of)
    pages = pa.concat_tables(
        [art_pages, pa.Table.from_pylist(disc_rows, schema=PAGE_SCHEMA)])

    seeds: list[dict] = []
    robots_bodies: dict[str, str] = {}
    for host in sorted(by_host):
        feed_host = host in RSS_HOSTS or host in ATOM_HOSTS
        if host in RSS_HOSTS:
            seeds.append({"url": f"https://{host}/feed.rss", "kind": "rss"})
        elif host in ATOM_HOSTS:
            seeds.append({"url": f"https://{host}/feed.atom", "kind": "atom"})
        if not feed_host or len(by_host[host]) > 2000:
            # sitemap channel (feed hosts above the feed cap use BOTH —
            # union of sources, like guardian's sitemap+specified pair)
            seeds.append({"url": f"https://{host}/robots.txt",
                          "kind": "robots"})
            robots_bodies[host] = ("User-agent: *\nDisallow: /private/\n"
                                   f"Sitemap: https://{host}/sitemap.xml\n")
    return pages, expected, seeds, robots_bodies
