"""Content-scoring fallback extractor (readability-lxml replacement).

Reference behavior: NewsLoader.add_readability (loaders.py:399-423) runs
readability-lxml only when headline or bodytext are still empty, taking
``short_title()`` for the headline and ``//body//text()`` of the cleaned
summary for the body. That library is unavailable offline, so this is a
from-scratch paragraph-density scorer with the same role (SURVEY.md 7.0):

- headline: the <title> text; when it contains ' - ' / ' | ' style site
  chaff, the longest delimited segment wins (short_title's documented
  purpose: "strips chaff").
- bodytext: each <p> scores 1 + one point per comma + one per full 100
  chars (capped at 3); scores propagate to the parent (x1) and grandparent
  (x0.5); container class/id names shift the score (story/article/content
  positive, sidebar/related/promo/footer negative); the best container's
  text nodes become one bodytext candidate.

Deterministic; ties broken by document order.
"""

from __future__ import annotations

import re

from ..html.dom import Node
from ..html.select import xpath as xpath_select

_TITLE_DELIMS = re.compile(r" [\|\-–—»:] ")

_NEGATIVE = re.compile(
    r"comment|combx|disqus|foot|header|menu|nav|rss|shoutbox|sidebar|related|"
    r"sponsor|promo|ad-|advert|share|social|breadcrumb", re.I)
_POSITIVE = re.compile(
    r"article|body|content|entry|hentry|main|page|pagination|post|text|blog|"
    r"story", re.I)

_CONTAINER_TAGS = frozenset({"div", "article", "section", "main", "td"})


def short_title(root: Node) -> str | None:
    titles = xpath_select(root, "head/title/text()")
    if not titles:
        return None
    title = titles[0].strip()
    parts = [p.strip() for p in _TITLE_DELIMS.split(title) if p.strip()]
    if len(parts) <= 1:
        return title or None
    return max(parts, key=len)


def _class_weight(node: Node) -> float:
    ident = f"{node.get('class') or ''} {node.get('id') or ''}"
    w = 0.0
    if _NEGATIVE.search(ident):
        w -= 25.0
    if _POSITIVE.search(ident):
        w += 25.0
    return w


def best_content_node(root: Node) -> Node | None:
    scores: dict[int, float] = {}
    nodes: dict[int, Node] = {}
    order: dict[int, int] = {}

    for idx, n in enumerate(root.iter_nodes()):
        if n.tag in _CONTAINER_TAGS:
            order.setdefault(id(n), idx)  # only containers can be scored
        if n.tag != "p":
            continue
        text = n.string_value()
        if len(text.strip()) < 25:
            continue
        pts = 1.0 + text.count(",") + min(len(text) // 100, 3)
        parent = n.parent
        grand = parent.parent if parent is not None else None
        for target, mult in ((parent, 1.0), (grand, 0.5)):
            if target is None or target.tag not in _CONTAINER_TAGS:
                continue
            tid = id(target)
            if tid not in scores:
                scores[tid] = _class_weight(target)
                nodes[tid] = target
            scores[tid] += pts * mult

    if not scores:
        return None
    best = max(scores.items(), key=lambda kv: (kv[1], -order.get(kv[0], 0)))
    return nodes[best[0]]


def readability_bodytext_nodes(root: Node) -> list[str]:
    """Text nodes of the best-scoring container (≙ summary() then
    //body//text(), loaders.py:416-422). Empty list when nothing scores."""
    node = best_content_node(root)
    if node is None:
        return []
    return list(node.iter_text())
