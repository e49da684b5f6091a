"""One-pass document index for the fixed standard-ensemble selectors.

The standard channels (htmlmeta / schema.org xpaths / OpenGraph / Dublin
Core, loaders.py:154-327) only use attribute-equality selectors — head
meta name/property lookups and document-wide @itemprop/@property matches.
Evaluating each as a full-tree XPath scan costs ~6 traversals per page;
this index collects everything in ONE traversal and answers those lookups
as dict gets, preserving document order. Site-specific selectors (class
contains etc.) still go through the general evaluator.
"""

from __future__ import annotations

from ..html.dom import Node


class DocIndex:
    __slots__ = ("head_meta_name", "head_meta_prop", "head_link_rel",
                 "title_texts", "by_itemprop", "by_property", "lang",
                 "order")

    def __init__(self, root: Node):
        self.head_meta_name: dict[str, list[str]] = {}
        self.head_meta_prop: dict[str, list[str]] = {}
        self.head_link_rel: dict[str, list[str]] = {}
        self.title_texts: list[str] = []
        self.by_itemprop: dict[str, list[Node]] = {}
        self.by_property: dict[str, list[Node]] = {}
        self.lang = root.get("lang") if root.tag == "html" else None
        self.order: dict[int, int] = {}

        head = None
        for c in root.children:
            if isinstance(c, Node) and c.tag == "head":
                head = c
                break
        if head is not None:
            for c in head.children:
                if not isinstance(c, Node):
                    continue
                if c.tag == "meta":
                    content = c.get("content")
                    if content is None:
                        continue
                    name = c.get("name")
                    prop = c.get("property")
                    if name is not None:
                        self.head_meta_name.setdefault(name, []).append(
                            content)
                    if prop is not None:
                        self.head_meta_prop.setdefault(prop, []).append(
                            content)
                elif c.tag == "link":
                    rel, href = c.get("rel"), c.get("href")
                    if rel is not None and href is not None:
                        self.head_link_rel.setdefault(rel, []).append(href)
                elif c.tag == "title":
                    self.title_texts.extend(c.direct_text())

        for i, n in enumerate(root.iter_nodes()):
            self.order[id(n)] = i
            ip = n.get("itemprop")
            if ip is not None:
                self.by_itemprop.setdefault(ip, []).append(n)
            pr = n.get("property")
            if pr is not None:
                self.by_property.setdefault(pr, []).append(n)

    # -- lookups mirroring the reference xpaths ---------------------------

    def meta_name(self, *names: str) -> list[str]:
        """head/meta[@name=a or @name=b]/@content (values in arg order of
        first match set; reference 'or' xpath returns doc order — for
        distinct names on real pages only one variant appears)."""
        out: list[str] = []
        for n in names:
            out.extend(self.head_meta_name.get(n, []))
        return out

    def meta_prop(self, *props: str) -> list[str]:
        out: list[str] = []
        for p in props:
            out.extend(self.head_meta_prop.get(p, []))
        return out

    def meta_name_or_prop(self, key: str) -> list[str]:
        """head/meta[@name=k or @property=k]/@content in document order."""
        a = self.head_meta_name.get(key, [])
        b = self.head_meta_prop.get(key, [])
        return a + b if a or b else []

    def _schema_nodes(self, *keys: str) -> list[Node]:
        nodes: list[Node] = []
        seen: set[int] = set()
        for k in keys:
            for n in (self.by_itemprop.get(k, [])
                      + self.by_property.get(k, [])):
                if id(n) not in seen:
                    seen.add(id(n))
                    nodes.append(n)
        nodes.sort(key=lambda n: self.order.get(id(n), 1 << 30))
        return nodes

    def schema_content(self, *keys: str) -> list[str]:
        """//*[@itemprop=k or @property=k]/@content in document order."""
        out = []
        for n in self._schema_nodes(*keys):
            v = n.get("content")
            if v is not None:
                out.append(v)
        return out

    def schema_text(self, *keys: str) -> list[str]:
        """//*[@itemprop=k or @property=k]//text(), document order with
        node-set text dedup (nested matches)."""
        nodes = self._schema_nodes(*keys)
        if not nodes:
            return []
        if len(nodes) == 1:
            return list(nodes[0].iter_text())
        out: list[str] = []
        emitted: set[int] = set()
        for n in nodes:
            for t in n.iter_text():
                if id(t) not in emitted:
                    emitted.add(id(t))
                    out.append(t)
        return out
