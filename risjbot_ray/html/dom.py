"""Tolerant HTML parser building a mutable DOM on stdlib ``html.parser``.

Replaces the reference's lxml/parsel dependency (unavailable offline;
SURVEY.md section 7.0). The tree supports the operations the reference uses:
document-order text-node iteration (lxml ``//text()`` semantics), attribute
access, and node removal (``mutate_selector_del``, reference utils.py:9-41).

Text nodes are plain ``str`` entries in ``Node.children``; contiguous
character data (with entities decoded, as lxml does) is merged into a single
text node. Comments and processing instructions are dropped, as lxml's
``//text()`` does not yield them.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator, Union

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Elements whose raw content lxml keeps as a single text child.
RAW_TEXT_ELEMENTS = frozenset({"script", "style"})

# Implicit auto-close pairs html.parser doesn't handle: opening any of the
# tags in the value set closes an open key tag (enough for news-page HTML).
_AUTOCLOSE = {
    "p": {"p", "div", "section", "article", "aside", "ul", "ol", "table",
          "figure", "form", "h1", "h2", "h3", "h4", "h5", "h6", "blockquote"},
    "li": {"li"},
    "td": {"td", "th", "tr"},
    "th": {"td", "th", "tr"},
    "tr": {"tr"},
    "option": {"option"},
}


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str] | None = None,
                 parent: "Node | None" = None):
        self.tag = tag
        self.attrs: dict[str, str] = attrs or {}
        self.children: list[Union["Node", str]] = []
        self.parent = parent

    def get(self, name: str, default: str | None = None) -> str | None:
        return self.attrs.get(name, default)

    @property
    def classes(self) -> list[str]:
        return (self.attrs.get("class") or "").split()

    def iter_nodes(self) -> Iterator["Node"]:
        """Self + all descendant element nodes, document order."""
        yield self
        for c in self.children:
            if isinstance(c, Node):
                yield from c.iter_nodes()

    def iter_text(self) -> Iterator[str]:
        """All descendant text nodes, document order (lxml //text())."""
        for c in self.children:
            if isinstance(c, Node):
                yield from c.iter_text()
            else:
                yield c

    def direct_text(self) -> Iterator[str]:
        """Direct child text nodes only (lxml text())."""
        for c in self.children:
            if not isinstance(c, Node):
                yield c

    def string_value(self) -> str:
        """XPath string-value: concatenation of all descendant text."""
        return "".join(self.iter_text())

    def remove(self) -> None:
        """Detach this node from its parent (mutate_selector_del semantics,
        reference utils.py:28-29)."""
        if self.parent is not None:
            try:
                self.parent.children.remove(self)
            except ValueError:
                pass
            self.parent = None

    def append(self, child: Union["Node", str]) -> None:
        if isinstance(child, Node):
            child.parent = self
        self.children.append(child)

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"<Node {self.tag} attrs={self.attrs} kids={len(self.children)}>"


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#document")
        self.stack: list[Node] = [self.root]
        self._textbuf: list[str] = []

    # -- text buffering ----------------------------------------------------
    def _flush_text(self) -> None:
        if self._textbuf:
            self.stack[-1].children.append("".join(self._textbuf))
            self._textbuf.clear()

    # -- tag handling ------------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        self._flush_text()
        top = self.stack[-1].tag
        if top in _AUTOCLOSE and tag in _AUTOCLOSE[top]:
            self.stack.pop()
        adict: dict[str, str] = {}
        for k, v in attrs:
            if k not in adict:  # first occurrence wins, like lxml
                adict[k] = v if v is not None else ""
        node = Node(tag, adict, self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self._flush_text()
        adict = {k: (v if v is not None else "") for k, v in attrs}
        node = Node(tag, adict, self.stack[-1])
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag: str) -> None:
        self._flush_text()
        # Pop to the matching open tag if present; ignore stray end tags.
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if data:
            self._textbuf.append(data)

    def close(self) -> None:
        super().close()
        self._flush_text()


def parse_html(text: str | bytes) -> Node:
    """Parse HTML to a tree; returns the root *element* (``<html>`` when
    present, else a synthetic ``#document`` wrapper).

    NUL bytes are stripped first (StripNull downloader middleware semantics,
    reference dlmiddlewares/stripnull.py:31-44).
    """
    if isinstance(text, bytes):
        text = text.decode("utf-8", errors="replace")
    if "\x00" in text:
        text = text.replace("\x00", "")
    builder = _TreeBuilder()
    builder.feed(text)
    builder.close()
    doc = builder.root
    for c in doc.children:
        if isinstance(c, Node) and c.tag == "html":
            return c
    return doc
