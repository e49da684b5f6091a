"""Tolerant HTML parser building a mutable DOM on stdlib ``html.parser``.

Replaces the reference's lxml/parsel dependency (unavailable offline;
SURVEY.md section 7.0). The tree supports the operations the reference uses:
document-order text-node iteration (lxml ``//text()`` semantics), attribute
access, and node removal (``mutate_selector_del``, reference utils.py:9-41).

Text nodes are ``Text`` (a str subclass — one unique object per tree
position, see its docstring) entries in ``Node.children``; contiguous
character data (with entities decoded, as lxml does) is merged into a single
text node. Comments and processing instructions are dropped, as lxml's
``//text()`` does not yield them.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import (HTMLParser, attrfind_tolerant, commentclose,
                         endendtag, endtagfind,
                         locatestarttagend_tolerant, tagfind_tolerant)
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


class Text(str):
    """Text node: a str subclass so every node is a UNIQUE object.
    Plain str children would let CPython's interned 1-char strings
    (' ', '\\n', 'a', ...) share one object across many tree
    positions, and the selector engine / DocIndex — which track
    emitted text nodes by id() — would then leak or drop text from
    the wrong positions. Subclass instances are never interned."""
    __slots__ = ()


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "tagidx")

    def __init__(self, tag: str, attrs: dict[str, str] | None = None,
                 parent: "Node | None" = None):
        self.tag = tag
        self.attrs: dict[str, str] = attrs or {}
        self.children: list[Union["Node", str]] = []
        self.parent = parent
        # lazy subtree tag->nodes index (html.select fast descendant
        # steps); invalidated up the ancestor chain on mutation
        self.tagidx: dict[str, list["Node"]] | None = None

    def get(self, name: str, default: str | None = None) -> str | None:
        return self.attrs.get(name, default)

    @property
    def classes(self) -> list[str]:
        return (self.attrs.get("class") or "").split()

    def iter_nodes(self) -> Iterator["Node"]:
        """Self + all descendant element nodes, document order.
        (Measured: recursive yield-from ties the fastest iterative
        variant on 3.11 for news-page tree shapes; keep the simple form.)
        """
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

    def _invalidate_indexes(self) -> None:
        anc: "Node | None" = self
        while anc is not None:
            anc.tagidx = None
            anc = anc.parent

    def remove(self) -> None:
        """Detach this node from its parent (mutate_selector_del semantics,
        reference utils.py:28-29)."""
        if self.parent is not None:
            self._invalidate_indexes()
            try:
                self.parent.children.remove(self)
            except ValueError:
                pass
            self.parent = None

    def append(self, child: Union["Node", str]) -> None:
        if isinstance(child, Node):
            child.parent = self
        self._invalidate_indexes()
        self.children.append(child)

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"<Node {self.tag} attrs={self.attrs} kids={len(self.children)}>"


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#document")
        self.stack: list[Node] = [self.root]
        self._textbuf: list[str] = []

    # -- stdlib wart shields ------------------------------------------------
    # _markupbase raises bare AssertionError on malformed declarations /
    # marked sections real crawls do contain ('<![0', '<!x<'…; found by
    # the property fuzz). Treat them as bogus comments: skip to the next
    # '>' (or end of input — the builder feeds whole documents).
    def _skip_bogus(self, i: int) -> int:
        j = self.rawdata.find(">", i)
        return len(self.rawdata) if j < 0 else j + 1

    def parse_marked_section(self, i: int, report: int = 1) -> int:
        try:
            return super().parse_marked_section(i, report)
        except AssertionError:
            return self._skip_bogus(i)

    def parse_declaration(self, i: int) -> int:
        try:
            return super().parse_declaration(i)
        except AssertionError:
            return self._skip_bogus(i)

    # -- text buffering ----------------------------------------------------
    def _flush_text(self) -> None:
        if self._textbuf:
            self.stack[-1].children.append(Text("".join(self._textbuf)))
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


# close-tag scanners for raw-text elements (stdlib set_cdata_mode patterns)
_CDATA_CLOSE = {e: re.compile(r"</\s*%s\s*>" % e, re.IGNORECASE)
                for e in RAW_TEXT_ELEMENTS}

# Common-case start/end tag shapes. When these match, the parse is
# identical to the stdlib tolerant path (same lowercasing, unquoting,
# unescaping; bare values include '/' exactly like attrfind_tolerant's
# [^>\s]*); anything else falls through to the stdlib-regex tolerant
# branch below.
_SIMPLE_TAG = re.compile(
    r"<([a-zA-Z][-a-zA-Z0-9:._]*)"
    r"((?:\s+[-a-zA-Z0-9:._]+"
    r"(?:\s*=+\s*(?:\"[^\"]*\"|'[^']*'|[^\s>'\"]+))?)*)\s*(/?)>")
# '=+' like attrfind_tolerant: <a b==c> parses to b='c', not b='=c'
_SIMPLE_ATTR = re.compile(
    r"([-a-zA-Z0-9:._]+)"
    r"(?:\s*=+\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>'\"]+)))?")
_SIMPLE_END = re.compile(r"</([a-zA-Z][-a-zA-Z0-9:._]*)>")


def _fast_parse(text: str) -> Node | None:
    """Single-pass scanner building the same tree as ``_TreeBuilder`` ~2x
    faster by inlining the tree ops and skipping the HTMLParser dispatch
    loop. Start/end tags are parsed with the STDLIB's own tolerant
    regexes (html.parser module constants), so accepted documents parse
    byte-identically; any construct outside the fast path (marked
    sections, bogus-comment recovery, truncated tags) returns None and
    the caller re-parses the whole document with html.parser.
    test_html_select.py pins fast-vs-stdlib tree equivalence."""
    root = Node("#document")
    stack = [root]
    textbuf: list[str] = []
    n = len(text)
    i = 0
    find = text.find
    startswith = text.startswith
    while i < n:
        j = find("<", i)
        if j < 0:
            j = n
        if j > i:
            seg = text[i:j]
            if "&" in seg:
                # unescape may yield '' (invalid-codepoint charrefs like
                # '&#1;' map to nothing); the stdlib builder drops empty
                # data in handle_data, so never buffer it here either.
                seg = unescape(seg)
                if seg:
                    textbuf.append(seg)
            else:
                textbuf.append(seg)
        if j >= n:
            i = n
            break
        i = j
        c = text[i + 1:i + 2]
        if c and ("a" <= c <= "z" or "A" <= c <= "Z"):
            # ---- start tag ----
            sm = _SIMPLE_TAG.match(text, i)
            if sm is not None:
                tag = sm.group(1).lower()
                attrstr = sm.group(2)
                endpos = sm.end()
                selfclose = sm.group(3) == "/"
                attrlist: list[tuple[str, str | None]] = []
                if attrstr:
                    for am in _SIMPLE_ATTR.finditer(attrstr):
                        dq, sq, bare = am.group(2, 3, 4)
                        v = (dq if dq is not None
                             else sq if sq is not None else bare)
                        if v and "&" in v:
                            v = unescape(v)
                        attrlist.append((am.group(1).lower(), v))
            else:
                # ---- tolerant path (parse_starttag semantics) ----
                m = locatestarttagend_tolerant.match(text, i)
                j2 = m.end()
                nxt = text[j2:j2 + 1]
                if nxt == ">":
                    endpos = j2 + 1
                elif nxt == "/" and startswith("/>", j2):
                    endpos = j2 + 2
                else:
                    return None  # recovery/incomplete paths -> stdlib
                tm = tagfind_tolerant.match(text, i + 1)
                tag = tm.group(1).lower()
                k = tm.end()
                attrlist = []
                while k < endpos:
                    am = attrfind_tolerant.match(text, k)
                    if not am:
                        break
                    attrname, rest, attrvalue = am.group(1, 2, 3)
                    if not rest:
                        attrvalue = None
                    elif (attrvalue[:1] == "'" == attrvalue[-1:]
                          or attrvalue[:1] == '"' == attrvalue[-1:]):
                        attrvalue = attrvalue[1:-1]
                    if attrvalue:
                        attrvalue = unescape(attrvalue)
                    attrlist.append((attrname.lower(), attrvalue))
                    k = am.end()
                end = text[k:endpos].strip()
                if end not in (">", "/>"):
                    # stdlib re-emits the whole tag as (raw) data
                    textbuf.append(text[i:endpos])
                    i = endpos
                    continue
                selfclose = end == "/>"
            if textbuf:
                stack[-1].children.append(Text("".join(textbuf)))
                textbuf.clear()
            if selfclose:
                # handle_startendtag: last duplicate attr wins, no push
                adict = {kk: (vv if vv is not None else "")
                         for kk, vv in attrlist}
                node = Node(tag, adict, stack[-1])
                stack[-1].children.append(node)
                i = endpos
                continue
            # handle_starttag: first duplicate attr wins, autoclose, push
            top = stack[-1].tag
            ac = _AUTOCLOSE.get(top)
            if ac and tag in ac:
                stack.pop()
            adict = {}
            for kk, vv in attrlist:
                if kk not in adict:
                    adict[kk] = vv if vv is not None else ""
            node = Node(tag, adict, stack[-1])
            stack[-1].children.append(node)
            if tag not in VOID_ELEMENTS:
                stack.append(node)
            i = endpos
            if tag in RAW_TEXT_ELEMENTS:
                # cdata mode: raw (un-unescaped) text to the close tag
                cm = _CDATA_CLOSE[tag].search(text, endpos)
                if not cm:
                    i = n  # unterminated: stdlib drops the tail
                    break
                raw = text[endpos:cm.start()]
                if raw:
                    node.children.append(Text(raw))
                for idx in range(len(stack) - 1, 0, -1):
                    if stack[idx].tag == tag:
                        del stack[idx:]
                        break
                i = cm.end()
        elif c == "/":
            # ---- end tag (parse_endtag semantics) ----
            em = _SIMPLE_END.match(text, i)
            if em is not None:
                endpos = em.end()
            else:
                gm = endendtag.search(text, i + 1)
                if not gm:
                    return None  # truncated at EOF -> stdlib
                em = endtagfind.match(text, i)
                if not em:
                    return None  # bogus-comment recovery -> stdlib
                endpos = gm.end()
            tag = em.group(1).lower()
            if textbuf:
                stack[-1].children.append(Text("".join(textbuf)))
                textbuf.clear()
            for idx in range(len(stack) - 1, 0, -1):
                if stack[idx].tag == tag:
                    del stack[idx:]
                    break
            i = endpos
        elif c == "!":
            if startswith("<!--", i):
                cm2 = commentclose.search(text, i + 4)
                if not cm2:
                    return None
                i = cm2.end()  # comments dropped
            elif startswith("<![", i):
                return None  # marked section -> stdlib
            elif text[i:i + 9].lower() == "<!doctype":
                g = find(">", i + 9)
                if g < 0:
                    return None
                i = g + 1  # declarations dropped
            else:
                g = find(">", i + 2)  # bogus comment
                if g < 0:
                    return None
                i = g + 1
        elif c == "?":
            g = find(">", i + 2)  # processing instruction, dropped
            if g < 0:
                return None
            i = g + 1
        elif c == "":
            textbuf.append("<")  # trailing '<' at EOF is data
            i = n
        else:
            textbuf.append("<")
            i += 1
    if textbuf:
        stack[-1].children.append(Text("".join(textbuf)))
    return root


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
    doc = _fast_parse(text)
    if doc is None:
        builder = _TreeBuilder()
        builder.feed(text)
        builder.close()
        doc = builder.root
    for c in doc.children:
        if isinstance(c, Node) and c.tag == "html":
            return c
    return doc
