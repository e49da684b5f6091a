"""Selector mini-language: the closed XPath/CSS subset the reference uses.

The reference selects with parsel/lxml XPath (e.g. loaders.py:154-327,
spiders/*/*.py). Only a small, enumerable XPath subset appears in that code
(SURVEY.md section 7.0): child ``/`` and descendant ``//`` steps, ``*`` or
tag-name node tests, predicates built from ``@attr="v"``, ``@attr``,
``contains(@attr, "v")``, ``contains(., "v")`` combined with ``and`` /
``or`` / ``not(...)``, and terminal ``/@attr``, ``/text()``, ``//text()``.
This module implements exactly that subset from scratch, plus the tiny CSS
subset used (``.class``, ``tag.class``, ``.class ::text``).

Results are in document order with node-set de-duplication, like XPath.
"""

from __future__ import annotations

import functools
import re
from typing import Callable, Union

from .dom import Node

Result = Union[Node, str]

_TOKEN_RE = re.compile(
    r"""
    (?P<dslash>//)
  | (?P<slash>/)
  | (?P<lbrack>\[)
  | (?P<rbrack>\])
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<comma>,)
  | (?P<eq>=)
  | (?P<string>"[^"]*"|'[^']*')
  | (?P<at>@)
  | (?P<dot>\.)
  | (?P<star>\*)
  | (?P<name>[A-Za-z_][A-Za-z0-9_:.-]*)
  | (?P<ws>\s+)
    """,
    re.VERBOSE,
)


def _tokenize(s: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            raise ValueError(f"Bad selector syntax at {s[pos:]!r} in {s!r}")
        kind = m.lastgroup
        if kind != "ws":
            out.append((kind, m.group()))
        pos = m.end()
    return out


Pred = Callable[[Node], bool]


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self, k: int = 0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, kind: str) -> str:
        k, v = self.next()
        if k != kind:
            raise ValueError(f"Expected {kind}, got {k}:{v}")
        return v

    # ---- path -----------------------------------------------------------
    def parse_path(self):
        """Returns (absolute, steps) where each step is
        ('child'|'desc', kind, payload)."""
        steps: list[tuple[str, str, object]] = []
        absolute = False
        axis = "child"
        k, _ = self.peek()
        if k == "dslash":
            self.next()
            absolute = True
            axis = "desc"
        elif k == "slash":
            self.next()
            absolute = True
            axis = "child"
        while True:
            steps.append(self.parse_step(axis))
            k, _ = self.peek()
            if k == "dslash":
                self.next()
                axis = "desc"
            elif k == "slash":
                self.next()
                axis = "child"
            else:
                break
        return absolute, steps

    def parse_step(self, axis: str):
        k, v = self.peek()
        if k == "at":
            self.next()
            return (axis, "attr", self.expect("name"))
        if k == "name" and v == "text" and self.peek(1)[0] == "lparen":
            self.next(); self.expect("lparen"); self.expect("rparen")
            return (axis, "text", None)
        if k == "name" and v.startswith("parent::"):
            # parent axis: 'parent::*' / 'parent::tag' (reference
            # uk/independent.py:31-34)
            self.next()
            rest = v[len("parent::"):]
            if rest == "" and self.peek()[0] == "star":
                self.next()
            name = None if rest in ("", "*") else rest
            preds: list[Pred] = []
            while self.peek()[0] == "lbrack":
                self.next()
                preds.append(self.parse_or())
                self.expect("rbrack")
            return ("parent", "node", (name, preds))
        if k == "star":
            self.next()
            name = None
        elif k == "name":
            self.next()
            name = v
        else:
            raise ValueError(f"Unexpected token {k}:{v} in step")
        preds: list[Pred] = []
        while self.peek()[0] == "lbrack":
            self.next()
            preds.append(self.parse_or())
            self.expect("rbrack")
        return (axis, "node", (name, preds))

    # ---- predicate expressions ------------------------------------------
    def parse_or(self) -> Pred:
        left = self.parse_and()
        terms = [left]
        while self.peek() == ("name", "or"):
            self.next()
            terms.append(self.parse_and())
        if len(terms) == 1:
            return left
        return lambda n, _t=tuple(terms): any(t(n) for t in _t)

    def parse_and(self) -> Pred:
        left = self.parse_unary()
        terms = [left]
        while self.peek() == ("name", "and"):
            self.next()
            terms.append(self.parse_unary())
        if len(terms) == 1:
            return left
        return lambda n, _t=tuple(terms): all(t(n) for t in _t)

    def parse_unary(self) -> Pred:
        k, v = self.peek()
        if (k, v) == ("name", "not") and self.peek(1)[0] == "lparen":
            self.next(); self.expect("lparen")
            inner = self.parse_or()
            self.expect("rparen")
            return lambda n, _p=inner: not _p(n)
        if (k, v) == ("name", "contains") and self.peek(1)[0] == "lparen":
            self.next(); self.expect("lparen")
            ak, av = self.next()
            if ak == "at":
                attr = self.expect("name")
                self.expect("comma")
                needle = self._string()
                self.expect("rparen")
                return lambda n, _a=attr, _s=needle: _s in (n.get(_a) or "")
            elif ak == "dot":
                self.expect("comma")
                needle = self._string()
                self.expect("rparen")
                return lambda n, _s=needle: _s in n.string_value()
            elif (ak, av) == ("name", "text") and self.peek()[0] == "lparen":
                # contains(text(), "...") — any DIRECT text child matches
                # (reference uk/independent.py:31)
                self.expect("lparen"); self.expect("rparen")
                self.expect("comma")
                needle = self._string()
                self.expect("rparen")
                return lambda n, _s=needle: any(
                    _s in t for t in n.direct_text())
            raise ValueError("contains() supports @attr, ., or text()")
        if k == "at":
            self.next()
            attr = self.expect("name")
            if self.peek()[0] == "eq":
                self.next()
                val = self._string()
                return lambda n, _a=attr, _v=val: n.get(_a) == _v
            return lambda n, _a=attr: n.get(_a) is not None
        raise ValueError(f"Unexpected predicate token {k}:{v}")

    def _string(self) -> str:
        v = self.expect("string")
        return v[1:-1]


@functools.lru_cache(maxsize=4096)
def _compile(path: str):
    p = _Parser(_tokenize(path))
    absolute, steps = p.parse_path()
    if p.i != len(p.toks):
        raise ValueError(f"Trailing tokens in selector {path!r}")
    return absolute, tuple(steps)


def _child_elements(n: Node):
    for c in n.children:
        if isinstance(c, Node):
            yield c


def _descendant_or_self(n: Node):
    yield from n.iter_nodes()


def _tag_index(node: Node) -> dict[str, list[Node]]:
    """Lazy doc-order (tag -> subtree nodes incl. self) index, cached on
    the node and invalidated by any subtree mutation (Node.remove/append).
    Turns the first descendant step of every selector from a full-tree
    walk into a dict lookup — the dominant xpath cost on news pages."""
    ti = node.tagidx
    if ti is None:
        ti = {}
        for nd in node.iter_nodes():
            ti.setdefault(nd.tag, []).append(nd)
        node.tagidx = ti
    return ti


def xpath(context: Node, path: str) -> list[Result]:
    """Evaluate the selector subset against ``context`` (the root element for
    absolute paths — matching parsel, whose root is ``<html>``)."""
    absolute, steps = _compile(path)
    current: list[Node] = [context]
    out_values: list[str] | None = None

    for si, (axis, kind, payload) in enumerate(steps):
        if (si == 0 and kind == "node" and axis == "desc"
                and payload[0] is not None and len(current) == 1):
            # '//name...' first step via the cached tag index (doc
            # order, unique). A relative './/name' would need to
            # exclude the context node itself, but the step parser
            # rejects a leading '.' (ValueError), so this fast path
            # only ever sees absolute selectors.
            name, preds = payload
            cands = _tag_index(context).get(name, [])
            current = [cd for cd in cands
                       if not any(not p(cd) for p in preds)]
            continue
        if kind == "node":
            name, preds = payload
            nxt: list[Node] = []
            seen: set[int] = set()
            for node in current:
                if axis == "parent":
                    pool = iter(() if node.parent is None
                                else (node.parent,))
                elif axis == "child":
                    if si == 0 and absolute:
                        # '/html/...': the document root's element IS the
                        # context element (parsel roots at <html>), so the
                        # first absolute child step tests the context itself.
                        pool = iter((node,))
                    else:
                        pool = _child_elements(node)
                elif si == 0 and absolute:
                    # leading '//' includes the context element itself
                    pool = _descendant_or_self(node)
                else:
                    pool = (d for c in _child_elements(node)
                            for d in _descendant_or_self(c))
                for cand in pool:
                    if name is not None and cand.tag != name:
                        continue
                    if any(not p(cand) for p in preds):
                        continue
                    if id(cand) not in seen:
                        seen.add(id(cand))
                        nxt.append(cand)
            current = nxt
        elif kind == "attr":
            vals: list[str] = []
            for node in current:
                v = node.get(payload)
                if v is not None:
                    vals.append(v)
            out_values = vals
            break
        elif kind == "text":
            # Collect the selected text nodes, then emit them in document
            # order with node-set de-duplication (XPath semantics; matters
            # when matched elements are nested, e.g. articleBody inside
            # articleBody — lxml yields each text node once, in order).
            wanted: set[int] = set()
            for node in current:
                it = node.iter_text() if axis == "desc" else node.direct_text()
                for t in it:
                    wanted.add(id(t))
            vals = [t for t in context.iter_text() if id(t) in wanted]
            if len(vals) < len(wanted):
                # selected nodes outside the context tree (detached) —
                # fall back to per-node order
                emitted: set[int] = set()
                vals = []
                for node in current:
                    it = (node.iter_text() if axis == "desc"
                          else node.direct_text())
                    for t in it:
                        if id(t) not in emitted:
                            emitted.add(id(t))
                            vals.append(t)
            out_values = vals
            break

    if out_values is not None:
        return list(out_values)
    return list(current)


_CSS_RE = re.compile(
    r"^\s*(?P<tag>[A-Za-z][A-Za-z0-9-]*)?\.(?P<cls>[A-Za-z0-9_-]+)"
    r"(?P<text>\s+::text)?\s*$"
)


def _css_match(css_sel: str, context: Node) -> tuple[list[Node], bool]:
    """Evaluate the CSS subset the reference uses (``.cls``, ``tag.cls``,
    ``.cls ::text``) with HTMLTranslator semantics: class selectors match a
    whitespace-separated *word* of @class exactly."""
    m = _CSS_RE.match(css_sel)
    if not m:
        raise ValueError(f"Unsupported CSS selector: {css_sel!r}")
    tag, cls = m.group("tag"), m.group("cls")
    nodes = [
        n for n in context.iter_nodes()
        if (tag is None or n.tag == tag) and cls in n.classes
    ]
    return nodes, bool(m.group("text"))


def css(context: Node, selector: str) -> list[Result]:
    nodes, want_text = _css_match(selector, context)
    if not want_text:
        return list(nodes)
    wanted = {id(t) for n in nodes for t in n.iter_text()}
    return [t for t in context.iter_text() if id(t) in wanted]


def delete_nodes(context: Node, path: str, method: str = "xpath") -> int:
    """Remove all nodes matching the selector from the tree
    (mutate_selector_del, reference utils.py:9-41; UnwantedContent,
    spmiddlewares/unwantedcontent.py:45-62). Returns count removed."""
    if method == "css":
        nodes = _css_match(path, context)[0]
    else:
        nodes = [n for n in xpath(context, path) if isinstance(n, Node)]
    for n in nodes:
        n.remove()
    return len(nodes)
