"""The fast-path HTML scanner must build the IDENTICAL tree to the
stdlib-HTMLParser builder for every document it accepts — over the whole
synthetic corpus, targeted edge cases, and randomized markup. Documents
it rejects fall back to the stdlib builder inside parse_html, so any
divergence caught here is the only correctness surface."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from risjbot_ray.html.dom import Node, _fast_parse, _TreeBuilder


def _stdlib_tree(text: str) -> Node:
    b = _TreeBuilder()
    b.feed(text)
    b.close()
    return b.root


def _serialize(node: Node) -> str:
    parts = []

    def walk(n, depth):
        parts.append(f"{depth}:{n.tag}:{sorted(n.attrs.items())}")
        for c in n.children:
            if isinstance(c, Node):
                walk(c, depth + 1)
            else:
                parts.append(f"{depth + 1}:#text:{c!r}")

    walk(node, 0)
    return "\n".join(parts)


def assert_equivalent(text: str) -> None:
    fast = _fast_parse(text)
    if fast is None:
        return  # rejected — parse_html uses the stdlib builder
    assert _serialize(fast) == _serialize(_stdlib_tree(text)), text


EDGE_CASES = [
    "",
    "plain text only",
    "<p>a<p>b<p>c",                              # autoclose chain
    "<ul><li>x<li>y</ul>",
    "<div class='a' class='b'>dup</div>",        # first attr wins
    "<br/><img src=x/><span attr='v' />",        # startendtag: last wins
    "<div CLASS=MiXeD DATA-x='1'>case</div>",
    "<p>a &amp; b &lt;tag&gt; &#65; &#x42; &nbsp;</p>",
    "<p>half &am</p>",
    "<a href='x&amp;y'>q</a>",
    "<a href=bare>q</a><a href>w</a><a href=''>e</a>",
    "<script>if (a < b && c > d) { x = '</div>'; }</script>after",
    "<script type='application/ld+json'>{\"a\": \"x &amp; y\"}</script>",
    "<SCRIPT>var x=1;</SCRIPT>",
    "<style>p > a { color: red }</style>",
    "<script>unterminated...",
    "<!-- comment <p>not a tag</p> --><p>real</p>",
    "<!DOCTYPE html><html><body>x</body></html>",
    "<!doctype html>",
    "<?php echo 'x'; ?><p>after pi</p>",
    "<p>bare < less</p>",
    "<p>trailing<",
    "<div><span>unclosed",
    "</stray></p><p>recover</p>",
    "<td>a<td>b<tr><td>c",
    "<p  spaced   =  'v'  >x</p>",
    "<x-custom-tag foo:bar='1'>y</x-custom-tag>",
    "<div data-json='{\"k\": \"v\"}'>j</div>",
    "<p>text</p  >tail",
    "<input type=checkbox checked><p>after void</p>",
    "<meta charset=utf-8><meta name=a content='b'>",
    "<div title=\"it's ok\">q</div>",
    "<a b=c d>e</a>",
    "<figure>f<figcaption>c</figcaption></figure>",
    "<p>&notanentity; &copy;</p>",
    "<h1>A</h1 junk><p>B</p>",
]


@pytest.mark.parametrize("idx", range(len(EDGE_CASES)))
def test_edge_case_equivalence(idx):
    assert_equivalent(EDGE_CASES[idx])


def test_whole_corpus_equivalence():
    """Every page the synthetic corpus generates (all families, all
    discovery docs) must take the fast path AND match the stdlib tree."""
    from risjbot_ray.testsupport.pagegen import gen_corpus
    pages, _, _, _ = gen_corpus(120, seed=3)
    n_fast = 0
    for row in pages.to_pylist():
        text = row["html"].decode("utf-8", "replace").replace("\x00", "")
        fast = _fast_parse(text)
        if fast is not None:
            n_fast += 1
            assert _serialize(fast) == _serialize(_stdlib_tree(text)), \
                row["url"]
    # the corpus is normal HTML: the fast path must actually cover it
    assert n_fast >= 0.95 * pages.num_rows


_markup = st.text(
    alphabet=st.sampled_from(
        list("abcdiv <>/='\"&;#!-?pshtml01xACB\n\t.:_")),
    max_size=160)


@given(_markup)
@settings(max_examples=400, deadline=None)
def test_random_markup_equivalence(text):
    assert_equivalent(text)
