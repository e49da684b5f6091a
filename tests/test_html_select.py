"""Tests for the from-scratch DOM + selector subset."""

from risjbot_ray.html.dom import parse_html
from risjbot_ray.html.select import css, delete_nodes, xpath

DOC = """<!DOCTYPE html><html lang="en"><head>
<title>Test - Site</title>
<meta name="author" content="Jane">
<meta property="og:title" content="A &amp; B">
<link rel="canonical" href="https://e.com/a">
</head><body>
<h1 itemprop="headline">The <b>Real</b> One</h1>
<div class="story-body main"><p>P1.</p><p>P2.</p><aside>junk</aside></div>
<p class="gel-long-primer">Keep</p>
<p class="gel-long-primer gel-long-primer-bold">Drop</p>
</body></html>"""


def make():
    return parse_html(DOC)


def test_attr_and_or_predicate():
    r = make()
    assert xpath(r, 'head/meta[@name="author" or @property="author"]/@content') \
        == ["Jane"]


def test_entities_decoded_in_attrs():
    assert xpath(make(), 'head/meta[@property="og:title"]/@content') == ["A & B"]


def test_absolute_html_attr():
    assert xpath(make(), "/html/@lang") == ["en"]


def test_descendant_text_document_order():
    assert xpath(make(), '//*[@itemprop="headline"]//text()') == \
        ["The ", "Real", " One"]


def test_class_contains_and_not():
    r = make()
    assert xpath(r, '//p[contains(@class, "gel-long-primer") and '
                    'not(contains(@class, "gel-long-primer-bold"))]/text()') \
        == ["Keep"]


def test_contains_string_value():
    assert len(xpath(make(), '//h1[contains(., "Real")]')) == 1
    assert xpath(make(), '//h1[contains(., "Absent")]') == []


def test_nested_text_dedup():
    r = parse_html('<html><body><div itemprop="articleBody">A'
                   '<span itemprop="articleBody">B</span>C</div></body></html>')
    assert xpath(r, '//*[@itemprop="articleBody"]//text()') == ["A", "B", "C"]


def test_css_word_match():
    r = make()
    assert css(r, ".gel-long-primer ::text") == ["Keep", "Drop"]
    assert css(r, ".gel-long-primer-bold ::text") == ["Drop"]


def test_delete_nodes():
    r = make()
    assert delete_nodes(r, "//aside") == 1
    texts = xpath(r, '//div[contains(@class, "story-body")]//text()')
    assert "junk" not in texts


def test_malformed_unclosed_p():
    r = parse_html("<html><body><div><p>one<p>two</div></body></html>")
    assert xpath(r, "//p/text()") == ["one", "two"]


def test_nul_bytes_stripped():
    r = parse_html(b"<html><body><p>a\x00b</p></body></html>")
    assert xpath(r, "//p/text()") == ["ab"]


def test_void_elements_do_not_swallow():
    r = parse_html('<html><head><meta name="a" content="1">'
                   '<meta name="b" content="2"></head><body></body></html>')
    assert xpath(r, 'head/meta[@name="b"]/@content') == ["2"]


def test_interned_text_nodes_are_position_unique():
    """CPython interns 1-char strings: identical single-char text in
    different tree positions must still be DISTINCT text nodes, or
    //text() under a subtree leaks (or drops) text from elsewhere."""
    r = parse_html('<html><body><div id="art"><p>a</p></div>'
                   '<footer><p>a</p><p>a</p></footer></body></html>')
    assert xpath(r, '//div[@id="art"]//text()') == ["a"]
    assert xpath(r, "//footer//text()") == ["a", "a"]
    # repeated interblock single spaces survive schema_text-style joins
    r2 = parse_html('<html><body><div itemprop="x"><b>x</b> <b>y</b>'
                    '</div><div itemprop="x"><b>p</b> <b>q</b></div>'
                    '</body></html>')
    assert xpath(r2, '//div[@itemprop="x"]//text()') == \
        ["x", " ", "y", "p", " ", "q"]


def test_double_equals_attr_matches_stdlib():
    """<a b==c>: attrfind_tolerant treats '=+' as the separator, so
    the fast path must parse b='c' (not '=c') for selector parity."""
    r = parse_html("<html><body><a b==c>t</a></body></html>")
    assert xpath(r, '//a[@b="c"]/text()') == ["t"]
