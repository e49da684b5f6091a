"""Hypothesis fuzz for the extraction stack above the parser (the
parser itself is covered by test_fastparse.py): xpath evaluation,
JSON-LD block extraction, and the full extract_batch ensemble must be
TOTAL over hostile markup — a crawl's extract task must never die over
one garbage page. Same technique as the WARC/urlnorm/feed fuzz modules
(VERDICT r3 item 8)."""

import json

import pyarrow as pa
from hypothesis import example, given, settings
from hypothesis import strategies as st

from risjbot_ray.extract.ensemble import extract_jsonld_blocks
from risjbot_ray.extract.stage import extract_batch
from risjbot_ray.html.dom import parse_html
from risjbot_ray.html.select import xpath

_markup = st.text(
    alphabet=st.sampled_from(
        list("abcdiv <>/='\"&;#!-?pshtml01xACB\n\t.:_{}[],@")),
    max_size=200)

# the xpath shapes site rules / the ensemble actually run (siterules.py,
# ensemble.py, page.py) — trusted expressions over UNTRUSTED trees
_XPATHS = [
    "//text()",
    "//p//text()",
    "//script",
    '//script[@type="application/ld+json"]',
    '//meta[@name="author"]/@content',
    '//meta[@property="og:title"]/@content',
    '//div[@class="article-body"]//text()',
    "//figure",
    "//a/@href",
    "//time/@datetime",
    "//h1//text()",
]


@given(_markup)
@example('<![0')  # stdlib _markupbase AssertionError (fuzz-found)
@settings(max_examples=500, deadline=None)
def test_xpath_eval_total_over_random_markup(text):
    root = parse_html(text)
    for path in _XPATHS:
        out = xpath(root, path)
        assert isinstance(out, list)


_jsonish = st.text(
    alphabet=st.sampled_from(list('{}[]":,0123456789.eE+-abcdef \n\t@')),
    max_size=120)


@given(_jsonish, _markup)
@settings(max_examples=500, deadline=None)
def test_jsonld_blocks_total(payload, tail):
    doc = ('<html><head><script type="application/ld+json">'
           f"{payload}</script></head><body>{tail}</body></html>")
    blocks, n_bad = extract_jsonld_blocks(parse_html(doc))
    assert isinstance(blocks, list)
    assert n_bad >= 0
    # whatever survives must be JSON-serializable (it rides in meta)
    json.dumps(blocks)


@given(st.lists(st.binary(max_size=300), min_size=1, max_size=4))
@settings(max_examples=200, deadline=None)
def test_extract_batch_total_over_garbage_pages(payloads):
    """The full M8 ensemble over arbitrary bytes (invalid UTF-8, NULs,
    truncated tags): must emit a well-formed table — possibly empty
    (fake-404 / checkcontent drops) — and never raise."""
    batch = pa.table({
        "url": [f"https://fuzz.example/p/{i}" for i in range(len(payloads))],
        "warc_ts": pa.array([1_600_000_000_000_000] * len(payloads),
                            type=pa.timestamp("us")),
        "html": pa.array(payloads, type=pa.binary()),
    })
    out = extract_batch(batch)
    assert out.num_rows <= len(payloads)
    assert "bodytext" in out.column_names
