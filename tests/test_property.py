"""Property-based tests (hypothesis) for the URL/text/date kernels."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from risjbot_ray.functions.dates import parse_date
from risjbot_ray.functions.text import bodytext_candidate, take_first
from risjbot_ray.functions.urlnorm import (canonicalize_url, host_of,
                                           url_fingerprint, url_hash64)

_path = st.text(alphabet=string.ascii_lowercase + string.digits + "-/",
                min_size=0, max_size=40)
_host = st.from_regex(r"[a-z][a-z0-9-]{0,20}(\.[a-z]{2,6}){1,2}",
                      fullmatch=True)


@st.composite
def urls(draw):
    host = draw(_host)
    path = draw(_path)
    q = draw(st.one_of(st.just(""), st.just("?b=2&a=1"), st.just("?a=1&b=2")))
    frag = draw(st.one_of(st.just(""), st.just("#frag")))
    return f"https://{host}/{path}{q}{frag}"


@given(urls())
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(url):
    c = canonicalize_url(url)
    assert canonicalize_url(c) == c


@given(urls())
@settings(max_examples=200, deadline=None)
def test_fingerprint_matches_canonical(url):
    assert url_fingerprint(url) == url_fingerprint(canonicalize_url(url))
    assert 0 <= url_hash64(url) < 2 ** 64


@given(_host, _path)
@settings(max_examples=100, deadline=None)
def test_query_order_irrelevant(host, path):
    a = f"https://{host}/{path}?x=1&y=2"
    b = f"https://{host}/{path}?y=2&x=1"
    assert url_fingerprint(a) == url_fingerprint(b)


@given(urls())
@settings(max_examples=100, deadline=None)
def test_host_of_matches_urlparse(url):
    from urllib.parse import urlparse
    assert host_of(url) == urlparse(url).netloc.lower()


@given(st.lists(st.text(max_size=20), max_size=8))
@settings(max_examples=100, deadline=None)
def test_bodytext_candidate_no_control_ws(frags):
    out = bodytext_candidate(frags)
    assert "\n" not in out and "\t" not in out and "\r" not in out


@given(st.lists(st.one_of(st.none(), st.text(max_size=5)), max_size=6))
@settings(max_examples=100, deadline=None)
def test_take_first_skips_falsy_strings(vals):
    got = take_first(vals)
    if got is not None:
        assert got == next(v for v in vals if v is not None and v != "")
    else:
        assert all(v is None or v == "" for v in vals)


@given(st.datetimes())
@settings(max_examples=100, deadline=None)
def test_iso_roundtrip(dt):
    parsed = parse_date(dt.isoformat())
    assert parsed is not None
    # sub-second precision is stripped BY DESIGN (wrapped_parse,
    # loaders.py:57-60)
    assert parsed.replace(tzinfo=None) == dt.replace(microsecond=0)


@given(st.text(max_size=30))
@settings(max_examples=200, deadline=None)
def test_parse_date_never_raises(s):
    parse_date(s)  # garbage in -> None or a datetime, never an exception
