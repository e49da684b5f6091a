"""Adversarial hypothesis fuzzing of the URL canonicalizer (VERDICT r3
item 8): the kernel runs on EVERY harvested href of a hostile web, so it
must never raise, must be idempotent (canon(canon(u)) == canon(u) — the
seen-ledger key must be a fixed point), and must keep its fingerprint
invariants on arbitrary garbage, not just well-formed URLs."""

import string

from hypothesis import example, given, settings
from hypothesis import strategies as st

from risjbot_ray.functions.urlnorm import (canonicalize_url, host_of,
                                           url_fingerprint, url_hash64)

# printable junk heavy on URL metacharacters — the shrink target space
# where urlparse's edge cases (IPv6 brackets, params, empty schemes) live
_junk = st.text(
    alphabet=string.ascii_letters + string.digits + ":/?#[]@!$&'()*+,;=.%- ",
    min_size=0, max_size=60)

_scheme = st.sampled_from(["http", "HTTP", "https", "hTTps", "ftp", ""])
_host = st.from_regex(r"[A-Za-z][A-Za-z0-9-]{0,15}(\.[A-Za-z]{2,6}){0,2}",
                      fullmatch=True)


@st.composite
def urlish(draw):
    """Mostly-URL-shaped strings with junk grafted into every part."""
    scheme = draw(_scheme)
    host = draw(st.one_of(_host, _junk))
    tail = draw(_junk)
    sep = draw(st.sampled_from(["://", ":/", "//", ""]))
    return f"{scheme}{sep}{host}{tail}"


@given(st.one_of(urlish(), _junk))
@example("http:////;")      # urlunparse collapse: fixed-point regression
@settings(max_examples=600, deadline=None)
def test_canonicalize_never_raises_and_is_idempotent(url):
    c = canonicalize_url(url)            # must not raise on ANY input
    assert isinstance(c, str)
    assert canonicalize_url(c) == c


@given(st.one_of(urlish(), _junk))
@example("http:////;")      # urlunparse collapse: fixed-point regression
@settings(max_examples=600, deadline=None)
def test_fingerprint_stable_under_canonicalization(url):
    # the ledger key is a function of the canonical form only
    assert url_fingerprint(url) == url_fingerprint(canonicalize_url(url))
    h = url_hash64(url)
    assert 0 <= h < 2 ** 64
    assert url_hash64(canonicalize_url(url)) == h


@given(st.one_of(urlish(), _junk))
@settings(max_examples=600, deadline=None)
def test_host_of_never_raises(url):
    h = host_of(url)
    assert isinstance(h, str)
    assert h == h.lower()


@given(_host, st.text(alphabet=string.ascii_lowercase + "/-.", max_size=30))
@settings(max_examples=500, deadline=None)
def test_scheme_and_host_case_insensitive(host, path):
    """'HTTP://X.COM/a' and 'http://x.com/a' must share one canonical
    form on every code path (fast and slow)."""
    lo = canonicalize_url(f"http://{host.lower()}/{path}")
    up = canonicalize_url(f"HTTP://{host.upper()}/{path}")
    assert lo == up
    # forcing the slow path with a fragment must agree too
    assert canonicalize_url(f"HTTP://{host.upper()}/{path}#frag") == lo


def test_hostile_ipv6_bracket_href_regression():
    """'http://[?x' used to raise ValueError out of urlparse and kill
    the whole wave task; now it degrades deterministically."""
    c = canonicalize_url("http://[?x")
    assert canonicalize_url(c) == c
    c2 = canonicalize_url("http://[?x#frag")
    assert canonicalize_url(c2) == c2
    assert host_of("//[?") == ""


def test_hostile_href_survives_equivalence_and_batch():
    """apply_equivalent_domains ran urlparse UNGUARDED, so a hostile
    href like 'http://[?x' crashed canonicalize_batch (and with it the
    whole harvest/spill task) even after canonicalize_url was hardened.
    The rewrite must pass garbage through untouched."""
    import pyarrow as pa

    from risjbot_ray.frontier.canon import canonicalize_batch
    from risjbot_ray.functions.urlnorm import apply_equivalent_domains

    assert apply_equivalent_domains(
        "http://[?x", {"www.cnn.com": "edition.cnn.com"}) == "http://[?x"
    batch = pa.table({"url": ["http://[?x", "http://ok.com/a"],
                      "meta": [None, None]})
    out = canonicalize_batch(batch)
    assert out.num_rows == 2
    assert "canon_url" in out.column_names
