"""Unit tests for the scalar kernels (reference loaders.py semantics)."""

from datetime import timezone

from risjbot_ray.functions import text as T
from risjbot_ray.functions.dates import parse_date, parse_date_iso
from risjbot_ray.functions.urlnorm import (apply_equivalent_domains,
                                           canonicalize_url, force_query_param,
                                           host_of, strip_query,
                                           url_fingerprint, url_hash64)


def test_replace_escape_chars():
    assert T.replace_escape_chars("a\nb\tc\rd") == "a b c d"


def test_replace_entities():
    assert T.replace_entities("Tom &amp; Jerry &#8217;s") == "Tom & Jerry ’s"


def test_clean_headline():
    assert T.clean_headline(["  A\nB &amp; C  "]) == ["A B & C"]


def test_bodytext_candidate_joins_and_cleans():
    assert T.bodytext_candidate(["One.", "Two\nthree.", "&amp; four"]) == \
        "One. Two three. & four"


def test_bylines_in_removes_fluff_and_splits():
    # loaders.py:32-47: drop http entries, strip 'By ' prefix, split ' and '
    vals = ["By John Smith and Jane Doe", "http://example.com/author"]
    assert T.bylines_in(vals) == "John Smith,Jane Doe"
    assert T.list_out(T.bylines_in(vals)) == ["John Smith", "Jane Doe"]


def test_split_multiple_byline_string():
    got = list(T.split_multiple_byline_string(
        "John Smith and Jane Doe, Chief Reporter"))
    assert got == ["John Smith", "Jane Doe"]


def test_take_first_skips_empty():
    assert T.take_first(["", None, "x", "y"]) == "x"
    assert T.take_first(["", None]) is None


def test_wordcount():
    assert T.wordcount("a  b\n c") == 3
    assert T.wordcount("") == 0


def test_parse_date_iso_millis_strip():
    # loaders.py:57-60
    assert parse_date_iso("2017-02-27T18:02:16.787Z") == \
        "2017-02-27T18:02:16+00:00"


def test_parse_date_rfc2822():
    dt = parse_date("Tue, 28 Feb 2017 14:30:00 GMT")
    assert dt is not None and dt.utcoffset().total_seconds() == 0
    assert dt.hour == 14


def test_parse_date_naive_becomes_utc():
    dt = parse_date("2017-03-01T09:00:00")
    assert dt.tzinfo == timezone.utc


def test_parse_date_unix_ts():
    assert parse_date_iso("1488326400") == "2017-03-01T00:00:00+00:00"
    assert parse_date_iso("@1488326400") == "2017-03-01T00:00:00+00:00"


def test_parse_date_garbage():
    assert parse_date("not a date at all") is None
    assert parse_date("") is None


def test_equivalent_domains():
    # equivalentdomains.py:40-50 + settings.py:176
    assert apply_equivalent_domains(
        "http://www.cnn.com/2017/a?x=1", {"www.cnn.com": "edition.cnn.com"}
    ) == "http://edition.cnn.com/2017/a?x=1"
    assert apply_equivalent_domains("http://other.com/a", {"www.cnn.com": "e"}) \
        == "http://other.com/a"


def test_canonicalize_sorts_query_drops_fragment():
    assert canonicalize_url("https://A.com/p?b=2&a=1#frag") == \
        "https://a.com/p?a=1&b=2"


def test_fingerprint_stable_and_hash():
    f1 = url_fingerprint("https://a.com/p?b=2&a=1")
    f2 = url_fingerprint("https://a.com/p?a=1&b=2")
    assert f1 == f2 and len(f1) == 20
    assert url_hash64("https://a.com/p") == url_hash64("https://a.com/p")


def test_strip_query_and_force_param():
    assert strip_query("http://x.com/a?ITO=1") == "http://x.com/a"
    assert "IR=C" in force_query_param("http://x.com/a?z=1", "IR", "C")
    assert host_of("https://X.com/a") == "x.com"
