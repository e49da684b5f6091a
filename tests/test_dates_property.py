"""Hypothesis fuzz for the date parser (VERDICT r3 item 8 technique):
parse_date runs on EVERY datePublished/meta/pubDate string a hostile web
page emits — it must never raise, always return a tz-aware datetime or
None, and parse_date_iso must be a fixed point (its output re-parses to
the same instant)."""

from datetime import datetime

from hypothesis import example, given, settings
from hypothesis import strategies as st

from risjbot_ray.functions.dates import parse_date, parse_date_iso

_junk = st.one_of(
    st.none(),
    st.text(max_size=60),
    st.binary(max_size=60),  # incl. invalid UTF-8: must not raise
)

# date-ish fragments recombined: digits, separators, tz markers, month
# names — biased toward ALMOST-valid forms where partial parses lurk
_fragment = st.sampled_from([
    "2017", "-02", "-31", "T18", ":02", ":16", ".787", "Z", "+00:00",
    "-500", " GMT", "Tue, ", "28 Feb 2017", "14:30:00", "@", "151234",
    "1512345678", "9" * 13, " ", "Feb", "T", ":", "+", "-", ".", "0",
])
_datish = st.lists(_fragment, min_size=0, max_size=8).map("".join)


@given(st.one_of(_junk, _datish))
# stdlib parsedate OverflowError on absurd years (fuzz-found)
@example('28 Feb 2017:0228 Feb 201720172017')
@settings(max_examples=1000, deadline=None)
def test_parse_date_total_and_aware(s):
    dt = parse_date(s)
    assert dt is None or (isinstance(dt, datetime)
                          and dt.tzinfo is not None)
    iso = parse_date_iso(s)
    assert (iso is None) == (dt is None)
    if iso is not None:
        # fixed point: the emitted ISO form re-parses to the same instant
        again = parse_date(iso)
        assert again is not None and again == dt
