"""Date parsing matching the reference's ``wrapped_parse`` behavior.

Reference: RISJbot/loaders.py:54-68 (millisecond strip + dateparser with
RETURN_AS_TIMEZONE_AWARE) plus the site-specific repairs:
- WaPo ``-500`` tz repair (spiders/us/washingtonpost.py:59-63)
- USAToday ``.787Z`` millis (spiders/us/usatoday.py:66-68)
- unix timestamps (spiders/base/businessinsiderspider.py:60-62)

dateparser is not available (no network); this implements the subset of
formats the reference actually encounters: ISO-8601 (with variants), RFC
2822, and a few human formats. Naive datetimes are made tz-aware as UTC.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone
from email.utils import parsedate_to_datetime

_MILLIS_RE = re.compile(
    r"^([0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2})\.[0-9]+"
)

# Human formats dateparser handles that appear in news pages.
_FALLBACK_FORMATS = (
    "%B %d, %Y %I:%M %p",
    "%B %d, %Y",
    "%b %d, %Y",
    "%d %B %Y",
    "%d %b %Y",
    "%Y-%m-%d %H:%M:%S",
    "%Y/%m/%d %H:%M:%S",
    "%Y-%m-%d",
    "%m/%d/%Y",
)


def _aware(dt: datetime) -> datetime:
    if dt.tzinfo is None:
        return dt.replace(tzinfo=timezone.utc)
    return dt


def parse_date(s: str | bytes | None) -> datetime | None:
    """Parse a date string to a tz-aware datetime, or None.

    Mirrors wrapped_parse (loaders.py:54-68): strips sub-second precision
    from ISO-ish strings first, then tries parsers in order.
    """
    if s is None:
        return None
    if isinstance(s, bytes):
        # hostile bytes must not raise out of a parse that promises
        # datetime-or-None; mojibake dates simply fail every format
        s = s.decode("utf-8", "replace")
    s = s.strip()
    if not s:
        return None

    # 2017-02-27T18:02:16.787Z -> 2017-02-27T18:02:16Z (loaders.py:57-60)
    s = _MILLIS_RE.sub(r"\1", s)

    # ISO-8601 (incl. 'Z', space separator, date-only).
    iso = s.replace("Z", "+00:00") if s.endswith("Z") else s
    # Repair compact tz offsets like '-500' -> '-05:00'
    # (washingtonpost.py:59-63 repairs these upstream; accept both here).
    m = re.match(r"^(.*T[0-9:]{5,8})([+-])([0-9]{1,2}):?([0-9]{2})$", iso)
    if m and len(m.group(3)) == 1:
        iso = f"{m.group(1)}{m.group(2)}0{m.group(3)}:{m.group(4)}"
    try:
        return _aware(datetime.fromisoformat(iso))
    except ValueError:
        pass

    # RFC 2822 (RSS pubDate, HTTP Date headers). OverflowError: the
    # stdlib tokenizer accepts absurd year strings ('…201720172017')
    # and overflows C int inside datetime(*dtuple) instead of raising
    # ValueError — found by the property fuzz, must not kill a batch.
    try:
        dt = parsedate_to_datetime(s)
        if dt is not None:
            return _aware(dt)
    except (TypeError, ValueError, IndexError, OverflowError):
        pass

    # Unix timestamp (seconds or milliseconds).
    if re.fullmatch(r"@?\d{9,13}", s):
        ts = int(s.lstrip("@"))
        if ts > 10**12:  # milliseconds
            ts //= 1000
        try:
            return datetime.fromtimestamp(ts, tz=timezone.utc)
        except (OverflowError, OSError, ValueError):
            return None

    for fmt in _FALLBACK_FORMATS:
        try:
            return _aware(datetime.strptime(s, fmt))
        except ValueError:
            continue
    return None


def parse_date_iso(s: str | bytes | None) -> str | None:
    """parse_date -> .isoformat() string (loaders.py:78,80,82), or None."""
    dt = parse_date(s)
    return dt.isoformat() if dt is not None else None


def repair_compact_tz(s: str) -> str:
    """WaPo repair: '2017-03-01T12:00:00-500' -> '...-05:00'
    (spiders/us/washingtonpost.py:59-63)."""
    return re.sub(r"([+-])(\d)(\d{2})$", r"\g<1>0\g<2>:\g<3>", s)
