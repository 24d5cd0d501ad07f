"""Date normalization with pre-1900 support.

Reimplements the observable semantics of hepcrawl/dateutils.py:127-204
(format cascade → dateutil fallback → raw passthrough) in Python 3.
The reference needed a custom strftime for pre-1900 dates (Python 2
limitation, dateutils.py:82-124); here the output formats are only ever
``%Y-%m-%d`` / ``%Y-%m`` / ``%Y`` so we format the struct_time fields
directly, which is pre-1900 safe and byte-identical.
"""

from __future__ import annotations

import time

import dateutil.parser as dparser
from datetime import datetime as _datetime

# Format cascade, tried in order — parity: hepcrawl/dateutils.py:23-31.
FORMATS_FULL = [
    "%Y-%m-%d", "%d %m %Y", "%x", "%d %b %Y",
    "%d %B %Y", "%d %b %y", "%d %B %y", "%Y-%m-%dT%H:%M:%SZ", "%d-%m-%Y",
]
FORMATS_MONTH = [
    "%Y-%m", "%Y %b", "%b %Y", "%Y %B", "%B %Y",
    "%y-%m", "%y %b", "%b %y", "%y %B", "%B %y",
]
FORMATS_YEAR = ["%Y", "%y"]


def create_valid_date(raw) -> str | None:
    """Try full → month → year formats; return ISO-ish string or None.

    Parity: hepcrawl/dateutils.py:127-156, including the destructive
    truncation of the input between cascade stages.
    """
    date = str(raw)
    for fmt in FORMATS_FULL:
        try:
            t = time.strptime(date, fmt)
            return "%04d-%02d-%02d" % (t.tm_year, t.tm_mon, t.tm_mday)
        except ValueError:
            pass
    for fmt in FORMATS_MONTH:
        try:
            if date.count("-") > 1:
                date = "-".join(date.split("-")[:2])
            t = time.strptime(date, fmt)
            return "%04d-%02d" % (t.tm_year, t.tm_mon)
        except ValueError:
            pass
    for fmt in FORMATS_YEAR:
        try:
            if date.count("-") > 0:
                date = date.split("-")[0]
            t = time.strptime(date, fmt)
            return "%04d" % t.tm_year
        except ValueError:
            pass
    return None


def parse_date(raw):
    """dateutil fallback with a year-1 default; unparseable input is
    returned verbatim.  Parity: hepcrawl/dateutils.py:159-178.
    """
    if not raw:
        return raw
    if not isinstance(raw, str):
        raw = str(raw)
    try:
        parsed = dparser.parse(raw, default=_datetime(1, 1, 1))
        return parsed.date().isoformat()
    except ValueError:
        return raw


def format_date(raw) -> str:
    """ISO-formatted date: format cascade first, dateutil second, ''
    for falsy input.  Parity: hepcrawl/dateutils.py:181-193.
    """
    out = create_valid_date(raw)
    if not out:
        out = parse_date(raw)
    if not out:
        out = ""
    return out


def format_year(raw) -> int:
    """Year of the formatted date, 0 if unparseable.

    Parity: hepcrawl/dateutils.py:196-204.
    """
    formatted = format_date(raw)
    try:
        return dparser.parse(formatted).year
    except (ValueError, OverflowError):
        return 0
