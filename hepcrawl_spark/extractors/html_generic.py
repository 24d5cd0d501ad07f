"""Generic web-page extractor (Common-Crawl-style HTML).

The webtext counterpart of the publisher-format extractors: for an
arbitrary HTML page emit one record with ``title`` (the <title> tag),
``abstract`` (whitespace-collapsed visible body text) and ``new_urls``
(href frontier expansion).  This is the format the 100 TB corpus rows
carry when no publisher format applies.

Parsing uses lxml when available and falls back to a small regex path
(the fixture corpus is simple enough for both to agree); whitespace
collapse matches the reference's ``clean_whitespace_characters``
semantics (/root/reference/hepcrawl/inputs.py:119-122).
"""

from __future__ import annotations

import re
from typing import List

from . import register

try:
    from lxml import html as lxml_html
    _HAVE_LXML = True
except ImportError:  # pragma: no cover
    _HAVE_LXML = False

_RE_TITLE = re.compile(rb"<title[^>]*>(.*?)</title>", re.I | re.S)
_RE_HREF = re.compile(rb"""href\s*=\s*["']([^"'#]+)["']""", re.I)
_RE_TAG = re.compile(rb"<[^>]+>")
_RE_SCRIPT = re.compile(rb"<(script|style)[^>]*>.*?</\1>", re.I | re.S)


def _collapse_ws(s: str) -> str:
    return " ".join(s.split())


@register("html-generic")
def extract_html_generic(payload: bytes) -> List[dict]:
    if not payload:
        return []
    if _HAVE_LXML:
        try:
            tree = lxml_html.fromstring(payload)
            title_el = tree.find(".//title")
            title = _collapse_ws(title_el.text_content()) if title_el is not None else None
            body = _collapse_ws(tree.text_content())
            links = [
                h for h in tree.xpath("//a/@href")
                if h.startswith(("http://", "https://"))
            ]
            return [{
                "title": title,
                "abstract": body or None,
                "urls": [{"value": u} for u in links],
                "new_urls": links,
                "collections": [{"primary": "HEP"}],
            }]
        except Exception:
            pass  # fall through to the regex path
    cleaned = _RE_SCRIPT.sub(b" ", payload)
    m = _RE_TITLE.search(cleaned)
    title = _collapse_ws(m.group(1).decode("utf-8", "replace")) if m else None
    body = _collapse_ws(_RE_TAG.sub(b" ", cleaned).decode("utf-8", "replace"))
    links = [
        u.decode("utf-8", "replace")
        for u in _RE_HREF.findall(cleaned)
        if u.startswith((b"http://", b"https://"))
    ]
    return [{
        "title": title,
        "abstract": body or None,
        "urls": [{"value": u} for u in links],
        "new_urls": links,
        "collections": [{"primary": "HEP"}],
    }]
