"""Brown University repository extractor (JSON API + splash page).

Reproduces /root/reference/hepcrawl/spiders/brown_spider.py:72-230:
stage A (``json-brown``) walks the collection API JSON and emits a
partial thesis record per ``items.docs[]`` (title, abstract, keywords,
uri) with the splash hop in ``new_urls``; stage B (``brown-splash``)
scrapes the record page's <dl> metadata panel for creators, copyright
date, PhD year (from Notes), page count (Extent) and pdf links.
"""

from __future__ import annotations

import json
import re
from typing import List
from urllib.parse import urljoin

from . import register
from .htmlsoup import parse_html
from .recbuild import RecordBuilder
from ..functions.textutils import parse_domain, split_fullname

_RE_NONWORD = re.compile(r"[\W_]+", re.UNICODE)


@register("json-brown")
def extract_brown(payload: bytes) -> List[dict]:
    body = json.loads(payload.decode("utf-8"))
    out = []
    for jsonrecord in body.get("items", {}).get("docs", []):
        b = RecordBuilder()
        b.add("title", jsonrecord.get("primary_title"))
        b.add("abstract", jsonrecord.get("abstract"))
        b.add("free_keywords", jsonrecord.get("keyword"))
        b.add("urls", jsonrecord.get("uri"))
        b.add("collections", ["HEP", "THESIS"])
        rec = b.build()
        rec["new_urls"] = [jsonrecord["uri"]] if jsonrecord.get("uri") else []
        out.append(rec)
    return out


def _dd_after(root, label: str, pred=None, first_only: bool = False):
    """dt[contains(text(), label)]/following-sibling::dd texts within
    the panel-body dl blocks."""
    out = []
    for div in root.iter("div"):
        if div.get("class") != "panel-body":
            continue
        for dl in div.findall("dl"):
            children = list(dl)
            hit = False
            for el in children:
                if el.tag == "dt":
                    hit = label in "".join(el.itertext())
                    continue
                if hit and el.tag == "dd":
                    text = el.text or ""
                    if pred is None or pred(text):
                        out.append(text)
                        if first_only:
                            return out
    return out


def get_authors(root) -> List[dict]:
    """Parity: brown_spider.py:95-117."""
    authors = []
    raw = _dd_after(
        root, "Contributors",
        pred=lambda t: "creator" in t or "Creator" in t,
    )
    for auth in raw:
        auth = auth.replace("(creator)", "").replace("(Creator)", "")
        split_author = split_fullname(auth)
        authors.append({
            "surname": split_author[0],
            "given_names": split_author[-1],
        })
    return authors


def get_phd_year(root) -> str:
    """Parity: brown_spider.py:129-144."""
    notes = _dd_after(root, "Notes", first_only=True)
    if not notes:
        return ""
    cleaned = _RE_NONWORD.sub(" ", notes[0].replace(".", "")).split()
    years = [w for w in cleaned if w.isdigit()]
    return years[0] if years else ""


@register("brown-splash")
def extract_brown_splash(payload: bytes, url: str = "") -> List[dict]:
    root = parse_html(payload)
    b = RecordBuilder()

    domain = parse_domain(url) if url else ""
    all_links = sorted({
        urljoin(domain, a.get("href"))
        for a in root.iter("a")
        if a.get("href") and "pdf" in a.get("href").lower()
        and "?embed" not in a.get("href")
    })
    pdf_links = [
        urljoin(domain, link) for link in all_links if "pdf" in link.lower()
    ]
    if pdf_links:
        b.add("file_urls", pdf_links)

    b.add("authors", get_authors(root))
    date = _dd_after(root, "Copyright", first_only=True)
    if date:
        b.add("date_published", date[0])
    b.add("thesis", {
        "date": get_phd_year(root),
        "institutions": [{"name": "Brown University"}],
        "degree_type": "PhD",
    })
    pages_raw = _dd_after(root, "Extent", first_only=True)
    if pages_raw:
        b.add("page_nr", [w for w in pages_raw[0].split() if w.isdigit()])
    return [b.build()]
