"""Philpapers.org extractor (JSON listing + splash pdf hunt).

Reproduces /root/reference/hepcrawl/spiders/phil_spider.py:63-160:
stage A (``json-phil``) walks the JSON array and emits one record per
entry (thesis vs journal branches, D/M/Y date reassembly, raw-name
authors); stage B (``phil-splash``) scrapes the record page for pdf
links (sorted, domain-joined, jpg-filtered).
"""

from __future__ import annotations

import json
from typing import List
from urllib.parse import urljoin

from . import register
from .htmlsoup import parse_html
from .recbuild import RecordBuilder
from ..functions.textutils import parse_domain


def get_date(record: dict) -> str:
    """D/M/Y → ISO-ish reassembly — parity: phil_spider.py:70-83."""
    date_raw = record["year"].split("/")
    if len(date_raw) == 1:
        return date_raw[0]
    if len(date_raw) == 2:
        return date_raw[-1] + "-" + date_raw[0]
    return date_raw[-1] + "-" + date_raw[1] + "-" + date_raw[0]


@register("json-phil")
def extract_phil(payload: bytes) -> List[dict]:
    body = json.loads(payload.decode("utf-8"))
    out = []
    for jsonrecord in body:
        b = RecordBuilder()
        b.add("title", jsonrecord["title"])
        b.add("abstract", jsonrecord["abstract"])
        b.add("dois", jsonrecord["doi"])
        b.add("page_nr", jsonrecord["pages"])
        b.add("authors", [
            {"raw_name": auth} for auth in jsonrecord["authors"]
        ])
        b.add("urls", jsonrecord["links"])
        b.add("source", "Philpapers.org")
        if not jsonrecord.get("year") == "forthcoming":
            b.add("date_published", get_date(jsonrecord))
        type_thesis = "thesis" in jsonrecord.get("pub_type", "").lower()
        info_diss = "dissertation" in jsonrecord.get("pubInfo", "").lower()
        if type_thesis or info_diss:
            b.add("collections", ["THESIS"])
        elif "journal" in jsonrecord.get("pub_type", "").lower():
            b.add("journal_title", jsonrecord["journal"])
            if not jsonrecord.get("volume") == "0":
                b.add("journal_volume", jsonrecord["volume"])
            if not jsonrecord.get("issue") == "0":
                b.add("journal_issue", jsonrecord["issue"])
            if not jsonrecord.get("year") == "forthcoming":
                b.add("journal_year", int(jsonrecord["year"]))
        rec = b.build()
        links = jsonrecord.get("links") or []
        rec["new_urls"] = links[:1]
        out.append(rec)
    return out


@register("phil-splash")
def extract_phil_splash(payload: bytes, url: str = "") -> List[dict]:
    """Splash → sorted pdf links (phil_spider.py:102-127)."""
    root = parse_html(payload)
    domain = parse_domain(url) if url else ""
    all_links = sorted({
        urljoin(domain, a.get("href"))
        for a in root.iter("a")
        if a.get("href") and "pdf" in a.get("href")
        and "jpg" not in a.get("href").lower()
    })
    pdf_links = [
        urljoin(domain, link) for link in all_links
        if "pdf" in link.lower() and "jpg" not in link.lower()
    ]
    b = RecordBuilder()
    if pdf_links:
        b.add("file_urls", pdf_links)
    return [b.build()]
