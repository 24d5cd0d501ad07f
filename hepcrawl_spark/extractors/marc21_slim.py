"""MARC21-slim (DNB Dissonline) extractor — stage A of the two-hop
DNB flow.

Reproduces /root/reference/hepcrawl/spiders/dnb_spider.py:73-225: one
``slim:record`` node → a partial thesis HEPRecord (authors with
cleaned 502 affiliations, title, source, date, supervisors (700 with
``Betreuer`` role), language, all record URLs, thesis struct,
collections) plus the splash/direct link classification.

Link classification in the reference is a live HTTP HEAD per URL
(utils.py:154-162 ``get_mime_type``); in this engine the mime source
is pluggable — a ``mime_lookup`` callable here, and relationally a
broadcast-joined ``mime(url, content_type)`` table in the flow
(SURVEY.md §2.2 R9).  The registered extractor uses a suffix
heuristic as the default seam.

Splash links become ``new_urls`` (frontier expansion): the first
splash link is scheduled for the ``dnb-splash`` extractor and the
results merge back in ``flows.enrichment``.
"""

from __future__ import annotations

from typing import Callable, List, Optional

from . import register
from .recbuild import RecordBuilder
from .xmlpath import iter_records, strip_namespaces, texts

SLIM_NS = "http://www.loc.gov/MARC21/slim"


def default_mime_lookup(url: str) -> str:
    """Suffix-heuristic stand-in for the reference's HTTP HEAD."""
    low = url.lower()
    if low.endswith(".pdf") or "/pdf" in low:
        return "application/pdf"
    if low.endswith((".jpg", ".jpeg")):
        return "image/jpeg"
    return "text/html"


def _subfields(node, tag: str, code: str) -> List[str]:
    out = []
    for df in node.findall(f"datafield[@tag='{tag}']"):
        out.extend(texts(df, f"subfield[@code='{code}']"))
    return out


def get_affiliations(node) -> List[str]:
    """502 affiliation strings with 'diss'/year segments dropped —
    parity: dnb_spider.py:73-84."""
    out = []
    for aff_raw in _subfields(node, "502", "a"):
        arlist = aff_raw.split(",")
        out.append(",".join(
            i for i in arlist
            if not ("diss" in i.lower() or i.strip().isdigit())
        ))
    return out


def get_authors(node) -> List[dict]:
    affiliations = get_affiliations(node)
    return [
        {"raw_name": author,
         "affiliations": [{"value": aff} for aff in affiliations]}
        for author in _subfields(node, "100", "a")
    ]


def get_thesis_supervisors(node) -> List[dict]:
    """700 datafields whose subfield e mentions 'Betreuer' —
    parity: dnb_spider.py:101-113."""
    out = []
    for df in node.findall("datafield[@tag='700']"):
        if any("Betreuer" in t for t in texts(df, "subfield[@code='e']")):
            out.extend(
                {"raw_name": s} for s in texts(df, "subfield[@code='a']")
            )
    return out


def find_direct_links(urls_in_record: List[str],
                      mime_lookup: Callable[[str], str]):
    """(direct_links, splash_links) — parity: dnb_spider.py:123-133."""
    direct, splash = [], []
    for link in urls_in_record:
        mime = mime_lookup(link)
        if "pdf" in mime and "jpg" not in link.lower():
            direct.append(link)
        elif "pdf" not in mime:
            splash.append(link)
    return direct, splash


def extract_marc21_slim(payload: bytes,
                        mime_lookup: Optional[Callable[[str], str]] = None
                        ) -> List[dict]:
    mime_lookup = mime_lookup or default_mime_lookup
    out = []
    for node in iter_records(payload, "record", namespace=SLIM_NS):
        strip_namespaces(node)
        urls_in_record = _subfields(node, "856", "u")
        direct_links, splash_links = find_direct_links(
            urls_in_record, mime_lookup
        )

        b = RecordBuilder()
        b.add("authors", get_authors(node))
        b.add("title", _subfields(node, "245", "a"))
        b.add("source", _subfields(node, "264", "b"))
        b.add("date_published", _subfields(node, "264", "c"))
        b.add("thesis_supervisor", get_thesis_supervisors(node))
        b.add("language", _subfields(node, "041", "a"))
        b.add("urls", urls_in_record)
        if direct_links:
            b.add("file_urls", direct_links)
        b.add("thesis", {"degree_type": "PhD"})
        b.add("collections", ["HEP", "THESIS"])

        rec = b.build()
        # first splash link goes back to the frontier for the
        # dnb-splash enrichment hop (dnb_spider.py:150-158)
        rec["new_urls"] = splash_links[:1]
        out.append(rec)
    return out


@register("marc21-slim")
def _extract_registered(payload: bytes) -> List[dict]:
    return extract_marc21_slim(payload)
