"""MARC21 (Hindawi) extractor.

Reproduces the record semantics of the reference Hindawi spider
(/root/reference/hepcrawl/spiders/hindawi_spider.py:75-225): one
``marc:record`` node (inside an OAI-PMH ListRecords envelope) → one
HEPRecord with authors (100 ∪ 700 datafields with affiliations),
abstract/title/date/page_nr, DOI (024 with subfield 2 = DOI), 773
publication info, 542 copyright, 540 license, and the 856/FFT URL
split into splash / pdf / xml links.
"""

from __future__ import annotations

from typing import List

from . import register
from .recbuild import RecordBuilder
from .xmlpath import iter_records, strip_namespaces, texts
from ..functions.textutils import get_license

MARC_NS = "http://www.loc.gov/MARC21/slim"


def _subfields(node, tag: str, code: str) -> List[str]:
    out = []
    for df in node.findall(f"datafield[@tag='{tag}']"):
        out.extend(texts(df, f"subfield[@code='{code}']"))
    return out


def _first(values, default=None):
    return values[0] if values else default


def get_authors(node) -> List[dict]:
    """100-then-700 datafields → author dicts.
    Parity: hindawi_spider.py:88-100."""
    authors = []
    fields = (node.findall("datafield[@tag='100']")
              + node.findall("datafield[@tag='700']"))
    for author in fields:
        authors.append({
            "raw_name": _first(texts(author, "subfield[@code='a']")),
            "affiliations": [
                {"value": aff} for aff in texts(author, "subfield[@code='u']")
            ],
        })
    return authors


def get_urls_in_record(node):
    """(pdf, xml, splash) link split — parity:
    hindawi_spider.py:102-131 (dedup preserves first-seen order where
    the reference's ``list(set(...))`` order is undefined)."""
    marc_856 = _subfields(node, "856", "u")
    marc_fft = _subfields(node, "FFT", "a")
    all_links = list(dict.fromkeys(marc_856 + marc_fft))
    pdf, xml, splash = [], [], []
    for link in all_links:
        low = link.lower()
        if "pdf" in low:
            pdf.append(link)
        elif "xml" in low:
            xml.append(link)
        elif "dx.doi.org" in low:
            splash.append(link)
    return pdf, xml, splash


def get_dois(node) -> List[str]:
    """024 fields whose subfield 2 mentions DOI —
    parity: hindawi_spider.py:180-181 (xpath contains())."""
    out = []
    for df in node.findall("datafield[@tag='024']"):
        if any("DOI" in t for t in texts(df, "subfield[@code='2']")):
            out.extend(texts(df, "subfield[@code='a']"))
    return out


@register("marc21")
def extract_marc21(payload: bytes) -> List[dict]:
    out = []
    for node in iter_records(payload, "record", namespace=MARC_NS):
        strip_namespaces(node)
        b = RecordBuilder()

        b.add("authors", get_authors(node))
        b.add("abstract", _subfields(node, "520", "a"))
        b.add("title", _subfields(node, "245", "a"))
        b.add("date_published", _subfields(node, "260", "c"))
        b.add("page_nr", _subfields(node, "300", "a"))
        b.add("dois", get_dois(node))
        b.add("journal_title", _subfields(node, "773", "p"))
        # the reference reads code='a' for the volume (not 'v');
        # mirrored for parity (hindawi_spider.py:184-185)
        b.add("journal_volume", _subfields(node, "773", "a"))
        journal_year = _subfields(node, "773", "y")
        if journal_year:
            b.add("journal_year", int(journal_year[0]))
        b.add("journal_issue", _subfields(node, "773", "n"))

        pages = _first(_subfields(node, "773", "c"), "")
        if "-" in pages:
            fpage, lpage = pages.split("-", 1)
        else:
            fpage, lpage = pages, ""
        b.add("journal_fpage", fpage)
        b.add("journal_lpage", lpage)

        cr_statement = _first(_subfields(node, "542", "f"), "")
        b.add("copyright_statement", cr_statement)
        b.add("copyright_year", "".join(c for c in cr_statement if c.isdigit()))

        lic = get_license(
            license_url=_first(_subfields(node, "540", "u")),
            license_text=_first(_subfields(node, "540", "a")),
        )
        if lic:
            b.add("license", lic)

        pdf_links, xml_links, splash_links = get_urls_in_record(node)
        b.add("urls", splash_links)
        b.add("file_urls", pdf_links)
        if xml_links:
            b.add("additional_files", [
                {"access": "INSPIRE-HIDDEN", "description": "HINDAWI",
                 "url": xml, "type": "Fulltext"}
                for xml in xml_links
            ])
        b.add("collections", ["HEP", "Citeable", "Published"])
        b.add("source", _subfields(node, "260", "b"))

        out.append(b.build())
    return out
