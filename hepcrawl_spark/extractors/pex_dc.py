"""PoS (pex-dc OAI) extractor — the two-hop PoS/Sissa flow.

Reproduces /root/reference/hepcrawl/spiders/pos_spider.py:45-168:

- stage A (``pex-dc``): one OAI ``record`` node → partial HEPRecord
  (title, subjects, source, ext-system numbers, license, date/year,
  PoS(CONF)ID triple split into journal fields, authors, extra_data,
  collections) + ``new_urls`` = the contribution splash URL.
- stage B (``pos-splash``): the splash page → the PDF link
  (``//a[contains(text(),'pdf')]/@href``) as an additional_files
  entry plus the splash URL itself into ``urls``.

The reference carries the record XML through ``meta`` and builds the
item after the second fetch; here stage A extracts immediately and
the enrichment join merges stage-B fields (flows.enrichment).
"""

from __future__ import annotations

import re
from typing import List

from . import register
from .recbuild import RecordBuilder
from .xmlpath import all_texts, iter_records, parse_xml, strip_namespaces, texts
from ..functions.dates import create_valid_date
from ..functions.textutils import get_license

POS_BASE_URL = "http://pos.sissa.it/contribution?id="


def _first(values, default=None):
    return values[0] if values else default


def get_authors(node) -> List[dict]:
    """Parity: pos_spider.py:144-160 (name//text() + affiliations)."""
    authors = []
    for creator in node.findall(".//metadata/pex-dc/creator"):
        auth = {}
        name_texts = []
        for name_el in creator.findall(".//name"):
            name_texts.extend(all_texts(name_el))
        auth["raw_name"] = _first(name_texts, "")
        affs = []
        for aff_el in creator.findall(".//affiliation"):
            affs.extend(all_texts(aff_el))
        if affs:
            auth["affiliations"] = [{"value": a} for a in affs]
        if auth:
            authors.append(auth)
    return authors


@register("pex-dc")
def extract_pex_dc(payload: bytes) -> List[dict]:
    out = []
    root = strip_namespaces(parse_xml(payload))
    for node in root.iter("record"):
        b = RecordBuilder()
        b.add("title", texts(node, ".//metadata/pex-dc/title"))
        b.add("field_categories", texts(node, ".//metadata/pex-dc/subject"))
        b.add("source", texts(node, ".//metadata/pex-dc/publisher"))

        identifier = _first(texts(node, ".//metadata/pex-dc/identifier"))
        b.add("external_system_numbers", [
            {"institute": "PoS", "value": identifier},
            {"institute": "PoS", "value": _first(texts(node, ".//identifier"))},
        ])

        lic = get_license(
            license_text=_first(texts(node, ".//metadata/pex-dc/rights")),
        )
        if lic:
            b.add("license", lic)

        date = create_valid_date(
            _first(texts(node, ".//metadata/pex-dc/date"))
        )
        if date:
            b.add("date_published", date)
            b.add("journal_year", int(date[0:4]))

        if identifier:
            pbn = re.split(r"[()]", identifier)
            if len(pbn) == 3:
                b.add("journal_title", pbn[0])
                b.add("journal_volume", pbn[1])
                b.add("journal_artid", pbn[2])
            else:
                b.add("pubinfo_freetext", identifier)

        language = _first(texts(node, ".//metadata/pex-dc/language"))
        if language:
            b.add("language", language)

        authors = get_authors(node)
        if authors:
            b.add("authors", authors)

        section = _first(texts(node, ".//metadata/pex-dc/description"))
        if section is not None:
            b.add("extra_data", {"section": section.split(";", 1)[-1].strip()})

        b.add("collections", ["HEP", "ConferencePaper"])

        rec = b.build()
        # "probably all links lead to same place, so take first"
        # (pos_spider.py:52-54): the contribution splash page
        rec["new_urls"] = (
            ["{0}{1}".format(POS_BASE_URL, identifier)] if identifier else []
        )
        out.append(rec)
    return out


@register("pos-splash")
def extract_pos_splash(payload: bytes, url: str = "") -> List[dict]:
    """Splash page → pdf link + page url (pos_spider.py:61-67)."""
    root = strip_namespaces(parse_xml(payload))
    pdf_url = None
    for a in root.iter("a"):
        if "pdf" in (a.text or "") and a.get("href"):
            pdf_url = a.get("href")
            break
    b = RecordBuilder()
    if url:
        b.add("urls", url)
    if pdf_url:
        b.add("additional_files", {"type": "Fulltext", "url": pdf_url})
    return [b.build()]
