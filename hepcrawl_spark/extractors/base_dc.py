"""BASE (base_dc OAI) extractor — thesis harvesting with pdf hunt.

Reproduces /root/reference/hepcrawl/spiders/base_spider.py:84-225:

- stage A (``oai-base-dc``): one ``OAI-PMH:record`` node → partial
  thesis HEPRecord (title+subtitle split, abstract, date, source
  collname, creators ∪ author-contributors, thesis struct,
  collections) plus the record's URL set (identifier/relation/link
  with the reference's http/front/jpg filters and <>-stripping);
  pdf-mime links become ``file_urls``, otherwise the first URL is the
  splash hop (``new_urls``).
- stage B (``base-splash``): any splash page → pdf-looking hrefs,
  domain-joined, sorted, deduped (scrape_for_pdf semantics).  Real
  splash pages are tag soup, so hrefs come from a byte-regex scan.

Mime classification is pluggable as in marc21_slim (the reference
does a live HEAD, utils.py:154-162).
"""

from __future__ import annotations

import re
from typing import Callable, List, Optional
from urllib.parse import urljoin

from . import register
from .recbuild import RecordBuilder
from .xmlpath import iter_records, strip_namespaces, texts
from ..functions.textutils import parse_domain

OAI_NS = "http://www.openarchives.org/OAI/2.0/"

_RE_HREF = re.compile(rb"""href\s*=\s*["']([^"']+)["']""", re.I)


def default_mime_lookup(url: str) -> str:
    low = url.lower()
    if low.endswith(".pdf") or "/pdf" in low:
        return "application/pdf"
    return "text/html"


def get_authors(node) -> List[dict]:
    """creators ∪ explicitly-tagged author contributors —
    parity: base_spider.py:84-103."""
    authors = []
    for author in texts(node, ".//creator"):
        authors.append({"raw_name": author})
    for author in texts(node, ".//contributor"):
        if "author" in author.lower():
            authors.append({
                "raw_name": author.replace("(Author)", "").strip()
            })
    return authors


def get_urls_in_record(node) -> List[str]:
    """identifier/relation/link URL collection with the reference's
    filters — parity: base_spider.py:105-128."""
    identifiers = [
        i for i in texts(node, ".//identifier")
        if "http" in i.lower() and "front" not in i.lower()
        and "jpg" not in i.lower()
    ]
    relations = [
        s for s in " ".join(texts(node, ".//relation")).split()
        if "http" in s and "jpg" not in s.lower()
    ]
    links = texts(node, ".//link")
    urls_in_record = []
    for url in identifiers + relations + links:
        url = url.strip("<>")
        if not url.startswith(("http://", "https://")):
            url = "http://{0}".format(url)
        if url not in urls_in_record:
            urls_in_record.append(url)
    return urls_in_record


def get_title(node):
    """(title, subtitle) from the first two dc:title values —
    parity: base_spider.py:146-156."""
    titles = texts(node, ".//title")
    title = titles[0] if titles else ""
    subtitle = titles[1] if len(titles) == 2 else ""
    return title, subtitle


def extract_base_dc(payload: bytes,
                    mime_lookup: Optional[Callable[[str], str]] = None
                    ) -> List[dict]:
    mime_lookup = mime_lookup or default_mime_lookup
    out = []
    for node in iter_records(payload, "record", namespace=OAI_NS):
        strip_namespaces(node)
        urls_in_record = get_urls_in_record(node)
        direct_link = [
            link for link in urls_in_record
            if "pdf" in mime_lookup(link) and "jpg" not in link.lower()
        ]

        b = RecordBuilder()
        if direct_link:
            b.add("file_urls", direct_link)
        b.add("urls", urls_in_record)
        b.add("abstract", texts(node, ".//description"))
        title, subtitle = get_title(node)
        if title:
            b.add("title", title)
        if subtitle:
            b.add("subtitle", subtitle)
        b.add("date_published", texts(node, ".//date"))
        b.add("source", texts(node, ".//collname"))
        b.add("authors", get_authors(node))
        b.add("thesis", {"degree_type": "PhD"})
        b.add("collections", ["HEP", "THESIS"])

        rec = b.build()
        # no direct pdf → follow the first link (base_spider.py:163-169)
        rec["new_urls"] = (
            urls_in_record[:1] if not direct_link and urls_in_record else []
        )
        out.append(rec)
    return out


@register("oai-base-dc")
def _extract_registered(payload: bytes) -> List[dict]:
    return extract_base_dc(payload)


@register("base-splash")
def extract_base_splash(payload: bytes, url: str = "",
                        mime_lookup: Optional[Callable[[str], str]] = None
                        ) -> List[dict]:
    """Splash page → sorted, domain-joined pdf links
    (scrape_for_pdf, base_spider.py:205-225)."""
    mime_lookup = mime_lookup or default_mime_lookup
    domain = parse_domain(url) if url else ""
    hrefs = [
        h.decode("utf-8", "replace")
        for h in _RE_HREF.findall(payload)
        if b"pdf" in h.lower()
    ]
    all_links = sorted({
        urljoin(domain, link) for link in hrefs if "jpg" not in link.lower()
    })
    pdf_links = [
        urljoin(domain, link) for link in all_links
        if ("pdf" in mime_lookup(link) or "pdf" in link.lower())
        and "jpg" not in link.lower()
    ]
    b = RecordBuilder()
    if pdf_links:
        b.add("file_urls", pdf_links)
    return [b.build()]
