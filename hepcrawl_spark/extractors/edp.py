"""EDP Sciences extractor (JATS 'jp' + 'rich' formats, tar packages).

Reproduces /root/reference/hepcrawl/spiders/edp_spider.py:202-595:

- ``edp-jats``: JATS ``article`` nodes → records with the EDP author
  variant (addr-line xref affiliations, e-mail split), keyword/PACS
  split, correction/addendum related DOIs, license, collections, and
  the parsed reference list; open-access journals (EPJ Web of
  Conferences) yield a dx.doi.org splash hop in ``new_urls``.
- ``edp-rich``: ``EDPSArticle`` nodes → records with the rich-format
  author/affiliation labels, Year/MonthNumber dates and page counts.
- ``edp-splash``: splash page → sorted pdf links (INSPIRE-PUBLIC fft).

raw_reference parity: lxml re-emits the root's xmlns declarations when
serializing a subtree, so the reference goldens carry them; the root
declarations are captured from the document head and re-injected.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import List, Optional
from urllib.parse import urljoin

from . import register
from .jats import get_keywords, get_published_date, serialize
from .recbuild import RecordBuilder
from .xmlpath import all_texts, iter_records, parse_xml, strip_namespaces, texts
from ..functions.textutils import (
    get_journal_and_section,
    get_license,
    parse_domain,
)

ALLOWED_ARTICLE_TYPES = [
    "research-article", "corrected-article", "original-article",
    "introduction", "letter", "correction", "addendum",
    "review-article", "rapid-communications", "Article", "Erratum",
]

OPEN_ACCESS_JOURNALS = {"EPJ Web of Conferences"}

CONFERENCE_JOURNAL = (
    "International Journal of Modern Physics: Conference Series"
)

_RE_ROOT_XMLNS = re.compile(rb"<(?:\w+:)?\w+([^>]*)>")
_RE_XMLNS_DECL = re.compile(r'(xmlns(?::\w+)?="[^"]*")')


def _first(vals, default=None):
    return vals[0] if vals else default


def root_xmlns_decls(payload: bytes) -> str:
    """The root element's xmlns declarations, source order."""
    m = _RE_ROOT_XMLNS.search(payload.split(b"?>")[-1])
    if not m:
        return ""
    attrs = m.group(1).decode("utf-8", "replace")
    return " ".join(_RE_XMLNS_DECL.findall(attrs))


def serialize_with_decls(el: ET.Element, decls: str) -> str:
    """Subtree serialization with the root's xmlns declarations
    re-injected (lxml subtree-serialization behavior)."""
    raw = serialize(el)
    if not decls:
        return raw
    m = re.match(r"<([\w.-]+)((?:\s|>).*)", raw, re.S)
    if not m:
        return raw
    return "<{0} {1}{2}".format(m.group(1), decls, m.group(2))


def get_collections(node, article_type: Optional[str],
                    journal_title: str) -> List[str]:
    if node.findall(".//conference") or journal_title == CONFERENCE_JOURNAL:
        return ["HEP", "ConferencePaper"]
    if article_type == "review-article":
        return ["HEP", "Review"]
    return ["HEP", "Published"]


def get_authors_jats(node) -> List[dict]:
    """EDP JATS author variant — parity: edp_spider.py:539-585."""
    authors = []
    for contrib in node.findall(".//contrib"):
        if contrib.get("contrib-type") != "author":
            continue
        surname = _first(texts(contrib, "name/surname"), "")
        given_names = _first(texts(contrib, "name/given-names"), "")
        email = _first(texts(contrib, "email"))

        affs_raw = [" ".join(all_texts(a)) for a in contrib.findall("aff")]
        rids = [
            x.get("rid") for x in contrib.findall("xref")
            if x.get("ref-type") == "aff" and x.get("rid")
        ]
        if rids:
            rid = rids[0]
            aff = [
                t for a in node.findall(".//aff") if a.get("id") == rid
                for t in texts(a, "addr-line/institution")
            ]
            if not aff:
                aff = [
                    t for a in node.findall(".//aff") if a.get("id") == rid
                    for t in texts(a, "addr-line")
                ]
            affs_raw += aff
        affiliations = []
        if affs_raw:
            no_email = []
            for aff_raw in affs_raw:
                if "e-mail" in aff_raw:
                    no_email.append(aff_raw.split("e-mail")[0].strip())
            if no_email:
                affs_raw = no_email
            affiliations = [{"value": a} for a in affs_raw]
        authors.append({
            "surname": surname,
            "given_names": given_names,
            "affiliations": affiliations,
            "email": email,
        })
    return authors


def get_authors_rich(node) -> List[dict]:
    """Parity: edp_spider.py:557-585 (_get_authors_rich)."""
    authors = []
    for contrib in node.findall(".//Author"):
        surname = _first(texts(contrib, "AuthorName//LastName")
                         or texts(contrib, ".//LastName"))
        fname = _first(texts(contrib, ".//FirstName"))
        mname = _first(texts(contrib, ".//MiddleName"))
        given_names = ""
        if fname:
            given_names = fname
            if mname:
                given_names += " " + mname
        affiliations = []
        rid = None
        for aff_id in contrib.findall("AffiliationID"):
            rid = aff_id.get("Label")
            break
        if rid:
            aff_raw = [
                t for a in node.findall(".//Affiliation")
                if a.get("ID") == rid
                for t in texts(a, "UnstructuredAffiliation")
            ]
            if aff_raw:
                affiliations = [{"value": a} for a in aff_raw]
        authors.append({
            "surname": surname,
            "given_names": given_names,
            "affiliations": affiliations,
        })
    return authors


def get_external_links(ref):
    """Parity: edp_spider.py:475-486."""
    doi, urls = "", []
    for link in ref.iter("ext-link"):
        href = link.get("href")
        if not href:
            continue
        if "doi" in href:
            doi = "doi:" + href.replace("http://dx.doi.org/", "")
        else:
            urls.append(href)
    return doi, urls


def parse_reference(ref, label, decls: str) -> dict:
    """Parity: edp_spider.py:400-473."""
    reference = {}
    raw_reference = serialize_with_decls(ref, decls)
    sublabel = ref.get("id")
    if label and sublabel:
        label = label + sublabel[-1]
    reference["number"] = label
    ref_type = ref.get("publication-type")
    doi, urls = get_external_links(ref)
    collaboration = None
    for collab in ref.iter("collab"):
        collaboration = _first(all_texts(collab))
        break

    authors = []
    for author_group in ref.iter("string-name"):
        surname = _first([t for el in author_group.iter("surname")
                          for t in all_texts(el)])
        firstnames = _first([t for el in author_group.iter("given-names")
                             for t in all_texts(el)])
        authors.append((surname or "") + ", " + (firstnames or ""))

    def deep_first(tag):
        return _first([t for el in ref.iter(tag) for t in all_texts(el)])

    title = deep_first("article-title")
    publication = deep_first("source")
    fpage = deep_first("fpage")
    issue = deep_first("issue")
    volume = deep_first("volume")
    year = deep_first("year")
    publisher = deep_first("publisher-name")
    publisher_loc = deep_first("publisher-loc")
    if not publisher_loc:
        # publisher-name following text sibling
        for el in ref.iter("publisher-name"):
            if el.tail:
                publisher_loc = el.tail
            break
    if publisher and publisher_loc:
        publisher = publisher_loc.strip(",. ") + ": " + publisher

    if publication:
        journal_title, section = get_journal_and_section(publication)
        if journal_title:
            reference["journal_title"] = journal_title
            if volume:
                reference["journal_volume"] = section + volume
    if ref_type:
        reference["doctype"] = ref_type
    if urls:
        reference["url"] = urls
    if doi:
        reference["doi"] = doi
    if fpage:
        reference["fpage"] = fpage
    if title:
        reference["title"] = title
    if issue:
        reference["issue"] = issue
    if year:
        reference["year"] = year
    if authors:
        reference["authors"] = authors
    if collaboration:
        reference["collaboration"] = collaboration
    if publisher:
        reference["publisher"] = publisher
    if raw_reference:
        reference["raw_reference"] = raw_reference
    return reference


def get_references(node, decls: str) -> List[dict]:
    """Parity: edp_spider.py:381-398."""
    references = []
    for ref_list in node.findall(".//ref-list"):
        for reference in ref_list.iter("ref"):
            label = _first(texts(reference, "label"))
            if label:
                label = label.strip("[].")
            inner = list(reference.iter("mixed-citation"))
            if not inner:
                references.append(parse_reference(reference, label, decls))
            for in_ref in inner:
                references.append(parse_reference(in_ref, label, decls))
    return references


@register("edp-jats")
def extract_edp_jats(payload: bytes) -> List[dict]:
    decls = root_xmlns_decls(payload)
    out = []
    for node in iter_records(payload, "article"):
        strip_namespaces(node)
        article_type = node.get("article-type")
        dois = [
            t for e in node.findall(".//article-id")
            if e.get("pub-id-type") == "doi" for t in all_texts(e)
        ]
        date_published = get_published_date(node)
        journal_title = _first(
            texts(node, ".//abbrev-journal-title")
            or texts(node, ".//journal-title"), "")
        if article_type not in ALLOWED_ARTICLE_TYPES:
            continue

        b = RecordBuilder()
        if article_type in ("correction", "addendum"):
            b.add("related_article_doi", [
                e.get("href") for e in node.findall(".//related-article")
                if e.get("ext-link-type") == "doi" and e.get("href")
            ])
            b.add("journal_doctype", article_type)
        b.add("dois", dois)
        b.add("page_nr", [
            e.get("count") for e in node.findall(".//counts/page-count")
            if e.get("count")
        ])
        abstracts = node.findall(".//abstract")
        if abstracts:
            b.add("abstract", serialize(abstracts[0]))
        b.add("title", texts(node, ".//article-title"))
        b.add("subtitle", texts(node, ".//subtitle"))
        b.add("authors", get_authors_jats(node))
        b.add("collaborations", texts(node, ".//contrib/collab"))

        free_keywords, classification_numbers = get_keywords(node)
        b.add("free_keywords", free_keywords)
        b.add("classification_numbers", classification_numbers)

        b.add("journal_title", journal_title)
        b.add("journal_issue", texts(node, ".//front//issue"))
        b.add("journal_volume", texts(node, ".//front//volume"))
        b.add("journal_artid", texts(node, ".//elocation-id"))
        b.add("journal_fpage", texts(node, ".//front//fpage"))
        b.add("journal_lpage", texts(node, ".//front//lpage"))
        b.add("journal_year", int(date_published[:4]))
        b.add("date_published", date_published)

        b.add("copyright_holder", texts(node, ".//copyright-holder"))
        b.add("copyright_year", texts(node, ".//copyright-year"))
        b.add("copyright_statement", texts(node, ".//copyright-statement"))
        b.add("copyright_material", "Article")

        lic = get_license(license_url=_first([
            link.get("href")
            for l in node.findall(".//license")
            for link in l.findall("license-p/ext-link")
        ]))
        if lic:
            b.add("license", lic)

        b.add("collections",
              get_collections(node, article_type, journal_title))
        b.add("references", get_references(node, decls))

        rec = b.build()
        rec["new_urls"] = (
            ["http://dx.doi.org/" + dois[0]]
            if dois and journal_title in OPEN_ACCESS_JOURNALS else []
        )
        out.append(rec)
    return out


@register("edp-rich")
def extract_edp_rich(payload: bytes) -> List[dict]:
    out = []
    for node in iter_records(payload, "EDPSArticle"):
        strip_namespaces(node)
        article_type = None
        for aid in node.findall(".//ArticleID"):
            article_type = aid.get("Type")
            break
        dois = texts(node, ".//DOI", deep=True)
        year = _first(texts(node, ".//Year"))
        month = _first(texts(node, ".//MonthNumber"))
        date_published = year or ""
        if year and month:
            date_published += "-" + month
        # xpath union = document order (not preference order)
        journal_title = ""
        for el in node.iter():
            if el.tag in ("JournalShortTitle", "JournalTitle"):
                title_texts = all_texts(el)
                if title_texts:
                    journal_title = title_texts[0]
                    break
        if article_type not in ALLOWED_ARTICLE_TYPES:
            continue

        b = RecordBuilder()
        b.add("dois", dois)
        abstracts = node.findall(".//Abstract")
        if abstracts:
            b.add("abstract", serialize(abstracts[0]))
        b.add("title", [
            serialize(t) for at in node.findall(".//ArticleTitle")
            for t in at.findall("Title")
        ])
        b.add("subtitle", [
            serialize(t) for at in node.findall(".//ArticleTitle")
            for t in at.findall("Subtitle")
        ])
        b.add("authors", get_authors_rich(node))
        b.add("free_keywords", [
            t for s in node.findall(".//Subject")
            for k in s.findall("Keyword") for t in all_texts(k)
        ])
        b.add("journal_title", journal_title)
        b.add("journal_issue", texts(node, ".//Issue"))
        b.add("journal_volume", texts(node, ".//Volume"))
        fpage = _first(texts(node, ".//FirstPage"))
        lpage = _first(texts(node, ".//LastPage"))
        b.add("journal_fpage", fpage)
        b.add("journal_lpage", lpage)
        if fpage and lpage:
            b.add("page_nr", str(int(lpage) - int(fpage) + 1))
        journal_year = texts(node, ".//IssueID/Year")
        if journal_year:
            b.add("journal_year", int(journal_year[0]))
        b.add("date_published", date_published)
        b.add("copyright_holder", texts(node, ".//Copyright"))
        b.add("collections",
              get_collections(node, article_type, journal_title))
        rec = b.build()
        rec["new_urls"] = []
        out.append(rec)
    return out


@register("edp-splash")
def extract_edp_splash(payload: bytes, url: str = "") -> List[dict]:
    """dx.doi.org splash → sorted pdf links (edp_spider.py:249-266)."""
    from .htmlsoup import parse_html
    root = parse_html(payload)
    domain = parse_domain(url) if url else ""
    pdf_links = sorted({
        urljoin(domain, a.get("href"))
        for a in root.iter("a")
        if a.get("href") and "pdf" in a.get("href")
    })
    b = RecordBuilder()
    if pdf_links:
        b.add("additional_files", {
            "access": "INSPIRE-PUBLIC", "description": "EDP",
            "url": pdf_links[0], "type": "Fulltext",
        })
    if url:
        b.add("urls", [url])
    return [b.build()]
