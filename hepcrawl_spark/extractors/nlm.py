"""NLM (IOP / PubMed article-set) extractor.

Reproduces the reference IOP spider + NLM mixin
(/root/reference/hepcrawl/spiders/iop_spider.py:150-213,
/root/reference/hepcrawl/extractors/nlm.py:15-152): one ``Article``
node → HEPRecord with NLM author list (First/Middle/Last name
assembly), DOI fallback chain, PubDate assembly, pub-status gate
(``aheadofprint``/``received`` dropped), page-count arithmetic,
keywords, doctype-driven collections, and the package-joined PDF
FFT entries (vol_issue_fpage filename pattern — the reference scans a
local unpacked tar dir; here the manifest is a parameter, and
relationally a join against the package-expansion manifest,
SURVEY.md §2.6 J4).
"""

from __future__ import annotations

import os
from typing import List, Optional

from . import register
from .recbuild import RecordBuilder
from .xmlpath import iter_records, strip_namespaces, texts

OPEN_ACCESS_JOURNALS = {"J. Phys.: Conf. Ser."}


def _first(vals, default=None):
    return vals[0] if vals else default


def _serialize(el) -> str:
    import xml.etree.ElementTree as ET
    tail, el.tail = el.tail, None
    try:
        return ET.tostring(el, encoding="unicode")
    finally:
        el.tail = tail


def get_authors(node) -> List[dict]:
    """Parity: extractors/nlm.py:18-44."""
    authors = []
    for author_list in node.findall(".//AuthorList"):
        for author in author_list.iter("Author"):
            surname = _first(texts(author, "LastName"), "")
            firstname = _first(texts(author, "FirstName"))
            middlename = _first(texts(author, "MiddleName"))
            affiliations = texts(author, ".//Affiliation")
            given_names = ""
            if firstname and middlename:
                given_names = "{} {}".format(firstname, middlename)
            elif firstname:
                given_names = firstname
            auth = {"surname": surname or "", "given_names": given_names}
            if affiliations:
                auth["affiliations"] = [{"value": a} for a in affiliations]
            authors.append(auth)
    return authors


def get_collections(doctype: Optional[str]) -> List[str]:
    collections = ["HEP", "Citeable", "Published"]
    if doctype:
        if doctype == "Review":
            collections += ["Review"]
        if "conference" in doctype.lower():
            collections += ["ConferencePaper"]
    return collections


def get_dois(node) -> List[str]:
    dois = [
        t for el in node.findall(".//ArticleIdList/ArticleId")
        if el.get("IdType") == "doi" for t in texts(el, ".")
    ]
    if not dois:
        dois = [
            t for el in node.findall(".//ELocationID")
            if el.get("EIdType") == "doi" for t in texts(el, ".")
        ]
    return dois


def get_date_published(node) -> str:
    year = _first(texts(node, ".//Journal/PubDate/Year"))
    month = _first(texts(node, ".//Journal/PubDate/Month"))
    day = _first(texts(node, ".//Journal/PubDate/Day"))
    date_published = ""
    if year:
        date_published = year
    if month:
        date_published += "-" + month
    if day:
        date_published += "-" + day
    return date_published


def get_page_numbers(node):
    fpage = _first(texts(node, ".//FirstPage"))
    lpage = _first(texts(node, ".//LastPage"))
    if fpage and lpage:
        page_nr = str(int(lpage) - int(fpage) + 1)
    else:
        page_nr = ""
    return fpage, lpage, page_nr


def get_pdf_path(pdf_manifest: List[str], vol, issue, fpage) -> Optional[str]:
    """vol_issue_fpage.pdf filename match — parity:
    iop_spider.py:135-140 (relational analog: equi-join on the
    computed key against the package manifest)."""
    pattern = "{}_{}_{}.pdf".format(vol, issue, fpage)
    for pdf_path in pdf_manifest:
        if pattern in os.path.basename(pdf_path):
            return pdf_path
    return None


def _fft(path, access, ftype):
    return {"access": access, "description": "IOP", "url": path,
            "type": ftype}


def extract_nlm(payload: bytes, url: str = "",
                pdf_manifest: Optional[List[str]] = None) -> List[dict]:
    out = []
    for node in iter_records(payload, "Article"):
        strip_namespaces(node)
        pub_status = None
        for pd in node.findall(".//Journal/PubDate"):
            pub_status = pd.get("PubStatus")
            break
        if pub_status in {"aheadofprint", "received"}:
            continue

        b = RecordBuilder()
        fpage, lpage, page_nr = get_page_numbers(node)
        volume = _first(texts(node, ".//Journal/Volume"))
        issue = _first(texts(node, ".//Journal/Issue"))

        b.add("journal_fpage", fpage)
        b.add("journal_lpage", lpage)
        abstracts = node.findall(".//Abstract")
        if abstracts:
            b.add("abstract", _serialize(abstracts[0]))
        titles = node.findall(".//ArticleTitle")
        if titles:
            b.add("title", _serialize(titles[0]))
        b.add("authors", get_authors(node))
        journal_title = _first(texts(node, ".//Journal/JournalTitle"))
        b.add("journal_title", journal_title)
        b.add("journal_issue", issue)
        b.add("journal_volume", volume)
        b.add("journal_issn", texts(node, ".//Journal/Issn"))
        b.add("dois", get_dois(node))

        journal_year = texts(node, ".//Journal/PubDate/Year")
        if journal_year:
            b.add("journal_year", int(journal_year[0]))

        b.add("language", texts(node, ".//Language"))
        b.add("page_nr", page_nr)
        b.add("date_published", get_date_published(node))
        b.add("copyright_statement", texts(node, "CopyrightInformation"))
        b.add("copyright_holder", texts(node, ".//Journal/PublisherName"))
        b.add("free_keywords", [
            t for obj in node.findall("ObjectList/Object")
            if obj.get("Type") == "keyword"
            for param in obj.findall("Param")
            if param.get("Name") == "value"
            for t in texts(param, ".")
        ])
        b.add("related_article_doi", [
            t for el in node.findall(".//Replaces")
            if el.get("IdType") == "doi" for t in texts(el, ".")
        ])
        doctype = _first(texts(node, ".//PublicationType"))
        b.add("journal_doctype", doctype)
        b.add("collections", get_collections(doctype))

        b.add("additional_files", _fft(url, "INSPIRE-HIDDEN", "Fulltext"))
        if pdf_manifest:
            pdf_file_path = get_pdf_path(pdf_manifest, volume, issue, fpage)
            if pdf_file_path:
                file_type = ("Erratum" if doctype
                             and "erratum" in doctype.lower() else "Fulltext")
                file_access = ("INSPIRE-PUBLIC"
                               if journal_title in OPEN_ACCESS_JOURNALS
                               else "INSPIRE-HIDDEN")
                b.add("additional_files",
                      _fft(pdf_file_path, file_access, file_type))

        out.append(b.build())
    return out


@register("nlm")
def _extract_registered(payload: bytes, url: str = "") -> List[dict]:
    return extract_nlm(payload, url)
