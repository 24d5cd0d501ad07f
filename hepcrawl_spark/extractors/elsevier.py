"""Elsevier CONSYN extractor.

Reproduces the main-record semantics of the reference Elsevier spider
(/root/reference/hepcrawl/spiders/elsevier_spider.py:183-1032): one
CONSYN document → HEPRecord with ce:/dct: title fallback, namespace-
stripped abstract paragraphs, author groups with refid-resolved
(structured or textfn) affiliations, prism journal info with section
split, coverDate cascade, docsubtype mapping, copyright fallbacks,
keywords (ce: else rdf bag), collaborations and collections.

Navigation is namespace-QUALIFIED (unlike the other extractors):
CONSYN reuses local names across vocabularies (ce:title vs dct:title
drive a fallback chain), so stripping prefixes would merge them.

The conditional ScienceDirect scrape (elsevier_spider.py:784-805:
fetch the article page only when journal keys are missing) becomes a
frontier hop: ``new_urls`` carries the sciencedirect URL when keys
are missing — lazy materialization as an enrichment join.

Known gap vs the reference: the structured-bibliography (sb:)
reference pretty-printer (elsevier_spider.py:452-686) is not yet
reimplemented.
"""

from __future__ import annotations

import copy
import os
import re
import xml.etree.ElementTree as ET
from typing import List, Optional

from . import register
from .recbuild import RecordBuilder
from .xmlpath import parse_xml, strip_namespaces
from ..functions.dates import format_date
from ..functions.textutils import get_license

NS = {
    "ce": "http://www.elsevier.com/xml/common/schema",
    "ja": "http://www.elsevier.com/xml/ja/schema",
    "prism": "http://prismstandard.org/namespaces/basic/2.0/",
    "dct": "http://purl.org/dc/terms/",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "oa": "http://vtw.elsevier.com/data/ns/properties/OpenAccess-1/",
    "sa": "http://www.elsevier.com/xml/common/struct-aff/schema",
    "sb": "http://www.elsevier.com/xml/common/struct-bib/schema",
}

DOCTYPE_MAPPING = {
    "abs": "abstract", "add": "addendum", "adv": "advertisement",
    "ann": "announcement", "brv": "book-review", "cal": "calendar",
    "chp": "chapter in a book", "cnf": "conference", "con": "contents list",
    "cop": "copyright information", "cor": "correspondence", "crp": "",
    "dis": "discussion", "dup": "duplicate", "edb": "editorial board",
    "edi": "editorial", "err": "erratum", "exm": "exam",
    "fla": "full-length article", "ind": "index", "lit": "literature alert",
    "mis": "miscellaneous", "nws": "news", "ocn": "other contents",
    "pgl": "practice guidelines", "pnt": "patent report",
    "prp": "personal report", "prv": "product review",
    "pub": "publisher's note", "rem": "removal", "req": "request for assistance",
    "ret": "retraction", "rev": "review-article", "sco": "short communication",
    "ssu": "short survey",
}

KEYS_WANTED = {
    "journal_title", "volume", "issue", "fpage", "lpage", "year",
    "date_published", "dois", "page_nr",
}

_RE_AFF_NUM = re.compile(r"^(\d+\ ?)")


def q(prefix: str, tag: str) -> str:
    return "{%s}%s" % (NS[prefix], tag)


def _iter(node, prefix, tag):
    return node.iter(q(prefix, tag))


def _texts(node, prefix, tag) -> List[str]:
    out = []
    for el in _iter(node, prefix, tag):
        if el.text:
            out.append(el.text)
    return out


def _first(vals, default=None):
    return vals[0] if vals else default


def _fix_node_text(text_nodes: List[str]) -> str:
    return " ".join(" ".join(text_nodes).split())


def get_dois(node) -> Optional[List[str]]:
    """Parity: elsevier_spider.py:183-189."""
    dois = [
        t for info in _iter(node, "ja", "item-info")
        for t in _texts(info, "ce", "doi")
    ]
    if not dois:
        dois = _texts(node, "prism", "doi")
    return dois or None


def get_title(node) -> Optional[str]:
    title = _texts(node, "ce", "title")
    if not title:
        title = _texts(node, "dct", "title")
    if title:
        return _fix_node_text(title)
    return None


def get_keywords(node) -> Optional[List[str]]:
    keywords = [
        t for kw in _iter(node, "ce", "keyword")
        for t in _texts(kw, "ce", "text")
    ]
    if not keywords:
        keywords = [
            t for subj in _iter(node, "dct", "subject")
            for t in _texts(subj, "rdf", "li")
        ]
    return keywords or None


def get_copyright(node) -> dict:
    """Parity: elsevier_spider.py:208-227."""
    cr_holder = _texts(node, "ce", "copyright")
    cr_year = [
        el.get("year") for el in _iter(node, "ce", "copyright")
        if el.get("year")
    ]
    cr_statement = [
        el.get("type") for el in _iter(node, "ce", "copyright")
        if el.get("type")
    ]
    if (not (cr_statement or cr_holder)
            or "unknown" in " ".join(cr_statement).lower()):
        cr_statement = _texts(node, "prism", "copyright")
        if len(cr_statement) > 1:
            cr_statement = [
                st for st in cr_statement if "unknown" not in st.lower()
            ]
    copyrights = {}
    if cr_holder:
        copyrights["cr_holder"] = _fix_node_text(cr_holder)
    if cr_year:
        copyrights["cr_year"] = cr_year[0]
    if cr_statement:
        copyrights["cr_statement"] = _first(cr_statement)
    return copyrights


def _find_affiliations_by_id(author_group, ref_ids) -> List[str]:
    """Parity: elsevier_spider.py:229-248 (structured sa: affiliations
    joined organization/city/country in document order, else textfn
    with leading numbers stripped)."""
    out = []
    wanted = {q("sa", "organization"), q("sa", "city"), q("sa", "country")}
    for aff_id in ref_ids:
        for ce_aff in _iter(author_group, "ce", "affiliation"):
            if ce_aff.get("id") != aff_id:
                continue
            if list(_iter(ce_aff, "sa", "affiliation")):
                parts = [
                    el.text for el in ce_aff.iter()
                    if el.tag in wanted and el.text
                ]
                out.append(", ".join(parts))
            else:
                aff = _first(_texts(ce_aff, "ce", "textfn"))
                if aff is not None:
                    out.append(_RE_AFF_NUM.sub("", aff))
    return out


def _get_affiliations(author_group, author) -> List[str]:
    ref_ids = [
        el.get("refid") for el in author.iter() if el.get("refid")
    ]
    ref_ids = [r for r in ref_ids if "aff" in r]
    affiliations = []
    if ref_ids:
        affiliations = _find_affiliations_by_id(author_group, ref_ids)
    for ce_aff in _iter(author_group, "ce", "affiliation"):
        if not ce_aff.attrib:
            affiliations += _texts(ce_aff, "ce", "textfn")
    return affiliations


def get_authors(node) -> List[dict]:
    """Parity: elsevier_spider.py:277-310."""
    authors = []
    if list(_iter(node, "ce", "author")):
        for author_group in _iter(node, "ce", "author-group"):
            collaborations = [
                t for collab in _iter(author_group, "ce", "collaboration")
                for t in _texts(collab, "ce", "text")
            ]
            for author in author_group.findall(q("ce", "author")):
                auth = {}
                surname = _first(_texts(author, "ce", "surname"))
                given_names = _first(_texts(author, "ce", "given-name"))
                if surname:
                    auth["surname"] = surname
                if given_names:
                    auth["given_names"] = given_names
                orcid = author.get("orcid")
                if orcid:
                    auth["orcid"] = "ORCID:{0}".format(orcid)
                affs = _get_affiliations(author_group, author)
                if affs:
                    auth["affiliations"] = [{"value": a} for a in affs]
                email = _first(_texts(author, "ce", "e-address"))
                if email:
                    auth["email"] = email
                if collaborations:
                    auth["collaborations"] = collaborations
                authors.append(auth)
    else:
        for creator in _texts(node, "dct", "creator"):
            authors.append({"raw_name": creator})
    return authors


def format_year(raw_date) -> int:
    """Parity: hepcrawl/dateutils.py:196-204."""
    iso = format_date(str(raw_date))
    try:
        return int(str(iso)[:4])
    except (TypeError, ValueError):
        return 0


def get_date(node):
    """coverDate > coverDisplayDate > openAccessEffective > doi year —
    parity: elsevier_spider.py:327-350."""
    raw_date = None
    cover_date = _first(_texts(node, "prism", "coverDate"))
    cover_display = _first(_texts(node, "prism", "coverDisplayDate"))
    oa_effective = _first(_texts(node, "oa", "openAccessEffective"))
    if cover_date:
        raw_date = cover_date
    elif cover_display:
        raw_date = cover_display
    elif oa_effective:
        raw_date = oa_effective
    else:
        dois = get_dois(node)
        if dois:
            m = re.search(
                r"^\d+\.\d+\/.\.[a-z]+\.(\d{4})\.\d+\.\d+$", dois[0]
            )
            raw_date = int(m.group(1)) if m else None
    if raw_date is None:
        return 0, ""
    return format_year(raw_date), str(raw_date)


def get_doctype(node) -> Optional[str]:
    abbrv = [el.get("docsubtype") for el in node.iter()
             if el.get("docsubtype")]
    doctype = ""
    if abbrv:
        doctype = DOCTYPE_MAPPING[abbrv[0]]
    elif list(_iter(node, "ja", "article")):
        doctype = "article"
    elif list(_iter(node, "ja", "simple-article")):
        doctype = "article"
    elif list(_iter(node, "ja", "book-review")):
        doctype = "book-review"
    elif list(_iter(node, "ja", "exam")):
        doctype = "exam"
    if any(el.tag.endswith("conference-info") for el in node.iter()):
        doctype = "conference_paper"
    return doctype or None


def get_collections(doctype) -> List[str]:
    collections = ["HEP", "Citeable", "Published"]
    if doctype == "conference_paper":
        collections += ["ConferencePaper"]
    elif doctype == "review-article":
        collections += ["Review"]
    return collections


def get_abstract(node) -> Optional[List[str]]:
    """Namespace-stripped serialized abstract paragraphs —
    parity: elsevier_spider.py:687-699."""
    out = []
    for sec in _iter(node, "ce", "abstract-sec"):
        for para in sec.findall(q("ce", "simple-para")):
            clone = strip_namespaces(copy.deepcopy(para))
            clone.tail = None
            out.append(ET.tostring(clone, encoding="unicode"))
    return out or None


def get_sd_url(xml_file: str) -> str:
    basename = os.path.basename(xml_file)
    elsevier_id = os.path.splitext(basename)[0]
    return "http://www.sciencedirect.com/science/article/pii/" + elsevier_id


def get_publication(node) -> str:
    publication = _first(_texts(node, "prism", "publicationName"))
    if not publication:
        publication = _first(_texts(node, "ja", "jid"))
    return publication or ""


def get_journal_and_section(publication: str):
    section = ""
    journal_title = ""
    try:
        split_pub = [p for p in re.split(r"(\W+)", publication) if p]
        if split_pub[-1] in ["A", "B", "C", "D", "E"]:
            section = split_pub.pop(-1)
        journal_title = "".join(
            w for w in split_pub if "section" not in w.lower()
        ).strip(", ")
    except IndexError:
        pass
    return journal_title, section


@register("elsevier-consyn")
def extract_elsevier(payload: bytes, url: str = "") -> List[dict]:
    node = parse_xml(payload)

    info = {}
    dois = get_dois(node)
    fpage = _first(_texts(node, "prism", "startingPage"))
    lpage = _first(_texts(node, "prism", "endingPage"))
    issn = _first(_texts(node, "prism", "issn"))
    volume = _first(_texts(node, "prism", "volume"))
    issue = _first(_texts(node, "prism", "number"))
    journal_title, section = get_journal_and_section(get_publication(node))
    year, date_published = get_date(node)

    if section and volume:
        volume = section + volume
    if volume:
        info["volume"] = volume
    if journal_title:
        info["journal_title"] = journal_title
    if issn:
        info["issn"] = issn
    if issue:
        info["issue"] = issue
    if fpage and lpage:
        info["fpage"] = fpage
        info["lpage"] = lpage
        info["page_nr"] = int(lpage) - int(fpage) + 1
    elif fpage:
        info["fpage"] = fpage
    if year:
        info["year"] = year
    if date_published:
        info["date_published"] = date_published
    if dois:
        info["dois"] = dois

    keys_missing = KEYS_WANTED - set(info.keys())

    b = RecordBuilder()
    doctype = get_doctype(node)
    if doctype in {"correction", "addendum"}:
        b.add("related_article_doi", [
            el.get("href") for el in node.iter()
            if el.tag.endswith("related-article")
            and el.get("ext-link-type") == "doi" and el.get("href")
        ])
    if url:
        b.add("additional_files", {
            "access": "HIDDEN", "description": "Elsevier",
            "url": url, "type": "Fulltext",
        })
    lic = get_license(
        license_url=_first(_texts(node, "oa", "userLicense"))
    )
    if lic:
        b.add("license", lic)

    abstract = get_abstract(node)
    if abstract:
        b.add("abstract", abstract)
    title = get_title(node)
    if title:
        b.add("title", title)
    b.add("authors", get_authors(node))
    keywords = get_keywords(node)
    if keywords:
        b.add("free_keywords", keywords)

    b.add("date_published", info.get("date_published"))
    b.add("journal_title", info.get("journal_title"))
    b.add("journal_issue", info.get("issue"))
    b.add("journal_volume", info.get("volume"))
    b.add("journal_issn", info.get("issn"))
    b.add("dois", info.get("dois"))
    b.add("journal_doctype", doctype)
    b.add("journal_fpage", info.get("fpage"))
    b.add("journal_lpage", info.get("lpage"))
    if info.get("page_nr") is not None:
        b.add("page_nr", str(info["page_nr"]))
    if info.get("year"):
        b.add("journal_year", int(info["year"]))
    copyrights = get_copyright(node)
    b.add("copyright_holder", copyrights.get("cr_holder"))
    b.add("copyright_year", copyrights.get("cr_year"))
    b.add("copyright_statement", copyrights.get("cr_statement"))
    b.add("collaborations", [
        t for collab in _iter(node, "ce", "collaboration")
        for t in _texts(collab, "ce", "text")
    ])
    b.add("collections", get_collections(doctype))

    rec = b.build()
    # lazy enrichment: only fetch the article page when keys are
    # missing (elsevier_spider.py:784-805)
    rec["new_urls"] = [get_sd_url(url)] if (keys_missing and url) else []
    return [rec]
