"""arXiv OAI-PMH extractor.

Reproduces the record semantics of the reference arXiv spider
(/root/reference/hepcrawl/spiders/arxiv_spider.py:53-232): one OAI-PMH
``record`` node → one HEPRecord dict with title, abstract, authors /
collaborations, DOIs, eprints, categories, report numbers, license,
comments-derived doctype + page count, external system numbers.

Runs as plain Python over document bytes; invoked batch-wise from the
Arrow extraction UDF (hepcrawl_spark.extract).
"""

from __future__ import annotations

import re
from typing import List

from . import register
from .recbuild import RecordBuilder
from .xmlpath import (
    all_texts,
    first_text,
    iter_records,
    strip_namespaces,
    texts,
)
from ..functions.textutils import get_license, split_collaboration_author, split_fullname
from ..functions.wordlists import RE_CONFERENCE, RE_THESIS

OAI_NS = "http://www.openarchives.org/OAI/2.0/"

# phrase heuristics for collaboration detection
# (parity: arxiv_spider.py:125-129)
_COLLAB_PHRASES = (
    "consortium", " collab ", "collaboration", " team", "group",
    " on behalf of ", " representing ",
)
_INST_PHRASES = ("institute", "university", "department", "center")

_RE_PAGES = re.compile(r"(?i)(\d+)\s*pages?\b")


def _authors_or_collaboration(node):
    """Partition author nodes into authors vs collaborations.

    Parity: arxiv_spider.py:119-190, including the retroactive flush of
    accumulated authors when a bare ':' name is seen and first-seen-order
    collaboration dedup.
    """
    authors: List[dict] = []
    collaboration: List[str] = []
    author_els = []
    for authors_el in node.findall(".//authors"):
        author_els.extend(authors_el.iter("author"))
    for author_el in author_els:
        forenames = " ".join(texts(author_el, ".//forenames", deep=True))
        keyname = " ".join(texts(author_el, ".//keyname", deep=True))
        name_string = " %s %s " % (forenames, keyname)
        affiliations = texts(author_el, ".//affiliation", deep=True)

        # collaborations hiding in affiliation strings (but not institutes)
        collab_idx = [
            i for i, aff in enumerate(affiliations)
            if any(p in aff.lower() for p in _COLLAB_PHRASES)
            and not any(p in aff.lower() for p in _INST_PHRASES)
        ]
        for i in reversed(collab_idx):
            coll, _ = split_collaboration_author(affiliations.pop(i))
            if coll and coll not in collaboration:
                collaboration.append(coll)

        low = name_string.lower()
        collab_in_name = " for the " in low or any(
            p in low for p in _COLLAB_PHRASES
        )
        if collab_in_name:
            coll, author_name = split_collaboration_author(name_string)
            if author_name:
                surname, given_names = split_fullname(author_name)
                authors.append({
                    "surname": surname,
                    "given_names": given_names,
                    "affiliations": [],
                })
            if coll and coll not in collaboration:
                collaboration.append(coll)
        elif name_string.strip() == ":":
            # names so far were actually collaboration banners
            for info in authors:
                banner = " %s %s " % (info["given_names"], info["surname"])
                coll, _ = split_collaboration_author(banner)
                if coll and coll not in collaboration:
                    collaboration.append(coll)
            authors = []
        else:
            authors.append({
                "surname": keyname,
                "given_names": forenames,
                "affiliations": [{"value": aff} for aff in affiliations],
            })
    return authors, collaboration


def _comments_info(comments: str):
    """page count + note + doctype from the comments field.

    Parity: arxiv_spider.py:192-209.
    """
    notes = {"source": "arXiv", "value": comments}
    pages = ""
    doctype = ""
    m = _RE_PAGES.search(comments)
    if m:
        pages = m.group(1)
    if RE_THESIS.search(comments):
        doctype = "Thesis"
    elif RE_CONFERENCE.search(comments):
        doctype = "ConferencePaper"
    return pages, notes, doctype


def extract_record(node) -> dict:
    """One OAI record element (namespaces stripped) → HEPRecord dict."""
    rec = RecordBuilder()
    rec.add("title", texts(node, ".//title"))
    rec.add("abstract", texts(node, ".//abstract"))
    rec.add("preprint_date", texts(node, ".//created"))
    rec.add("dois", texts(node, ".//doi", deep=True))
    rec.add("pubinfo_freetext", texts(node, ".//journal-ref", deep=True))
    rec.add("source", "arXiv")

    authors, collabs = _authors_or_collaboration(node)
    rec.add("authors", authors)
    rec.add("collaborations", collabs)

    collections = ["HEP", "Citeable", "arXiv"]
    comments = "; ".join(texts(node, ".//comments", deep=True))
    if comments:
        pages, notes, doctype = _comments_info(comments)
        rec.add("public_notes", notes)
        if pages:
            rec.add("page_nr", pages)
        if doctype:
            collections.append(doctype)
    rec.add("collections", collections)

    report_numbers = ",".join(texts(node, ".//report-no", deep=True))
    if report_numbers:
        rec.add(
            "report_numbers",
            [{"source": "", "value": rn.strip()}
             for rn in report_numbers.split(",")],
        )

    plain_categories = " ".join(texts(node, ".//categories", deep=True)).split()
    rec.add(
        "field_categories",
        [{"source": "publisher", "term": c, "scheme": "ARXIV"}
         for c in plain_categories],
    )
    rec.add(
        "arxiv_eprints",
        {
            "value": first_text(node, ".//id", deep=True),
            "categories": plain_categories,
        },
    )
    rec.add(
        "external_system_numbers",
        {
            "institute": "arXiv",
            "value": first_text(node, ".//identifier", deep=True),
        },
    )
    rec.add(
        "license",
        get_license(license_url=first_text(node, ".//license", deep=True)),
    )
    return rec.build()


@register("arxiv-oai")
def extract(data: bytes) -> List[dict]:
    """All OAI records in an arXiv OAI-PMH document → HEPRecord dicts."""
    out = []
    for node in iter_records(data, "record", OAI_NS):
        strip_namespaces(node)
        out.append(extract_record(node))
    return out
