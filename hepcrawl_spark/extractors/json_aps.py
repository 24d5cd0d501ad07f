"""APS (harvest REST API JSON) extractor.

Reproduces /root/reference/hepcrawl/spiders/aps_spider.py:68-153: one
JSON response body → one HEPRecord per ``data[]`` article, with
Person/Collaboration author split, affiliationIds resolved through a
``build_dict`` id-index (the reference's hash-join, utils.py:146-151),
APS subject areas, rights/copyright and license.

Pagination (the ``Link: rel=next`` header walk, aps_spider.py:121-127)
flows through the frontier: the fetch layer stores the HTTP ``Link``
header in the JSON envelope (top-level ``"Link"`` or under
``"headers"``; a pre-resolved ``links.next`` key is also honored),
``link_next`` extracts the rel=next target exactly as the reference's
``link_header.parse`` + ``links_by_attr_pairs([('rel','next')])`` do,
and the URL rides out on ``new_urls`` so ``_expand_children`` enqueues
the next page until the walk is exhausted (SURVEY.md §2.1 S8).
"""

from __future__ import annotations

import json
import re
from typing import List, Optional

from . import register
from .recbuild import RecordBuilder
from ..functions.textutils import get_license

_LINK_SEGMENT = re.compile(r"<([^>]*)>((?:\s*;\s*[^,<]+)*)")


def link_next(header_value: str) -> Optional[str]:
    """RFC 5988 ``Link`` header → the rel="next" target URI, or None.

    Parity: aps_spider.py:121-127 (python-linkheader semantics: first
    link whose rel list contains ``next``; rel may be a
    space-separated, optionally quoted list).
    """
    for m in _LINK_SEGMENT.finditer(header_value or ""):
        href, params = m.group(1), m.group(2)
        for param in params.split(";"):
            param = param.strip()
            if not param or "=" not in param:
                continue
            key, _, value = param.partition("=")
            if key.strip().lower() == "rel":
                rels = value.strip().strip('"').strip("'").lower().split()
                if "next" in rels:
                    return href
    return None


def get_nested(root, *keys):
    """Parity: hepcrawl/utils.py:133-143 ('' default)."""
    if not keys:
        return root
    if not isinstance(root, dict) or keys[0] not in root:
        return ""
    return get_nested(root[keys[0]], *keys[1:])


def build_dict(seq, key):
    """Parity: hepcrawl/utils.py:146-151 (index a list by field)."""
    return {d[key]: dict(d, index=index) for (index, d) in enumerate(seq)}


def _get_authors_and_collab(article):
    """Parity: aps_spider.py:129-153."""
    authors, collaboration = [], []
    for author in article.get("authors", []):
        if author.get("type") == "Person":
            author_affiliations = []
            if "affiliations" in article and "affiliationIds" in author:
                affiliations = build_dict(article["affiliations"], "id")
                for aff_id in author["affiliationIds"]:
                    author_affiliations.append({
                        "value": affiliations[aff_id]["name"]
                    })
            authors.append({
                "surname": author.get("surname", ""),
                "given_names": author.get("firstname", ""),
                "raw_name": author.get("name", ""),
                "affiliations": author_affiliations,
            })
        elif author.get("type") == "Collaboration":
            collaboration.append(author["name"])
    return authors, collaboration


@register("json-aps")
def extract_json_aps(payload: bytes) -> List[dict]:
    body = json.loads(payload.decode("utf-8"))
    out = []
    for article in body.get("data", []):
        b = RecordBuilder()
        b.add("dois", get_nested(article, "identifiers", "doi"))
        b.add("page_nr", str(article.get("numPages", "")))
        b.add("abstract", get_nested(article, "abstract", "value"))
        b.add("title", get_nested(article, "title", "value"))

        authors, collaborations = _get_authors_and_collab(article)
        b.add("authors", authors)
        b.add("collaborations", collaborations)

        b.add("journal_title",
              get_nested(article, "journal", "abbreviatedName"))
        b.add("journal_issue", get_nested(article, "issue", "number"))
        b.add("journal_volume", get_nested(article, "volume", "number"))

        published_date = article.get("date", "")
        b.add("journal_year", int(published_date[:4]))
        b.add("date_published", published_date)
        b.add("field_categories", [
            {"term": term.get("label"), "scheme": "APS", "source": ""}
            for term in get_nested(
                article, "classificationSchemes", "subjectAreas"
            )
        ])
        # The reference indexes [0] unguarded (aps_spider.py:100,110)
        # and a missing rights block crashes the whole response parse;
        # here one malformed article must not drop its siblings in the
        # Arrow batch, so absent holders/licenses simply omit the field.
        holders = get_nested(article, "rights", "copyrightHolders")
        if holders:
            b.add("copyright_holder", holders[0].get("name", ""))
        b.add("copyright_year",
              str(get_nested(article, "rights", "copyrightYear")))
        b.add("copyright_statement",
              get_nested(article, "rights", "rightsStatement"))
        b.add("copyright_material", "Article")

        licenses = get_nested(article, "rights", "licenses")
        if licenses:
            lic = get_license(license_url=licenses[0].get("url", ""))
            if lic:
                b.add("license", lic)

        b.add("collections", ["HEP", "Citeable", "Published"])
        out.append(b.build())

    # pagination: follow rel=next until exhausted (aps_spider.py:121-127)
    header = body.get("Link") or get_nested(body, "headers", "Link")
    next_url = link_next(header) if header else None
    if not next_url:
        nxt = body.get("links")
        if isinstance(nxt, dict):
            next_url = nxt.get("next")
    if next_url:
        if out:
            out[0]["new_urls"] = [next_url]
        else:
            # empty data page mid-walk: emit a pure link-carrier row so
            # the frontier keeps walking (the reference yields only a
            # Request here)
            out.append({"new_urls": [next_url]})
    return out
