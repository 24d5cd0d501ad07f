"""Minimal XML selector helpers over ``xml.etree.ElementTree``.

Reproduces the lxml/Scrapy-Selector text-node semantics the reference
relies on (``.//tag/text()`` = direct child text nodes in document
order; ``.//tag//text()`` = all descendant text), without lxml (not in
this sandbox).  Whitespace-only text nodes are preserved, as in lxml.

Reference behaviors mirrored: ``node.remove_namespaces()``
(arxiv_spider.py:55 etc.) and ``utils.py:193-199`` (get_node).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import Iterable, List


# lxml-recover parity: an undefined named entity (``&ndash;`` etc. in
# DTD-less publisher XML) expands to the empty string instead of
# aborting the parse — exactly what the reference's Scrapy/lxml
# selectors do in recover mode (visible in its goldens, e.g.
# /root/reference/tests/test_elsevier.py "10&ndash;12" → "1012").
# The five XML-predefined entities and numeric references survive,
# and CDATA sections are passed through untouched ('&name;' inside
# CDATA is literal content that lxml preserves).
_UNDEF_ENTITY_B = re.compile(rb"&(?!amp;|lt;|gt;|apos;|quot;|#)"
                             rb"[A-Za-z][A-Za-z0-9._-]*;")
_UNDEF_ENTITY_S = re.compile(r"&(?!amp;|lt;|gt;|apos;|quot;|#)"
                             r"[A-Za-z][A-Za-z0-9._-]*;")
_CDATA_B = re.compile(rb"(<!\[CDATA\[.*?\]\]>)", re.S)
_CDATA_S = re.compile(r"(<!\[CDATA\[.*?\]\]>)", re.S)


def _strip_undefined_entities(data, cdata_re, entity_re, empty):
    # split keeps the CDATA delimiters as odd-index chunks; only the
    # even-index (non-CDATA) chunks get entity-stripped
    parts = cdata_re.split(data)
    return empty.join(
        part if i % 2 else entity_re.sub(empty, part)
        for i, part in enumerate(parts)
    )


def parse_xml(data) -> ET.Element:
    """Parse bytes/str into an Element tree root."""
    if isinstance(data, (bytes, bytearray)):
        return ET.fromstring(_strip_undefined_entities(
            bytes(data), _CDATA_B, _UNDEF_ENTITY_B, b""
        ))
    return ET.fromstring(_strip_undefined_entities(
        data, _CDATA_S, _UNDEF_ENTITY_S, ""
    ))


_NS_TAG = re.compile(r"\{[^}]*\}")


def strip_namespaces(el: ET.Element) -> ET.Element:
    """In-place removal of namespace URIs from tags and attributes.

    Parity: lxml ``remove_namespaces()`` as called per record node in
    the reference spiders (e.g. arxiv_spider.py:55).
    """
    for node in el.iter():
        if isinstance(node.tag, str):
            node.tag = _NS_TAG.sub("", node.tag)
        if node.attrib:
            node.attrib = {
                _NS_TAG.sub("", k): v for k, v in node.attrib.items()
            }
    return el


def findall(node: ET.Element, path: str) -> List[ET.Element]:
    """ElementTree findall (supports ``.//tag`` / ``tag/sub`` paths)."""
    return node.findall(path)


def direct_texts(el: ET.Element) -> List[str]:
    """The element's direct text nodes (lxml ``tag/text()``): leading
    text plus each child's tail, in document order, skipping empties."""
    out: List[str] = []
    if el.text:
        out.append(el.text)
    for child in el:
        if child.tail:
            out.append(child.tail)
    return out


def all_texts(el: ET.Element) -> List[str]:
    """All descendant text nodes (lxml ``tag//text()``), document order."""
    return [t for t in el.itertext() if t]


def texts(node: ET.Element, path: str, deep: bool = False) -> List[str]:
    """Concatenation of text nodes over every element matching ``path``.

    ``deep=False`` ≙ ``path/text()``; ``deep=True`` ≙ ``path//text()``.
    """
    out: List[str] = []
    for el in node.findall(path):
        out.extend(all_texts(el) if deep else direct_texts(el))
    return out


def first_text(node: ET.Element, path: str, deep: bool = False, default=None):
    """``extract_first()`` equivalent."""
    vals = texts(node, path, deep=deep)
    return vals[0] if vals else default


def iter_records(data, itertag: str, namespace: str | None = None) -> Iterable[ET.Element]:
    """Split a document into record nodes, the XMLFeedSpider way
    (itertag iteration, e.g. ``OAI-PMH:record`` arxiv_spider.py:40)."""
    root = parse_xml(data)
    tag = "{%s}%s" % (namespace, itertag) if namespace else itertag
    if root.tag == tag:
        yield root
        return
    yield from root.iter(tag)
