"""Lenient HTML → ElementTree parsing (stdlib-only tag-soup bridge).

The reference parses real-world pages with lxml (not available in
this container); this module builds an ``xml.etree`` Element tree via
``html.parser.HTMLParser`` with browser-ish recovery: void elements,
implied closes for mismatched tags, entity decoding.  Good enough for
the reference's fixture pages, and the same Element API the XML
extractors already use (xmlpath helpers apply).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from html.parser import HTMLParser

VOID_ELEMENTS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = ET.Element("document")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        el = ET.SubElement(
            self.stack[-1], tag,
            {k: (v if v is not None else "") for k, v in attrs},
        )
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        ET.SubElement(
            self.stack[-1], tag,
            {k: (v if v is not None else "") for k, v in attrs},
        )

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        # implied closes: pop to the nearest matching open tag; ignore
        # stray end tags entirely (browser recovery behavior)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        parent = self.stack[-1]
        if len(parent):
            last = parent[-1]
            last.tail = (last.tail or "") + data
        else:
            parent.text = (parent.text or "") + data


def parse_html(data) -> ET.Element:
    """bytes/str → lenient Element tree rooted at ``<document>``."""
    if isinstance(data, (bytes, bytearray)):
        data = bytes(data).decode("utf-8", "replace")
    builder = _TreeBuilder()
    builder.feed(data)
    builder.close()
    return builder.root


def text_content(el) -> str:
    """All descendant text, document order (lxml text_content)."""
    return "".join(el.itertext())
