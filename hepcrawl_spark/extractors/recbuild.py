"""HEPRecord builder — declarative per-field processor pipelines.

Reimplements the public Scrapy ItemLoader contract the reference's
``HEPLoader`` (hepcrawl/loaders.py:44-163) is built on:

- ``add(field, values)`` flattens values to a list, applies the field's
  *input* processors map-compose style (``None`` results are dropped,
  list results are spliced in), and accumulates only non-empty results;
- ``build()`` applies the field's *output* processor to the accumulated
  list and emits only fields that accumulated anything.

The per-field processor table below is the byte-parity contract with
hepcrawl/loaders.py:71-163.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List

from ..functions import textutils as T
from ..functions.dates import format_date
from ..functions.wordlists import MATHML_TAGS

# ---------------------------------------------------------------------------
# processor combinators (public Scrapy loader semantics)
# ---------------------------------------------------------------------------


def _to_iter(value) -> list:
    if value is None:
        return []
    if isinstance(value, (list, tuple)):
        return list(value)
    return [value]


def map_compose(*functions: Callable) -> Callable[[list], list]:
    def _run(values: list) -> list:
        for fn in functions:
            nxt: list = []
            for v in values:
                nxt.extend(_to_iter(fn(v)))
            values = nxt
        return values
    return _run


def take_first(values: list):
    for v in values:
        if v is not None and v != "":
            return v


def join_with(sep: str = " ") -> Callable[[list], str]:
    return lambda values: sep.join(values)


def wrap_dicts(key: str = "value") -> Callable[[list], list]:
    """ListToValueDict — parity: hepcrawl/outputs.py:45-58."""
    return lambda values: [{key: v} for v in values]


def keywords_out(source: str = "author") -> Callable[[list], list]:
    """FreeKeywords — parity: hepcrawl/outputs.py:13-26."""
    return lambda values: [{"source": source, "value": v} for v in values]


def classification_out(standard: str = "PACS") -> Callable[[list], list]:
    """ClassificationNumbers — parity: hepcrawl/outputs.py:29-42."""
    return lambda values: [
        {"standard": standard, "classification_number": v} for v in values
    ]


_TITLE_CLEAN = map_compose(
    T.squash_whitespace,
    T.subscripts_to_latex,
    T.fix_title_capitalization,
    T.strip_unsafe_attributes,
    lambda v: T.strip_tags(v, keep=MATHML_TAGS),
    str.strip,
)

# field → input processor (hepcrawl/loaders.py:73-162 *_in entries)
INPUT_PROCESSORS: Dict[str, Callable[[list], list]] = {
    "authors": map_compose(T.fill_author, T.clean_affiliations),
    "abstract": map_compose(
        T.squash_whitespace,
        T.subscripts_to_latex,
        T.strip_unsafe_attributes,
        lambda v: T.strip_tags(v, keep=MATHML_TAGS),
        str.strip,
    ),
    "collaborations": map_compose(T.clean_collaboration),
    "title": _TITLE_CLEAN,
    "subtitle": _TITLE_CLEAN,
    "date_published": map_compose(format_date),
    "language": map_compose(T.translate_language),
    "free_keywords": map_compose(
        T.squash_whitespace,
        T.subscripts_to_latex,
        T.strip_tags,
    ),
    "thesis_supervisor": map_compose(T.fill_supervisor),
    "urls": map_compose(T.canonicalize_url),
}

# field → output processor (hepcrawl/loaders.py *_out entries);
# fields absent here keep the accumulated list as-is (Identity).
OUTPUT_PROCESSORS: Dict[str, Callable[[list], Any]] = {
    "source": take_first,
    "abstract": take_first,
    "collaborations": wrap_dicts(),
    "collections": wrap_dicts(key="primary"),
    "title": join_with(" "),
    "subtitle": take_first,
    "journal_title": take_first,
    "journal_year": take_first,
    "journal_artid": take_first,
    "journal_fpage": take_first,
    "journal_lpage": take_first,
    "journal_volume": take_first,
    "journal_issue": take_first,
    "journal_doctype": take_first,
    "pubinfo_freetext": take_first,
    "preprint_date": take_first,
    "date_published": take_first,
    # both a TakeFirst and a ListToValueDict are declared for
    # related_article_doi in the reference; the later class attribute
    # wins (loaders.py:136 vs :153), so ListToValueDict applies.
    "related_article_doi": wrap_dicts(),
    "copyright_holder": take_first,
    "copyright_year": take_first,
    "copyright_statement": take_first,
    "copyright_material": take_first,
    "free_keywords": keywords_out(),
    "classification_numbers": classification_out(),
    "dois": wrap_dicts(),
    "thesis": take_first,
    "urls": wrap_dicts(),
}


class RecordBuilder:
    """Accumulate field values, then build the record dict."""

    def __init__(self) -> None:
        self._values: Dict[str, List[Any]] = {}

    def add(self, field: str, value) -> None:
        values = _to_iter(value)
        proc = INPUT_PROCESSORS.get(field)
        if proc is not None:
            values = proc(values)
        if values:
            self._values.setdefault(field, []).extend(values)

    def build(self) -> Dict[str, Any]:
        record: Dict[str, Any] = {}
        for field, values in self._values.items():
            out = OUTPUT_PROCESSORS.get(field)
            record[field] = out(values) if out is not None else values
        return record
