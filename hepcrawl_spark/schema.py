"""Engine schemas.

- ``PAGES_SCHEMA``: the authoritative input table shape (BASELINE.json
  ``input_hint``): Common-Crawl-style pages.
- ``HEPRECORD_SCHEMA``: the extraction output row — the fixed-typed
  columnar projection of the reference's schema-loose HEPRecord item
  (/root/reference/hepcrawl/items.py:19-287).  Shapes follow the
  reference *test goldens* (e.g. ``page_nr`` is a list —
  tests/test_arxiv_single.py:69-72).
- frontier state tables: ``FRONTIER_SCHEMA``, ``SEEN_SCHEMA``,
  ``HOST_OFFSETS_SCHEMA``, ``LINEAGE_SCHEMA``, ``ROBOTS_SCHEMA``.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# input corpus (BASELINE.json input_hint)
# ---------------------------------------------------------------------------

PAGES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])

# extraction input additionally carries the format tag resolved from the
# seed source (reference: spider choice is the CLI entry point)
PAGES_WITH_FORMAT_SCHEMA = StructType(
    PAGES_SCHEMA.fields + [StructField("format", StringType())]
)

# ---------------------------------------------------------------------------
# HEPRecord output row
# ---------------------------------------------------------------------------


def _s(name):
    return StructField(name, StringType())


def _arr_struct(*fields):
    return ArrayType(StructType(list(fields)))


AUTHOR_TYPE = StructType([
    _s("surname"),
    _s("given_names"),
    _s("full_name"),
    _s("email"),
    _s("orcid"),
    StructField("affiliations", _arr_struct(_s("value"))),
])

VALUE_DICT = _arr_struct(_s("value"))

REFERENCE_TYPE = StructType([
    # string: labels like "5a" (edp_spider.py:411 "should not be int")
    _s("number"),
    _s("doctype"),
    _s("doi"),
    _s("title"),
    _s("journal_title"),
    _s("journal_volume"),
    _s("issue"),
    _s("fpage"),
    _s("lpage"),
    _s("year"),
    # book refs (Elsevier sb: bibliography, elsevier_spider.py:486-507)
    _s("book_title"),
    StructField("authors", ArrayType(StringType())),
    StructField("editors", ArrayType(StringType())),
    StructField("series_editors", ArrayType(StringType())),
    _s("publisher"),
    _s("isbn"),
    _s("arxiv_id"),
    StructField("url", ArrayType(StringType())),
    _s("collaboration"),
    StructField("journal_pubnote", ArrayType(StringType())),
    _s("raw_reference"),
    StructField("misc", ArrayType(StringType())),
])

HEPRECORD_SCHEMA = StructType([
    # provenance / join keys
    _s("url"),
    _s("source"),
    # core text fields
    _s("title"),
    _s("subtitle"),
    _s("abstract"),
    StructField("authors", ArrayType(AUTHOR_TYPE)),
    StructField("collaborations", VALUE_DICT),
    StructField("dois", VALUE_DICT),
    StructField("related_article_doi", VALUE_DICT),
    StructField("arxiv_eprints", _arr_struct(
        _s("value"), StructField("categories", ArrayType(StringType())),
    )),
    StructField("report_numbers", _arr_struct(_s("source"), _s("value"))),
    StructField("external_system_numbers", _arr_struct(
        _s("institute"), _s("value"),
    )),
    StructField("free_keywords", _arr_struct(_s("source"), _s("value"))),
    StructField("classification_numbers", _arr_struct(
        _s("standard"), _s("classification_number"),
    )),
    StructField("field_categories", _arr_struct(
        _s("source"), _s("term"), _s("scheme"),
    )),
    StructField("collections", _arr_struct(_s("primary"))),
    StructField("public_notes", _arr_struct(_s("source"), _s("value"))),
    StructField("license", _arr_struct(_s("license"), _s("url"))),
    # dates kept as strings for pre-1900 fidelity
    # (reference: hepcrawl/dateutils.py:82-124)
    _s("date_published"),
    _s("preprint_date"),
    # journal scratch fields
    _s("journal_title"),
    _s("journal_volume"),
    _s("journal_issue"),
    StructField("journal_year", IntegerType()),
    _s("journal_fpage"),
    _s("journal_lpage"),
    _s("journal_artid"),
    # list shape: journal_issn has no output processor in the
    # reference loader, so it stays an accumulated list
    StructField("journal_issn", ArrayType(StringType())),
    _s("journal_doctype"),
    _s("pubinfo_freetext"),
    StructField("page_nr", ArrayType(StringType())),
    # copyright
    _s("copyright_holder"),
    _s("copyright_year"),
    _s("copyright_statement"),
    _s("copyright_material"),
    # thesis
    StructField("thesis", StructType([
        _s("date"),
        StructField("institutions", _arr_struct(_s("name"))),
        _s("degree_type"),
    ])),
    StructField("thesis_supervisor", _arr_struct(
        _s("full_name"), _s("affiliation"),
    )),
    StructField("references", ArrayType(REFERENCE_TYPE)),
    StructField("urls", VALUE_DICT),
    StructField("file_urls", ArrayType(StringType())),
    StructField("additional_files", _arr_struct(
        _s("access"), _s("description"), _s("url"), _s("type"),
    )),
    StructField("extra_data", MapType(StringType(), StringType())),
    # list shape: the reference's language field accumulates translated
    # values with no output processor (loaders.py:132-134)
    StructField("language", ArrayType(StringType())),
])

# extraction UDF output: records + frontier expansion + error capture
EXTRACT_OUTPUT_SCHEMA = StructType(
    HEPRECORD_SCHEMA.fields + [
        StructField("new_urls", ArrayType(StringType())),
        StructField("error", StringType()),
    ]
)

# ---------------------------------------------------------------------------
# frontier state tables (checkpointed each round)
# ---------------------------------------------------------------------------

FRONTIER_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("url_host", StringType()),
    StructField("priority", LongType()),
    StructField("depth", IntegerType()),
    StructField("round", IntegerType()),
    StructField("seq", LongType()),       # enqueue order (LIFO tie-break)
    StructField("source", StringType()),  # spider name / format route
    StructField("format", StringType()),
])

SEEN_SCHEMA = StructType([
    StructField("shard", IntegerType()),
    StructField("fingerprint", LongType()),
])

HOST_OFFSETS_SCHEMA = StructType([
    StructField("url_host", StringType()),
    StructField("next_fetch_ts", DoubleType()),
    StructField("crawl_delay", DoubleType()),
])

ROBOTS_SCHEMA = StructType([
    StructField("url_host", StringType()),
    StructField("disallow_prefixes", ArrayType(StringType())),
    StructField("crawl_delay", DoubleType()),
])

POLITENESS_SCHEMA = StructType([
    StructField("url_host", StringType()),
    StructField("download_delay", DoubleType()),
    StructField("max_per_host", IntegerType()),
])

LINEAGE_SCHEMA = StructType([
    StructField("round", IntegerType()),
    StructField("partition_id", IntegerType()),
    StructField("input_rows", LongType()),
    StructField("emitted_rows", LongType()),
    StructField("error_rows", LongType()),
    StructField("errors", ArrayType(StringType())),
])
