"""INSPIRE final restructuring + JSON writers.

K2 — ``inspire_restructure``: the reference's
``InspireAPIPushPipeline.process_item`` field folding
(/root/reference/hepcrawl/pipelines.py:95-157) as one Catalyst
``select``: flat scratch fields fold into ``acquisition_source``,
``titles``, ``abstracts``, ``imprints``, ``copyright`` and a
conditional ``publication_info``; ``related_article_doi`` merges into
``dois``; the journal_* scratch columns are dropped.  The acquisition
date is injected (the reference stamps ``datetime.now()`` — frozen
here for deterministic output).

K1 — ``write_json_array``: the JsonWriterPipeline file layout
(pipelines.py:44-86): ``[`` + ``json.dumps(indent=4)`` records
``\\n,``-separated + ``]\\n``.  A single-file array layout is
inherently single-writer, so this is a driver-side parity writer; the
scale path is ``records.write.json`` (JSON-lines, per-partition).

Deviation note: ``publication_info.year`` is int-or-``''`` in the
reference (schema-loose); a Spark column is single-typed, so year is
a nullable int here.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_JOURNAL_SCRATCH = [
    "journal_title", "journal_volume", "journal_year", "journal_issue",
    "journal_fpage", "journal_lpage", "journal_doctype", "journal_artid",
    "pubinfo_freetext",
]


def _e(name):
    """'' default, matching the reference's ``item.pop(key, '')``."""
    return F.coalesce(F.col(name), F.lit(""))


def has_publication_info_col():
    """Parity: pipelines.py:26-35."""
    checks = [
        F.col(c).isNotNull() & (F.col(c).cast("string") != "")
        for c in _JOURNAL_SCRATCH
        if c != "journal_year"
    ] + [F.col("journal_year").isNotNull()]
    cond = checks[0]
    for c in checks[1:]:
        cond = cond | c
    return cond


def inspire_restructure(records: DataFrame, acquisition_date: str,
                        default_source: str = "hepcrawl",
                        submission_number: str = "") -> DataFrame:
    """HEPRecord rows → INSPIRE-shaped rows (pipelines.py:95-157)."""
    src = F.coalesce(F.col("source"), F.lit(default_source))
    empty_dois = F.array().cast("array<struct<value:string>>")

    df = records.withColumn(
        "dois",
        F.concat(
            F.coalesce(F.col("dois"), empty_dois),
            F.coalesce(F.col("related_article_doi"), empty_dois),
        ),
    )
    df = (
        df.withColumn("acquisition_source", F.struct(
            src.alias("source"),
            src.alias("method"),
            F.lit(acquisition_date).alias("date"),
            F.lit(submission_number).alias("submission_number"),
        ))
        .withColumn("titles", F.array(F.struct(
            _e("title").alias("title"),
            _e("subtitle").alias("subtitle"),
            src.alias("source"),
        )))
        .withColumn("abstracts", F.array(F.struct(
            _e("abstract").alias("value"),
            src.alias("source"),
        )))
        .withColumn("imprints", F.array(F.struct(
            _e("date_published").alias("date"),
        )))
        .withColumn("copyright", F.array(F.struct(
            _e("copyright_holder").alias("holder"),
            _e("copyright_year").alias("year"),
            _e("copyright_statement").alias("statement"),
            _e("copyright_material").alias("material"),
        )))
        .withColumn(
            "publication_info",
            F.when(has_publication_info_col(), F.array(F.struct(
                _e("journal_title").alias("journal_title"),
                _e("journal_volume").alias("journal_volume"),
                F.col("journal_year").alias("year"),
                _e("journal_issue").alias("journal_issue"),
                _e("journal_artid").alias("artid"),
                _e("journal_fpage").alias("page_start"),
                _e("journal_lpage").alias("page_end"),
                _e("journal_doctype").alias("note"),
                _e("pubinfo_freetext").alias("pubinfo_freetext"),
            ))),
        )
    )
    drop = set(_JOURNAL_SCRATCH + [
        "title", "subtitle", "abstract", "date_published",
        "copyright_holder", "copyright_year", "copyright_statement",
        "copyright_material", "related_article_doi", "source",
    ])
    return df.drop(*[c for c in drop if c in df.columns])


def write_json_array(records: DataFrame, path: str) -> int:
    """Reference JsonWriterPipeline file layout (pipelines.py:44-86):
    one JSON array file, records indent=4, ``\\n,``-separated.
    Driver-side by design (single file); returns the record count."""
    count = 0
    with open(path, "w") as fh:
        fh.write("[")
        for row in records.toJSON().toLocalIterator():
            line = "" if count == 0 else "\n,"
            line += json.dumps(json.loads(row), indent=4)
            fh.write(line)
            count += 1
        fh.write("]\n")
    return count
