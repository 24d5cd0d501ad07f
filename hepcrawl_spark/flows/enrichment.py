"""Two-hop enrichment join (SURVEY.md §2.6 J3, §3.3).

The reference pattern (PoS, DNB, BASE, Elsevier, Brown, …): stage A
extracts a partial record and yields a splash-page request carrying
the record in ``meta``; stage B scrapes the splash page; the final
record merges both.  Spark-first, the ``meta`` carry becomes a left
outer join: A's records keep their splash URL as a join-key column,
B's records are keyed by their page URL, and enrichment fields merge
with ``coalesce`` (B wins where present).

This is the only cross-row join at corpus scale; the enrichment side
is usually much smaller (only records that needed a second hop), so
it broadcasts — otherwise AQE picks a sort-merge join on the url key.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..extract import extract_records


def classify_links(urls: DataFrame, mime: Optional[DataFrame],
                   url_col: str = "url") -> DataFrame:
    """Attach a ``content_type`` to a URL table: broadcast join against
    the sandbox ``mime(url, content_type)`` table (the relational seam
    for the reference's live HTTP HEAD, utils.py:154-162), falling back
    to a suffix heuristic for unknown urls."""
    heuristic = (
        F.when(F.lower(F.col(url_col)).rlike(r"\.pdf($|\?)|/pdf"),
               F.lit("application/pdf"))
        .when(F.lower(F.col(url_col)).rlike(r"\.jpe?g($|\?)"),
              F.lit("image/jpeg"))
        .otherwise(F.lit("text/html"))
    )
    if mime is None:
        return urls.withColumn("content_type", heuristic)
    joined = urls.join(
        F.broadcast(mime.withColumnRenamed("url", url_col)
                    .withColumnRenamed("content_type", "_mime")),
        on=url_col, how="left",
    )
    return joined.withColumn(
        "content_type", F.coalesce(F.col("_mime"), heuristic)
    ).drop("_mime")


def merge_enrichment(records_a: DataFrame, records_b: DataFrame,
                     fields: List[str],
                     key_a: str = "splash_url",
                     key_b: str = "url") -> DataFrame:
    """A ⟕ B on A.key_a == B.key_b; for each field in ``fields`` the
    enrichment value wins when present (meta-carry → join payload)."""
    b_side = records_b.select(
        F.col(key_b).alias("_bk"),
        *[F.col(f).alias(f"_b_{f}") for f in fields],
    )
    joined = records_a.join(
        F.broadcast(b_side),
        records_a[key_a] == F.col("_bk"),
        how="left",
    )
    for f in fields:
        joined = joined.withColumn(
            f, F.coalesce(F.col(f"_b_{f}"), F.col(f))
        ).drop(f"_b_{f}")
    return joined.drop("_bk")


def dnb_flow(pages_records: DataFrame, splash_pages: DataFrame) -> DataFrame:
    """The DNB two-hop flow: stage-A records (format ``marc21-slim``,
    already extracted, with ``new_urls`` = their splash link) enriched
    with the ``dnb-splash`` extraction of the splash pages.

    ``splash_pages`` is a pages DataFrame (url, html) for the splash
    URLs; the round engine produces it as the next round's fetch.
    """
    a = pages_records.withColumn(
        "splash_url", F.element_at(F.col("new_urls"), 1)
    )
    b_raw = extract_records(
        splash_pages.select("url", "html"), default_format="dnb-splash"
    ).filter(F.col("error").isNull())
    b = b_raw.select("url", "abstract", "page_nr")
    return merge_enrichment(a, b, fields=["abstract", "page_nr"]).drop(
        "splash_url"
    )


ELSEVIER_SD_FIELDS = [
    "journal_title", "journal_volume", "journal_issue",
    "journal_fpage", "journal_lpage", "journal_year",
    "date_published", "dois", "page_nr",
]


def elsevier_sd_flow(pages_records: DataFrame,
                     splash_pages: DataFrame) -> DataFrame:
    """The Elsevier lazy-enrichment hop: CONSYN records whose journal
    keys were missing (``new_urls`` = their sciencedirect URL,
    elsevier_spider.py:784-805) joined with the
    ``elsevier-sciencedirect`` scrape of those pages.

    keys_missing gating becomes coalesce(parent, splash): the parent's
    value wins when it already has one, the web value fills the holes.
    A splash page that identifies an unpublished proof
    (``journal_volume == 'proof'``) DROPS the parent record entirely —
    the reference's ``return None`` (elsevier_spider.py:929-932).
    """
    a = pages_records.withColumn(
        "splash_url", F.element_at(F.col("new_urls"), 1)
    )
    b_raw = extract_records(
        splash_pages.select("url", "html"),
        default_format="elsevier-sciencedirect",
    ).filter(F.col("error").isNull())
    b = b_raw.select(
        F.col("url").alias("_bk"),
        (F.col("journal_volume") == "proof").alias("_proof"),
        *[F.col(f).alias(f"_b_{f}") for f in ELSEVIER_SD_FIELDS],
    )
    joined = a.join(
        F.broadcast(b), a["splash_url"] == F.col("_bk"), how="left"
    ).filter(~F.coalesce(F.col("_proof"), F.lit(False)))
    for f in ELSEVIER_SD_FIELDS:
        joined = joined.withColumn(
            f, F.coalesce(F.col(f), F.col(f"_b_{f}"))
        ).drop(f"_b_{f}")
    return joined.drop("_bk", "_proof", "splash_url")
