"""Sitemap scan: urlset / sitemapindex XML -> frontier candidates.

The reference discovers work through per-source listing scans (OAI
feeds, Atom feeds, FTP listings — hepcrawl/spiders/arxiv_spider.py
XMLFeedSpider ``itertag``, elsevier_spider.py atom feed); the
standard discovery channel for generic web hosts is the sitemap
protocol (sitemaps.org).  This module is the sitemap counterpart of
those scans, built the same way the engine's extractors split feeds:
per-entry itertag split first (so optional child elements like
``lastmod`` can never mis-align across entries), then per-entry
XPath projection — all JVM-side (``regexp_extract_all`` for the
split, ``xpath_string``/``xpath_double`` for the projection; no
Python in the plan).

Two hops, like the reference's feed->package expansion:
``sitemap_index_targets`` turns a ``<sitemapindex>`` page into child
sitemap URLs to enqueue; ``sitemap_entries`` turns a ``<urlset>``
page into frontier candidates (url, lastmod, priority).

100 TB design: sitemaps arrive as ordinary rows of the pages table,
so both functions are narrow codegen maps over the scan — the
explode fans out to entry cardinality with no shuffle; candidates
flow into the same url_filter / URL-seen / politeness gates as any
discovered link.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# default-namespace declarations make javax XPath name tests miss;
# the sitemap schema pins one xmlns on the root, so strip it before
# splitting (same move as the extractors' strip_namespaces, R2).
_XMLNS_RE = r'\s+xmlns="[^"]*"'


def _clean(xml_col: str):
    return F.regexp_replace(F.decode(F.col(xml_col), "UTF-8"),
                            _XMLNS_RE, "")


def sitemap_index_targets(
    pages: DataFrame, url_col: str = "url", xml_col: str = "xml",
) -> DataFrame:
    """``<sitemapindex>`` pages -> (index_url, sitemap_url) child rows."""
    frags = F.regexp_extract_all(
        _clean(xml_col), F.lit(r"(?s)(<sitemap>.*?</sitemap>)"), F.lit(1)
    )
    return (
        pages.select(
            F.col(url_col).alias("index_url"),
            F.explode(frags).alias("frag"),
        )
        .select(
            "index_url",
            F.xpath_string("frag", F.lit("sitemap/loc")).alias("sitemap_url"),
        )
        .where(F.col("sitemap_url").rlike(r"^https?://"))
    )


def sitemap_entries(
    pages: DataFrame, url_col: str = "url", xml_col: str = "xml",
) -> DataFrame:
    """``<urlset>`` pages -> one candidate row per ``<url>`` entry.

    Columns: sitemap_url, url, url_host, lastmod (string or null),
    sm_priority (double or null), changefreq (string or null).
    Entries without an absolute http(s) ``<loc>`` are dropped.
    """
    frags = F.regexp_extract_all(
        _clean(xml_col), F.lit(r"(?s)(<url>.*?</url>)"), F.lit(1)
    )
    loc = F.xpath_string("frag", F.lit("url/loc"))
    lastmod = F.nullif(F.xpath_string("frag", F.lit("url/lastmod")),
                       F.lit(""))
    prio = F.xpath_string("frag", F.lit("url/priority"))
    cfreq = F.xpath_string("frag", F.lit("url/changefreq"))
    return (
        pages.select(
            F.col(url_col).alias("sitemap_url"),
            F.explode(frags).alias("frag"),
        )
        .select(
            "sitemap_url",
            loc.alias("url"),
            lastmod.alias("lastmod"),
            F.nullif(prio, F.lit("")).cast("double").alias("sm_priority"),
            F.nullif(F.lower(cfreq), F.lit("")).alias("changefreq"),
        )
        .where(F.col("url").rlike(r"^https?://"))
        .withColumn("url_host", F.parse_url(F.col("url"), F.lit("HOST")))
    )


# sitemap-protocol changefreq → recrawl interval in days.  "always"
# and "hourly" mean sub-daily — due immediately on any day boundary;
# "never" opts out of scheduled recrawl entirely (archival URLs).
CHANGEFREQ_DAYS = {
    "always": 0, "hourly": 0, "daily": 1, "weekly": 7,
    "monthly": 30, "yearly": 365,
}
DEFAULT_RECRAWL_DAYS = 7


def sitemap_recrawl_due(entries: DataFrame, as_of: str,
                        default_days: int = DEFAULT_RECRAWL_DAYS,
                        ) -> DataFrame:
    """Publisher-declared recrawl scheduling: the sitemap protocol's
    ``changefreq``/``lastmod`` hints turned into a due verdict — the
    cooperative counterpart of the observation-driven churn estimate
    (``frontier.recrawl``): the SITE tells the crawler how often a
    page changes, and a polite crawler folds that into its refetch
    queue rather than rediscovering it from snapshot diffs.

    Semantics per entry: interval = :data:`CHANGEFREQ_DAYS` for the
    declared frequency (``never`` → NULL interval, never due;
    unknown/missing → ``default_days``); ``next_due`` = lastmod +
    interval; entries WITHOUT a lastmod are due immediately (nothing
    says when they last changed).  ``due`` compares against
    ``as_of`` (an ISO date literal — a plan constant, so the verdict
    is reproducible).

    100 TB shape: one codegen projection on the entries frame (date
    arithmetic + a literal CASE map), no join, no window, no Python;
    the due predicate pushes into the frontier insert downstream.
    """
    freq_days = F.element_at(
        F.create_map(*[
            F.lit(x) for kv in CHANGEFREQ_DAYS.items() for x in kv
        ]),
        F.col("changefreq"),
    )
    interval = F.when(
        F.col("changefreq") == "never", F.lit(None).cast("int")
    ).otherwise(
        F.coalesce(freq_days, F.lit(int(default_days)))
    )
    next_due = F.date_add(F.to_date("lastmod"), interval)
    due = F.when(F.col("changefreq") == "never", F.lit(False)) \
        .when(F.col("lastmod").isNull(), F.lit(True)) \
        .otherwise(next_due <= F.to_date(F.lit(as_of)))
    return entries.select(
        "url", "url_host", "changefreq", "lastmod",
        interval.cast("int").alias("interval_days"),
        next_due.alias("next_due"),
        due.cast("int").alias("due"),
    )


def sitemap_coverage(sitemap_urls: DataFrame, crawled_urls: DataFrame,
                     url_col: str = "url",
                     host_col: str = "url_host") -> DataFrame:
    """Per-host sitemap-vs-crawl coverage: the crawl-ops dashboard
    that tells the frontier where its discovery backlog is.

    ``sitemap_only`` = published in the sitemap but never fetched
    (seed these next round — the site OWNER says they exist);
    ``crawl_only`` = fetched but absent from the sitemap (orphan /
    link-discovered pages — a freshness signal the recrawl scheduler
    deprioritizes).  Returns one row per host:
    (host, n_sitemap, n_crawled, n_both, sitemap_only, crawl_only).

    100 TB shape: both sides dedupe map-side (distinct on the url
    key), meet in ONE equi-join shuffle on url, and collapse to host
    cardinality through partial-agg sums — no window, no Python, no
    skew beyond the url key's natural spread (hosts never key a
    shuffle).  Reference analog: none (fixed publisher lists); this
    is Common-Crawl-style seed-list hygiene.
    """
    s = (sitemap_urls.select(F.col(url_col).alias("url"),
                             F.col(host_col).alias("host"))
         .distinct().withColumn("in_s", F.lit(1)))
    c = (crawled_urls.select(F.col(url_col).alias("url"),
                             F.col(host_col).alias("host"))
         .distinct().withColumn("in_c", F.lit(1)))
    j = s.join(c, on=["url", "host"], how="full_outer").select(
        "host",
        F.coalesce("in_s", F.lit(0)).alias("in_s"),
        F.coalesce("in_c", F.lit(0)).alias("in_c"),
    )
    return j.groupBy("host").agg(
        F.sum("in_s").cast("long").alias("n_sitemap"),
        F.sum("in_c").cast("long").alias("n_crawled"),
        F.sum(F.col("in_s") * F.col("in_c")).cast("long").alias("n_both"),
        F.sum(F.col("in_s") * (1 - F.col("in_c")))
        .cast("long").alias("sitemap_only"),
        F.sum(F.col("in_c") * (1 - F.col("in_s")))
        .cast("long").alias("crawl_only"),
    )
