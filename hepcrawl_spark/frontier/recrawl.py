"""Recrawl scheduling: snapshot history, churn, and freshness priority.

The reference harvests incrementally by date window (``from_date`` /
``until_date`` OAI arguments, hepcrawl/spiders/arxiv_spider.py:34-43)
— "fetch what changed since last run".  Over a Common-Crawl-style
pages table (url, warc_ts, html, …) holding MANY snapshots per URL,
the engine-mode equivalent is content-level: which URLs changed
between snapshots, how often (churn), and which are stale enough to
re-enqueue — the freshness signal every production crawler feeds its
frontier alongside authority (``linkgraph``).

Scale shape: every operator here partitions by ``url`` — the
highest-cardinality key in the system, so the shuffle is perfectly
spread and each window group holds only that URL's handful of
snapshots (never a mega-group; host-skew is irrelevant on the url
key).  Change detection compares 64-bit content digests
(``xxhash64``), so the wide ``html`` column is pruned from the
shuffle — only (url, ts, digest) moves.  The output tables are
URL-cardinality dimensions; ``recrawl_candidates`` emits integer
priorities compatible with ``schedule``'s sort keys.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snapshot_history(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    digest: Optional[F.Column] = None,
) -> DataFrame:
    """Per-URL snapshot/churn stats.

    Output: url, versions (snapshot count), changes (count of
    adjacent-snapshot content changes), first_ts_us, last_ts_us,
    last_changed (did the newest snapshot differ from its
    predecessor).  ``digest`` defaults to ``xxhash64(html)``; pass any
    64-bit content digest column expression to override (e.g. a
    digest already materialized in the table — the html column is
    then never read at all).
    """
    if digest is None:
        digest = F.xxhash64(F.col("html"))
    snaps = (
        pages.select(
            F.col(url_col).alias("url"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_ts_us"),
            digest.alias("_dig"),
        )
        .withColumn("_prev", F.lag("_dig").over(
            Window.partitionBy("url").orderBy(F.col("_ts_us").asc())))
        .withColumn(
            "_chg",
            F.when(F.col("_prev").isNull(), F.lit(0))
            .when(F.col("_prev") != F.col("_dig"), F.lit(1))
            .otherwise(F.lit(0)),
        )
        .withColumn("_rn_desc", F.row_number().over(
            Window.partitionBy("url").orderBy(F.col("_ts_us").desc())))
    )
    return snaps.groupBy("url").agg(
        F.count(F.lit(1)).alias("versions"),
        F.sum("_chg").cast("long").alias("changes"),
        F.min("_ts_us").alias("first_ts_us"),
        F.max("_ts_us").alias("last_ts_us"),
        (F.max(F.when(F.col("_rn_desc") == 1, F.col("_chg"))) == 1)
        .alias("last_changed"),
    )


def snapshot_latest(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Latest snapshot row per URL (all columns), ties broken by the
    64-bit content hash so the pick is deterministic even on equal
    timestamps."""
    w = Window.partitionBy(url_col).orderBy(
        F.col(ts_col).desc(), F.xxhash64(F.col("html")).desc()
    )
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def recrawl_candidates(
    history: DataFrame,
    as_of_us: int,
    min_age_sec: int = 86400,
    levels: int = 100,
) -> DataFrame:
    """URLs stale enough to re-enqueue, with an integer freshness
    priority for ``schedule``.

    age buckets = floor(age / min_age); URLs younger than one bucket
    are dropped.  Priority = min(levels, buckets * (1 + changes)) —
    staleness scaled by observed churn, so a page that changes every
    snapshot outranks a static one of equal age.  Pure BIGINT
    arithmetic (exact on any engine).
    """
    min_age_us = int(min_age_sec) * 1_000_000
    buckets = F.floor(
        (F.lit(int(as_of_us)) - F.col("last_ts_us")) / F.lit(min_age_us)
    ).cast("long")
    return (
        history.withColumn("_b", buckets)
        .filter(F.col("_b") >= 1)
        .select(
            "url",
            F.least(
                F.lit(int(levels)),
                F.col("_b") * (F.lit(1) + F.col("changes")),
            ).cast("long").alias("recrawl_priority"),
            (F.lit(int(as_of_us)) - F.col("last_ts_us")).alias("age_us"),
            "versions", "changes",
        )
    )


def as_frontier_seeds(
    candidates: DataFrame,
    source: str = "recrawl",
    fmt: str = "html-generic",
) -> DataFrame:
    """``recrawl_candidates`` output -> rows in the frontier's
    CANDIDATE_SCHEMA, ready for ``run_crawl``/``stream_crawl_round``.

    ``recrawl_priority`` becomes the queue priority (stalest +
    churniest first, composing with any host-authority boost on top);
    ``seq`` is ``xxhash64(url)`` masked to the non-negative 63-bit
    domain — deterministic given the input (the LIFO tie-break among
    equal-priority recrawls carries no meaning, unlike discovery
    order), and the mask keeps the scheduler's ``seq - min(seq)``
    range bucketing inside int64 under ANSI mode.  Same identity
    derivation as every other queue entry (``with_url_identity``).
    """
    from .fingerprint import with_url_identity
    from .seen import CANDIDATE_SCHEMA

    seeded = with_url_identity(candidates.select(
        "url",
        F.col("recrawl_priority").cast("long").alias("priority"),
        F.lit(0).cast("int").alias("depth"),
        F.xxhash64(F.col("url"))
        .bitwiseAND(F.lit(0x7FFFFFFFFFFFFFFF)).alias("seq"),
        F.lit(source).alias("source"),
        F.lit(fmt).alias("format"),
    ))
    return seeded.select(*CANDIDATE_SCHEMA.fieldNames())
