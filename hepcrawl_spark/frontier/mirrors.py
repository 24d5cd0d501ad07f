"""Mirror-host detection: host pairs serving the same content.

Large crawls waste budget re-fetching mirrors (the same site under
several hostnames — CDNs, country mirrors, scraped re-hosts).  The
classic signal (Bharat & Broder, WWW8 1999, "A comparison of
techniques to find mirrored hosts on the WWW") is content-set
overlap: hash every page body, invert to content → hosts, and pair
hosts whose shared-content count covers most of the smaller host's
page set.  Downstream the crawler keeps ONE member per mirror pair
(and the cleaning pipeline drops the rest — see
``corpus.clean_corpus_full(mirror_pages=…)`` / p17).

Reference analog: none — hepcrawl harvests a fixed publisher list;
mirror elimination is a web-scale frontier concern.

100 TB shape:

- content identity is ``md5(text)`` — ONE codegen projection, then a
  map-side-combinable distinct per (content, host); no Python.
- the content→hosts posting join is quadratic in hosts-per-content,
  exactly like shingle posting lists in dedup — so boilerplate pages
  (empty page, cookie wall, "domain parked") that thousands of hosts
  serve are pruned with ``max_content_df`` BEFORE the self-join, the
  same stop-shingle move ``ngram_jaccard_pairs`` makes.  A content
  hash shared by k hosts contributes k² pair rows; capping k bounds
  the join while true mirror pairs, which share many *rare* pages,
  still collide.
- per-host set sizes ride a broadcast join back onto the (already
  tiny) host-pair aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mirror_host_pairs(pages: DataFrame,
                      min_shared: int = 3,
                      min_overlap_pct: int = 80,
                      max_content_df: int | None = None,
                      host_col: str = "host",
                      text_col: str = "text") -> DataFrame:
    """Host pairs ranked by shared identical-content pages.

    Returns (host_a, host_b, shared, n_a, n_b, overlap_pct, flagged)
    for pairs with ``shared >= min_shared``, where ``n_x`` is host x's
    distinct-content count, ``overlap_pct = 100·shared/min(n_a,n_b)``
    (coverage of the smaller host — a full mirror scores 100 even
    when the larger host has extra pages) and ``flagged = 1`` when
    ``shared·100 >= min_overlap_pct·min(n_a,n_b)`` (kept integral so
    the verdict is bit-exact cross-engine; overlap_pct itself is a
    small-int ratio).
    """
    posts = pages.select(
        F.col(host_col).alias("host"),
        F.md5(F.col(text_col).cast("string")).alias("content"),
    ).distinct()
    if max_content_df is not None:
        rare = (
            posts.groupBy("content")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_content_df)
            .select("content")
        )
        posts = posts.join(rare, on="content")
    sizes = posts.groupBy("host").agg(F.count(F.lit(1)).alias("n_pages"))
    pairs = (
        posts.alias("a")
        .join(posts.alias("b"), on="content")
        .filter(F.col("a.host") < F.col("b.host"))
        .groupBy(F.col("a.host").alias("host_a"),
                 F.col("b.host").alias("host_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    sized = (
        pairs.join(F.broadcast(sizes.withColumnRenamed("n_pages", "n_a")),
                   pairs.host_a == F.col("host")).drop("host")
        .join(F.broadcast(sizes.withColumnRenamed("n_pages", "n_b")),
              pairs.host_b == F.col("host")).drop("host")
    )
    smaller = F.least("n_a", "n_b")
    return sized.select(
        "host_a", "host_b", "shared", "n_a", "n_b",
        (F.col("shared") * 100 / smaller).alias("overlap_pct"),
        (F.col("shared") * 100 >= F.lit(min_overlap_pct) * smaller)
        .cast("int").alias("flagged"),
    )


def mirror_losers(pairs: DataFrame) -> DataFrame:
    """Hosts to drop: the lexicographically larger member of every
    flagged mirror pair (the deterministic keep-one rule; host_a <
    host_b by construction, so host_b always loses).  One column
    ``host``, distinct — ready for an anti-join against pages or the
    frontier."""
    return (
        pairs.filter(F.col("flagged") == 1)
        .select(F.col("host_b").alias("host"))
        .distinct()
    )
