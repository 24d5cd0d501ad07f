"""Robots gating (F5).

The reference never enables robots (Scrapy default off — no
ROBOTSTXT_OBEY in /root/reference/hepcrawl/settings.py), so parity mode
uses an empty/allow-all table and this gate is an identity.  The
engine-mode gate is a broadcast join of the frontier against a
host-keyed rules table + a prefix filter — host tables are tiny
relative to the frontier, so this never shuffles the frontier.
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def robots_filter(
    candidates: DataFrame, robots: Optional[DataFrame]
) -> Tuple[DataFrame, DataFrame]:
    """(allowed, blocked).  ``robots`` columns: url_host,
    disallow_prefixes array<string>, crawl_delay double (nullable)."""
    if robots is None:
        return candidates, candidates.limit(0)
    joined = candidates.join(
        F.broadcast(robots.select("url_host", "disallow_prefixes")),
        on="url_host",
        how="left",
    )
    path = F.coalesce(
        F.parse_url(F.col("canon_url"), F.lit("PATH")), F.lit("/")
    )
    blocked_cond = F.when(
        F.col("disallow_prefixes").isNull(), F.lit(False)
    ).otherwise(
        F.exists("disallow_prefixes", lambda p: path.startswith(p))
    )
    allowed = joined.filter(~blocked_cond).drop("disallow_prefixes")
    blocked = joined.filter(blocked_cond).drop("disallow_prefixes")
    return allowed, blocked


def effective_politeness(
    politeness: Optional[DataFrame], robots: Optional[DataFrame]
) -> Optional[DataFrame]:
    """Robots ``Crawl-delay`` overrides the per-host budget's delay when
    larger (conservative merge)."""
    if robots is None or politeness is None:
        return politeness
    merged = politeness.join(
        robots.select("url_host", F.col("crawl_delay").alias("_robots_delay")),
        on="url_host",
        how="left",
    )
    return merged.select(
        "url_host",
        F.greatest(
            F.col("download_delay"), F.coalesce("_robots_delay", F.lit(0.0))
        ).alias("download_delay"),
        "max_per_host",
    )
