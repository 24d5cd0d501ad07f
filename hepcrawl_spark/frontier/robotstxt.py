"""robots.txt parsing: raw fetched bodies -> the robots rules table.

``frontier.robots.robots_filter`` consumes a host-keyed rules table
(url_host, disallow_prefixes, crawl_delay); this module produces that
table from raw robots.txt bodies fetched through the ordinary corpus
join, and additionally surfaces ``Sitemap:`` declarations — which
feed ``sources.sitemap`` — closing the discovery loop.  (Reference
parity note: the reference crawler leaves robots handling to Scrapy
and ships with it OFF — no ROBOTSTXT_OBEY in
/root/reference/hepcrawl/settings.py — so parity mode simply passes
no rules table; this parser is the engine-mode path that makes the
gate self-sufficient at Common-Crawl scale.)  The loop:

    robots.txt -> rules -> robots_filter gate
              \\-> sitemaps -> sitemap_entries -> frontier candidates

Grammar: the RFC 9309 subset the gate can enforce — ``User-agent``
groups (consecutive UA lines share one group; a specific-agent group
takes precedence over ``*``; multiple groups for the same agent
merge), ``Disallow`` AND ``Allow`` path prefixes (empty value = no
rule), ``Crawl-delay`` (non-standard, honored conservatively as the
max across matching groups), ``Sitemap`` (global — outside group
scope per the RFC), ``#`` comments.  Allow-vs-Disallow resolution
follows RFC 9309 §2.2.2 longest-match in the gate
(``frontier.robots.robots_filter``): the most specific (longest)
matching prefix wins, and a tie is least-restrictive (allow).  A
rules table WITHOUT the ``allow_prefixes`` column (older producers)
degrades to the previous pure prefix-blocklist semantics.

Scale shape: robots bodies are HOST-cardinality, not URL-cardinality
— the same regime as the record extractors — so the parse runs as an
Arrow-batched ``mapInPandas`` (pure-Python grammar, unit-testable
standalone via ``parse_robots``), never in the per-URL hot path.
The output is exactly the broadcast dimension ``robots_filter`` and
``effective_politeness`` already join.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, StringType, StructField, StructType,
)

DEFAULT_AGENT = "sparkcrawl"

ROBOTS_RULES_SCHEMA = StructType([
    StructField("url_host", StringType()),
    StructField("disallow_prefixes", ArrayType(StringType())),
    StructField("allow_prefixes", ArrayType(StringType())),
    StructField("crawl_delay", DoubleType()),
    StructField("sitemaps", ArrayType(StringType())),
])


def parse_robots(body: str, agent: str = DEFAULT_AGENT) -> dict:
    """Parse one robots.txt body for ``agent``.

    Returns ``{"disallow": [prefixes...], "allow": [prefixes...],
    "crawl_delay": float|None, "sitemaps": [urls...]}``.  Group
    selection per RFC 9309 §2.2.1: if any group names ``agent``
    (case-insensitive product token), the union of those groups
    applies and ``*`` groups are ignored; otherwise the ``*`` groups
    apply.  ``Allow`` lines are collected per group under the same
    precedence; the GATE resolves Allow-vs-Disallow by RFC 9309
    §2.2.2 longest-match (ties go to allow) — see
    ``frontier.robots.robots_filter``.
    """
    groups = []          # [(set_of_agents, [disallow], [delay], [allow])]
    cur_agents: Optional[set] = None
    cur_open = False     # True while still collecting UA lines
    sitemaps = []

    def _new_group(a):
        groups.append(({a}, [], [], []))

    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "sitemap":
            if value:
                sitemaps.append(value)
            continue
        if field == "user-agent":
            ua = value.lower()
            if cur_open and groups:
                groups[-1][0].add(ua)
            else:
                _new_group(ua)
                cur_open = True
            continue
        # any rule line closes the UA run of the current group
        cur_open = False
        if not groups:
            continue  # rule before any user-agent line: ignored
        if field == "disallow":
            if value:
                groups[-1][1].append(value)
        elif field == "allow":
            if value:
                groups[-1][3].append(value)
        elif field == "crawl-delay":
            try:
                groups[-1][2].append(float(value))
            except ValueError:
                pass
        # unknown fields: ignored

    agent = agent.lower()
    exact = [g for g in groups if agent in g[0]]
    chosen = exact if exact else [g for g in groups if "*" in g[0]]
    disallow = [p for g in chosen for p in g[1]]
    allow = [p for g in chosen for p in g[3]]
    delays = [d for g in chosen for d in g[2]]
    return {
        "disallow": sorted(set(disallow)),
        "allow": sorted(set(allow)),
        "crawl_delay": max(delays) if delays else None,
        "sitemaps": sitemaps,
    }


def robots_table(
    bodies: DataFrame,
    agent: str = DEFAULT_AGENT,
    host_col: str = "url_host",
    body_col: str = "body",
) -> DataFrame:
    """(url_host, body) -> the rules dimension ``robots_filter`` joins.

    ``body`` may be string or binary.  Output columns: url_host,
    disallow_prefixes, allow_prefixes, crawl_delay, sitemaps
    (ROBOTS_RULES_SCHEMA).
    """
    src = bodies.select(
        F.col(host_col).alias("url_host"),
        F.col(body_col).cast("string").alias("body"),
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_robots(b, agent) for b in pdf["body"]]
            yield pd.DataFrame({
                "url_host": pdf["url_host"].values,
                "disallow_prefixes": [p["disallow"] for p in parsed],
                "allow_prefixes": [p["allow"] for p in parsed],
                "crawl_delay": [p["crawl_delay"] for p in parsed],
                "sitemaps": [p["sitemaps"] for p in parsed],
            })

    return src.mapInPandas(_parse, schema=ROBOTS_RULES_SCHEMA)


def discovered_sitemaps(rules: DataFrame) -> DataFrame:
    """Explode the Sitemap declarations into (url_host, sitemap_url)
    rows for ``sources.sitemap`` to fetch."""
    return (
        rules.select("url_host",
                     F.explode("sitemaps").alias("sitemap_url"))
        .where(F.col("sitemap_url").rlike(r"^https?://"))
    )
