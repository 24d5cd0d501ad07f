"""rel=canonical URL collapse: alias grouping for the crawl corpus.

Web pages declare their preferred URL with
``<link rel="canonical" href="…">``; production crawlers collapse
URL aliases onto that target before dedup/indexing (Google's
canonicalization contract; Common Crawl dedups fetched URLs the same
way), so session-id/tracking/mirror aliases stop inflating the corpus
and per-URL signals (ranks, seen filters, recrawl state) concentrate
on one name.  The reference harvester keys records by DOI/arXiv id —
content-level identity — and has no URL-alias notion; at webtext
scale the alias collapse is what keeps the frontier's URL universe
near the true page universe.

Like redirects (``frontier/redirects.py``), canonicals CHAIN (A says
B, B says C) and can form cycles (A⇄B, both claiming the other).
``collapse_canonicals`` extracts declarations JVM-side (two regexes —
attribute order is not fixed in HTML), then reuses the redirect
pointer-doubling to land every chain; cycles and over-long chains
fall back to SELF (the safe verdict: a page that can't prove an alias
stays its own canonical — never dropped, never mis-grouped).

100 TB shape: extraction is one codegen projection over the page
scan; the chain resolution touches only DECLARING urls (a small
fraction of the corpus — most pages are self-canonical and never
enter the join), with log2(max_hops) self-joins at declaring-url
cardinality; the final merge is one left join back on url.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .redirects import resolve_redirects

# both attribute orders, both quote styles; group 1 = the target
_CANON_REL_FIRST = (
    r'<link[^>]*rel=["\']canonical["\'][^>]*href=["\']([^"\']*)["\']'
)
_CANON_HREF_FIRST = (
    r'<link[^>]*href=["\']([^"\']*)["\'][^>]*rel=["\']canonical["\']'
)


def extract_canonicals(pages: DataFrame, url_col: str = "url",
                       html_col: str = "html") -> DataFrame:
    """(url, canonical) per page — ``canonical`` NULL when the page
    declares none (self-canonical).  Pure codegen: decode + two
    regexp_extract, no Python, no shuffle."""
    h = F.decode(F.col(html_col), "UTF-8")
    c1 = F.regexp_extract(h, _CANON_REL_FIRST, 1)
    c2 = F.regexp_extract(h, _CANON_HREF_FIRST, 1)
    canon = F.when(c1 != "", c1).when(c2 != "", c2)
    return pages.select(F.col(url_col).alias("url"),
                        canon.alias("canonical"))


def collapse_canonicals(pages: DataFrame, max_hops: int = 8,
                        url_col: str = "url",
                        html_col: str = "html") -> DataFrame:
    """Resolve every page's canonical chain.

    Returns ``(url, canonical_url, hops, collapsed)``: the final
    canonical target (self for non-declaring pages AND for cycles /
    chains beyond ``max_hops`` — the safe fallback), chain length
    (0 for self), and whether the URL actually collapsed onto a
    different name.
    """
    decl = (
        extract_canonicals(pages, url_col=url_col, html_col=html_col)
        .filter(F.col("canonical").isNotNull()
                & (F.col("canonical") != F.col("url")))
    )
    resolved = resolve_redirects(
        decl, max_hops=max_hops, url_col="url", target_col="canonical",
    )
    return (
        pages.select(F.col(url_col).alias("url"))
        .join(resolved, on="url", how="left")
        .select(
            "url",
            F.when(F.col("resolved"), F.col("final_url"))
            .otherwise(F.col("url")).alias("canonical_url"),
            F.when(F.col("resolved"), F.col("hops"))
            .otherwise(F.lit(0)).cast("long").alias("hops"),
            F.coalesce(F.col("resolved"), F.lit(False)).alias("collapsed"),
        )
    )
