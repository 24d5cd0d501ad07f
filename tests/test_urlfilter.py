"""Frontier URL blocklist gate (f07): scheme allowlist, registrable
domain-suffix blocklist (literal and DataFrame paths), extension
blocklist."""

import pytest
from pyspark.sql import functions as F

from hepcrawl_spark.frontier.fingerprint import with_url_identity
from hepcrawl_spark.frontier.urlfilter import (
    MAX_LITERAL_DOMAINS,
    host_suffixes,
    url_filter,
    url_filter_df,
)

URLS = [
    "http://ok.example.com/page.html",       # clean
    "http://bad.example.org/page.html",      # domain-blocked (suffix)
    "http://sub.a.bad.example.org/x",        # deep subdomain of blocked
    "http://example.org/x",                  # blocked registrable itself
    "ftp://ok.example.com/file.txt",         # scheme-blocked
    "http://ok.example.com/photo.JPG",       # extension (case-folded)
    "https://ok.example.com/doc.pdf",        # clean https
    "http://exampleXorg/x",                  # NOT a dot-suffix match
]


def _cand(spark):
    rows = [(u, i) for i, u in enumerate(URLS)]
    return with_url_identity(
        spark.createDataFrame(rows, "url string, seq long")
    )


def test_host_suffixes(spark):
    df = spark.range(1).select(
        host_suffixes(F.lit("a.b.example.com")).alias("s"),
        host_suffixes(F.lit("example.com")).alias("t"),
        host_suffixes(F.lit("localhost")).alias("u"),
    )
    r = df.collect()[0]
    assert r.s == ["a.b.example.com", "b.example.com", "example.com"]
    assert r.t == ["example.com"]
    # single-label host: only itself (never a zero-label suffix)
    assert r.u == ["localhost"]


def test_url_filter_literal(spark):
    out = {
        r.seq: r
        for r in url_filter(
            _cand(spark),
            blocked_domains=["example.org"],
            blocked_extensions=["jpg"],
        ).collect()
    }
    assert out[0].keep
    assert out[1].domain_blocked and not out[1].keep
    assert out[2].domain_blocked          # deep subdomain still caught
    assert out[3].domain_blocked          # the registrable itself
    assert not out[4].scheme_ok and not out[4].keep
    assert out[5].ext_blocked and not out[5].keep   # .JPG case-folded
    assert out[6].keep
    # "exampleXorg" must not match the ".example.org" suffix rule
    assert not out[7].domain_blocked and out[7].keep


def test_url_filter_df_matches_literal(spark):
    blocked = ["example.org"]
    lit = url_filter(
        _cand(spark), blocked_domains=blocked,
        blocked_extensions=["jpg"],
    ).select("seq", "scheme_ok", "domain_blocked", "ext_blocked", "keep")
    dim = spark.createDataFrame([(d,) for d in blocked],
                                "domain string")
    big = url_filter_df(
        _cand(spark), dim, blocked_extensions=["jpg"],
    ).select("seq", "scheme_ok", "domain_blocked", "ext_blocked", "keep")
    assert sorted(map(tuple, lit.collect())) == \
        sorted(map(tuple, big.collect()))


def test_url_filter_literal_cap(spark):
    toobig = [f"d{i}.test" for i in range(MAX_LITERAL_DOMAINS + 1)]
    with pytest.raises(ValueError, match="url_filter_df"):
        url_filter(_cand(spark), blocked_domains=toobig)


def test_url_filter_empty_blocklists_keep_all(spark):
    out = url_filter(_cand(spark))
    kept = out.filter("keep").count()
    # only the ftp URL drops when no blocklists are given
    assert kept == len(URLS) - 1
