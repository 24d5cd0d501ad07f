"""Frontier URL blocklist gate (f07): scheme allowlist, registrable
domain-suffix blocklist (literal and DataFrame paths), extension
blocklist."""

import pytest
from pyspark.sql import functions as F

from hepcrawl_spark.frontier import urlfilter
from hepcrawl_spark.frontier.fingerprint import with_url_identity
from hepcrawl_spark.frontier.urlfilter import (
    MAX_LITERAL_DOMAINS,
    detect_traps,
    host_suffixes,
    url_filter,
    url_filter_df,
    url_pattern_col,
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


# ---------------------------------------------------------------------------
# crawl-trap detection
# ---------------------------------------------------------------------------

PATTERN_CASES = [
    # calendar digits collapse to ~d per run
    ("http://h.x/cal/2026/08/19", "/cal/~d/~d/~d"),
    ("http://h.x/cal/1999/01/02", "/cal/~d/~d/~d"),
    # >=8 hex chars collapse to ~h BEFORE the digit rule can eat the
    # leading digits (case-folded first)
    ("http://h.x/s/00DEADBEEF42", "/s/~h"),
    ("http://h.x/s/0001869f", "/s/~h"),
    # an all-digit run >=8 chars is hex too — session-id rule wins
    ("http://h.x/s/12345678", "/s/~h"),
    # short runs: digits collapse, 7-char hex does NOT
    ("http://h.x/s/deadbee", "/s/deadbee"),
    ("http://h.x/p/42.html", "/p/~d.html"),
    # no path -> empty pattern
    ("http://h.x", ""),
]


def test_url_pattern_col(spark):
    rows = [(u,) for u, _ in PATTERN_CASES]
    got = (
        spark.createDataFrame(rows, "url string")
        .select("url", url_pattern_col(F.col("url")).alias("p"))
        .collect()
    )
    expect = dict(PATTERN_CASES)
    for r in got:
        assert r.p == expect[r.url], r.url


def test_detect_traps_flags_planted_hosts(spark):
    rows = []
    # trap.x: 30 distinct calendar URLs, one pattern, 100% share
    rows += [(f"http://trap.x/cal/{y}/{m}", "trap.x")
             for y in range(2016, 2026) for m in (1, 2, 3)]
    # mixed.x: same 30 calendar URLs diluted by 40 sectioned URLs —
    # top share 30/70 < 0.5 -> not a trap
    rows += [(f"http://mixed.x/cal/{y}/{m}", "mixed.x")
             for y in range(2016, 2026) for m in (1, 2, 3)]
    rows += [(f"http://mixed.x/{s}/page{i}", "mixed.x")
             for s in ("a", "b", "c", "d") for i in range(10)]
    # small.x: one pattern, 100% share, but below min_pattern_urls
    rows += [(f"http://small.x/cal/{y}/1", "small.x")
             for y in range(2016, 2021)]
    # duplicate URLs must not inflate distinct counts
    rows += rows[:5]
    df = spark.createDataFrame(rows, "url string, url_host string")
    out = {r.url_host: r
           for r in detect_traps(df, min_pattern_urls=20).collect()}
    assert out["trap.x"].trap
    assert out["trap.x"].top_pattern == "/cal/~d/~d"
    assert out["trap.x"].top_pattern_urls == 30
    assert out["trap.x"].host_urls == 30
    assert out["trap.x"].pattern_cnt == 1
    assert not out["mixed.x"].trap
    assert out["mixed.x"].host_urls == 70
    assert out["mixed.x"].top_pattern == "/cal/~d/~d"
    assert not out["small.x"].trap
    assert out["small.x"].top_pattern_urls == 5


def test_detect_traps_tie_break_smallest_pattern(spark):
    # two patterns at 3 distinct URLs each: argmax must pick the
    # lexicographically smaller pattern deterministically
    rows = [(f"http://t.x/a/{i}", "t.x") for i in range(3)]
    rows += [(f"http://t.x/b/{i}", "t.x") for i in range(3)]
    out = detect_traps(
        spark.createDataFrame(rows, "url string, url_host string"),
        min_pattern_urls=3, min_share=0.5,
    ).collect()
    assert len(out) == 1
    assert out[0].top_pattern == "/a/~d"
    # both thresholds are inclusive: 3 >= 3 urls, 3/6 >= 0.5 share
    assert out[0].trap


def test_url_spam_score_features(spark):
    from hepcrawl_spark.frontier.urlfilter import url_spam_score

    rows = [
        (1, "http://a.com/ok"),                          # clean: 0
        (2, "http://a.com/id/1234567"),                  # digit run: 3
        (3, "http://a.com/buy-cheap-x-y-z-now"),         # hyphens: 2
        (4, "http://a.com/a/b/c/d/e/f/g"),               # depth: 1
        (5, "http://a.com/q?a=1&b=2&c=3"),               # params: 2
        (6, "http://a.com/id/1234567-x-y-z-w-v/" + "p/" * 30
            + "f?a=1&b=2&c=3"),                          # everything
    ]
    df = spark.createDataFrame(rows, "doc_id long, canon_url string")
    out = {r.doc_id: r for r in url_spam_score(df).collect()}
    assert out[1].spam_score == 0 and out[1].spam_flag == 0
    assert out[2].spam_score == 3 and out[2].spam_flag == 0
    assert out[3].spam_score == 2
    assert out[4].spam_score == 1
    assert out[5].spam_score == 2
    # long + digits + hyphens + depth + params = 2+3+2+1+2
    assert out[6].spam_score == 10 and out[6].spam_flag == 1


def test_url_spam_score_plan_is_python_free(spark):
    from hepcrawl_spark.frontier.urlfilter import url_spam_score

    df = url_spam_score(spark.createDataFrame(
        [(1, "http://a.com/x")], "doc_id long, canon_url string"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "Exchange" not in plan and "Join" not in plan


def test_dust_params_rule_mining(spark):
    rows = [
        # utm: three agreeing pairs → irrelevant at min_support=3
        ("http://a/p/1", "x1"), ("http://a/p/1?utm=z", "x1"),
        ("http://a/p/2", "x2"), ("http://a/p/2?utm=z", "x2"),
        ("http://a/p/3", "x3"), ("http://a/p/3?utm=z", "x3"),
        # page: alias exists but content DIFFERS → counterexample
        ("http://a/p/4", "x4"), ("http://a/p/4?page=2", "y4"),
        # ref: agrees but support 1 < 3 → not promoted
        ("http://a/p/5", "x5"), ("http://a/p/5?ref=r", "x5"),
        # orphan param URL with no crawled alias → n_alias 0
        ("http://a/p/9?lone=1", "x9"),
        # multi-param URLs are skipped, not guessed about
        ("http://a/p/1?utm=z&page=2", "x1"),
    ]
    df = spark.createDataFrame(
        [(u, "a", t) for u, t in rows], "url string, host string, text string")
    r = {x.param: x for x in urlfilter.dust_params(
        df, min_support=3).collect()}
    assert set(r) == {"utm", "page", "ref", "lone"}
    assert (r["utm"].n_urls, r["utm"].n_alias, r["utm"].n_same,
            r["utm"].irrelevant) == (3, 3, 3, 1)
    assert (r["page"].n_same, r["page"].irrelevant) == (0, 0)
    assert (r["ref"].n_same, r["ref"].irrelevant) == (1, 0)
    assert (r["lone"].n_alias, r["lone"].irrelevant) == (0, 0)


def test_apply_dust_rules_rewrite(spark):
    rules = spark.createDataFrame(
        [("a", "utm", 1), ("a", "sess", 1), ("a", "page", 0),
         ("b", "ref", 1)],
        "host string, param string, irrelevant int")
    urls = [
        # both params irrelevant → query dropped entirely
        ("http://a/p/1?utm=z&sess=9", "a", "http://a/p/1", 2),
        # relevant param survives the strip
        ("http://a/p/2?page=2&utm=z", "a", "http://a/p/2?page=2", 1),
        # nothing to strip
        ("http://a/p/3?page=5", "a", "http://a/p/3?page=5", 0),
        # no query → untouched
        ("http://a/p/4", "a", "http://a/p/4", 0),
        # host without rules → untouched even though utm matches
        ("http://c/p/5?utm=z", "c", "http://c/p/5?utm=z", 0),
        # rules are per-host: a's utm is NOT stripped on b
        ("http://b/p/6?utm=z&ref=r", "b", "http://b/p/6?utm=z", 1),
    ]
    df = spark.createDataFrame(
        [(u, h) for u, h, _, _ in urls], "url string, host string")
    got = {r.url: r for r in urlfilter.apply_dust_rules(df, rules).collect()}
    for u, _, want, n in urls:
        assert got[u].dust_url == want, u
        assert got[u].n_stripped == n, u


def test_apply_dust_rules_plan_broadcasts_and_stays_jvm(spark):
    rules = spark.createDataFrame(
        [("a", "utm", 1)], "host string, param string, irrelevant int")
    df = spark.createDataFrame(
        [("http://a/p/1?utm=z", "a")], "url string, host string")
    plan = (urlfilter.apply_dust_rules(df, rules)
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "BroadcastHashJoin" in plan
    # the URL stream itself never shuffles: the ONE hash Exchange in
    # the plan is the (host, param)-cardinality rule fold feeding the
    # broadcast side
    assert plan.count("Exchange hashpartitioning") == 1
