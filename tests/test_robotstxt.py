"""robots.txt parser (f11): grammar unit tests + Spark table +
composition into the existing robots gate."""

from hepcrawl_spark.frontier import robotstxt
from hepcrawl_spark.frontier.robotstxt import parse_robots


def test_star_group_with_comments_and_blanks():
    got = parse_robots(
        "# hi\n\nUser-agent: *\nDisallow: /a  # trailing\nDisallow: /b\n",
        agent="me")
    assert got == {"disallow": ["/a", "/b"], "allow": [],
                   "crawl_delay": None, "sitemaps": []}


def test_specific_agent_beats_star():
    body = ("User-agent: *\nDisallow: /all\nCrawl-delay: 3\n"
            "User-agent: MyBot\nDisallow: /mine\n")
    assert parse_robots(body, "mybot")["disallow"] == ["/mine"]
    assert parse_robots(body, "mybot")["crawl_delay"] is None
    assert parse_robots(body, "other")["disallow"] == ["/all"]
    assert parse_robots(body, "other")["crawl_delay"] == 3.0


def test_same_agent_groups_merge_and_delay_is_max():
    body = ("User-agent: bot\nDisallow: /x\nCrawl-delay: 2\n"
            "User-agent: other\nDisallow: /o\n"
            "User-agent: bot\nDisallow: /y\nCrawl-delay: 7\n")
    got = parse_robots(body, "bot")
    assert got["disallow"] == ["/x", "/y"]
    assert got["crawl_delay"] == 7.0


def test_consecutive_ua_lines_share_one_group():
    body = "User-agent: a\nUser-agent: b\nDisallow: /shared\n"
    assert parse_robots(body, "a")["disallow"] == ["/shared"]
    assert parse_robots(body, "b")["disallow"] == ["/shared"]
    assert parse_robots(body, "c")["disallow"] == []


def test_edge_cases_ignored():
    body = ("Disallow: /before-any-group\n"        # rule before UA
            "User-agent: *\n"
            "Disallow:\n"                          # empty = no rule
            "Allow: /hole\n"                       # collected
            "Crawl-delay: fast\n"                  # unparseable
            "Sitemap: http://a.com/s.xml\n"
            "Sitemap: http://a.com/s2.xml\n")
    got = parse_robots(body, "x")
    assert got == {"disallow": [], "allow": ["/hole"],
                   "crawl_delay": None,
                   "sitemaps": ["http://a.com/s.xml",
                                "http://a.com/s2.xml"]}


def test_allow_longest_match_gate(spark):
    # RFC 9309 §2.2.2: longest matching prefix wins; ties (incl. the
    # no-rules case) are least-restrictive
    from hepcrawl_spark.frontier.robots import robots_filter
    from hepcrawl_spark.frontier.robotstxt import robots_table

    bodies = spark.createDataFrame(
        [("h.example.com",
          "User-agent: *\nDisallow: /private/\n"
          "Allow: /private/pub/\nAllow: /private/x\n")],
        "url_host string, body string",
    )
    rules = robots_table(bodies, agent="me")
    cand = spark.createDataFrame(
        [("h.example.com", f"http://h.example.com{p}")
         for p in ("/private/secret", "/private/pub/doc",
                   "/private/x", "/private/xy", "/open/doc")],
        "url_host string, canon_url string",
    )
    allowed, blocked = robots_filter(cand, rules)
    ok = {r.canon_url.rsplit(".com", 1)[1] for r in allowed.collect()}
    no = {r.canon_url.rsplit(".com", 1)[1] for r in blocked.collect()}
    # deeper Allow beats the shorter Disallow; equal length ties
    # allow; the bare Disallow still blocks
    assert ok == {"/private/pub/doc", "/private/x", "/private/xy",
                  "/open/doc"}
    assert no == {"/private/secret"}
    # a rules table WITHOUT allow_prefixes keeps the old semantics
    legacy = rules.drop("allow_prefixes")
    allowed2, blocked2 = robots_filter(cand, legacy)
    assert blocked2.count() == 4 and allowed2.count() == 1


def test_robots_table_and_gate_composition(spark):
    from hepcrawl_spark.frontier.robots import robots_filter

    bodies = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /private/\n"
                   "Crawl-delay: 4\nSitemap: http://a.com/sm.xml\n"),
         ("b.com", "User-agent: *\nDisallow:\n")],
        "url_host string, body string")
    rules = robotstxt.robots_table(bodies, agent="anybot")
    got = {r.url_host: r for r in rules.collect()}
    assert list(got["a.com"].disallow_prefixes) == ["/private/"]
    assert got["a.com"].crawl_delay == 4.0
    assert list(got["a.com"].sitemaps) == ["http://a.com/sm.xml"]
    assert list(got["b.com"].disallow_prefixes) == []

    cands = spark.createDataFrame(
        [("http://a.com/private/x", "http://a.com/private/x", "a.com"),
         ("http://a.com/ok", "http://a.com/ok", "a.com"),
         ("http://b.com/anything", "http://b.com/anything", "b.com")],
        "url string, canon_url string, url_host string")
    allowed, blocked = robots_filter(cands, rules)
    assert {r.url for r in blocked.collect()} == {"http://a.com/private/x"}
    assert allowed.count() == 2

    sm = robotstxt.discovered_sitemaps(rules).collect()
    assert [(r.url_host, r.sitemap_url) for r in sm] == \
        [("a.com", "http://a.com/sm.xml")]


def test_binary_bodies_accepted(spark):
    bodies = spark.createDataFrame(
        [("a.com", bytearray(b"User-agent: *\nDisallow: /x\n"))],
        "url_host string, body binary")
    rows = robotstxt.robots_table(bodies).collect()
    assert list(rows[0].disallow_prefixes) == ["/x"]


def test_f11_registered():
    import __spark_entry__ as em
    assert "f11_robots_parse" in em.queries()
    assert "f11_robots_parse" in em.oracle_sql()


def test_f14_discovery_composition(spark):
    # the composed cascade at sf0.001: every surviving path avoids its
    # host's chosen disallow prefixes, and every host's spacing honors
    # the parsed Crawl-delay override
    import __spark_entry__ as em
    rows = em.queries()["f14_discovery_schedule"](
        spark, "/root/testdata/sf0.001").collect()
    assert rows, "discovery cascade produced no candidates"
    for r in rows:
        hid = int(r.url_host.split(".")[0][1:])
        path = r.url.split(".example.com", 1)[1]
        if hid % 5 == 0:
            assert not path.startswith(f"/only/{hid}")
        else:
            assert not path.startswith(f"/private/{hid}")
    assert "f14_discovery_schedule" in em.oracle_sql()


def test_fuzz_arrow_path_matches_pure_function(spark):
    # property: the Spark mapInPandas path IS parse_robots — fuzz
    # adversarial bodies (weird whitespace, case variance, colons in
    # values, rules before groups, empty fields) through both
    import pytest
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    field = st.sampled_from(
        ["User-agent", "user-AGENT", "Disallow", "disallow", "Allow",
         "Crawl-delay", "CRAWL-DELAY", "Sitemap", "sitemap", "Unknown"])
    value = st.sampled_from(
        ["*", "bot", "MyBot", "/", "/a", "/a/b", "", "3", "2.5", "x",
         "http://h.example.com/s.xml", "http://h:8080/s.xml",
         "  /spaced  ", "/a#frag"])
    line = st.builds(lambda f, v, c: f + ":" + v + c,
                     field, value,
                     st.sampled_from(["", "  # comment", "\r"]))
    body = st.lists(line, max_size=24).map("\n".join)

    @given(bodies=st.lists(body, min_size=1, max_size=6),
           agent=st.sampled_from(["bot", "mybot", "none"]))
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def check(bodies, agent):
        df = spark.createDataFrame(
            [(f"h{i}.example.com", b) for i, b in enumerate(bodies)],
            "url_host string, body string")
        got = {r.url_host: (list(r.disallow_prefixes), r.crawl_delay,
                            list(r.sitemaps))
               for r in robotstxt.robots_table(df, agent=agent).collect()}
        for i, b in enumerate(bodies):
            want = parse_robots(b, agent)
            assert got[f"h{i}.example.com"] == (
                want["disallow"], want["crawl_delay"], want["sitemaps"])

    check()
