"""Sitemap source (f10): itertag split + per-entry xpath projection."""

from hepcrawl_spark.sources import sitemap

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>http://a.example.com/p/1</loc>
    <lastmod>2024-01-05</lastmod>
    <priority>0.8</priority>
  </url>
  <url><loc>http://a.example.com/p/2</loc></url>
  <url><loc>/relative</loc><lastmod>2024-01-06</lastmod></url>
  <url><loc>ftp://a.example.com/f</loc></url>
</urlset>"""

INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://a.example.com/s1.xml</loc></sitemap>
  <sitemap><loc>http://a.example.com/s2.xml</loc></sitemap>
</sitemapindex>"""


def _pages(spark, url, xml):
    return spark.createDataFrame([(url, bytearray(xml.encode()))],
                                 "url string, xml binary")


def test_entries_optional_children_stay_aligned(spark):
    rows = sitemap.sitemap_entries(
        _pages(spark, "http://a.example.com/s1.xml", URLSET)
    ).orderBy("url").collect()
    # relative + ftp locs dropped; lastmod/priority NULL where omitted
    assert [(r.url, r.lastmod, r.sm_priority, r.url_host) for r in rows] == [
        ("http://a.example.com/p/1", "2024-01-05", 0.8, "a.example.com"),
        ("http://a.example.com/p/2", None, None, "a.example.com"),
    ]
    assert all(r.sitemap_url == "http://a.example.com/s1.xml" for r in rows)


def test_index_targets(spark):
    rows = sitemap.sitemap_index_targets(
        _pages(spark, "http://a.example.com/sitemap.xml", INDEX)
    ).orderBy("sitemap_url").collect()
    assert [r.sitemap_url for r in rows] == [
        "http://a.example.com/s1.xml", "http://a.example.com/s2.xml"]
    assert all(r.index_url == "http://a.example.com/sitemap.xml"
               for r in rows)


def test_plans_are_jvm_only(spark):
    for df in (
        sitemap.sitemap_entries(
            _pages(spark, "http://a.example.com/s1.xml", URLSET)),
        sitemap.sitemap_index_targets(
            _pages(spark, "http://a.example.com/sitemap.xml", INDEX)),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan


def test_f10_registered():
    import __spark_entry__ as em
    assert "f10_sitemap_scan" in em.queries()
    assert "f10_sitemap_scan" in em.oracle_sql()


def test_sitemap_coverage_counts(spark):
    from hepcrawl_spark.sources.sitemap import sitemap_coverage
    sm = spark.createDataFrame(
        [("http://a/1", "a"), ("http://a/2", "a"), ("http://a/2", "a"),
         ("http://b/1", "b")],
        "url string, url_host string")
    cr = spark.createDataFrame(
        [("http://a/1", "a"), ("http://a/9", "a"),   # 9 = orphan
         ("http://c/1", "c")],                       # crawl-only host
        "url string, url_host string")
    r = {x.host: x for x in sitemap_coverage(sm, cr).collect()}
    a = r["a"]
    # sitemap dupes collapse: n_sitemap counts distinct urls
    assert (a.n_sitemap, a.n_crawled, a.n_both,
            a.sitemap_only, a.crawl_only) == (2, 2, 1, 1, 1)
    assert (r["b"].n_sitemap, r["b"].n_crawled) == (1, 0)
    assert (r["c"].n_sitemap, r["c"].crawl_only) == (0, 1)


def test_sitemap_recrawl_due_semantics(spark):
    from hepcrawl_spark.sources.sitemap import (
        sitemap_entries,
        sitemap_recrawl_due,
    )
    body = (
        '<?xml version="1.0"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>http://s.x/daily-old</loc>"
        "<lastmod>2024-01-01</lastmod>"
        "<changefreq>daily</changefreq></url>"
        "<url><loc>http://s.x/weekly-fresh</loc>"
        "<lastmod>2024-01-18</lastmod>"
        "<changefreq>WEEKLY</changefreq></url>"
        "<url><loc>http://s.x/never</loc>"
        "<lastmod>2020-01-01</lastmod>"
        "<changefreq>never</changefreq></url>"
        "<url><loc>http://s.x/no-lastmod</loc>"
        "<changefreq>daily</changefreq></url>"
        "<url><loc>http://s.x/no-freq</loc>"
        "<lastmod>2024-01-10</lastmod></url>"
        "</urlset>"
    )
    pages = spark.createDataFrame(
        [("http://s.x/sitemap.xml", bytearray(body.encode()))],
        "url string, xml binary",
    )
    out = {r.url: r for r in sitemap_recrawl_due(
        sitemap_entries(pages), as_of="2024-01-20").collect()}
    assert out["http://s.x/daily-old"].due == 1          # long overdue
    assert out["http://s.x/daily-old"].interval_days == 1
    # weekly from the 18th -> due the 25th, not yet
    assert out["http://s.x/weekly-fresh"].due == 0
    assert str(out["http://s.x/weekly-fresh"].next_due) == "2024-01-25"
    # changefreq is case-folded by the parser
    assert out["http://s.x/weekly-fresh"].changefreq == "weekly"
    assert out["http://s.x/never"].due == 0              # opted out
    assert out["http://s.x/never"].interval_days is None
    assert out["http://s.x/no-lastmod"].due == 1         # unknown age
    # missing changefreq -> default 7 days, 10th + 7 = 17th <= 20th
    assert out["http://s.x/no-freq"].due == 1
    assert out["http://s.x/no-freq"].interval_days == 7
