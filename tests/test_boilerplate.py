"""Boilerplate removal (t25): element drops, block split, link
density, min length, counters, and the Python-free plan."""

from hepcrawl_spark.operators import boilerplate
from hepcrawl_spark.operators.boilerplate import main_text

PROSE = ("This is the real article body with plenty of honest "
         "prose text for the classifier to keep.")


def _pages(spark, htmls):
    return spark.createDataFrame(
        [(i, h) for i, h in enumerate(htmls)],
        "doc_id long, html_str string",
    )


def test_main_text_keeps_prose_drops_chrome(spark):
    html = (
        "<html><head><title>T</title><style>p{c:red}</style></head>"
        '<body><div><a href="/">Home</a> <a href="/a">About</a></div>'
        '<script>var x = "<p>decoy</p>";</script>'
        f"<p>{PROSE}</p>"
        '<div>(c) 2026 <a href="/tos">Terms</a>'
        ' <a href="/p">Privacy</a></div></body></html>'
    )
    r = main_text(_pages(spark, [html])).collect()[0]
    assert r.main_text == PROSE          # decoy <p> in JS never leaks
    assert r.cand_blocks == 3 and r.kept_blocks == 1


def test_link_density_boundary_is_inclusive(spark):
    # 33 anchor chars in 100 text chars: 33*100 <= 33*100 -> kept
    anchor = "a" * 33
    pad = "b" * 66 + " "                  # 67 chars incl. the space
    html = f'<p><a href="/x">{anchor}</a> {pad[:-1]}</p>'
    # text = anchor + ' ' + 66 b's = 100 chars, ac = 33
    r = main_text(_pages(spark, [html])).collect()[0]
    assert len(r.main_text) == 100
    assert r.kept_blocks == 1
    # one more anchor char tips it over
    html2 = f'<p><a href="/x">{anchor}c</a> {pad[:-2]}</p>'
    r2 = main_text(_pages(spark, [html2])).collect()[0]
    assert len(r2.main_text.replace("\n", "")) in (0,)
    assert r2.kept_blocks == 0


def test_short_blocks_drop_and_join_order(spark):
    long_a = "First honest paragraph with enough length to pass."
    long_b = "Second honest paragraph, also long enough to stay."
    html = f"<p>{long_a}</p><p>tiny</p><p>{long_b}</p>"
    r = main_text(_pages(spark, [html])).collect()[0]
    assert r.main_text == f"{long_a}\n{long_b}"
    assert r.cand_blocks == 3 and r.kept_blocks == 2


def test_pure_boilerplate_page_yields_empty(spark):
    html = ('<div><a href="/1">One</a></div>'
            '<div><a href="/2">Two</a></div>')
    r = main_text(_pages(spark, [html])).collect()[0]
    assert r.main_text == "" and r.kept_blocks == 0


def test_plan_is_single_python_free_projection(spark):
    df = main_text(_pages(spark, ["<p>x</p>"]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "Exchange" not in plan and "Join" not in plan


def test_page_metadata_extracts_head_fields(spark):
    from hepcrawl_spark.operators.boilerplate import page_metadata

    html = (
        '<html lang="en"><head><title>My  Page </title>'
        '<meta name="description" content="a summary here">'
        '<link rel="canonical" href="http://ex.com/page">'
        '<meta property="og:title" content="OG Page">'
        "</head><body><p>body</p></body></html>"
    )
    r = page_metadata(_pages(spark, [html])).collect()[0]
    assert r.title == "My Page"            # collapse + edge trim
    assert r.meta_description == "a summary here"
    assert r.canonical_url == "http://ex.com/page"
    assert r.og_title == "OG Page"
    assert r.html_lang == "en"


def test_page_metadata_missing_elements_yield_empty(spark):
    from hepcrawl_spark.operators.boilerplate import page_metadata

    r = page_metadata(_pages(spark, ["<html><body>x</body></html>"]))\
        .collect()[0]
    assert (r.title, r.meta_description, r.canonical_url,
            r.og_title, r.html_lang) == ("", "", "", "", "")


def test_page_metadata_plan_is_python_free(spark):
    from hepcrawl_spark.operators.boilerplate import page_metadata

    df = page_metadata(_pages(spark, ["<p>x</p>"]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "Exchange" not in plan and "Join" not in plan


def test_soft404_title_authoritative_phrase_needs_thin(spark):
    long_pad = " The discussion continues at length." * 10
    rows = [
        # real error page: title + thin body → flagged
        (0, "404 Not Found", "The page was not found."),
        # long article QUOTING the phrase → reported, not flagged
        (1, "On link rot", "Browsers show page not found daily." + long_pad),
        # thin but benign → not flagged
        (2, "Stub", "Short note."),
        # error title alone flags even with a long body (title wins)
        (3, "Page Unavailable", "Padding text." + long_pad),
        # healthy page
        (4, "A fine read", "Plenty of healthy content here." + long_pad),
        # phrase must not match ACROSS sentences: 'page' and 'not
        # found' in different sentences stay unflagged
        (5, "Notes", "This page is fine. The cat was not found."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, title string, text string")
    r = {x.doc_id: x for x in boilerplate.soft404_flag(df).collect()}
    assert (r[0].nf_title, r[0].nf_phrase, r[0].thin, r[0].soft404) == (1, 1, 1, 1)
    assert (r[1].nf_phrase, r[1].soft404) == (1, 0)
    assert (r[2].nf_phrase, r[2].soft404) == (0, 0)
    assert (r[3].nf_title, r[3].thin, r[3].soft404) == (1, 0, 1)
    assert r[4].soft404 == 0
    assert (r[5].nf_phrase, r[5].soft404) == (0, 0)


def test_p18_drops_planted_error_pages(spark):
    # the composition removes every %17 error page before cleaning;
    # the %23 quote articles survive the gate (not thin)
    import __spark_entry__ as em

    out = em.queries()["p18_clean_soft404"](spark, "/root/testdata/sf0.001")
    ids = {r.doc_id for r in out.collect()}
    assert ids
    assert all(i % 17 != 0 for i in ids)
    assert any(i % 23 == 0 for i in ids)
