"""APS (harvest JSON) parity vs the reference goldens
(/root/reference/tests/test_aps.py over tests/responses/aps)."""

import pytest

from hepcrawl_spark.extractors.json_aps import extract_json_aps

FIXTURE = "/root/reference/tests/responses/aps/aps_single_response.json"


@pytest.fixture(scope="module")
def record():
    with open(FIXTURE, "rb") as fh:
        records = extract_json_aps(fh.read())
    assert records
    return records[0]


def test_abstract(record):
    assert record["abstract"].startswith(
        "We use a popular fictional disease, zombies"
    )
    assert record["abstract"].endswith(
        "susceptibility of different geographical regions."
    )


def test_title(record):
    assert record["title"] == (
        "You can run, you can hide: The epidemiology and statistical "
        "mechanics of zombies"
    )


def test_date_published(record):
    assert record["date_published"] == "2015-11-02"


def test_page_nr(record):
    assert record["page_nr"] == ["11"]


def test_license(record):
    assert record["license"] == [{
        "license": "CC-BY-3.0",
        "url": "http://creativecommons.org/licenses/by/3.0/",
    }]


def test_dois(record):
    assert record["dois"][0]["value"] == "10.1103/PhysRevE.92.052801"


def test_collections(record):
    for coll in ["HEP", "Citeable", "Published"]:
        assert {"primary": coll} in record["collections"]


def test_collaborations(record):
    assert record["collaborations"] == [{"value": "OSQAR Collaboration"}]


def test_subjects(record):
    assert record["field_categories"] == [{
        "term": "Quantum Information", "scheme": "APS", "source": "",
    }]


def test_publication_info(record):
    assert record["journal_title"] == "Phys. Rev. E"
    assert record["journal_year"] == 2015
    assert record["journal_volume"] == "92"
    assert record["journal_issue"] == "5"


def test_authors(record):
    full_names = ["Alemi, Alexander A.", "Bierbaum, Matthew",
                  "Myers, Christopher R.", "Sethna, James P."]
    affiliation = ("Laboratory of Atomic and Solid State Physics, "
                   "Cornell University, Ithaca, New York 14853, USA")
    assert len(record["authors"]) == 4
    assert set(a["full_name"] for a in record["authors"]) == set(full_names)
    for author in record["authors"]:
        assert author["affiliations"][0]["value"] == affiliation


def test_copyrights(record):
    assert record["copyright_holder"] == "authors"
    assert record["copyright_year"] == "2015"
    assert record["copyright_statement"] == (
        "Published by the American Physical Society"
    )
    assert record["copyright_material"] == "Article"


# --- pagination: the rel=next walk (aps_spider.py:121-127) ---------------

def test_link_next_parses_rfc5988():
    from hepcrawl_spark.extractors.json_aps import link_next
    hdr = ('<https://api/v2/journals/articles?page=2>; rel="next", '
           '<https://api/v2/journals/articles?page=1>; rel="prev"')
    assert link_next(hdr) == "https://api/v2/journals/articles?page=2"
    assert link_next('<https://x/2>; rel=next') == "https://x/2"
    assert link_next('<https://x/1>; rel="prev first"') is None
    assert link_next("") is None


def test_pagination_new_urls():
    import json
    with open(FIXTURE, "rb") as fh:
        body = json.load(fh)
    body["Link"] = '<https://api/page2>; rel="next"'
    records = extract_json_aps(json.dumps(body).encode())
    assert records[0]["new_urls"] == ["https://api/page2"]


def test_pagination_empty_page_still_walks():
    import json
    payload = json.dumps({
        "data": [],
        "headers": {"Link": '<https://api/page3>; rel="next"'},
    }).encode()
    records = extract_json_aps(payload)
    assert records == [{"new_urls": ["https://api/page3"]}]


def test_pagination_flow_three_pages_to_exhaustion(spark):
    """Crawl a 3-page APS Link-header sequence to exhaustion: one
    seed, records harvested from every page (frontier walk through
    _expand_children, not a spider loop)."""
    import json

    from hepcrawl_spark.frontier.rounds import CrawlConfig, make_seeds, run_crawl

    with open(FIXTURE, "rb") as fh:
        base = json.load(fh)

    def page(n, last=False):
        body = dict(base)
        body["data"] = [dict(base["data"][0])]
        body["data"][0]["identifiers"] = {
            "doi": "10.1103/PhysRevE.92.0%d" % n
        }
        if not last:
            body["Link"] = (
                '<http://api.aps.test/articles?page=%d>; rel="next"' % (n + 1)
            )
        return ("http://api.aps.test/articles?page=%d" % n,
                json.dumps(body).encode(), "json-aps")

    rows = [page(1), page(2), page(3, last=True)]
    pages = spark.createDataFrame(rows, "url string, html binary, format string")
    seeds = make_seeds(spark, [(rows[0][0], "APS", 0)])
    summary = run_crawl(
        spark, seeds, pages,
        config=CrawlConfig(seen_mode="off", max_rounds=8),
    )
    assert summary["records"] == 3      # one article per page
    assert summary["scheduled"] == 3    # the walk visited every page
    assert summary["rounds"] == 3       # one committed round per page
