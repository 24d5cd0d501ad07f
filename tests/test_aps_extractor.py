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
