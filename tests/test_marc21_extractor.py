"""MARC21 (Hindawi) extraction parity vs the reference goldens
(/root/reference/tests/test_hindawi.py over tests/responses/hindawi)."""

import pytest

from hepcrawl_spark.extractors.marc21 import extract_marc21

FIXTURE = "/root/reference/tests/responses/hindawi/test_1.xml"


@pytest.fixture(scope="module")
def record():
    with open(FIXTURE, "rb") as fh:
        records = extract_marc21(fh.read())
    assert records
    return records[0]


def test_title(record):
    assert record["title"] == "“Pi of the Sky” Detector"


def test_date_published(record):
    assert record["date_published"] == "2010-01-26"


def test_authors(record):
    authors = ["Małek, Katarzyna", "Batsch, Tadeusz"]
    surnames = ["Małek", "Batsch"]
    affiliations = [
        "Center for Theoretical Physics Polish Academy of Sciences",
        "The Andrzej Soltan Institute for Nuclear Studies",
    ]
    astr = record["authors"]
    assert len(astr) == len(authors)
    for index in range(len(authors)):
        assert astr[index]["full_name"] == authors[index]
        assert astr[index]["surname"] == surnames[index]
        assert affiliations[index] in [
            aff["value"] for aff in astr[index]["affiliations"]
        ]


def test_source(record):
    assert record["source"] == "Hindawi Publishing Corporation"


def test_files(record):
    assert record["file_urls"] == [
        "http://downloads.hindawi.com/journals/aa/2010/194946.pdf"
    ]


def test_urls(record):
    assert record["urls"] == [
        {"value": "http://dx.doi.org/10.1155/2010/194946"}
    ]


def test_additional_files(record):
    af = record["additional_files"][0]
    assert af["url"] == "http://downloads.hindawi.com/journals/aa/2010/194946.xml"
    assert af["access"] == "INSPIRE-HIDDEN"


def test_collections(record):
    assert [c["primary"] for c in record["collections"]] == [
        "HEP", "Citeable", "Published"
    ]


def test_copyright(record):
    assert record["copyright_statement"] == (
        "Copyright \xa9 2010 Katarzyna Małek et al."
    )
    assert record["copyright_year"] == "2010"


def test_dois(record):
    assert record["dois"][0]["value"] == "10.1155/2010/194946"


def test_publication_info(record):
    assert record["journal_title"] == "Advances in Astronomy"
    assert record["journal_year"] == 2010
    assert record["journal_issue"] == "898351"


def test_license(record):
    assert record["license"] == [{
        "license": "CC-BY-3.0",
        "url": "http://creativecommons.org/licenses/by/3.0/",
    }]
