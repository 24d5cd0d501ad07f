"""BASE (oai-base-dc + splash pdf hunt) parity vs the reference
goldens (/root/reference/tests/test_base.py over tests/responses/base).
"""

import hashlib

import pytest

from hepcrawl_spark.extractors.base_dc import (
    extract_base_dc,
    extract_base_splash,
)

FIXTURE = "/root/reference/tests/responses/base/test_1.xml"
SPLASH = "/root/reference/tests/responses/base/test_1_splash.htm"

# md5 of the reference's golden abstract literal (test_base.py
# test_abstract) — pinned as a hash because the text carries
# soft-hyphen characters that do not survive copy-paste
ABSTRACT_MD5 = "a24baaa8d0c78a347bebc3bd0cba13cc"


@pytest.fixture(scope="module")
def record():
    with open(FIXTURE, "rb") as fh:
        records = extract_base_dc(fh.read())
    assert records
    return records[0]


def test_abstract(record):
    assert len(record["abstract"]) == 3116
    assert hashlib.md5(record["abstract"].encode()).hexdigest() == ABSTRACT_MD5


def test_title(record):
    assert record["title"] == (
        "The effect of ground-state spin on fission and "
        "quasi-fission anisotropies"
    )
    assert record["subtitle"] == "This is an optional subtitle"


def test_date_published(record):
    assert record["date_published"] == "2013-05-09"


def test_authors(record):
    authors = ["Butt, Rachel Deborah",
               "Butt Surname, Rachel Deborah Firstname"]
    assert len(record["authors"]) == len(authors)
    for index, name in enumerate(authors):
        assert record["authors"][index]["full_name"] == name


def test_urls(record):
    assert record["urls"] == [{"value": "http://hdl.handle.net/1885/10005"}]


def test_get_urls_and_splash_hop(record):
    # no direct pdf in the record → first link is the splash hop
    assert record["new_urls"] == ["http://hdl.handle.net/1885/10005"]


def test_thesis_and_collections(record):
    assert record["thesis"]["degree_type"] == "PhD"
    assert [c["primary"] for c in record["collections"]] == ["HEP", "THESIS"]


def test_splash_pdf(record):
    with open(SPLASH, "rb") as fh:
        splash = extract_base_splash(fh.read(), "http://www.example.com")[0]
    assert splash["file_urls"] == [
        "http://www.example.com/bitstream/1885/10005/1/Butt_R.D._2003.pdf"
    ]
