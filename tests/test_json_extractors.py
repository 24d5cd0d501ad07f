"""Brown and Philpapers JSON extractors parity vs reference goldens
(test_brown.py / test_phil.py over tests/responses/{brown,phil})."""

import json

import pytest

from hepcrawl_spark.extractors.json_brown import (
    extract_brown,
    extract_brown_splash,
)
from hepcrawl_spark.extractors.json_phil import (
    extract_phil,
    extract_phil_splash,
)

RESP = "/root/reference/tests/responses"


def _read(path):
    with open(path, "rb") as fh:
        return fh.read()


# --- Brown -----------------------------------------------------------------

@pytest.fixture(scope="module")
def brown():
    data = json.loads(_read(f"{RESP}/brown/test_1.json"))
    data["items"]["docs"][0]["uri"] = "brown/test_splash.html"
    return extract_brown(json.dumps(data).encode())[0]


@pytest.fixture(scope="module")
def brown_splash():
    return extract_brown_splash(
        _read(f"{RESP}/brown/test_splash.html"), "http://www.example.com"
    )[0]


def test_brown_title(brown):
    assert brown["title"] == (
        "The Electrostatic Field-Effect in Electrically Actuated Nanopores"
    )


def test_brown_urls_and_hop(brown):
    assert brown["urls"] == [{"value": "brown/test_splash.html"}]
    assert brown["new_urls"] == ["brown/test_splash.html"]


def test_brown_splash_fields(brown_splash):
    assert brown_splash["authors"][0]["full_name"] == "Jiang, Zhijun"
    assert brown_splash["date_published"] == "2011-01-01"
    assert brown_splash["file_urls"] == [
        "http://www.example.com/studio/item/bdr:11303/PDF/"
    ]
    assert brown_splash["page_nr"] == ["129"]
    assert brown_splash["thesis"]["date"] == "2011"
    assert brown_splash["thesis"]["institutions"][0]["name"] == (
        "Brown University"
    )


# --- Phil ------------------------------------------------------------------

@pytest.fixture(scope="module")
def phil_thesis():
    return extract_phil(_read(f"{RESP}/phil/test_thesis.json"))[0]


@pytest.fixture(scope="module")
def phil_journal():
    return extract_phil(_read(f"{RESP}/phil/test_journal.json"))[0]


def test_phil_title_and_date(phil_thesis):
    assert phil_thesis["title"] == "Bringing Goodness"
    assert phil_thesis["date_published"] == "2015-12-14"


def test_phil_abstract(phil_thesis):
    assert phil_thesis["abstract"].startswith(
        "Now indulgence dissimilar for his thoroughly has terminated."
    )
    assert phil_thesis["abstract"].endswith(
        "On am in nearer square wanted."
    )


def test_phil_thesis_authors(phil_thesis):
    assert [a["raw_name"] for a in phil_thesis["authors"]] == [
        "Jennings, Bob"
    ]
    assert phil_thesis["collections"] == [{"primary": "THESIS"}]


def test_phil_journal(phil_journal):
    assert phil_journal["journal_title"] == "Analys"
    assert phil_journal["journal_volume"] == "66"
    assert phil_journal["journal_issue"] == "3"
    assert [a["full_name"] for a in phil_journal["authors"]] == [
        "Jennings, Bob", "Frederik, Jensen"
    ]


def test_phil_splash_pdf(phil_thesis):
    splash = extract_phil_splash(
        _read(f"{RESP}/phil/fake_splash.html"),
        "http://philpapers.org/rec/SDFGSDFGDGSDF",
    )[0]
    assert splash["file_urls"] == [
        "http://philpapers.org/www.example.com/file.pdf"
    ]
