"""NLM/IOP extraction parity vs the reference goldens
(/root/reference/tests/test_iop.py over tests/responses/iop)."""

import os

import pytest

from hepcrawl_spark.extractors.nlm import extract_nlm

FIXTURE = "/root/reference/tests/responses/iop/xml/test_standard.xml"
PDF_DIR = "/root/reference/tests/responses/iop/pdf/"


@pytest.fixture(scope="module")
def record():
    manifest = [os.path.join(PDF_DIR, f) for f in os.listdir(PDF_DIR)]
    with open(FIXTURE, "rb") as fh:
        records = extract_nlm(
            fh.read(), url="http://www.example.com/test.xml",
            pdf_manifest=manifest,
        )
    assert records
    return records[0]


def test_abstract(record):
    assert record["abstract"].startswith("Somatic BRAF mutation")


def test_title(record):
    assert record["title"] == (
        "A Modified Lynch Syndrome Screening Algorithm in Colon Cancer: "
        "BRAF Immunohistochemistry Is Efficacious and Cost Beneficial."
    )


def test_date_published(record):
    assert record["date_published"] == "2015-03"


def test_page_nr(record):
    assert record["journal_fpage"] == "336"
    assert record["journal_lpage"] == "343"


def test_free_keywords(record):
    keywords = ["BRAF", "MLH1", "Immunohistochemistry",
                "Cost-benefit analysis"]
    for kw in record["free_keywords"]:
        assert kw["source"] == "author"
        assert kw["value"] in keywords


def test_dois(record):
    assert record["dois"][0]["value"] == "110.1309/AJCP4D7RXOBHLKGJ"


def test_collections(record):
    for coll in record["collections"]:
        assert coll["primary"] in ["HEP", "Citeable", "Published"]


def test_publication_info(record):
    assert record["journal_title"] == "Am J Clin Pathol"
    assert record["journal_year"] == 2015
    assert record["journal_volume"] == "143"
    assert record["journal_issue"] == "3"
    assert record["journal_issn"][0] == "1943-7722"


def test_authors(record):
    names = ["Roth, Rachel M", "Hampel, Heather", "Arnold, Christina A",
             "Yearsley, Martha M", "Marsh, William L", "Frankel, Wendy L"]
    assert len(record["authors"]) == 6
    for index, name in enumerate(names):
        assert record["authors"][index]["full_name"] == name
    assert record["authors"][2]["affiliations"] == [
        {"value": "Department of Pathology, The Ohio State University "
                  "Wexner Medical Center, Columbus"},
        {"value": "Department of Microbiology, The Ohio State University "
                  "Wexner Medical Center, Columbus"},
    ]


def test_copyrights(record):
    assert record["copyright_holder"] == (
        "American Society for Clinical Pathology"
    )
    assert record["copyright_statement"] == (
        "Copyright\xa9 by the American Society for \n  Clinical Pathology"
    )


def test_files(record):
    assert record["additional_files"][1]["access"] == "INSPIRE-HIDDEN"
    assert record["additional_files"][1]["type"] == "Fulltext"
    assert record["additional_files"][1]["url"] == (
        PDF_DIR + "test_143_3_336.pdf"
    )


ERRATUM_BODY = b"""
<ArticleSet>
    <Article>
        <Journal>
            <PublisherName>Institute of Physics</PublisherName>
            <JournalTitle>J. Phys.: Conf. Ser.</JournalTitle>
            <Volume>143</Volume>
            <Issue>3</Issue>
        </Journal>
        <FirstPage LZero="save">336</FirstPage>
    <PublicationType>Published Erratum</PublicationType>
    </Article>
</ArticleSet>
"""


def test_erratum_open_access():
    manifest = [os.path.join(PDF_DIR, f) for f in os.listdir(PDF_DIR)]
    rec = extract_nlm(ERRATUM_BODY, pdf_manifest=manifest)[0]
    assert rec["additional_files"][1]["access"] == "INSPIRE-PUBLIC"
    assert rec["additional_files"][1]["type"] == "Erratum"


AHEAD_BODY = b"""
<ArticleSet>
    <Article>
        <Journal>
            <PubDate PubStatus="aheadofprint">
                <Year>2015</Year>
                <Month>03</Month>
            </PubDate>
        </Journal>
    </Article>
</ArticleSet>
"""


def test_not_published_record():
    assert extract_nlm(AHEAD_BODY) == []
