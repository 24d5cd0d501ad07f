"""JATS (WSP) extraction parity vs the reference goldens.

Golden values are the reference's own spider tests
(/root/reference/tests/test_world_scientific.py) over the checked-in
fixture tests/responses/world_scientific/sample_ws_record.xml.
"""

import pytest

from hepcrawl_spark.extractors.jats import extract_jats

FIXTURE = ("/root/reference/tests/responses/world_scientific/"
           "sample_ws_record.xml")

ABSTRACT = (
    "CH$_{3}$NH$_{3}$PbX(X = Br, I, Cl) perovskites have recently been used as light absorbers in hybrid"
    " organic-inorganic solid-state solar cells, with efficiencies above 15%. To date, it is essential to"
    " add Lithium bis(Trifluoromethanesulfonyl)Imide (LiTFSI) to the hole transport materials (HTM) to get"
    " a higher conductivity. However, the detrimental effect of high LiTFSI concentration on the charge transport"
    ", DOS in the conduction band of the TiO$_{2}$ substrate and device stability results in an overall "
    "compromise for a satisfactory device. Using a higher mobility hole conductor to avoid lithium salt "
    "is an interesting alternative. Herein, we successfully made an efficient perovskite solar cell by "
    "applying a hole conductor PTAA (Poly[bis(4-phenyl) (2,4,6-trimethylphenyl)-amine]) in the absence of"
    " LiTFSI. Under AM 1.5 illumination of 100 mW/cm$^{2}$, an efficiency of 10.9% was achieved, which is "
    "comparable to the efficiency of 12.3% with the addition of 1.3 mM LiTFSI. An unsealed device without "
    "Li$^{+}$ shows interestingly a promising stability."
)


@pytest.fixture(scope="module")
def record():
    with open(FIXTURE, "rb") as fh:
        records = extract_jats(fh.read())
    assert len(records) == 1
    return records[0]


def test_abstract(record):
    assert record["abstract"] == ABSTRACT


def test_title(record):
    assert record["title"] == (
        "High-efficient Solid-state Perovskite Solar Cell Without "
        "Lithium Salt in the Hole Transport Material"
    )


def test_date_published(record):
    assert record["date_published"] == "2014-06-05"


def test_page_nr(record):
    assert record["page_nr"] == ["7"]


def test_free_keywords(record):
    expected = ["Perovskite CH$_{3}$NH$_{3}$PbI$_{3}$", "solar cell", "lithium"]
    for kw in record["free_keywords"]:
        assert kw["source"] == "author"
        assert kw["value"] in expected
        expected.remove(kw["value"])
    assert not expected


def test_license(record):
    assert record["license"] == [{
        "license": "CC-BY-4.0",
        "url": "https://creativecommons.org/licenses/by/4.0",
    }]


def test_dois(record):
    assert record["dois"][0]["value"] == "10.1142/S1793292014400013"


def test_collections(record):
    for coll in ["HEP", "Published"]:
        assert {"primary": coll} in record["collections"]


def test_collaborations(record):
    assert record["collaborations"] == [{"value": "Belle Collaboration"}]


def test_publication_info(record):
    assert record["journal_title"] == "NANO"
    assert record["journal_year"] == 2014
    assert record["journal_artid"] == "1440001"
    assert record["journal_volume"] == "9"
    assert record["journal_issue"] == "05"


def test_authors(record):
    names = ["BI, DONGQIN", "BOSCHLOO, GERRIT", "HAGFELDT, ANDERS"]
    affiliation = (
        "Department of Chemistry-Angstrom Laboratory, Uppsala University, "
        "Box 532, SE 751 20 Uppsala, Sweden"
    )
    xref_affiliation = (
        "Physics Department, Brookhaven National Laboratory, "
        "Upton, NY 11973, USA"
    )
    authors = record["authors"]
    assert len(authors) == 3
    for index, name in enumerate(names):
        assert authors[index]["full_name"] == name
        assert affiliation in [
            aff["value"] for aff in authors[index]["affiliations"]
        ]
    assert xref_affiliation in [
        aff["value"] for aff in authors[1]["affiliations"]
    ]


def test_copyrights(record):
    assert record["copyright_holder"] == "World Scientific Publishing Company"
    assert record["copyright_year"] == "2014"
    assert "copyright_statement" not in record
    assert record["copyright_material"] == "Article"


def test_spark_pipeline_jats(spark):
    """End-to-end through the Arrow extraction UDF."""
    from pyspark.sql import functions as F

    from hepcrawl_spark.extract import extract_records
    from hepcrawl_spark.sources.fixtures import fixture_pages

    recs = extract_records(fixture_pages(spark, formats=["jats"]))
    rows = recs.filter(F.col("error").isNull()).collect()
    assert len(rows) == 1
    assert rows[0].abstract == ABSTRACT
    assert [c.asDict() for c in rows[0].collections] == [
        {"primary": "HEP"}, {"primary": "Published"}
    ]
