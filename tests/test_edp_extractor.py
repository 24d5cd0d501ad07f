"""EDP Sciences (jats + rich + references) parity vs the reference
goldens (/root/reference/tests/test_edp.py over tests/responses/edp).
"""

import pytest

from hepcrawl_spark.extractors.edp import (
    extract_edp_jats,
    extract_edp_rich,
    extract_edp_splash,
)
from hepcrawl_spark.sources.packages import iter_tar_members

RESP = "/root/reference/tests/responses/edp"


def _member_xml(package, suffix=".xml"):
    with open(package, "rb") as fh:
        return list(iter_tar_members(fh.read(), suffix))[0][1]


@pytest.fixture(scope="module")
def jats():
    records = extract_edp_jats(_member_xml(f"{RESP}/test_gz.tar.gz"))
    assert records
    return records[0]


@pytest.fixture(scope="module")
def rich():
    records = extract_edp_rich(_member_xml(f"{RESP}/test_rich.tar.bz2"))
    assert records
    return records[0]


def test_jats_title(jats):
    assert jats["title"] == (
        "Calculation of photo-nuclear reaction cross sections for O"
    )


def test_jats_abstract(jats):
    assert jats["abstract"].startswith(
        "Because of the high thermal expansion coefficient of uranium"
    )
    assert jats["abstract"].endswith("were used to get theoretical results.")


def test_jats_date_and_year(jats):
    assert jats["date_published"] == "2015-01-01"
    assert jats["journal_year"] == 2015


def test_jats_collections(jats):
    for coll in ["HEP", "ConferencePaper"]:
        assert {"primary": coll} in jats["collections"]


def test_jats_publication_info(jats):
    assert jats["journal_title"] == "EPJ Web of Conferences"
    assert jats["journal_artid"] == "01001"
    assert jats["journal_volume"] == "100"
    assert jats["journal_fpage"] == "1"
    assert jats["journal_lpage"] == "3"
    assert jats["journal_issue"] == "1"
    assert jats["page_nr"][0] == "3"
    assert jats["dois"][0]["value"] == "10.1051/epjconf/201510001001"


def test_jats_authors(jats):
    astr = jats["authors"]
    assert [a["full_name"] for a in astr] == [
        "Arasoglu, Ali", "Ozdemir, Omer Faruk"
    ]
    assert astr[0]["affiliations"][0]["value"] == (
        "Y\xfcz\xfcnc\xfc Yil University, Science Faculty, "
        "Physics Department"
    )


def test_jats_license_and_copyright(jats):
    assert jats["license"] == [{
        "license": "CC-BY-4.0",
        "url": "http://creativecommons.org/licenses/by/4.0/",
    }]
    assert jats["copyright_holder"] == (
        "Owned by the authors, published by EDP Sciences"
    )
    assert jats["copyright_statement"] == (
        "\xa9 Owned by the authors, published by EDP Sciences, 2015"
    )
    assert jats["copyright_year"] == "2015"
    assert jats["copyright_material"] == "Article"


def test_jats_open_access_hop(jats):
    # EPJ Web of Conferences is open access → dx.doi.org splash hop
    assert jats["new_urls"] == [
        "http://dx.doi.org/10.1051/epjconf/201510001001"
    ]


def test_rich_title(rich):
    assert rich["title"] == "A representative sample of Be stars"
    assert rich["subtitle"] == "II. $K$ band spectroscopy"


def test_rich_date_and_pages(rich):
    assert rich["date_published"] == "2000-01"
    assert rich["page_nr"][0] == "13"
    assert rich["journal_fpage"] == "65"
    assert rich["journal_lpage"] == "77"


def test_rich_collections(rich):
    for coll in ["HEP", "Published"]:
        assert {"primary": coll} in rich["collections"]


def test_rich_publication_info(rich):
    assert rich["journal_title"] == (
        "Astronomy and Astrophysics Supplement Series"
    )
    assert rich["journal_year"] == 2000
    assert rich["journal_volume"] == "141"


def test_rich_authors(rich):
    astr = rich["authors"]
    assert [a["full_name"] for a in astr] == ["Clark, J.S.", "Steele, I.A."]
    assert astr[0]["affiliations"][0]["value"] == (
        "Astronomy Centre, CPES, University of Sussex, Brighton, "
        "BN1 9QH, UK"
    )
    assert astr[1]["affiliations"][0]["value"] == (
        "Astrophysics Research Institute, Liverpool John Moores "
        "University, Liverpool, L41 1LD, UK"
    )


REF_BODY = b"""<article xmlns:xlink="http://www.w3.org/1999/xlink" xmlns:mml="http://www.w3.org/1998/Math/MathML" xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance" article-type="research-article" xml:lang="en" dtd-version="3.0">
    <back>
    <ref-list>
    <title>References</title>
        <ref id="R5"><label>5.</label><mixed-citation publication-type="journal" id="a"><string-name><given-names>R.V.</given-names> <surname>Krishnan</surname></string-name>, <string-name><given-names>G.</given-names> <surname>Panneerselvam</surname></string-name>, <string-name><given-names>P.</given-names> <surname>Manikandan</surname></string-name> <string-name><given-names>M.P.</given-names> <surname>Antony</surname></string-name>, <string-name><given-names>K.</given-names> <surname>Nagarajan</surname></string-name>, <source>J. Nucl. Radiochem. Sci.</source>, <volume>10</volume>.<issue>1</issue>, <fpage>19</fpage>\xe2\x80\x93<lpage>26</lpage> (<year>2009</year>).</mixed-citation></ref>
        <ref id="R44"><label>44.</label><mixed-citation publication-type="journal"><string-name><given-names>L.</given-names> <surname>Cronin</surname></string-name>, <string-name><given-names>P.</given-names> <surname>Sojka</surname></string-name>, <string-name><given-names>A.</given-names> <surname>Lefebvre</surname></string-name>, <source>SAE Technical Paper</source>, DOI: <ext-link ext-link-type="uri" xlink:href="http://dx.doi.org/10.4271/852086">10.4271/852086</ext-link>, (<year>1985</year>)</mixed-citation></ref>
        <ref id="R3"><label>3.</label><mixed-citation publication-type="book"><string-name><given-names>T.</given-names> <surname>Aliyev</surname></string-name>, <string-name><given-names>\xd0\xa2.</given-names> <surname>Belyaev</surname></string-name>, <string-name><given-names>S.</given-names> <surname>Gallagher</surname></string-name> <article-title>Simulation in ANSYS flow to the gas purification section of the multicomponent gas mixture through the dust cyclone CKBN GP-628</article-title>. <source>Mechanical engineering</source>, <publisher-loc>Moscow</publisher-loc>, \xe2\x84\x96<issue>10</issue>, (<year>2014</year>).</mixed-citation></ref>
    </ref-list>
    </back>
</article>"""


def test_references():
    refs = extract_edp_jats(REF_BODY)[0]["references"]
    first = refs[0]
    assert first["authors"] == [
        "Krishnan, R.V.", "Panneerselvam, G.", "Manikandan, P.",
        "Antony, M.P.", "Nagarajan, K.",
    ]
    assert first["doctype"] == "journal"
    assert first["fpage"] == "19"
    assert first["issue"] == "1"
    assert first["journal_title"] == "J. Nucl. Radiochem. Sci."
    assert first["journal_volume"] == "10"
    assert first["number"] == "5a"
    assert first["year"] == "2009"
    # byte parity incl. the re-injected root xmlns declarations
    assert first["raw_reference"].startswith(
        '<mixed-citation xmlns:xlink="http://www.w3.org/1999/xlink" '
        'xmlns:mml="http://www.w3.org/1998/Math/MathML" '
        'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance" '
        'publication-type="journal" id="a">'
    )
    assert refs[1]["doi"] == "doi:10.4271/852086"
    assert refs[2]["title"].startswith("Simulation in ANSYS flow")


def test_splash_pdf():
    body = b"""<html><body>
    <a href="/articles/epjconf/pdf/2015/01001.pdf">PDF</a>
    <a href="/other.html">other</a>
    </body></html>"""
    rec = extract_edp_splash(
        body, "http://dx.doi.org/10.1051/epjconf/201510001001"
    )[0]
    assert rec["additional_files"][0]["access"] == "INSPIRE-PUBLIC"
    assert rec["additional_files"][0]["url"].endswith("01001.pdf")
