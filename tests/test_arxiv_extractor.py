"""arXiv OAI extraction byte-parity vs the reference pytest goldens
(/root/reference/tests/test_arxiv_single.py and test_arxiv_all.py)."""

import pytest

from hepcrawl_spark.extractors.arxiv_oai import extract

FIXDIR = "/root/reference/tests/responses/arxiv"


def _load(name):
    with open(f"{FIXDIR}/{name}", "rb") as fh:
        return fh.read()


@pytest.fixture(scope="module")
def record():
    records = extract(_load("sample_arxiv_record0.xml"))
    assert len(records) == 1
    return records[0]


@pytest.fixture(scope="module")
def many():
    records = extract(_load("sample_arxiv_record.xml"))
    assert len(records) == 11
    return records


def test_abstract(record):
    assert record["abstract"] == (
        "We study the dynamics of quantum coherence under Unruh thermal noise "
        "and seek under which condition the coherence can be frozen in a "
        "relativistic setting. We find that the quantum coherence can not be "
        "frozen for any acceleration due to the effect of Unruh thermal noise. "
        "We also find that quantum coherence is more robust than entanglement "
        "under the effect of Unruh thermal noise and therefore the coherence "
        "type quantum resources are more accessible for relativistic quantum "
        "information processing tasks. Besides, the dynamic of quantum "
        "coherence is found to be more sensitive than entanglement to the "
        "preparation of the detectors' initial state and the atom-field "
        "coupling strength, while it is less sensitive than entanglement to "
        "the acceleration of the detector."
    )


def test_scalar_fields(record):
    assert record["title"] == (
        "Irreversible degradation of quantum coherence under relativistic motion"
    )
    assert record["preprint_date"] == "2016-01-13"
    assert record["page_nr"] == ["6"]
    assert record["pubinfo_freetext"] == "Phys.Rev. D93 (2015) 016005"
    assert record["source"] == "arXiv"


def test_structured_fields(record):
    assert record["dois"][0]["value"] == "10.1103/PhysRevD.93.016005"
    assert record["report_numbers"] == [{"value": "YITP-2016-26", "source": ""}]
    assert record["collaborations"] == [{"value": "Planck"}]
    assert record["license"] == [{
        "license": "CC-BY-3.0",
        "url": "https://creativecommons.org/licenses/by/3.0/",
    }]
    assert set(c["primary"] for c in record["collections"]) == \
        {"HEP", "Citeable", "arXiv", "ConferencePaper"}
    assert record["public_notes"][0] == {
        "source": "arXiv", "value": "6 pages, 4 figures, conference paper",
    }
    assert record["arxiv_eprints"][0]["value"] == "1601.03238"
    assert record["arxiv_eprints"][0]["categories"] == \
        ["quant-ph", "gr-qc", "hep-th"]
    assert record["external_system_numbers"][0] == {
        "institute": "arXiv", "value": "oai:arXiv.org:1601.03238",
    }
    assert [a["full_name"] for a in record["authors"]] == \
        ["Wang, Jieci", "Tian, Zehua", "Jing, Jiliang", "Fan, Heng"]


def test_many_collaborations(many):
    expected = [
        ["Planck"], ["IceCube"], ["JLQCD"], ["NuPRISM", "Hyper-K"],
        ["BICEP2", "Keck Array"], ["Planck"], ["DES"], [],
        ["Super-Kamiokande"], ["CMS"], [],
    ]
    for rec, exp in zip(many, expected):
        got = [c["value"] for c in rec.get("collaborations", [])]
        assert got == exp


def test_many_page_nr_and_doctype(many):
    page_nrs = [["6"], ["8"], ["10"], ["11"], None, ["4"], ["8"], ["24"],
                ["23"], None, None]
    doctypes = ["ConferencePaper"] * 4 + ["", "ConferencePaper", "", "", "",
                "ConferencePaper", "Thesis"]
    for rec, pages, doctype in zip(many, page_nrs, doctypes):
        if pages:
            assert rec["page_nr"] == pages
        expected = {"HEP", "Citeable", "arXiv"} | ({doctype} if doctype else set())
        assert set(c["primary"] for c in rec["collections"]) == expected


def test_many_authors_and_affiliations(many):
    # spot-check the two hardest records: multi-part surname with comma and
    # the affiliation-rich Super-K record (reference test_arxiv_all.py:134-180)
    saxton = many[7]
    assert [a["full_name"] for a in saxton["authors"]] == \
        ["Saxton Walton, Curtis J.", "Younsi, Ziri", "Wu, Kinwah"]
    assert [[af["value"] for af in a["affiliations"]]
            for a in saxton["authors"]] == \
        [["Technion", "DESY"], ["U.Frankfurt"], []]

    superk = many[8]
    assert [a["full_name"] for a in superk["authors"]] == \
        ["Abe, K.", "Suzuki, Y.", "Vagins, M.R.", "Nantais, C.M.",
         "Martin, J.F.", "de Perio, P."]
