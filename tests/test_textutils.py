"""Scalar transform parity tests.

Golden values follow the reference's unit tests
(/root/reference/tests/test_utils.py, test_inputs.py) and the observed
semantics of hepcrawl/inputs.py + utils.py.
"""

from hepcrawl_spark.functions import textutils as T


def test_squash_whitespace():
    assert T.squash_whitespace("  foo\n\t bar  baz ") == "foo bar baz"


def test_subscripts_to_latex():
    assert T.subscripts_to_latex("H<sub>2</sub>O") == "H$_{2}$O"
    assert T.subscripts_to_latex("x<inf>i</inf>") == "x$_{i}$"
    assert T.subscripts_to_latex("e<sup>+</sup>") == "e$^{+}$"


def test_strip_tags_keep():
    assert T.strip_tags("<p>a <b>b</b> c</p>") == "a b c"
    assert T.strip_tags("<p>a <mi>x</mi></p>", keep=("mi",)) == "a <mi>x</mi>"
    assert T.strip_tags("<p>a</p><q>b</q>", which_ones=("p",)) == "a<q>b</q>"


def test_strip_tags_and_content():
    assert T.strip_tags_and_content(
        "<label><sup>1</sup></label>CERN", ("label",)
    ) == "CERN"


def test_collapse_initials():
    assert T.collapse_initials("T. A.") == "T.A."
    assert T.collapse_initials("T.- A.") == "T.A."
    assert T.collapse_initials("Tom") == "Tom"


def test_split_fullname():
    # reference: tests/test_utils.py split_fullname cases
    assert T.split_fullname("Doe, John Magic") == ("Doe", "John Magic")
    assert T.split_fullname("John Magic Doe") == ("Doe", "John Magic")
    assert T.split_fullname("John Magic, Doe", switch_name_order=True) == \
        ("Doe", "John Magic")
    assert T.split_fullname("John Magic Doe", switch_name_order=True) == \
        ("John", "Magic Doe")
    assert T.split_fullname("") == ("", "")


def test_fill_author():
    out = T.fill_author({"raw_name": "Doe, John"})
    assert out["surname"] == "Doe"
    assert out["given_names"] == "John"
    assert out["full_name"] == "Doe, John"
    out = T.fill_author({"surname": "Doe", "given_names": "J. M."})
    assert out["full_name"] == "Doe, J.M."
    out = T.fill_author({"surname": "Doe", "given_names": ""})
    assert out["full_name"] == "Doe"


def test_clean_affiliations():
    author = {"affiliations": [
        {"value": "<label><sup>1</sup></label><p>CERN,  Geneva</p>"},
    ]}
    assert T.clean_affiliations(author)["affiliations"][0]["value"] == \
        "CERN, Geneva"


def test_split_collaboration_author():
    # reference semantics: utils.py:202-224
    assert T.split_collaboration_author(" Planck Collaboration ") == \
        ("Planck", None)
    coll, author = T.split_collaboration_author(
        "John Smith for the ATLAS Collaboration"
    )
    assert coll == "ATLAS"
    assert author == "John Smith"
    coll, author = T.split_collaboration_author("On behalf of the CMS Collaboration")
    assert coll == "CMS"
    # institute guard: left untouched
    coll, author = T.split_collaboration_author("Institute for the development of things")
    assert coll == "Institute for the development of things"


def test_translate_language():
    # reference: tests/test_inputs.py:17 + mappings
    assert T.translate_language("en") is None
    assert T.translate_language("english") is None
    assert T.translate_language("fr") == "French"
    assert T.translate_language("ger") == "German"
    assert T.translate_language("klingon") == "Klingon"


def test_get_license():
    lic = T.get_license(license_url="https://creativecommons.org/licenses/by/3.0/")
    assert lic == [{"license": "CC-BY-3.0",
                    "url": "https://creativecommons.org/licenses/by/3.0/"}]
    lic = T.get_license(license_url="http://arxiv.org/licenses/nonexclusive-distrib/1.0/")
    assert lic == [{"license": "arXiv-1.0",
                    "url": "http://arxiv.org/licenses/nonexclusive-distrib/1.0/"}]
    lic = T.get_license(license_text="Creative Commons Attribution 4.0")
    assert lic[0]["license"] == "CC-BY-4.0"
    assert T.get_license() == []


def test_journal_and_section():
    assert T.journal_and_section("Physics Letters B") == ("Physics Letters", "B")
    assert T.journal_and_section("Nucl. Phys.") == ("Nucl. Phys.", "")
    assert T.journal_and_section("") == ("", "")


def test_range_as_string():
    assert T.range_as_string(["1981", "1982", "1985"]) == "1981-1982, 1985"
    assert T.range_as_string(["1981", "1982"]) == "1981-1982"
    assert T.range_as_string(["1981"]) == "1981"


def test_misc_helpers():
    assert T.has_numbers("abc1") is True
    assert T.has_numbers("abc") is False
    assert T.get_first([], "x") == "x"
    assert T.get_first(["a", "b"]) == "a"
    assert T.get_nested({"a": {"b": 1}}, "a", "b") == 1
    assert T.get_nested({"a": {}}, "a", "b") == ""
    d = T.build_dict([{"id": "x", "v": 1}, {"id": "y", "v": 2}], "id")
    assert d["y"]["v"] == 2 and d["y"]["index"] == 1
    assert T.parse_domain("http://www.example.com/path?q=1") == \
        "http://www.example.com/"


def test_strip_unsafe_attributes_escaping_idempotent():
    # plain > gets escaped, like lxml's text-node serialization
    assert T.strip_unsafe_attributes("E(QG2) > 4x10^10") == \
        "E(QG2) &gt; 4x10^10"
    # already-escaped entities round-trip unchanged (lxml parses them
    # before re-serializing) — never double-escape to &amp;amp;
    assert T.strip_unsafe_attributes("a &amp; b &gt; c") == \
        "a &amp; b &gt; c"
    assert T.strip_unsafe_attributes(
        T.strip_unsafe_attributes("x < y & z")
    ) == "x &lt; y &amp; z"
    # entity decode happens per text segment, never creating tags
    assert T.strip_unsafe_attributes("&lt;b&gt;keep&lt;/b&gt;") == \
        "&lt;b&gt;keep&lt;/b&gt;"
    # attribute stripping still applies inside real tags
    assert T.strip_unsafe_attributes(
        '<a href="x" onclick="evil()">t &amp; u</a>'
    ) == '<a href="x">t &amp; u</a>'


def test_fix_title_capitalization():
    assert T.fix_title_capitalization("THE QCD VACUUM AND ITS PROPERTIES") == \
        "The QCD Vacuum and its Properties"
    # mixed case untouched
    assert T.fix_title_capitalization("A mixed Case Title") == \
        "A mixed Case Title"


def test_canonicalize_url():
    assert T.canonicalize_url("HTTP://Example.com/a?b=2&a=1#frag") == \
        "http://example.com/a?a=1&b=2"
    assert T.canonicalize_url("http://example.com") == "http://example.com/"


def test_url_host():
    assert T.url_host("http://user:pw@Sub.Example.COM:8080/x") == "sub.example.com"
