"""Scalar text transforms — the per-field cleaning library.

Pure-Python, dependency-free (stdlib only) reimplementations of the
reference's cleaning semantics, observed from hepcrawl/inputs.py,
hepcrawl/utils.py and the public w3lib/scrapy helpers it calls.  These
run inside Arrow-batched extraction UDFs over whole record batches.

Each function's docstring cites the reference behavior it reproduces
(file:line in /root/reference) so parity can be checked; none of the
code is copied — the reference is Python 2 over lxml/w3lib, this is
stdlib Python 3.
"""

from __future__ import annotations

import html
import re
from itertools import groupby
from urllib.parse import (
    parse_qsl,
    quote,
    unquote,
    urlencode,
    urlparse,
    urlunparse,
)

from .wordlists import (
    ACRONYMS,
    LANGUAGE_NAMES,
    LICENSE_TEXT_URLS,
    LICENSE_URL_PREFIXES,
)

# --------------------------------------------------------------------------
# whitespace / markup cleanup
# --------------------------------------------------------------------------

_RE_TAG = re.compile(r"</?([^ >/]+).*?>", re.DOTALL | re.IGNORECASE)
_RE_SUB = re.compile(r"<sub>(.*?)</sub>")
_RE_INF = re.compile(r"<inf>(.*?)</inf>")
_RE_SUP = re.compile(r"<sup>(.*?)</sup>")


def squash_whitespace(text: str) -> str:
    """Collapse every whitespace run to a single space.

    Parity: hepcrawl/inputs.py:119-122 (clean_whitespace_characters).
    """
    return " ".join(text.split())


def subscripts_to_latex(text: str) -> str:
    """Rewrite ``<sub>/<inf>/<sup>`` markup into LaTeX ``$_{}$ / $^{}$``.

    Parity: hepcrawl/inputs.py:48-53.
    """
    text = _RE_SUB.sub(r"$_{\1}$", text)
    text = _RE_INF.sub(r"$_{\1}$", text)
    text = _RE_SUP.sub(r"$^{\1}$", text)
    return text


def strip_tags(text: str, which_ones=(), keep=()) -> str:
    """Remove tag markup, keeping content.

    With ``which_ones``: remove only those tags.  With ``keep``: remove
    all tags except those.  Tag names match case-insensitively.

    Parity: w3lib.html.remove_tags as used by hepcrawl/inputs.py:56-60
    (selective_remove_tags).
    """
    if which_ones and keep:
        raise ValueError("give either which_ones or keep, not both")
    which = {t.lower() for t in which_ones}
    kept = {t.lower() for t in keep}

    def _sub(m: re.Match) -> str:
        tag = m.group(1).lower()
        remove = tag in which if which else tag not in kept
        return "" if remove else m.group(0)

    return _RE_TAG.sub(_sub, text)


def strip_tags_and_content(text: str, which_ones=()) -> str:
    """Remove the listed tags together with everything inside them.

    Parity: w3lib.html.remove_tags_with_content as used by
    hepcrawl/inputs.py:102-111 (label prefixes in affiliations).
    """
    if not which_ones:
        return text
    pattern = "|".join(
        r"<%s\b.*?</%s>|<%s\s*/>" % (re.escape(t), re.escape(t), re.escape(t))
        for t in which_ones
    )
    return re.sub(pattern, "", text, flags=re.DOTALL | re.IGNORECASE)


# Attributes the lxml Cleaner(safe_attrs_only=True) retains; used to
# reproduce hepcrawl/inputs.py:137-145 (remove_attributes_from_tags).
_SAFE_ATTRS = frozenset(
    """abbr accept accept-charset accesskey action align alt axis border
    cellpadding cellspacing char charoff charset checked cite class clear
    cols colspan color compact coords datetime dir disabled enctype for
    frame headers height href hreflang hspace id ismap label lang longdesc
    maxlength media method multiple name nohref noshade nowrap prompt
    readonly rel rev rows rowspan rules scope selected shape size span src
    start summary tabindex target title type usemap valign value vspace
    width""".split()
)

_RE_FULL_TAG = re.compile(r"<(/?)([A-Za-z][\w:.-]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*?)(/?)>")
_RE_ATTR = re.compile(r"([\w:.-]+)(?:\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>]*))?")


def strip_unsafe_attributes(text: str) -> str:
    """Drop non-whitelisted attributes from any tags present, and
    XML-escape ``& < >`` in the text between tags.

    Parity: hepcrawl/inputs.py:137-145 (lxml ``Cleaner(safe_attrs_only=
    True).clean_html``).  The reference call *re-serializes* the value
    through lxml, so plain-text ``>`` comes back as ``&gt;`` (observable
    in the reference's own golden: tests/test_magic.py:95 keeps
    ``E(QG2) &gt; 4x10^10`` escaped in the final abstract).  The
    escaping applies to every field routed through the loader chains
    that include remove_attributes_from_tags (abstract/title/subtitle,
    loaders.py:78-110), not just ones carrying markup.
    """
    if not text:
        return text

    out = []
    pos = 0
    for m in _RE_FULL_TAG.finditer(text):
        out.append(_xml_escape_text(text[pos:m.start()]))
        close, name, attrs, selfclose = m.groups()
        if close:
            out.append("</%s>" % name)
        else:
            kept = []
            for am in _RE_ATTR.finditer(attrs or ""):
                aname, aval = am.group(1), am.group(2)
                if aname.lower() in _SAFE_ATTRS:
                    kept.append("%s=%s" % (aname, aval) if aval else aname)
            inner = (" " + " ".join(kept)) if kept else ""
            out.append("<%s%s%s>" % (name, inner, "/" if selfclose else ""))
        pos = m.end()
    out.append(_xml_escape_text(text[pos:]))
    return "".join(out)


def _xml_escape_text(segment: str) -> str:
    """lxml text-node serialization escapes exactly ``& < >`` —
    after PARSING, which resolves any entities already present.
    Decode-then-escape reproduces that round-trip and makes the
    escaping idempotent: ``&amp;`` stays ``&amp;`` instead of
    double-escaping to ``&amp;amp;``, exactly as the reference's
    ``Cleaner(...).clean_html`` serialization behaves."""
    return (
        html.unescape(segment)
        .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def fix_title_capitalization(title: str) -> str:
    """Capitalize an all-caps/all-lower title word-wise; keep known
    acronyms upper-case and words of ≤3 chars lower-case.

    Parity: hepcrawl/inputs.py:32-45.
    """
    if re.search("[A-Z]", title) and re.search("[a-z]", title):
        return title
    words = re.split(" +", title)
    out = [words[0].capitalize()]
    for word in words[1:]:
        if word.upper() in ACRONYMS:
            out.append(word.upper())
        elif len(word) > 3:
            out.append(word.capitalize())
        else:
            out.append(word.lower())
    return " ".join(out)


# --------------------------------------------------------------------------
# names / authors
# --------------------------------------------------------------------------

_RE_INITIALS = re.compile(r"([A-Z]\.)[\s\-]+(?=[A-Z]\.)")


def collapse_initials(name: str) -> str:
    """``"T. A." -> "T.A."`` — join spaced/hyphenated initials.

    Parity: hepcrawl/utils.py:78-82.
    """
    if len(name.split(".")) > 1:
        name = _RE_INITIALS.sub(r"\1", name)
    return name


def split_fullname(author: str, switch_name_order: bool = False):
    """Split a display name into (surname, given_names).

    Comma-separated names are surname-first; otherwise the last token is
    the surname (multi-part surnames without a comma are mis-split, as in
    the reference).  Parity: hepcrawl/utils.py:85-112.
    """
    if not author:
        return "", ""
    if "," in author:
        parts = [p.strip() for p in author.split(",")]
        surname_first = True
    else:
        parts = [p.strip() for p in author.split()]
        surname_first = False
    if switch_name_order:
        surname_first = not surname_first
    if surname_first:
        return parts[0], " ".join(parts[1:])
    return parts[-1], " ".join(parts[:-1])


def fill_author(value: dict) -> dict:
    """Complete an author dict: derive surname/given_names from raw_name,
    collapse initials, and build ``full_name = "Surname, Given"``.

    Parity: hepcrawl/inputs.py:63-80 (parse_authors).
    """
    if "raw_name" in value and "surname" not in value:
        value["surname"], value["given_names"] = split_fullname(value["raw_name"])
    if value.get("given_names"):
        value["given_names"] = collapse_initials(value["given_names"])
        value["full_name"] = "{0}, {1}".format(value["surname"], value["given_names"])
    else:
        value["full_name"] = value["surname"]
    return value


def fill_supervisor(value: dict) -> dict:
    """Author fill, keeping only full_name + affiliation.

    Parity: hepcrawl/inputs.py:83-89.
    """
    value = fill_author(value)
    return {
        "full_name": value.get("full_name"),
        "affiliation": value.get("affiliation"),
    }


def clean_affiliations(value: dict) -> dict:
    """Strip ``<label>…</label>`` prefixes (with content), then all other
    markup, then squash whitespace, for each affiliation of an author.

    Parity: hepcrawl/inputs.py:102-111.
    """
    for aff in value.get("affiliations", []):
        aff["value"] = strip_tags_and_content(aff["value"], ("label",))
        aff["value"] = strip_tags(aff["value"])
        aff["value"] = squash_whitespace(aff["value"])
    return value


_RE_FOR_THE = re.compile(r"\b(?:for|on behalf of|representing)\b", re.IGNORECASE)
_INST_PHRASES = ("for the development",)


def split_collaboration_author(coll: str):
    """Split a "Smith for the ATLAS Collaboration"-style string into
    (collaboration, author_or_None); strips the/collaboration(s) words.

    Parity: hepcrawl/utils.py:202-224 (coll_cleanforthe) including the
    institute-phrase guard and '.;' stripping.
    """
    author = None
    low = coll.lower()
    if any(p in low for p in _INST_PHRASES):
        return coll, author
    coll = coll.strip(".; ")
    if _RE_FOR_THE.search(coll):
        lead, trail = _RE_FOR_THE.split(coll, maxsplit=1)
        if re.search(r"\w", lead):
            author = lead.strip()
        if re.search(r"\w", trail):
            coll = trail
    coll = re.sub("(?i)^ *the ", "", coll)
    coll = re.sub("(?i) *collaborations? *", "", coll)
    return coll.strip(), author


def clean_collaboration(value: str) -> str:
    """Drop a literal "for the" prefix and strip.

    Parity: hepcrawl/inputs.py:114-116.
    """
    return value.replace("for the", "").strip()


# --------------------------------------------------------------------------
# languages / licenses / journals / misc
# --------------------------------------------------------------------------

_ENGLISH = frozenset({"en", "eng", "english"})


def translate_language(lang: str):
    """ISO code → English language name; English returns None (dropped).

    Parity: hepcrawl/inputs.py:125-134.
    """
    low = lang.lower()
    if low in _ENGLISH:
        return None
    return LANGUAGE_NAMES.get(low, lang.title())


def license_from_url(license_url: str):
    """Canonicalize a license URL into ``[{license, url}]``.

    Parity: hepcrawl/utils.py:266-279 — the matched prefix is rewritten
    to the canonical short name, keeping the version suffix.
    """
    if not license_url:
        return []
    license_str = ""
    for key, prefix in LICENSE_URL_PREFIXES.items():
        if key in license_url.lower():
            license_str = re.sub(
                "(?i)^.*%s" % re.escape(key), prefix, license_url.strip("/")
            )
            break
    return [{"license": license_str, "url": license_url}]


def license_from_text(license_text: str):
    """Map a free-text license phrase to its canonical URL form.

    Parity: hepcrawl/utils.py:282-290 (including its quirk that the
    *given text* must be a substring of the known phrase).
    """
    if not license_text:
        return []
    license = []
    for phrase, url in LICENSE_TEXT_URLS.items():
        if license_text.lower() in phrase.lower():
            license = license_from_url(url)
    return license


def get_license(license_url: str = "", license_text: str = ""):
    """URL first, fall back to text. Parity: hepcrawl/utils.py:244-263."""
    license = []
    if license_url:
        license = license_from_url(license_url)
    if not license and license_text:
        license = license_from_text(license_text)
    return license


def journal_and_section(publication: str):
    """Split a trailing section letter (A-E) off a journal title and drop
    "section" words.  Parity: hepcrawl/utils.py:227-241.
    """
    section = ""
    journal_title = ""
    sections = ("A", "B", "C", "D", "E")
    parts = [p for p in re.split(r"(\W+)", publication) if p]
    if parts:
        if parts[-1] in sections:
            section = parts.pop(-1)
        journal_title = "".join(
            w for w in parts if "section" not in w.lower()
        ).strip(", ")
    return journal_title, section


def parse_domain(url: str) -> str:
    """``scheme://netloc/`` of a URL. Parity: hepcrawl/utils.py:165-169."""
    u = urlparse(url)
    return "{0}://{1}/".format(u.scheme, u.netloc)


def has_numbers(text: str) -> bool:
    """Any digit present. Parity: hepcrawl/utils.py:172-174."""
    return any(c.isdigit() for c in text)


def range_as_string(data) -> str:
    """Group consecutive integers: ["1981","1982","1985"] → "1981-1982, 1985".

    Parity: hepcrawl/utils.py:177-190.
    """
    values = [int(i) for i in data]
    ranges = []
    for _, group in groupby(enumerate(values), lambda p: p[0] - p[1]):
        run = [item for _, item in group]
        if len(run) > 1:
            ranges.append("{0}-{1}".format(run[0], run[-1]))
        else:
            ranges.append(str(run[0]))
    return ", ".join(ranges)


def get_first(iterable, default=None):
    """Head-or-default. Parity: hepcrawl/utils.py:70-75."""
    if iterable:
        for item in iterable:
            return item
    return default


def get_nested(root, *keys):
    """Nested dict probe returning '' on a missing key.

    Parity: hepcrawl/utils.py:133-143.
    """
    if not keys:
        return root
    if keys[0] not in root:
        return ""
    return get_nested(root[keys[0]], *keys[1:])


def build_dict(seq, key):
    """Index a list of dicts by ``key`` (adds original position as
    ``index``).  Parity: hepcrawl/utils.py:146-151.
    """
    return dict((d[key], dict(d, index=i)) for i, d in enumerate(seq))


# --------------------------------------------------------------------------
# URL canonicalization (frontier fingerprint basis)
# --------------------------------------------------------------------------

_RESERVED_PATH = "/;:@&=+$,!*'()~"


def canonicalize_url(url: str, keep_fragments: bool = False) -> str:
    """Normalize a URL the way the frontier fingerprints it: lower-case
    scheme/host, sorted query parameters, normalized percent-encoding,
    fragment dropped, empty path → "/".

    Parity: w3lib/scrapy ``canonicalize_url`` semantics as used by
    hepcrawl/loaders.py:160-162 (urls_in) and Scrapy's request
    fingerprinting (the reference's URL-seen identity).
    """
    parts = urlparse(url.strip())
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    # normalize percent-encoding: decode then re-encode with a stable safe set
    path = quote(unquote(parts.path), safe=_RESERVED_PATH + "%")
    if not path:
        path = "/"
    params = quote(unquote(parts.params), safe=_RESERVED_PATH)
    query = urlencode(sorted(parse_qsl(parts.query, keep_blank_values=True)))
    fragment = parts.fragment if keep_fragments else ""
    return urlunparse((scheme, netloc, path, params, query, fragment))


def url_host(url: str) -> str:
    """Host (netloc without credentials/port) — the politeness key."""
    netloc = urlparse(url).netloc.lower()
    if "@" in netloc:
        netloc = netloc.rsplit("@", 1)[1]
    return netloc.split(":")[0]


def get_journal_and_section(publication: str):
    """Split a possible trailing section letter (A-E) off a journal
    title and drop "section" words.

    Parity: hepcrawl/utils.py:227-241.
    """
    section = ""
    journal_title = ""
    possible_sections = ["A", "B", "C", "D", "E"]
    try:
        split_pub = [p for p in re.split(r"(\W+)", publication) if p]
        if split_pub[-1] in possible_sections:
            section = split_pub.pop(-1)
        journal_title = "".join(
            word for word in split_pub if "section" not in word.lower()
        ).strip(", ")
    except IndexError:
        pass
    return journal_title, section
