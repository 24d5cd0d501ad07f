"""Experiment-website thesis extractors (HTML listings).

Reproduces the reference's small HTML spiders over lenient-parsed tag
soup (htmlsoup): ALPHA (alpha_spider.py), T2K (t2k_spider.py), MAGIC
(magic_spider.py), PHENIX (phenix_spider.py), MIT (mit_spider.py),
INFN (infn_spider.py).  Each format tag maps one listing page → its
thesis records; the two-hop variants (t2k/magic/infn/mit splash
pages) follow the enrichment-join flow like DNB/PoS.
"""

from __future__ import annotations

import re
from typing import List
from urllib.parse import urljoin

from . import register
from .htmlsoup import parse_html, text_content
from .recbuild import RecordBuilder

ALPHA_DOMAIN = "http://alpha.web.cern.ch/"

_RE_CLEAN = re.compile(r"[\n\t\xa0]")
_RE_DIGITS = re.compile(r"\d+")


def _class_is(el, value: str) -> bool:
    return el.get("class") == value


def _direct_texts(el) -> List[str]:
    out = []
    if el.text:
        out.append(el.text)
    for child in el:
        if child.tail:
            out.append(child.tail)
    return out


def _parse_alpha_author_data(thesis):
    """Parity: alpha_spider.py:66-93."""
    author_line = None
    for div in thesis.iter("div"):
        if _class_is(div, "field-item even"):
            for p in div.findall("p"):
                texts = _direct_texts(p)
                if any("Thesis" in t for t in texts):
                    author_line = texts[0]
                    break
    if author_line is None:
        return [], "", ""
    author_list = _RE_CLEAN.sub("", author_line).split(",")
    author = author_list[0]
    year = ""
    thesis_type = ""
    affiliation = ""
    for i in author_list:
        if "thesis" in i.lower():
            thesis_type = re.sub(r"thesis|Thesis", "", i).strip()
        if "university" in i.lower():
            affiliation = re.sub(r"[^A-Za-z\s]+", "", i).strip()
        if any(c.isdigit() for c in i):
            year = _RE_DIGITS.findall(i)[0].strip()
    authors = [{
        "raw_name": author,
        "affiliations": [{"value": affiliation}],
    }]
    return authors, thesis_type, year


def _alpha_abstract(thesis) -> str:
    """Non-empty paragraphs except the last (the author line) —
    parity: alpha_spider.py:95-103."""
    paragraphs = []
    for div in thesis.iter("div"):
        if _class_is(div, "field-item even"):
            ps = [
                p for p in div.findall("p")
                if text_content(p).strip() and _direct_texts(p)
            ]
            for p in ps[:-1]:
                paragraphs.extend(_direct_texts(p))
    return " ".join(paragraphs)


@register("html-alpha")
def extract_alpha(payload: bytes) -> List[dict]:
    # "Random <br>'s will create problems" (alpha_spider.py:117)
    payload = payload.replace(b"<br />", b"")
    root = parse_html(payload)
    out = []
    for thesis in root.iter("div"):
        if not _class_is(thesis, "node node-thesis"):
            continue
        authors, thesis_type, year = _parse_alpha_author_data(thesis)
        if "phd" not in thesis_type.lower():
            continue
        b = RecordBuilder()
        b.add("authors", authors)
        b.add("date_published", year)
        b.add("thesis", {"degree_type": thesis_type})

        titles, urls = [], []
        for div in thesis.iter("div"):
            if _class_is(div, "node-headline clearfix"):
                for a in div.iter("a"):
                    titles.extend(_direct_texts(a))
                    if a.get("href"):
                        urls.append(urljoin(ALPHA_DOMAIN, a.get("href")))
                        break
        b.add("title", titles)
        b.add("urls", urls[:1])

        b.add("abstract", _alpha_abstract(thesis))
        file_urls = [
            a.get("href")
            for span in thesis.iter("span") if _class_is(span, "file")
            for a in span.iter("a") if a.get("href")
        ]
        b.add("file_urls", file_urls)
        b.add("source", "Alpha experiment")
        b.add("collections", ["HEP", "THESIS"])
        out.append(b.build())
    return out


# ---------------------------------------------------------------------------
# T2K (t2k_spider.py): thesis table listing + splash page
# ---------------------------------------------------------------------------

from ..functions.textutils import split_fullname  # noqa: E402


def _tds(tr):
    return list(tr.iter("td"))


def _span_texts(el):
    out = []
    for span in el.iter("span"):
        for t in _direct_texts(span):
            if t.strip():
                out.append(t)
    return out


@register("html-t2k")
def extract_t2k(payload: bytes, url: str = "") -> List[dict]:
    """Listing rows → partial records + splash hop
    (t2k_spider.py:66-130)."""
    root = parse_html(payload)
    out = []
    for table in root.iter("table"):
        if table.get("id") != "folders":
            continue
        for tr in table.iter("tr"):
            tds = _tds(tr)
            if len(tds) < 4:
                continue
            authors = []
            for a in tds[1].iter("a"):
                for name in _span_texts(a):
                    surname, given_names = split_fullname(name)
                    authors.append({
                        "surname": surname, "given_names": given_names,
                    })
            title = _span_texts(tds[2])
            date = _span_texts(tds[3])
            splash = [
                urljoin(url, a.get("href").rstrip(".html"))
                for a in tds[0].iter("a") if a.get("href")
            ]
            b = RecordBuilder()
            b.add("authors", authors)
            b.add("date_published", date)
            b.add("thesis", {"degree_type": "PhD"})
            b.add("title", title)
            b.add("urls", splash)
            b.add("collections", ["HEP", "THESIS"])
            rec = b.build()
            rec["new_urls"] = splash[:1]
            out.append(rec)
    return out


@register("html-t2k-splash")
def extract_t2k_splash(payload: bytes, url: str = "") -> List[dict]:
    """Splash page → abstract + file links (t2k_spider.py:132-144)."""
    root = parse_html(payload)
    b = RecordBuilder()
    titles = [
        t for h1 in root.iter("h1")
        if _class_is(h1, "documentFirstHeading")
        for t in _direct_texts(h1)
    ]
    if titles:
        b.add("title", titles)
    abstract = [
        t for div in root.iter("div")
        if _class_is(div, "documentDescription description")
        for t in _direct_texts(div)
    ]
    b.add("abstract", abstract)
    files = [
        a.get("href") for a in root.iter("a")
        if _class_is(a, "contenttype-file state-internal url")
        and a.get("href")
    ]
    b.add("additional_files", [
        {"access": "HIDDEN", "description": "T2k",
         "url": urljoin(url, link), "type": "Fulltext"}
        for link in files
    ])
    return [b.build()]


# ---------------------------------------------------------------------------
# MAGIC (magic_spider.py): thesis list + splash page
# ---------------------------------------------------------------------------

@register("html-magic")
def extract_magic(payload: bytes, url: str = "") -> List[dict]:
    """Listing rows → title/date + splash hop
    (magic_spider.py:120-145)."""
    root = parse_html(payload)
    out = []
    for table in root.iter("table"):
        if table.get("class") != "list":
            continue
        for tr in table.iter("tr"):
            links = [a for a in tr.iter("a") if a.get("href")]
            if not links:
                continue
            title = links[0].text
            splash = [urljoin(url, a.get("href")) for a in links]
            tails = [
                br.tail for br in tr.iter("br")
                if br.tail and br.tail.strip()
            ]
            date = tails[1].strip().strip("()") if len(tails) > 1 else ""
            b = RecordBuilder()
            b.add("date_published", date)
            b.add("thesis", {"degree_type": "PhD"})
            b.add("title", title)
            b.add("urls", splash)
            b.add("collections", ["HEP", "THESIS"])
            rec = b.build()
            rec["new_urls"] = splash[:1]
            out.append(rec)
    return out


@register("html-magic-splash")
def extract_magic_splash(payload: bytes, url: str = "") -> List[dict]:
    """Splash → authors/affiliation, abstract, pdf links
    (magic_spider.py:66-92, 147-160)."""
    root = parse_html(payload)
    content = None
    for div in root.iter("div"):
        if div.get("id") == "content":
            content = div
            break
    b = RecordBuilder()
    if content is None:
        return [b.build()]

    affiliation = ""
    for h2 in root.iter("h2"):
        if "School" in text_content(h2):
            sib = h2
            parent_map = {c: p for p in root.iter() for c in p}
            parent = parent_map.get(h2)
            if parent is not None:
                found = False
                for child in parent:
                    if child is h2:
                        found = True
                        continue
                    if found and child.tag == "p":
                        strongs = [s.text for s in child.iter("strong")
                                   if s.text]
                        if strongs:
                            affiliation = strongs[0]
                        break
            break

    authors = []
    for p in content.findall("p"):
        if _class_is(p, "author"):
            for name in _direct_texts(p):
                surname, given_names = split_fullname(name)
                authdict = {"surname": surname, "given_names": given_names}
                if affiliation:
                    authdict["affiliations"] = [{"value": affiliation}]
                authors.append(authdict)
    b.add("authors", authors)

    titles = [t for h3 in content.findall("h3") for t in _direct_texts(h3)]
    if titles:
        b.add("title", titles)
    abstract = [
        t for p in content.findall("p") if _class_is(p, "abstract")
        for t in _direct_texts(p)
    ]
    b.add("abstract", abstract)

    file_paths = sorted({
        a.get("href")
        for p in content.findall("p") if _class_is(p, "url")
        for a in p.iter("a") if a.get("href")
    })
    b.add("additional_files", [
        {"access": "HIDDEN", "description": "Magic",
         "url": urljoin(url, link), "type": "Fulltext"}
        for link in file_paths
    ])
    return [b.build()]


# ---------------------------------------------------------------------------
# PHENIX (phenix_spider.py): single-hop thesis list
# ---------------------------------------------------------------------------

PHENIX_DOMAIN = "http://www.phenix.bnl.gov"
PHENIX_START_URL = "http://www.phenix.bnl.gov/WWW/talk/theses.php"


def _phenix_datablock(li):
    """Parity: phenix_spider.py:62-81."""
    texts = _direct_texts(li)
    datablock = texts[0]
    datalist = datablock.strip().split(",")
    thesis_type = "PhD" if "Ph.D." in datablock else None
    title = datablock.split('"')[1]
    datalist = [el for el in datalist if "archive" not in el]
    year = datalist.pop().strip()
    affline = datalist.pop().strip()
    stop_words = {"Ph.D.", "Master", "thesis", "at"}
    affiliation = " ".join(
        w for w in affline.split() if w not in stop_words
    )
    return title, year, affiliation, thesis_type


@register("html-phenix")
def extract_phenix(payload: bytes) -> List[dict]:
    root = parse_html(payload)
    out = []
    for table in root.iter("table"):
        for li in table.iter("li"):
            try:
                title, year, affiliation, thesis_type = _phenix_datablock(li)
            except IndexError:
                continue
            if not thesis_type:
                continue
            b = RecordBuilder()
            b.add("additional_files", [
                {"access": "HIDDEN", "description": "Phenix",
                 "url": urljoin(PHENIX_DOMAIN, a.get("href")),
                 "type": "Fulltext"}
                for a in li.iter("a") if a.get("href")
            ])
            b.add("authors", [
                {"raw_name": aut,
                 "affiliations": [{"value": affiliation}]}
                for bb in li.findall("b") for aut in _direct_texts(bb)
            ])
            b.add("date_published", year)
            b.add("thesis", {"degree_type": thesis_type})
            b.add("title", title)
            b.add("urls", [PHENIX_START_URL])
            b.add("source", "PHENIX")
            b.add("collections", ["HEP", "THESIS"])
            out.append(b.build())
    return out


# ---------------------------------------------------------------------------
# MIT (mit_spider.py): dspace listing + full-metadata splash
# ---------------------------------------------------------------------------

MIT_DOMAIN = "http://dspace.mit.edu/"

_RE_STRIP_YEARS = re.compile(r"(.*)\,\s\d{4}.?")
_RE_FULL_GIVEN = re.compile(r".?\((.*)\).?")


def _label_rows(root, label: str) -> List[str]:
    """//td[contains(text(), label)]/following-sibling::td[1]/text()"""
    out = []
    for tr in root.iter("tr"):
        tds = tr.findall("td")
        for i, td in enumerate(tds[:-1]):
            if label in (td.text or ""):
                out.extend(_direct_texts(tds[i + 1]))
                break
    return out


@register("html-mit")
def extract_mit(payload: bytes, url: str = "") -> List[dict]:
    """Listing page → splash links (mit_spider.py:185-191)."""
    root = parse_html(payload)
    out = []
    for ul in root.iter("ul"):
        if ul.get("class") != "ds-artifact-list":
            continue
        for li in ul.findall("li"):
            link = None
            for div in li.iter("div"):
                if _class_is(div, "artifact-title"):
                    for a in div.iter("a"):
                        if a.get("href"):
                            link = a.get("href")
                            break
                    break
            if not link:
                continue
            splash = urljoin(MIT_DOMAIN, link) + "?show=full"
            b = RecordBuilder()
            rec = b.build()
            rec["new_urls"] = [splash]
            out.append(rec)
    return out


@register("html-mit-splash")
def extract_mit_splash(payload: bytes, url: str = "") -> List[dict]:
    """Full-metadata page → thesis HEPRecord
    (mit_spider.py:193-223 build_item)."""
    root = parse_html(payload)
    doc_type = _label_rows(root, "dc.description.degree")
    if doc_type and "ph" not in doc_type[0].lower():
        return []

    b = RecordBuilder()
    pdf_files = [
        a.get("href")
        for table in root.iter("table") if table.get("id") == "file-table"
        for td in table.iter("td") for a in td.findall("a")
        if a.get("href")
    ]
    if pdf_files:
        b.add("additional_files", [
            {"access": "HIDDEN", "description": "MIT",
             "url": urljoin(MIT_DOMAIN, link), "type": "Fulltext"}
            for link in pdf_files
        ])

    affiliation = (_label_rows(root, "dc.contributor.department") or [None])[0]
    authors = []
    for author in _label_rows(root, "dc.contributor.author"):
        m = _RE_STRIP_YEARS.search(author)
        if m:
            author = m.group(1)
        surname, given_names = split_fullname(author)
        m = _RE_FULL_GIVEN.search(given_names)
        if m:
            given_names = m.group(1)
        authdict = {"surname": surname, "given_names": given_names}
        if affiliation:
            authdict["affiliations"] = [{"value": affiliation}]
        authors.append(authdict)
    b.add("authors", authors)

    b.add("date_published", _label_rows(root, "dc.date.issued"))
    b.add("thesis", {
        "date": (_label_rows(root, "dc.date.issued") or [None])[0],
        "institutions": [
            {"name": (_label_rows(root, "dc.publisher") or [None])[0]}
        ],
        "degree_type": "PhD",
    })
    supers = []
    for supervisor in _label_rows(root, "dc.contributor.advisor"):
        if "and" in supervisor:
            supers.extend(supervisor.split(" and "))
        else:
            supers.append(supervisor)
    b.add("thesis_supervisor", [{"raw_name": s} for s in supers])
    b.add("title", _label_rows(root, "dc.title"))
    b.add("urls", _label_rows(root, "dc.identifier.uri"))
    b.add("abstract", _label_rows(root, "dc.description.abstract"))
    b.add("copyright_statement", _label_rows(root, "dc.rights"))
    b.add("copyright_year", _label_rows(root, "dc.date.copyright"))
    page_nr_raw = _label_rows(root, "dc.format.extent")
    if page_nr_raw:
        b.add("page_nr", "".join(i for i in page_nr_raw[0] if i.isdigit()))
    b.add("collections", ["HEP", "THESIS"])
    return [b.build()]


# ---------------------------------------------------------------------------
# INFN (infn_spider.py): thesis listing + dettaglio splash
# ---------------------------------------------------------------------------

INFN_DOMAIN = "http://www.infn.it/thesis/"

from ..functions.dates import format_date  # noqa: E402


def _fix_node_text(text_nodes: List[str]) -> str:
    """Parity: infn_spider.py:96-103."""
    return " ".join(" ".join(text_nodes).split())


def _th_rows(root, label: str) -> List[str]:
    """//tr[./th[contains(text(), label)]]/td/text()"""
    out = []
    for tr in root.iter("tr"):
        ths = [t for t in tr.findall("th") if label in text_content(t)]
        if ths:
            for td in tr.findall("td"):
                out.extend(_direct_texts(td))
    return out


@register("html-infn")
def extract_infn(payload: bytes, url: str = "") -> List[dict]:
    """Listing rows → splash/pdf links (infn_spider.py:170-190)."""
    root = parse_html(payload)
    out = []
    for tr in root.iter("tr"):
        if tr.get("onmouseover") is None:
            continue
        pdf_links = []
        splash_link = ""
        for a in tr.iter("a"):
            link = a.get("href") or ""
            if "thesis_dettaglio.php" in link:
                splash_link = urljoin(INFN_DOMAIN, link)
            if "pdf" in link:
                pdf_links.append(link)
        b = RecordBuilder()
        if pdf_links and not splash_link:
            b.add("additional_files", [
                {"access": "HIDDEN", "description": "Infn",
                 "url": urljoin(INFN_DOMAIN, link), "type": "Fulltext"}
                for link in pdf_links
            ])
        rec = b.build()
        rec["new_urls"] = [splash_link] if splash_link else []
        if pdf_links and splash_link:
            rec["extra_data"] = {"pdf_links": ";".join(pdf_links)}
        out.append(rec)
    return out


@register("html-infn-splash")
def extract_infn_splash(payload: bytes, url: str = "") -> List[dict]:
    """Dettaglio page → thesis HEPRecord
    (infn_spider.py:192-240 scrape_splash + build_item)."""
    root = parse_html(payload)
    thesis_type = (_label_rows(root, "Tipo") or [""])[0]
    if "dottorato" not in thesis_type.lower():
        return []

    b = RecordBuilder()
    date_published = _th_rows(root, "aggiornamento")
    titles = _label_rows(root, "Titolo")
    abstracts = _label_rows(root, "Abstract")
    experiment = (_th_rows(root, "Esperimento") or [None])[0]

    given_names_raw = [
        t for span in root.iter("span")
        if span.get("id") == "autore_nome_text" for t in _direct_texts(span)
    ]
    surname_raw = [
        t for span in root.iter("span")
        if span.get("id") == "autore_cognome_text" for t in _direct_texts(span)
    ]
    university = _label_rows(root, "Universit")
    authdict = {}
    if given_names_raw:
        authdict["given_names"] = _fix_node_text(given_names_raw)
    if surname_raw:
        authdict["surname"] = _fix_node_text(surname_raw)
    if university:
        authdict["affiliations"] = [{"value": _fix_node_text(university)}]
    b.add("authors", [authdict])

    b.add("date_published", _fix_node_text(date_published))
    b.add("thesis", {
        "date": format_date(_fix_node_text(_label_rows(root, "Data conseguimento"))),
        "institutions": [{"name": _fix_node_text(university)}],
        "degree_type": "PhD",
    })
    b.add("thesis_supervisor", [
        {"raw_name": " ".join(s.split())}
        for s in _label_rows(root, "Relatore/i")
    ])
    b.add("title", titles)
    if url:
        b.add("urls", url)
    b.add("abstract", abstracts)
    pdf_links = [
        a.get("href") for tr in root.iter("tr")
        for td in tr.findall("td") for a in td.findall("a")
        if a.get("href")
    ]
    if pdf_links:
        b.add("additional_files", [
            {"access": "HIDDEN", "description": "Infn",
             "url": urljoin(INFN_DOMAIN, link), "type": "Fulltext"}
            for link in pdf_links
        ])
    if experiment:
        b.add("extra_data", {"experiment": experiment})
    b.add("source", "INFN")
    b.add("collections", ["HEP", "THESIS"])
    return [b.build()]
