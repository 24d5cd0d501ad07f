"""Boilerplate removal: main-content extraction from raw HTML.

jusText/boilerpipe-style block classification reduced to the two
signals that survive exact cross-engine mirroring: block text length
and link density.  The reference never needs this — its spiders
XPath specific record nodes out of publisher markup (e.g.
/root/reference/hepcrawl/spiders/wsp_spider.py projects only the
tagged metadata fields) — but a Common-Crawl-scale corpus pipeline
sees arbitrary pages, where nav bars, tag clouds, footers and
script/style payloads would otherwise flood every downstream quality
gate and dedup signal with template mass.

Pipeline per page (one codegen-free-of-Python projection):
1. drop ``<head>``, ``<script>`` and ``<style>`` elements with their
   content;
2. split what remains on block-level tag boundaries;
3. per block, compute the tag-stripped whitespace-collapsed text and
   the character mass of anchor bodies;
4. keep blocks with at least ``min_chars`` of text whose anchor mass
   stays at or below ``max_link_pct`` percent (integer
   cross-multiplication — no float compare to drift);
5. join survivors with newlines.

100 TB shape: everything is higher-order JVM expressions over the
page scan — no shuffle, no join, no Python, output cardinality =
input cardinality.  The block arrays live only inside the projection
(never materialized), so memory per row is bounded by page size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (?s) makes . span newlines in Java regex and RE2 alike; non-greedy
# bodies keep one element from eating the page
DROP_RE = r"(?s)<head.*?</head>|<script.*?</script>|<style.*?</style>"
# block-level boundaries; inline markup (<a>, <b>, <span>) stays
# inside its block
BLOCK_SPLIT_RE = (
    r"</?(?:p|div|li|h[1-6]|br|tr|td|th|ul|ol|table|section|article|"
    r"header|footer|nav|body|html)[^>]*>"
)
ANCHOR_BODY_RE = r"<a[^>]*>([^<]*)</a>"
TAG_RE = r"<[^>]*>"
# the tokenizer's explicit whitespace contract (textops.WS_CLASS):
# identical in Java regex, RE2 and Python re.  _WS_EDGE is the
# flagless form interpolated into the DuckDB mirrors; Spark-side
# trims use _WS_EDGE_J (``(?d)`` pins Java's ``$`` to end-of-text /
# final-\n semantics — see textops.WS_EDGE_J for the NEL/LS/PS seam)
_WS = r"[ \t\n\f\r]+"
_WS_EDGE = r"^[ \t\n\f\r]+|[ \t\n\f\r]+$"
_WS_EDGE_J = "(?d)" + _WS_EDGE


# page-metadata element patterns (t26); attribute order is fixed to
# the emitted-by-CMS convention the regex targets — a tolerant parser
# would need lookarounds RE2 lacks, so the contract is the strict form
TITLE_RE = r"(?s)<title[^>]*>([^<]*)</title>"
META_DESC_RE = r'<meta name="description" content="([^"]*)"'
CANONICAL_RE = r'<link rel="canonical" href="([^"]*)"'
OG_TITLE_RE = r'<meta property="og:title" content="([^"]*)"'
HTML_LANG_RE = r'<html[^>]*lang="([^"]*)"'


def page_metadata(
    pages: DataFrame,
    html_col: str = "html_str",
) -> DataFrame:
    """Add ``title`` / ``meta_description`` / ``canonical_url`` /
    ``og_title`` / ``html_lang`` extracted from raw HTML.

    The head-metadata surrogate record a webtext corpus attaches to
    every page at crawl time (title for display, description +
    og:title as document-summary candidates, canonical URL for the
    frontier's dedup identity, lang attribute as the cheap
    language-ID prior).  The reference extracts title/abstract via
    per-publisher XPath (e.g. /root/reference/hepcrawl/spiders/
    wsp_spider.py record projection); over arbitrary crawl pages the
    generic head elements are the only universally present analog.

    Missing elements yield ``''`` (both engines' regexp_extract
    no-match value), so downstream coalesce/gates need no NULL
    branch.  Title text is whitespace-collapsed and edge-trimmed with
    the contract class.  One Python-free projection over the page
    scan — no shuffle, no join; first-match semantics bound the work
    per row even on pathological pages.
    """
    h = F.col(html_col)
    title = F.regexp_replace(
        F.regexp_replace(F.regexp_extract(h, TITLE_RE, 1), _WS, " "),
        _WS_EDGE_J, "",
    )
    return pages.select(
        "*",
        title.alias("title"),
        F.regexp_extract(h, META_DESC_RE, 1).alias("meta_description"),
        F.regexp_extract(h, CANONICAL_RE, 1).alias("canonical_url"),
        F.regexp_extract(h, OG_TITLE_RE, 1).alias("og_title"),
        F.regexp_extract(h, HTML_LANG_RE, 1).alias("html_lang"),
    )


def _block_struct(b: Column) -> Column:
    """Per-block (txt, ac): collapsed tag-free text + anchor chars."""
    txt = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(b, TAG_RE, " "), _WS, " "),
        _WS_EDGE_J, "",
    )
    ac = F.aggregate(
        F.regexp_extract_all(b, F.lit(ANCHOR_BODY_RE), F.lit(1)),
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.length(t),
    )
    return F.struct(txt.alias("txt"), ac.alias("ac"))


def main_text(
    pages: DataFrame,
    html_col: str = "html_str",
    min_chars: int = 30,
    max_link_pct: int = 33,
    out_col: str = "main_text",
) -> DataFrame:
    """Add ``main_text`` + ``cand_blocks``/``kept_blocks`` counters.

    ``cand_blocks`` counts blocks with any text at all (the
    denominator a boilerplate-share metric wants); ``kept_blocks``
    counts survivors of both rules.  A page of pure boilerplate
    yields ``main_text = ''`` — downstream gates (Gopher min tokens)
    then drop it for free.
    """
    from hepcrawl_spark.operators.textops import bind_once

    body = F.regexp_replace(F.col(html_col), DROP_RE, " ")
    cand = F.filter(
        F.transform(F.split(body, BLOCK_SPLIT_RE), _block_struct),
        lambda s: s["txt"] != "",
    )

    def _keep(s):
        return (F.length(s["txt"]) >= F.lit(int(min_chars))) & (
            s["ac"] * 100 <= F.lit(int(max_link_pct))
            * F.length(s["txt"])
        )

    # bind the candidate array, then the survivor array, each exactly
    # once per row (codegen dedupes plain projections but NOT HOF
    # lambdas — textops.bind_once); every output column reads the
    # bound variables
    res = bind_once(cand, lambda c: bind_once(
        F.filter(c, _keep),
        lambda k: F.struct(
            F.array_join(F.transform(k, lambda s: s["txt"]), "\n")
            .alias("txt"),
            F.size(c).cast("long").alias("cand"),
            F.size(k).cast("long").alias("kept"),
        ),
    ))
    return pages.withColumn("_bp", res).select(
        "*",
        F.col("_bp.txt").alias(out_col),
        F.col("_bp.cand").alias("cand_blocks"),
        F.col("_bp.kept").alias("kept_blocks"),
    ).drop("_bp")


# soft-404 detection patterns (f29).  Case-insensitivity is done by
# lowercasing the column (NOT (?i): Java's (?i) is ASCII-only unless
# UNICODE_CASE while DuckDB/RE2's folds Unicode — lower() on both
# sides is the one portable spelling).  The phrase gap [^.]{0,40}
# tolerates "the page you requested was not found" phrasings while
# the sentence-bounded window keeps a long article that merely
# *mentions* page ... not found from matching across sentences.
SOFT404_TITLE_RE = r"404|not +found|page +unavailable"
SOFT404_PHRASE_RE = (
    r"(?:page|document|file|url)[^.]{0,40}?not (?:be )?found"
    r"|does not exist|no longer available|could not be found|error 404"
)


def soft404_flag(pages: DataFrame,
                 title_col: str = "title",
                 text_col: str = "text",
                 min_chars: int = 200) -> DataFrame:
    """Flag soft-404s: pages served with HTTP 200 whose CONTENT is an
    error page (Bar-Yossef et al., WWW 2004 "Sic transit gloria
    telae" — the dead-link half of web decay that status codes miss).

    Signals: ``nf_title`` (error-page title), ``nf_phrase``
    (not-found phrasing in the body), ``thin`` (body under
    ``min_chars``).  Verdict ``soft404 = nf_title OR (nf_phrase AND
    thin)`` — a title is authoritative; a body phrase alone needs the
    thin-page corroboration so a long article *discussing* 404s
    doesn't flag.

    Crawl role: soft-404 survivors poison both the link graph (they
    collect inlinks forever) and the corpus (thousands of identical
    "not found" bodies per host); the frontier drops them before
    extraction, the recrawl scheduler treats them as dead.  One
    codegen projection — no shuffle, no join, no Python.

    Reference analog: none (hepcrawl's publishers return real 4xx);
    this is the web-scale fetch-health gate.
    """
    lt = F.lower(F.col(title_col))
    lb = F.lower(F.col(text_col))
    nf_title = lt.rlike(SOFT404_TITLE_RE)
    nf_phrase = lb.rlike(SOFT404_PHRASE_RE)
    thin = F.length(F.col(text_col)) < min_chars
    return pages.select(
        "*",
        nf_title.cast("int").alias("nf_title"),
        nf_phrase.cast("int").alias("nf_phrase"),
        thin.cast("int").alias("thin"),
        (nf_title | (nf_phrase & thin)).cast("int").alias("soft404"),
    )
