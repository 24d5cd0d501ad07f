"""Parameterized POST-form seed generators (SURVEY.md §2.1 S9).

The INFN and MIT thesis listings are behind POST query forms; the
reference POSTs the form, saves the response to a temp file and crawls
that (infn_spider.py:77-94, mit_spider.py:72-88).  Here the *seed
generator* is the distributed analog: it produces the frontier rows
for the listing request, with the form payload canonicalized into the
URL query string — the sandbox pages corpus (and a cluster fetch
layer) keys POST fetches by exactly this canonical URL, so the crawl
plumbing stays a pure url equi-join.

The form field sets are the byte-parity contract
(tests/test_html_theses.py::test_*_seed_generator).
"""

from __future__ import annotations

from typing import List, Tuple
from urllib.parse import urlencode

from pyspark.sql import DataFrame, SparkSession

from ..frontier.rounds import make_seeds

INFN_START_URL = "http://www.infn.it/thesis/index.php"
MIT_START_URL = "http://dspace.mit.edu/handle/1721.1/7695/browse"

# ``year`` is deliberately REQUIRED everywhere below.  The reference
# spiders default to ``date.today().year`` (infn_spider.py:78-84,
# mit_spider.py:70-78), but a frontier seed that silently changes on
# Jan 1 breaks resumable-crawl reproducibility — so the wall-clock
# default lives in the APPLICATION (scripts/submit_crawl.py resolves
# it once per job and records it in the job config), never in the
# library.


def infn_form_data(year: str) -> List[Tuple[str, str]]:
    """Parity: infn_spider.py:78-84 — given year, doctoral theses,
    unpaginated (all results)."""
    return [
        ("TESI[data_conseguimentoyy]", year),
        ("TESI[tesi_tipo]", "1"),       # Dottoral
        ("TESI[paginazione]", "0"),     # All results
    ]


def mit_form_data(year: str, n: int = 2) -> List[Tuple[str, str]]:
    """Parity: mit_spider.py:70-78 — year, sorted by date, n results
    per page (the reference's start_requests uses n=2)."""
    return [
        ("year", year),
        ("sort_by", "2"),               # sort by date
        ("rpp", str(n)),                # results per page
    ]


def listing_url(base_url: str, form_data: List[Tuple[str, str]]) -> str:
    """Canonical POST-listing URL: base + the form payload as a query
    string in form-field order."""
    return base_url + "?" + urlencode(form_data)


def infn_seeds(spark: SparkSession, year: str) -> DataFrame:
    return make_seeds(spark, [
        (listing_url(INFN_START_URL, infn_form_data(year)), "infn", 0)
    ])


def mit_seeds(spark: SparkSession, year: str, n: int = 2) -> DataFrame:
    return make_seeds(spark, [
        (listing_url(MIT_START_URL, mit_form_data(year, n)), "MIT", 0)
    ])
