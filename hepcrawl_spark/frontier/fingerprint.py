"""URL canonicalization + fingerprinting for the frontier.

The URL-seen identity is ``xxhash64(canonical_url)`` (JVM-side hash —
deterministic, seed 42 = Spark default) over the w3lib-style canonical
form (reference identity: Scrapy request fingerprints over
``canonicalize_url``; hepcrawl/loaders.py:160-162).

Canonicalization itself is string surgery that needs Python semantics,
so it runs once per newly-discovered URL as an Arrow-vectorized pandas
UDF and is persisted on the frontier row — compute-once, reuse across
rounds.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from ..functions.textutils import canonicalize_url, url_host


@pandas_udf(StringType())
def canonical_url_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: canonicalize_url(u) if u else u)


@pandas_udf(StringType())
def url_host_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: url_host(u) if u else "")


def fingerprint_col(canon_url: Column) -> Column:
    """64-bit URL fingerprint (JVM xxhash64, no Python in the hot path)."""
    return F.xxhash64(canon_url)


def with_url_identity(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach canon_url / url_host / fingerprint columns."""
    canon = canonical_url_udf(F.col(url_col))
    return (
        df.withColumn("canon_url", canon)
          .withColumn("url_host", url_host_udf(F.col(url_col)))
          .withColumn("fingerprint", fingerprint_col(F.col("canon_url")))
    )


def content_seen_flag(df: DataFrame, content_col: str = "html",
                      order_col: str = "seq") -> DataFrame:
    """Mercator's content-seen test (Heydon & Najork 2001 §4.1):
    checksum the fetched document and flag every URL whose CONTENT an
    earlier fetch already carried — the same page served under many
    URLs (mirrors, session-id aliases, default-document '/index.html'
    vs '/') must be processed once, or the crawler re-extracts the
    same links and the dup trees multiply.  URL-seen (``seen.py``)
    cannot catch these: the URLs genuinely differ.

    Adds ``content_fp`` (md5 of the fetched bytes) and
    ``content_dup`` (true unless this row is the first owner of its
    checksum in ``order_col`` order — earlier fetch wins,
    deterministic).  ``order_col`` may be a single column name or a
    list of columns/expressions (``run_crawl`` passes the schedule's
    real fetch-order keys).  Callers gate *processing* (link
    extraction / child expansion) on the flag; the fetch itself
    already happened, exactly as in Mercator.

    100 TB shape: one window partitioned by the checksum — the
    highest-cardinality key in the system (near-unique per distinct
    document), so the shuffle is even and AQE's skew split covers the
    pathological all-identical corpus; the checksum itself is
    JVM-side codegen (``F.md5``), no Python.
    """
    order_cols = (
        list(order_col) if isinstance(order_col, (list, tuple))
        else [order_col]
    )
    w = Window.partitionBy("content_fp").orderBy(*order_cols)
    return (
        df.withColumn("content_fp", F.md5(F.col(content_col)))
        .withColumn("content_dup", F.row_number().over(w) > 1)
    )
