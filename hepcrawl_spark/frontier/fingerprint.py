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

from pyspark.sql import Column, DataFrame
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
