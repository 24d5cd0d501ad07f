"""FilesPipeline analog (K5): materialize ``file_urls`` payloads.

The reference enables Scrapy's ``FilesPipeline``
(/root/reference/hepcrawl/settings.py:87-98: ``FILES_URLS_FIELD =
'file_urls'``, ``FILES_STORE``): every URL in a record's
``file_urls`` is downloaded and stored under
``full/<sha1(url)><ext>``, and the results land back on the item.

Spark-first shape: the "download" is a join of the exploded
``file_urls`` against the pages corpus (same J5 fetch seam as the
crawler — at cluster scale both sides bucket by url), the store write
happens executor-side per Arrow batch (no driver round-trip, no
collect), and the per-file results come back as a manifest DataFrame
(record url, file url, store path, md5 checksum, byte size) that
``attach_files`` folds onto the records as the ``files`` column —
Scrapy's ``FILES_RESULT_FIELD`` contract.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# sha1-of-url naming, Scrapy FilesPipeline parity
_EXT_RE = r"(\.[A-Za-z0-9]{1,5})(?:[?#].*)?$"


def files_manifest(records: DataFrame, pages: DataFrame,
                   url_col: str = "url",
                   files_field: str = "file_urls") -> DataFrame:
    """(record_url, file_url, store_path, checksum, n_bytes, html) for
    every requested file found in the corpus; missing urls keep a null
    checksum (Scrapy logs-and-skips a failed download)."""
    wanted = (
        records
        .filter(F.size(F.coalesce(F.col(files_field),
                                  F.array().cast("array<string>"))) > 0)
        .select(
            F.col(url_col).alias("record_url"),
            F.explode(files_field).alias("file_url"),
        )
    )
    corpus = pages.select(
        F.col("url").alias("file_url"), F.col("html")
    )
    fetched = wanted.join(corpus, on="file_url", how="left")
    return fetched.select(
        "record_url",
        "file_url",
        F.concat(
            F.lit("full/"),
            F.sha1(F.encode(F.col("file_url"), "UTF-8")),
            F.coalesce(F.regexp_extract("file_url", _EXT_RE, 1), F.lit("")),
        ).alias("store_path"),
        F.md5(F.col("html")).alias("checksum"),
        F.octet_length(F.col("html")).alias("n_bytes"),
        "html",
    )


def write_files(manifest: DataFrame, store_dir: str) -> DataFrame:
    """Write each file's bytes to ``store_dir/store_path`` on the
    executors (Arrow-batched, idempotent overwrite); returns the
    manifest without the payload column."""
    out_schema = ("record_url string, file_url string, "
                  "store_path string, checksum string, n_bytes long")

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import uuid

        for pdf in batches:
            for path, blob in zip(pdf["store_path"], pdf["html"]):
                if blob is None:
                    continue
                full = os.path.join(store_dir, path)
                os.makedirs(os.path.dirname(full), exist_ok=True)
                # task-unique tmp name: the same file_url can appear in
                # several records/partitions, and two tasks sharing one
                # tmp path would race (torn file or FileNotFoundError
                # at replace); with unique tmps the last atomic rename
                # wins and both writers produced identical bytes anyway
                tmp = "{}.tmp.{}.{}".format(
                    full, os.getpid(), uuid.uuid4().hex[:8]
                )
                with open(tmp, "wb") as fh:
                    fh.write(bytes(blob))
                os.replace(tmp, full)
            yield pdf.drop(columns=["html"])

    return manifest.mapInPandas(_write, out_schema)


def attach_files(records: DataFrame, written: DataFrame,
                 url_col: str = "url") -> DataFrame:
    """Fold per-file results back onto records as ``files`` —
    Scrapy's FILES_RESULT_FIELD (list of {url, path, checksum})."""
    grouped = (
        written.filter(F.col("checksum").isNotNull())
        .groupBy("record_url")
        .agg(F.collect_list(F.struct(
            F.col("file_url").alias("url"),
            F.col("store_path").alias("path"),
            F.col("checksum").alias("checksum"),
        )).alias("files"))
    )
    return records.join(
        grouped, records[url_col] == grouped["record_url"], how="left"
    ).drop("record_url")


def files_pipeline(records: DataFrame, pages: DataFrame,
                   store_dir: str, url_col: str = "url",
                   files_field: str = "file_urls") -> DataFrame:
    """records + pages corpus → records with ``files`` results, store
    populated.  One pass: explode → fetch join → executor write →
    group back."""
    written = write_files(
        files_manifest(records, pages, url_col, files_field), store_dir
    )
    return attach_files(records, written, url_col)
