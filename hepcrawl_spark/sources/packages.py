"""Package expansion sources (SURVEY.md §2.1 S5/S6): zip/tar(.gz/.bz2)
payloads → exploded member documents.

The reference unpacks to local disk and yields ``file://`` requests
(utils.py:30-40 ``unzip_xml_files``; edp_spider.py:185-199 /
iop_spider.py:118-133 tar variants).  Distributed, the package is a
``binary`` column and members explode into new pages rows — one
Arrow-batched ``mapInPandas`` pass, in-memory zipfile/tarfile, no
local filesystem.

Idempotent re-extraction (the reference skips already-extracted
members, utils.py:36-38) is an anti-join of the member manifest
against the already-processed checkpoint table — relational, not
filesystem state.
"""

from __future__ import annotations

import io
import tarfile
import zipfile
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
)

MEMBER_SCHEMA = StructType([
    StructField("package_url", StringType()),
    StructField("member_path", StringType()),
    StructField("html", BinaryType()),
    StructField("error", StringType()),
])


def iter_zip_members(payload: bytes, suffix: str = ".xml"):
    """(member_path, bytes) for matching zip members — the in-memory
    analog of utils.py:30-40."""
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        for name in zf.namelist():
            if name.endswith(suffix):
                yield name, zf.read(name)


def iter_tar_members(payload: bytes, suffix: str = ".xml",
                     mode: str = "r:*"):
    """(member_path, bytes) for matching tar members (gz/bz2 auto) —
    the in-memory analog of edp_spider.py:185-199 /
    iop_spider.py:118-133."""
    with tarfile.open(fileobj=io.BytesIO(payload), mode=mode) as tf:
        for member in tf.getmembers():
            if member.isfile() and member.name.endswith(suffix):
                fh = tf.extractfile(member)
                if fh is not None:
                    yield member.name, fh.read()


def _detect_kind(url: str, payload: bytes) -> str:
    if payload[:4] == b"PK\x03\x04" or url.endswith(".zip"):
        return "zip"
    return "tar"


def expand_packages(packages: DataFrame, suffix: str = ".xml") -> DataFrame:
    """pages-like (url, html=package bytes) → exploded member rows
    (package_url, member_path, html, error).

    Per-package errors are captured, never raised (crawl continues —
    middlewares.py:28-35 behavior).
    """
    narrowed = packages.select("url", "html")

    def _expand(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {c: [] for c in MEMBER_SCHEMA.fieldNames()}
            for url, payload in zip(pdf["url"], pdf["html"]):
                data = bytes(payload) if payload is not None else b""
                try:
                    if _detect_kind(url or "", data) == "zip":
                        members = iter_zip_members(data, suffix)
                    else:
                        members = iter_tar_members(data, suffix)
                    for member_path, body in members:
                        cols["package_url"].append(url)
                        cols["member_path"].append(member_path)
                        cols["html"].append(body)
                        cols["error"].append(None)
                except Exception as exc:
                    cols["package_url"].append(url)
                    cols["member_path"].append(None)
                    cols["html"].append(None)
                    cols["error"].append(f"{type(exc).__name__}: {exc}")
            if cols["package_url"]:
                yield pd.DataFrame(cols, columns=MEMBER_SCHEMA.fieldNames())

    return narrowed.mapInPandas(_expand, MEMBER_SCHEMA)


def members_as_pages(members: DataFrame, fmt: str,
                     already_extracted: DataFrame | None = None) -> DataFrame:
    """Member rows → pages rows for the extraction round; optional
    anti-join against the already-extracted manifest (idempotence)."""
    pages = (
        members.filter(F.col("error").isNull())
        .select(
            F.concat_ws("#", "package_url", "member_path").alias("url"),
            "html",
            F.lit(fmt).alias("format"),
        )
    )
    if already_extracted is not None:
        pages = pages.join(
            already_extracted.select("url"), on="url", how="left_anti"
        )
    return pages
