"""Package expansion (zip/tar → member pages) over the reference's
own fixture packages (elsevier zips, edp tarballs, iop tar.gz)."""

import pytest

from pyspark.sql import functions as F

from hepcrawl_spark.sources.packages import (
    expand_packages,
    iter_tar_members,
    iter_zip_members,
    members_as_pages,
)

ELSEVIER_ZIP = "/root/reference/tests/responses/elsevier/fake_astropart.zip"
EDP_GZ = "/root/reference/tests/responses/edp/test_gz.tar.gz"
EDP_BZ2 = "/root/reference/tests/responses/edp/test_rich.tar.bz2"
IOP_GZ = "/root/reference/tests/responses/iop/packages/test.tar.gz"


def _read(path):
    with open(path, "rb") as fh:
        return fh.read()


def test_zip_members():
    members = list(iter_zip_members(_read(ELSEVIER_ZIP), ".xml"))
    assert members
    assert all(name.endswith(".xml") for name, _ in members)
    assert all(body.lstrip().startswith(b"<") for _, body in members)


def test_tar_gz_members():
    members = list(iter_tar_members(_read(EDP_GZ), ".xml"))
    assert members
    assert all(name.endswith(".xml") for name, _ in members)


def test_tar_bz2_members():
    members = list(iter_tar_members(_read(EDP_BZ2), ".xml"))
    assert members


def test_tar_pdf_members():
    members = list(iter_tar_members(_read(IOP_GZ), ".pdf"))
    assert [name for name, _ in members] == [
        "1943-7722/143/3/336/test_143_3_336.pdf"
    ]


def test_expand_packages_spark(spark):
    pkgs = spark.createDataFrame(
        [
            ("ftp://example.org/fake_astropart.zip",
             bytearray(_read(ELSEVIER_ZIP))),
            ("ftp://example.org/test_gz.tar.gz", bytearray(_read(EDP_GZ))),
            ("ftp://example.org/broken.zip", bytearray(b"not a package")),
        ],
        "url string, html binary",
    )
    members = expand_packages(pkgs, suffix=".xml")
    rows = members.collect()
    good = [r for r in rows if r.error is None]
    bad = [r for r in rows if r.error is not None]
    assert good and len(bad) == 1  # errors captured, never raised
    assert bad[0].package_url == "ftp://example.org/broken.zip"

    pages = members_as_pages(members, fmt="jats")
    assert pages.filter(F.col("url").contains("#")).count() == len(good)

    # idempotence: anti-join against already-extracted manifest
    done = pages.select("url").limit(1)
    remaining = members_as_pages(members, fmt="jats", already_extracted=done)
    assert remaining.count() == len(good) - 1
