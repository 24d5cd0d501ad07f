"""WARC container source: Common-Crawl-style WARC members -> records.

The reference reads its corpus through container expansion — ZIP and
TAR packages split into member files before the format extractors run
(hepcrawl/spiders/wsp_spider.py ``untar_files`` analog in
sources/packages.py).  The container format of the open web corpus
this engine targets is WARC (ISO 28500): a crawl ships as *.warc.gz
files, each a concatenation of records ``WARC/1.0\\r\\n`` +
``Name: value`` header lines + blank line + payload block.  This
module is the WARC counterpart of the package expansion: one input
row per (decompressed) WARC member, exploded into one output row per
record with the standard header fields projected out.

All JVM-side, one narrow codegen pass: ``split`` on the version line
fans a member out to its records (no shuffle — record cardinality
only), ``instr``/``substring`` isolate the header block from the
payload, and anchored ``regexp_extract`` projects each header field.

Text-mode caveat, stated plainly: a faithful WARC reader walks
``Content-Length`` byte offsets; splitting on the version line is
exact whenever payloads do not themselves contain a line starting
``WARC/1.0`` (true for the HTML/text corpus this engine processes,
and checked here — ``parse_warc_records`` also emits ``length_ok``
comparing the declared Content-Length against the recovered payload,
so any mis-split is visible per record, not silent).

100 TB design: WARC members are the natural partition unit (Common
Crawl members are ~1 GB); the explode is per-row with no shuffle, so
the operator is scan-bound and AQE-splittable, and downstream
projections prune to the header fields without touching payloads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CRLF = "\r\n"
_VERSION_LINE = "WARC/1.0\r\n"
# split pattern is a REGEX on both engines' fast paths — escape the dot
_VERSION_SPLIT_RE = r"WARC/1\.0\r\n"


def _header_field(headers: Column, name: str) -> Column:
    """One WARC header value: everything after ``Name: `` up to the
    line end (``[^\\r\\n]*`` — identical in Java regex and RE2)."""
    return F.regexp_extract(headers, name + ": ([^\r\n]*)", 1)


def build_warc_records(url: Column, date: Column, payload: Column,
                       warc_type: str = "response") -> Column:
    """Serialize one WARC record (version line, the four standard
    headers, blank line, payload block, record separator) — the
    writer half used by the round-trip tests and the f17 oracle
    construction; byte-layout per ISO 28500 §4."""
    return F.concat(
        F.lit(_VERSION_LINE),
        F.lit("WARC-Type: " + warc_type + CRLF),
        F.lit("WARC-Target-URI: "), url, F.lit(CRLF),
        F.lit("WARC-Date: "), date, F.lit(CRLF),
        F.lit("Content-Length: "), F.length(payload).cast("string"),
        F.lit(CRLF + CRLF),
        payload,
        F.lit(CRLF + CRLF),
    )


def parse_warc_records(members: DataFrame, blob_col: str = "warc",
                       keep_cols: tuple = ()) -> DataFrame:
    """Explode WARC members into records: (*keep_cols, warc_type,
    target_uri, warc_date, content_length, payload, length_ok).

    ``content_length`` is the declared header value; ``length_ok``
    compares it against the recovered payload length so a payload
    that embeds a version line (the text-mode caveat above) flags
    its record instead of silently corrupting the stream.
    """
    rec = F.col("_rec")
    pos = F.instr(rec, CRLF + CRLF)
    headers = F.substring(rec, F.lit(1), pos - 1)
    payload = F.regexp_replace(
        F.substring(rec, pos + 4, F.length(rec)),
        CRLF + CRLF + "$", "",
    )
    # try_cast: a mis-split record (text-mode caveat) has no
    # Content-Length header — it must surface as null + length_ok
    # false, not fail the whole scan under ANSI
    clen = _header_field(headers, "Content-Length").try_cast("long")
    return (
        members.select(
            *[F.col(c) for c in keep_cols],
            F.explode(
                F.split(F.col(blob_col), _VERSION_SPLIT_RE)
            ).alias("_rec"),
        )
        .where(F.col("_rec") != "")
        .select(
            *keep_cols,
            _header_field(headers, "WARC-Type").alias("warc_type"),
            _header_field(headers, "WARC-Target-URI")
            .alias("target_uri"),
            _header_field(headers, "WARC-Date").alias("warc_date"),
            clen.alias("content_length"),
            payload.alias("payload"),
            (clen == F.length(payload)).alias("length_ok"),
        )
    )
