"""Vectorized record extraction over the pages table.

One ``mapInPandas`` UDTF covers the entire extraction surface (SURVEY.md
§2.2/§2.4/§2.9): input Arrow batches of ``(url, html, format, ...)``,
output HEPRecord rows + ``new_urls`` (frontier expansion) + ``error``
(per-row error capture — errors never fail the job, matching the
reference's crawl-continues-on-error behavior,
/root/reference/hepcrawl/middlewares.py:28-35).

Everything row-wise happens *inside* the Arrow batch (documents must be
parsed one-by-one by nature); transfer and scheduling stay vectorized —
no per-row Python UDFs on the Spark plan.
"""

from __future__ import annotations

from typing import Iterable, Iterator, List

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DataType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructType,
)

from .extractors import get_extractor_entry
from .schema import EXTRACT_OUTPUT_SCHEMA, HEPRECORD_SCHEMA

_OUT_COLUMNS = EXTRACT_OUTPUT_SCHEMA.fieldNames()


def _conform_value(value, dtype: DataType):
    """Coerce an extracted Python value to the declared Spark type shape:
    drop unknown struct keys, fill missing ones with None, cast scalars."""
    if value is None:
        return None
    if isinstance(dtype, StructType):
        if isinstance(value, str):
            # schema-loose reference fields mix plain strings and
            # structs (e.g. field_categories: PoS emits strings,
            # arXiv emits {source,term,scheme}); coerce onto the
            # conventional value field
            target = next(
                (n for n in ("term", "value") if n in dtype.fieldNames()),
                None,
            )
            value = {target: value} if target else None
        if not isinstance(value, dict):
            return None
        return {
            f.name: _conform_value(value.get(f.name), f.dataType)
            for f in dtype.fields
        }
    if isinstance(dtype, ArrayType):
        if not isinstance(value, (list, tuple)):
            value = [value]
        return [_conform_value(v, dtype.elementType) for v in value]
    if isinstance(dtype, MapType):
        if isinstance(value, (list, tuple)):
            # loader accumulation wraps single map values in a list
            merged = {}
            for v in value:
                if isinstance(v, dict):
                    merged.update(v)
            value = merged
        if not isinstance(value, dict):
            return None
        return {str(k): _conform_value(v, dtype.valueType)
                for k, v in value.items()}
    if isinstance(dtype, StringType):
        return value if isinstance(value, str) else str(value)
    if isinstance(dtype, (IntegerType, LongType)):
        try:
            return int(value)
        except (TypeError, ValueError):
            return None
    return value


def conform_record(record: dict) -> dict:
    """Project a loose extractor dict onto HEPRECORD_SCHEMA exactly."""
    return {
        f.name: _conform_value(record.get(f.name), f.dataType)
        for f in HEPRECORD_SCHEMA.fields
    }


def _extract_batches(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        # columnar accumulation: one list per output column (a
        # list-of-row-dicts pd.DataFrame costs ~#cols dict lookups per
        # record in pandas — measured hot-path overhead at 10^7 pages)
        cols: dict = {c: [] for c in _OUT_COLUMNS}
        n = 0
        for url, html, fmt in zip(pdf["url"], pdf["html"], pdf["format"]):
            try:
                entry = get_extractor_entry(fmt)
                if entry is None:
                    raise ValueError(f"no extractor for format {fmt!r}")
                extractor, url_aware = entry
                payload = bytes(html) if html is not None else b""
                if url_aware:
                    records = extractor(payload, url)  # url-aware (splash)
                else:
                    records = extractor(payload)
                for rec in records:
                    row = conform_record(rec)
                    row["url"] = url
                    row["new_urls"] = rec.get("new_urls") or None
                    row["error"] = None
                    for c in _OUT_COLUMNS:
                        cols[c].append(row.get(c))
                    n += 1
            except Exception as exc:  # error capture, crawl continues
                for c in _OUT_COLUMNS:
                    cols[c].append(None)
                cols["url"][-1] = url
                cols["error"][-1] = f"{type(exc).__name__}: {exc}"
                n += 1
        if n:
            yield pd.DataFrame(cols, columns=_OUT_COLUMNS)


def extract_records(pages: DataFrame, default_format: str | None = None) -> DataFrame:
    """pages(url, html[, format]) → HEPRecord rows + new_urls + error.

    Column pruning: only url/html/format are shipped into the UDF; the
    scan never reads the other page columns (check ``ReadSchema`` in
    ``.explain``).
    """
    if "format" not in pages.columns:
        if default_format is None:
            raise ValueError("pages has no 'format' column and no default given")
        pages = pages.withColumn("format", F.lit(default_format))
    narrowed = pages.select("url", "html", "format")
    return narrowed.mapInPandas(_extract_batches, EXTRACT_OUTPUT_SCHEMA)


def split_records_errors(extracted: DataFrame):
    """(records_df, errors_df) — errors feed the lineage table."""
    records = extracted.filter(F.col("error").isNull()).drop("error")
    errors = extracted.filter(F.col("error").isNotNull()).select("url", "error")
    return records, errors
