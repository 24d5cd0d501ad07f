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

from .extractors import get_extractor
from .schema import EXTRACT_OUTPUT_SCHEMA, HEPRECORD_SCHEMA

_OUT_COLUMNS = EXTRACT_OUTPUT_SCHEMA.fieldNames()


def _conform_value(value, dtype: DataType):
    """Coerce an extracted Python value to the declared Spark type shape:
    drop unknown struct keys, fill missing ones with None, cast scalars."""
    if value is None:
        return None
    if isinstance(dtype, StructType):
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
        rows: List[dict] = []
        for url, html, fmt in zip(pdf["url"], pdf["html"], pdf["format"]):
            try:
                extractor = get_extractor(fmt)
                if extractor is None:
                    raise ValueError(f"no extractor for format {fmt!r}")
                payload = bytes(html) if html is not None else b""
                for rec in extractor(payload):
                    row = conform_record(rec)
                    row["url"] = url
                    row["new_urls"] = rec.get("new_urls") or None
                    row["error"] = None
                    rows.append(row)
            except Exception as exc:  # error capture, crawl continues
                row = {c: None for c in _OUT_COLUMNS}
                row["url"] = url
                row["error"] = f"{type(exc).__name__}: {exc}"
                rows.append(row)
        if rows:
            yield pd.DataFrame(rows, columns=_OUT_COLUMNS)


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
