"""Streaming extraction pipeline.

``stream_extract`` turns the batch extraction into a continuous one:
``readStream`` over a pages directory (new parquet files = newly
fetched WARC batches), the same Arrow extraction UDF, and a
``foreachBatch`` sink that reuses the batch writers — so batch and
streaming share one code path (the round engine's per-round body *is*
the batch function).

``stream_host_stats`` is the watermarked per-host fetch-metrics
aggregation (1-minute tumbling windows over ``warc_ts``, 10-minute
late-data watermark) — the streaming analog of the lineage/metrics
table (SURVEY.md §2.3 F8).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extract import extract_records
from ..schema import PAGES_WITH_FORMAT_SCHEMA


def read_pages_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int = 8) -> DataFrame:
    return (
        spark.readStream
        .schema(PAGES_WITH_FORMAT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_extract(pages_stream: DataFrame, checkpoint: str,
                   batch_fn: Optional[Callable[[DataFrame, int], None]] = None,
                   output_path: Optional[str] = None,
                   available_now: bool = True):
    """Continuous extraction.  Either a custom ``batch_fn(df, epoch)``
    or a parquet ``output_path`` sink; returns the StreamingQuery."""
    records = extract_records(pages_stream)

    if batch_fn is None:
        if output_path is None:
            raise ValueError("need batch_fn or output_path")

        def batch_fn(df: DataFrame, epoch: int) -> None:
            df.write.mode("append").parquet(output_path)

    writer = (
        records.writeStream
        .foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_host_stats(pages_stream: DataFrame,
                      window: str = "1 minute",
                      watermark: str = "10 minutes") -> DataFrame:
    """Watermarked per-host page counts + bytes over event time."""
    # no trailing slash (pathless URLs keep their host) and
    # case-insensitive scheme — consistent with the frontier's host
    # derivation in frontier/fingerprint.py
    host = F.regexp_extract(F.col("url"), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/]+)", 1)
    return (
        pages_stream
        .withColumn("url_host", host)
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "url_host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.octet_length("html")).alias("bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "url_host", "n_pages", "bytes",
        )
    )
