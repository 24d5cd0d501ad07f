"""Streaming extraction: availableNow micro-batch over a pages dir."""

import pytest

from pyspark.sql import functions as F


def test_stream_extract(spark, tmp_path):
    from hepcrawl_spark.schema import PAGES_WITH_FORMAT_SCHEMA
    from hepcrawl_spark.sources.fixtures import fixture_rows
    from hepcrawl_spark.streaming.pipeline import (
        read_pages_stream,
        stream_extract,
    )

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "records")
    ckpt = str(tmp_path / "ckpt")

    batch = spark.createDataFrame(
        fixture_rows(["arxiv-oai"]), PAGES_WITH_FORMAT_SCHEMA
    )
    batch.write.parquet(pages_dir)

    stream = read_pages_stream(spark, pages_dir, max_files_per_trigger=2)
    assert stream.isStreaming
    q = stream_extract(stream, ckpt, output_path=out_dir)
    q.awaitTermination(120)

    records = spark.read.parquet(out_dir).filter(F.col("error").isNull())
    # same records the batch path produces (22 arXiv fixture records)
    assert records.count() == 22
    assert records.filter(F.col("title").isNotNull()).count() == 22

    # resume: a second availableNow run over the same checkpoint adds
    # nothing (exactly-once file-source tracking)
    q2 = stream_extract(
        read_pages_stream(spark, pages_dir), ckpt, output_path=out_dir
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).filter(
        F.col("error").isNull()
    ).count() == 22


def test_stream_host_stats(spark, tmp_path):
    from hepcrawl_spark.schema import PAGES_WITH_FORMAT_SCHEMA
    from hepcrawl_spark.sources.fixtures import fixture_rows
    from hepcrawl_spark.streaming.pipeline import (
        read_pages_stream,
        stream_host_stats,
    )

    pages_dir = str(tmp_path / "pages")
    spark.createDataFrame(
        fixture_rows(["arxiv-oai", "jats"]), PAGES_WITH_FORMAT_SCHEMA
    ).write.parquet(pages_dir)

    stats = stream_host_stats(read_pages_stream(spark, pages_dir))
    q = (
        stats.writeStream.format("memory").queryName("host_stats")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "select * from host_stats order by url_host"
    ).collect()
    hosts = {r.url_host for r in rows}
    assert "export.arxiv.org" in hosts
    assert all(r.n_pages > 0 and r.bytes > 0 for r in rows)
