"""Whole-corpus extraction smoke: every registered format over the
reference's complete fixture corpus through the Arrow UDF — zero
extraction errors, records from every record-bearing format."""

from pyspark.sql import functions as F


def test_full_corpus_extraction(spark):
    from hepcrawl_spark.extract import extract_records
    from hepcrawl_spark.sources.fixtures import fixture_pages

    pages = fixture_pages(spark)
    formats = {r.format for r in pages.select("format").distinct().collect()}
    assert len(formats) >= 17  # all format routes present in the corpus

    extracted = extract_records(pages).persist()
    errors = extracted.filter(F.col("error").isNotNull()).collect()
    assert errors == [], [(e.url, e.error) for e in errors]

    records = extracted.filter(F.col("error").isNull())
    assert records.count() >= 35  # 22 arXiv + one-plus per other format

    with_title = records.filter(F.col("title").isNotNull())
    # every record-bearing format yields titled records; listing-only
    # pages (mit/infn/t2k hops) legitimately carry none
    assert with_title.count() >= 30
    extracted.unpersist()
