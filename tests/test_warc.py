"""WARC container source: round-trip + mis-split flagging."""

from pyspark.sql import functions as F

from hepcrawl_spark.sources import warc


def test_warc_round_trip(spark):
    rows = [
        (1, "https://a.example.com/x", "2026-08-19T00:00:01Z",
         "hello world"),
        (2, "https://b.example.com/y", "2026-08-19T00:00:02Z",
         "line one\r\nline two"),
        (3, "https://b.example.com/z", "2026-08-19T00:00:03Z", ""),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, url string, dt string, body string"
    )
    members = docs.select(
        F.lit(0).alias("file_id"), "doc_id",
        warc.build_warc_records(
            F.col("url"), F.col("dt"), F.col("body")
        ).alias("rec"),
    ).groupBy("file_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "rec"))),
                lambda s: s["rec"],
            ), ""
        ).alias("warc")
    )
    out = {
        r.target_uri: r
        for r in warc.parse_warc_records(members).collect()
    }
    assert len(out) == 3
    for _, url, dt, body in rows:
        r = out[url]
        assert r.payload == body
        assert r.warc_date == dt
        assert r.warc_type == "response"
        assert r.content_length == len(body) and r.length_ok


def test_warc_embedded_version_line_is_flagged(spark):
    # a payload that opens a line with the WARC version marker
    # mis-splits in text mode; the record must FLAG via length_ok,
    # never silently pass
    evil = "before\r\nWARC/1.0\r\nafter"
    docs = spark.createDataFrame(
        [(1, "https://a.example.com/x", "2026-08-19T00:00:01Z", evil)],
        "doc_id long, url string, dt string, body string",
    )
    members = docs.select(
        warc.build_warc_records(
            F.col("url"), F.col("dt"), F.col("body")
        ).alias("warc")
    )
    recs = warc.parse_warc_records(members).collect()
    assert not all(r.length_ok for r in recs)
