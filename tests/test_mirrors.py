"""Mirror-host detection (f28): content-set overlap per host pair.

Planted layouts verify the flag threshold, the min_shared floor, the
stop-content cap and the deterministic keep-one rule.
"""

import pytest
from pyspark.sql import functions as F

from hepcrawl_spark.frontier import mirrors


def _pages(spark, rows):
    return spark.createDataFrame(rows, "host string, text string")


def test_full_mirror_flagged_partial_not(spark):
    rows = []
    for i in range(10):
        rows.append(("a.com", f"page-{i}"))
        rows.append(("b.com", f"page-{i}"))            # full mirror of a
        rows.append(("c.com", f"c-{i}"))
        rows.append(("d.com", f"c-{i}" if i < 5 else f"d-{i}"))  # half
    res = {(r.host_a, r.host_b): r for r in mirrors.mirror_host_pairs(
        _pages(spark, rows), min_shared=3, min_overlap_pct=80).collect()}
    ab = res[("a.com", "b.com")]
    assert (ab.shared, ab.n_a, ab.n_b, ab.flagged) == (10, 10, 10, 1)
    assert ab.overlap_pct == 100.0
    cd = res[("c.com", "d.com")]
    assert (cd.shared, cd.flagged) == (5, 0)       # 50% < the 80% bar
    assert set(res) == {("a.com", "b.com"), ("c.com", "d.com")}

    losers = {r.host for r in mirrors.mirror_losers(
        mirrors.mirror_host_pairs(
            _pages(spark, rows), min_shared=3, min_overlap_pct=80)
    ).collect()}
    assert losers == {"b.com"}                     # keep-smaller rule


def test_min_shared_floor(spark):
    rows = [("a.com", "x"), ("b.com", "x"),
            ("a.com", "y"), ("b.com", "z")]
    res = mirrors.mirror_host_pairs(
        _pages(spark, rows), min_shared=2).collect()
    assert res == []                               # 1 shared < floor 2


def test_boilerplate_cap_prunes_universal_content(spark):
    # a cookie-wall page served by every host would pair all hosts
    # quadratically; the df cap drops it from the index, and with it
    # the only shared content — no pairs survive
    rows = []
    for h in ("a.com", "b.com", "c.com", "d.com", "e.com"):
        rows.append((h, "cookie wall"))
        rows.append((h, f"own-{h}"))
    capped = mirrors.mirror_host_pairs(
        _pages(spark, rows), min_shared=1, max_content_df=3).collect()
    assert capped == []
    uncapped = mirrors.mirror_host_pairs(
        _pages(spark, rows), min_shared=1).collect()
    assert len(uncapped) == 10                     # all C(5,2) pairs


def test_p17_drops_only_the_losing_mirror_host(spark):
    # the composition keeps host h3 (half mirror, below the bar) and
    # removes every page of h1 (the flagged pair's larger member)
    import __spark_entry__ as em

    out = em.queries()["p17_clean_mirror_dedup"](
        spark, "/root/testdata/sf0.001")
    ids = {r.doc_id for r in out.collect()}
    assert ids
    assert all(i % 10 != 1 for i in ids)           # h1 fully dropped
    assert any(i % 10 == 3 for i in ids)           # h3 survives


def test_duplicate_urls_within_host_count_once(spark):
    # distinct (host, content): re-crawled duplicates of the same page
    # must not inflate shared counts
    rows = [("a.com", "x"), ("a.com", "x"), ("b.com", "x"),
            ("a.com", "y"), ("b.com", "y")]
    res = mirrors.mirror_host_pairs(
        _pages(spark, rows), min_shared=1).collect()
    assert len(res) == 1
    assert res[0].shared == 2 and res[0].n_a == 2
