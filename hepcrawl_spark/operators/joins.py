"""Temporal joins over event streams.

``asof_join`` — for every left row, attach the latest right row with
the same key whose timestamp is at or before the left timestamp (the
"what was the state when this happened" join; SURVEY.md §2.6 notes
``warc_ts`` ordering gives the crawl corpus exactly this shape:
latest page snapshot per url as of a fetch).

Scale design: the naive formulation is an inequality join (cartesian
per key); the implementation here is the single-shuffle union trick —
tag both sides, union, one window partitioned by key ordered by
(ts, side) carrying the last right payload forward, then keep left
rows.  One hash shuffle on the key, no join, no range explosion; AQE
handles skewed keys like any other window partition and a mega-key can
additionally be range-bucketed like politeness ranking
(frontier/politeness.py per_host_rank) if one key dominates.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _null_struct(df: DataFrame, cols: Sequence[str]):
    """A typed NULL struct matching ``df.select(*cols)``."""
    inner = ",".join(
        f"{f.name}:{f.dataType.simpleString()}"
        for f in df.select(*cols).schema.fields
    )
    return F.lit(None).cast(f"struct<{inner}>")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    prefix: str = "asof_",
    right_seq: str | None = None,
) -> DataFrame:
    """Left as-of join: latest ``right`` row per key with
    ``right_ts <= left_ts`` (ties: the right row counts — state at
    time t includes an update stamped exactly t).

    ``right_seq`` names a right column that breaks ties between right
    rows sharing (key, ts) deterministically (highest wins); without
    it such ties are resolved arbitrarily, like SQL ASOF joins.

    Output: every ``left`` column, plus each requested right column as
    ``{prefix}{col}`` (null when no right row precedes the left row).
    """
    lcols = left.columns
    tagged_left = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_tie"),
        F.struct(*lcols).alias("_l"),
        _null_struct(right, right_cols).alias("_r"),
    )
    tagged_right = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        (F.col(right_seq).cast("long") if right_seq else F.lit(0).cast("long"))
        .alias("_tie"),
        _null_struct(left, lcols).alias("_l"),
        F.struct(*right_cols).alias("_r"),
    )
    # right sorts before left at equal _ts, so a right row stamped
    # exactly at left_ts is visible to that left row; among equal-ts
    # right rows the highest _tie sorts last and wins the carry
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_left.unionByName(tagged_right).withColumn(
        "_carry", F.last("_r", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in lcols],
        *[F.col(f"_carry.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int = 64,
) -> DataFrame:
    """Interval (range) join: every ``points`` row paired with every
    ``intervals`` row whose half-open [lo, hi) contains the point —
    the "which window/tier/block does this value fall in" join
    (IP→geo blocks, latency→SLA tier, ts→maintenance window).  Spark
    has no native interval join; the naive ``ON v >= lo AND v < hi``
    plans as BroadcastNestedLoopJoin (small side) or a cartesian —
    O(P·I) comparisons either way.

    This is the standard BUCKETIZED formulation: pick ``bucket_width``
    w, explode each interval into the ⌈len/w⌉ buckets it covers, map
    each point to bucket ⌊v/w⌋, EQUI-join on the bucket id, then
    post-filter the exact containment.  Comparisons drop from P·I to
    P·(intervals overlapping the point's bucket).

    100 TB shape: the equi-join hash-partitions on the bucket key —
    co-partitioned, AQE-skew-splittable, broadcastable when the
    exploded interval side is small; the explosion factor is
    len/w per interval, so set ``bucket_width`` near the MEDIAN
    interval length (w too small explodes the build side, w too big
    degenerates toward per-bucket cartesian).  Intervals may overlap
    — every containing interval matches (a genuine join, not a CASE
    bucketing).

    Degenerate intervals (hi <= lo: empty by half-open convention)
    are dropped before the explode — also keeping the bucket
    ``sequence`` ascending (Spark's sequence DESCENDS when lo > hi).
    Returns points ⋈ intervals columns; callers project.
    """
    v = F.col(point_col)
    lo, hi = F.col(lo_col), F.col(hi_col)
    iv = (
        intervals.filter(hi > lo)
        .withColumn(
            "_b",
            F.explode(F.sequence(
                F.floor(lo / bucket_width),
                F.floor((hi - 1) / bucket_width),
            )),
        )
    )
    pts = points.withColumn("_b", F.floor(v / bucket_width))
    return (
        pts.join(iv, on="_b", how="inner")
        .filter((v >= lo) & (v < hi))
        .drop("_b")
    )
