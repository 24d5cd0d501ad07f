"""Crawler-shard assignment: rendezvous (HRW) hashing of hosts.

A distributed crawl partitions the frontier BY HOST across worker
shards (politeness state — per-host delays, robots cache, seen
filters — must be worker-local; cf. UbiCrawler, Boldi et al.,
Softw. Pract. Exper. 2004, which introduced consistent host
assignment for exactly this reason).  The reference crawler is
single-process (scrapyd schedules whole spiders,
hepcrawl/settings.py), so host→worker assignment has no counterpart
there; at fleet scale it is the first thing a coordinator needs.

Plain ``hash(host) % N`` reassigns ~(N-1)/N of all hosts when the
fleet grows by one worker — every politeness/seen state migrates.
Rendezvous hashing (highest-random-weight, Thaler & Ravishankar 1998)
instead scores every (host, shard) pair with an independent hash and
assigns the host to the argmax shard: growing N→N+1 moves exactly the
hosts whose new shard wins the score — 1/(N+1) of them in
expectation — and NO host moves between two surviving shards.

100 TB shape: the score argmax is a pure JVM fold
(``aggregate(sequence(0, N-1), …)``) over a per-row literal range —
no explode, no shuffle, no Python; whole-stage codegen keeps it
inside the scan projection.  The shard id then keys the
``repartition`` that routes frontier entries to their worker, which
is the only exchange in the path.  Hashes are the engine-portable
md5-prefix fold every sampler in this repo uses
(operators/textops.py:223 precedent), so assignments are
reproducible cross-engine and across restarts — a host's shard is a
pure function of (host, N, salt), never of cluster state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hrw_score(host: Column, shard: Column, salt: str) -> Column:
    """Independent per-(host, shard) weight: first 15 hex digits of
    md5(salt || host || ':' || shard) as a BIGINT — exact, portable
    (DuckDB: ('0x' || substr(md5(...), 1, 15))::BIGINT)."""
    key = F.concat(F.lit(salt), host, F.lit(":"), shard.cast("string"))
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def hrw_shard(host: Column, n_shards: int, salt: str = "") -> Column:
    """Rendezvous shard id for ``host`` among ``n_shards`` workers:
    argmax over shard ids of the (host, shard) score, ties to the
    smaller shard id.  Pure JVM fold — usable inside any projection.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    init = F.struct(
        F.lit(-1).cast("long").alias("s"),
        F.lit(-1).cast("int").alias("i"),
    )
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(n_shards - 1)),
        init,
        lambda a, i: F.when(
            _hrw_score(host, i, salt) > a["s"],
            F.struct(
                _hrw_score(host, i, salt).alias("s"),
                i.cast("int").alias("i"),
            ),
        ).otherwise(a),
    )["i"]


def reshard_report(hosts: DataFrame, n_from: int, n_to: int,
                   host_col: str = "host", salt: str = "") -> DataFrame:
    """Per-host view of a fleet resize ``n_from`` → ``n_to`` workers:
    (host, shard_from, shard_to, moved).  With rendezvous hashing the
    expected moved fraction is ``1 - min(n)/max(n)`` (= 1/(N+1) for
    N→N+1), and a host whose assignment survives never hops between
    two surviving shards — both properties are pinned in
    tests/test_sharding.py over a wide synthetic host set.
    """
    h = F.col(host_col)
    return hosts.select(
        h.alias("host"),
        hrw_shard(h, n_from, salt).alias("shard_from"),
        hrw_shard(h, n_to, salt).alias("shard_to"),
    ).withColumn(
        "moved",
        (F.col("shard_from") != F.col("shard_to")).cast("int"),
    )
