"""Rendezvous (HRW) crawler-shard assignment — the properties the
operator exists for, pinned over a wide synthetic host set."""

import pytest
from pyspark.sql import functions as F

from hepcrawl_spark.frontier import sharding


def _hosts(spark, n=2000):
    return spark.range(n).select(
        F.concat(F.lit("host-"), F.col("id").cast("string"),
                 F.lit(".example.com")).alias("host")
    )


def test_hrw_minimal_movement_and_no_survivor_hops(spark):
    # growing the fleet 8→9: only hosts whose NEW shard wins move
    # (expectation 1/9), and no host ever hops between two surviving
    # shards — the property plain hash(host)%N lacks (it moves ~8/9)
    rep = sharding.reshard_report(_hosts(spark), 8, 9).persist()
    agg = rep.agg(F.sum("moved").alias("m"), F.count("*").alias("n")
                  ).collect()[0]
    frac = agg.m / agg.n
    assert frac == pytest.approx(1 / 9, abs=0.03)
    assert rep.filter((F.col("moved") == 1)
                      & (F.col("shard_to") != 8)).count() == 0
    # mod-N movement on the same hosts, for contrast
    mod_moved = _hosts(spark).select(
        ((F.abs(F.hash("host")) % 8)
         != (F.abs(F.hash("host")) % 9)).cast("int").alias("m")
    ).agg(F.sum("m")).collect()[0][0]
    assert mod_moved / agg.n > 0.8
    rep.unpersist()


def test_hrw_balance(spark):
    # independent per-(host, shard) scores give near-uniform loads:
    # max/min shard load within 25% of each other at 2000 hosts / 8
    # shards (binomial spread, deterministic given the md5 fold)
    rep = sharding.reshard_report(_hosts(spark), 8, 9)
    loads = [r["count"]
             for r in rep.groupBy("shard_from").count().collect()]
    assert len(loads) == 8
    assert max(loads) / min(loads) < 1.25


def test_hrw_deterministic_and_salted(spark):
    rows = sharding.reshard_report(_hosts(spark, 50), 4, 4).collect()
    # same N on both sides → identity, nothing moves
    assert all(r.shard_from == r.shard_to and r.moved == 0 for r in rows)
    # a salt re-keys the whole assignment
    a = {r.host: r.shard_from
         for r in sharding.reshard_report(_hosts(spark, 200), 8, 8,
                                          salt="a").collect()}
    b = {r.host: r.shard_from
         for r in sharding.reshard_report(_hosts(spark, 200), 8, 8,
                                          salt="b").collect()}
    assert any(a[h] != b[h] for h in a)


def test_hrw_plan_is_shuffle_free_codegen(spark):
    # the argmax fold is a pure projection: no exchange, no explode,
    # no Python — the only shuffle in a real routing path is the
    # repartition the CALLER adds on the shard id
    df = sharding.reshard_report(_hosts(spark), 8, 9)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Generate" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_hrw_rejects_bad_shard_count():
    with pytest.raises(ValueError, match="positive"):
        sharding.hrw_shard(F.col("host"), 0)


def test_f36_registered():
    import __spark_entry__ as e
    assert "f36_reshard" in e.queries()
    assert "f36_reshard" in e.oracle_sql()
