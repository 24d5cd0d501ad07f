"""Best-of-N A/B timing for the queries the single-shot driver bench
flagged as regressed round-over-round (r2 set: s01 +73%, t04 +95%,
d04 +35%, d03 +26%, q01 +14%; r3 set: s03 2.3x, m01-m03 1.9-2.8x,
t02/t03 ~1.7x, q08 1.7x — pass --r3 for that target list).

Times each current query best-of-N in a warmed session (the bench.py
suite is single-shot and this host's wall clock is 2-4x noisy), plus
candidate variants that isolate the suspected causes:

- s01_jvm_fold : ann_topk with the JVM ``dot_col`` per-pair fold the
  r01 code used, instead of the Arrow ``pair_dot_udf``.
- t04_xxhash   : fingerprint with Spark-native xxhash64 token hashes
  instead of the portable md5-60bit hash the cross-engine oracle
  contract requires — quantifies the correctness cost.

Usage: python scripts/bench_ab.py [N]   (default N=5)
Prints one JSON line {name: {"best": s, "samples": [...]}, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _materialize(df):
    df.write.format("noop").mode("overwrite").save()


def _time_best(fn, n):
    samples = []
    for _ in range(n):
        t0 = time.time()
        _materialize(fn())
        samples.append(round(time.time() - t0, 3))
    return {"best": min(samples), "samples": samples}


def s01_jvm_fold(spark, sf_dir):
    """ann_topk body with the r01-style JVM per-pair fold."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hepcrawl_spark.operators.similarity import dot_col, norm_col

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"),
        norm_col(F.col("embedding")).alias("qn"),
    )
    cands = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"),
        norm_col(F.col("embedding")).alias("cn"),
    )
    scored = (
        cands.join(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", dot_col(F.col("qv"), F.col("cv"))
                    / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
            .select("query_id", "neighbor_id", "rank"))


def t04_xxhash(spark, sf_dir):
    """fingerprint with engine-native token hashes (NOT oracle-portable)."""
    from pyspark.sql import functions as F

    from hepcrawl_spark.operators.textops import FP_MOD, tokens_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = tokens_col(F.col("text"))
    fp = F.aggregate(
        t, F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(31)
                        + F.pmod(F.xxhash64(x), F.lit(FP_MOD)))
        % F.lit(FP_MOD),
    )
    return docs.select(F.col("doc_id"), fp.alias("fingerprint"))


R2_TARGETS = ["q01_pricing_summary", "t04_text_fingerprint",
              "d04_dedup_simhash", "d03_dedup_minhash", "s01_ann_topk"]
R3_TARGETS = ["s03_emb_neardup", "m01_multimodal_meta",
              "m02_media_resize", "m03_media_frames",
              "t02_text_langid", "t03_text_quality",
              "q08_hourly_window"]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from hepcrawl_spark.session import get_spark

    spark = get_spark("bench-ab", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    qs = em.queries()
    r3 = "--r3" in sys.argv
    targets = R3_TARGETS if r3 else R2_TARGETS

    # warm the session (JVM/codegen/Arrow paths) before timing
    _materialize(qs["t01_text_tokens"](spark, sf_dir))
    _materialize(qs["s01_ann_topk"](spark, sf_dir))
    _materialize(qs["m01_multimodal_meta"](spark, sf_dir))

    out = {}
    for name in targets:
        out[name] = _time_best(lambda: qs[name](spark, sf_dir), n)
    if not r3:
        out["s01_jvm_fold"] = _time_best(
            lambda: s01_jvm_fold(spark, sf_dir), n)
        out["t04_xxhash"] = _time_best(
            lambda: t04_xxhash(spark, sf_dir), n)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
