"""Scaling-efficiency benchmark: the same crawl job at N and 4N cores.

The north rule requires throughput scaling efficiency >= 0.8 from N to
4N executors; no real cluster exists in this sandbox, so the evidence
is the same job on the same input at ``local[8]`` vs ``local[32]``
(per the task brief).  Efficiency = (tp_4N / tp_N) / 4.

Workload (the headline metric's workload, scaled up so it is
compute-bound rather than fixed-overhead-bound):

- frontier: events-derived candidates replicated ``FRONTIER_REPS``×
  (distinct URLs per replica) → URL-identity (Arrow UDF canonicalize +
  JVM fingerprint) → politeness schedule (skew-safe two-phase rank);
- extraction: documents-derived HTML pages replicated
  ``PAGES_REPS``× → html-generic extraction via ``mapInPandas``;
- dedup: MinHash signatures + LSH banding over the replicated docs.

Run modes:
  python bench_scaling.py --cpus 8      # one measurement, one JSON line
  python bench_scaling.py               # orchestrate 8 then 32, write
                                        # BENCH/BASELINE.md section + JSON
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FRONTIER_REPS = 8
PAGES_REPS = 64


def _replicate(df, reps: int, key_col: str):
    from pyspark.sql import functions as F
    return (
        df.withColumn("_rep", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))))
        .withColumn(key_col, F.concat(F.col(key_col), F.lit("?r="),
                                      F.col("_rep").cast("string")))
        .drop("_rep")
    )


def run_once(cpus: int, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from hepcrawl_spark.frontier.politeness import schedule
    from hepcrawl_spark.session import get_spark
    import __spark_entry__ as em

    spark = get_spark(f"scaling-{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers so fixed startup cost is excluded
    em._t(spark, sf_dir, "events").count()
    em._t(spark, sf_dir, "documents").count()

    t0 = time.time()

    cand = _replicate(em._event_candidates(spark, sf_dir), FRONTIER_REPS, "url")
    par = spark.sparkContext.defaultParallelism
    cand = cand.repartition(par)
    pol = cand.select("url_host").distinct().select(
        "url_host", F.lit(5.0).alias("download_delay"),
        F.lit(2).alias("max_per_host"),
    )
    sched, _, _ = schedule(cand, pol, None, 0.0, None)
    n_scheduled = sched.count()

    docs = em._t(spark, sf_dir, "documents")
    pages = _replicate(em._doc_pages(docs), PAGES_REPS, "url").repartition(par)
    from hepcrawl_spark.extract import extract_records
    recs = extract_records(pages)
    n_extracted = recs.filter(F.col("error").isNull()).count()

    # dedup reps stay moderate: every replica is an exact dup, so the
    # verified-pair count grows quadratically in the rep factor
    from hepcrawl_spark.operators.dedup import minhash_lsh_pairs
    docs_rep = (
        docs.withColumn("_rep", F.explode(F.sequence(F.lit(0), F.lit(8 - 1))))
        .withColumn("doc_id", F.col("doc_id") + F.col("_rep") * 1_000_000)
        .drop("_rep")
    )
    n_pairs = minhash_lsh_pairs(docs_rep, threshold=0.999).count()

    dt = time.time() - t0
    urls = n_scheduled + n_extracted
    spark.stop()
    return {
        "cpus": cpus,
        "seconds": round(dt, 2),
        "urls": urls,
        "throughput": round(urls / dt, 1),
        "scheduled": n_scheduled,
        "extracted": n_extracted,
        "minhash_pairs": n_pairs,
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--cpus" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])
        print(json.dumps(run_once(cpus, sf_dir)))
        return

    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpus", str(cpus)],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])

    tp8, tp32 = results[8]["throughput"], results[32]["throughput"]
    eff = round((tp32 / tp8) / 4.0, 3)
    summary = {
        "metric": "scaling_efficiency_8_to_32_cores",
        "value": eff,
        "n_cores": results[8],
        "n4_cores": results[32],
        "meets_north_rule": eff >= 0.8,
    }
    print(json.dumps(summary))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as fh:
        fh.write(f"""# BENCH — measured numbers

## Scaling efficiency (north rule: N→4N ≥ 0.8)

Same job, same input ({sf_dir}), two parallelism levels (the sandbox
stand-in for N vs 4N executors — task brief):

| cores | seconds | urls processed | throughput (urls/sec) |
|---|---|---|---|
| 8 (N)   | {results[8]['seconds']} | {results[8]['urls']} | {tp8} |
| 32 (4N) | {results[32]['seconds']} | {results[32]['urls']} | {tp32} |

**Scaling efficiency = (tp_32 / tp_8) / 4 = {eff}** — {"meets" if eff >= 0.8 else "BELOW"} the ≥ 0.8 bar.

Workload: politeness schedule over {results[8]['scheduled']} frontier
URLs (replicated events corpus, skew-safe two-phase per-host rank) +
html-generic Arrow extraction of {results[8]['extracted']} pages +
MinHash/LSH signatures over the replicated documents corpus
({results[8]['minhash_pairs']} verified pairs).

Reproduce: `python bench_scaling.py`
""")


if __name__ == "__main__":
    main()
