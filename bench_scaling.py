"""Scaling-efficiency benchmark: the same crawl job at N and 4N cores.

The north rule requires throughput scaling efficiency >= 0.8 from N to
4N executors; no real cluster exists in this sandbox, so the evidence
is the same job on the same input at two local parallelism levels
(per the task brief).  Efficiency = (tp_4N / tp_N) / 4.

The sandbox host itself cannot express a 4x speedup at every pair: a
pure-process capacity probe (independent python processes doing
identical CPU work, no coordination) measures how much aggregate
throughput the host actually grants as more cores engage — the
hypervisor throttles per-core throughput as occupancy rises.  The
benchmark therefore reports the engine's efficiency at N=2 vs 4N=8
(a pair the host can express ~4x at) AND at N=8 vs 4N=32 alongside
the host ceiling for that pair, so the engine's scaling is separable
from the host's.

Workload = the north-metric pipeline ("URLs scheduled+extracted/sec"):

- frontier: events-derived candidates replicated ``FRONTIER_REPS``x
  (distinct URLs per replica) -> URL-identity (Arrow UDF canonicalize +
  JVM fingerprint) -> politeness schedule (skew-safe two-phase rank);
- extraction: documents-derived HTML pages replicated
  ``PAGES_REPS``x -> html-generic extraction via ``mapInPandas``.

Run modes:
  python bench_scaling.py --cpus 8      # one measurement, one JSON line
  python bench_scaling.py               # full orchestration -> BENCH/BASELINE.md
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FRONTIER_REPS = 32
PAGES_REPS = 2048
# Workload multiplier (SPARK_GRAFT_REPS_SCALE / --reps-scale): scaling
# efficiency must be read at a problem size where per-leg fixed costs
# (stage barriers, task launch, Arrow worker spin-up) don't dominate
# the PARALLEL leg — at 1x the 4-executor leg finishes in ~86 s, so a
# ~20 s fixed floor costs it ~20% efficiency that a 100 TB run would
# never see.  Larger scales amortize the floor without changing the
# per-URL work.
REPS_SCALE = int(os.environ.get("SPARK_GRAFT_REPS_SCALE", "1"))


def _replicate(df, reps: int, key_col: str):
    from pyspark.sql import functions as F
    return (
        df.withColumn("_rep", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))))
        .withColumn(key_col, F.concat(F.col(key_col), F.lit("?r="),
                                      F.col("_rep").cast("string")))
        .drop("_rep")
    )


def run_once(cpus: int, sf_dir: str, master: str | None = None) -> dict:
    from pyspark.sql import functions as F

    from hepcrawl_spark.frontier.politeness import schedule
    from hepcrawl_spark.session import get_spark
    import __spark_entry__ as em

    os.environ.setdefault("SPARK_HOME", "/opt/spark")
    spark = get_spark(f"scaling-{cpus}", cpus=cpus, master=master)
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers so fixed startup cost is excluded
    em._t(spark, sf_dir, "events").count()
    em._t(spark, sf_dir, "documents").count()

    t0 = time.time()

    # repartition BEFORE the replicate-explode: the testdata parquet is
    # one row group, so exploding first would funnel the entire corpus
    # through a single task (a serial fraction that caps scaling);
    # exploding after the spread needs no post-explode shuffle at all
    par = spark.sparkContext.defaultParallelism
    cand = _replicate(
        em._event_candidates(spark, sf_dir).repartition(par),
        FRONTIER_REPS * REPS_SCALE, "url",
    )
    pol = cand.select("url_host").distinct().select(
        "url_host", F.lit(5.0).alias("download_delay"),
        F.lit(2).alias("max_per_host"),
    )
    sched, _, _ = schedule(cand, pol, None, 0.0, None)
    # aggregate over fetch_ts so the politeness windows are actually
    # computed — a bare count() lets Catalyst prune the rank/window
    # expressions away and times nothing
    row = sched.agg(
        F.count(F.lit(1)).alias("n"), F.max("fetch_ts").alias("mx")
    ).first()
    n_scheduled = row.n

    docs = em._t(spark, sf_dir, "documents")
    pages = _replicate(
        em._doc_pages(docs).repartition(par), PAGES_REPS * REPS_SCALE, "url"
    )
    from hepcrawl_spark.extract import extract_records
    recs = extract_records(pages)
    n_extracted = recs.filter(F.col("error").isNull()).count()

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
    }


def lsh_growth(cpus: int = 32) -> dict:
    """Candidate-volume growth of the LSH scale paths vs the quadratic
    all-pairs control, measured across sf0.001/sf0.01/sf0.1 (VERDICT
    r2 #3 — the asymptotic claim as a measurement, not a formula).

    For each scale: corpus size N, candidate-pair count and wall time
    for (a) banded-SRP embedding near-dup candidates (s04 path),
    (b) banded-MinHash candidates (d03 path), and (c) the exact
    inverted-shingle-index pair volume (d02 path, the control).
    The growth exponent is the log-log slope between the smallest and
    largest scale; sub-quadratic means exponent well below the
    control's.
    """
    import math

    from hepcrawl_spark.operators.dedup import (
        minhash_candidate_pairs,
        ngram_candidate_pairs,
    )
    from hepcrawl_spark.operators.similarity import srp_candidate_pairs
    from hepcrawl_spark.session import get_spark

    spark = get_spark("lsh-growth", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism

    def timed_count(df):
        t0 = time.time()
        n = df.count()
        return n, round(time.time() - t0, 3)

    points = {}
    for sf in ("0.001", "0.01", "0.1"):
        d = f"/root/testdata/sf{sf}"
        docs = spark.read.parquet(f"{d}/documents.parquet")
        emb = spark.read.parquet(f"{d}/embeddings.parquet").repartition(par)
        n_docs, n_emb = docs.count(), emb.count()
        srp_c, srp_t = timed_count(srp_candidate_pairs(emb))
        mh_c, mh_t = timed_count(minhash_candidate_pairs(docs))
        ex_c, ex_t = timed_count(ngram_candidate_pairs(docs))
        points[sf] = {
            "n_docs": n_docs, "n_emb": n_emb,
            "srp_candidates": srp_c, "srp_sec": srp_t,
            "minhash_candidates": mh_c, "minhash_sec": mh_t,
            "exact_pairs": ex_c, "exact_sec": ex_t,
        }
    spark.stop()

    # SRP prune sweep at the largest scale: at the s03/s04 CONTRACT
    # threshold (τ=0.45) the r=4 banding is dense by design (the
    # docstring's b·p_rand^r math: 1-(1-0.5^4)^12 ≈ 0.54 of all
    # pairs — confirmed by the exponent above); the production
    # near-dup regime raises band_planes, collapsing the candidate
    # constant.  Measure the prune factor AND the recall against the
    # exact τ=0.45 pairs for r ∈ {4, 8, 12}.
    spark = get_spark("lsh-growth-sweep", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism
    from hepcrawl_spark.operators.similarity import neardup_pairs

    emb = spark.read.parquet(
        "/root/testdata/sf0.1/embeddings.parquet"
    ).repartition(par).persist()
    n_emb = emb.count()
    all_pairs = n_emb * (n_emb - 1) // 2
    true_pairs = {
        (r.id_a, r.id_b)
        for r in neardup_pairs(emb, bucketed=False).collect()
    }
    sweep = {}
    for r_planes in (4, 8, 12):
        t0 = time.time()
        cands = srp_candidate_pairs(emb, band_planes=r_planes, n_bands=12)
        got = {(x.id_a, x.id_b) for x in cands.collect()}
        sweep[r_planes] = {
            "candidates": len(got),
            "fraction_of_all_pairs": round(len(got) / all_pairs, 4),
            "recall_vs_exact": (
                round(len(got & true_pairs) / len(true_pairs), 4)
                if true_pairs else None
            ),
            "sec": round(time.time() - t0, 3),
        }

    # Production-regime recall: the synthetic corpus has NO pairs at
    # real near-dup thresholds (max natural cosine < 0.9), so plant a
    # deterministic truth set — every 10th vector gets a perturbed
    # twin at cosine ≈ 0.95 (orthogonalized fixed-seed direction,
    # ε = sqrt(1/0.95² − 1)) — and measure the banding's recall on
    # the planted pairs at each plane count.  This is the regime the
    # neardup_pairs docstring prescribes r = 8-16 for: p = 1−θ/π ≈
    # 0.9, so recall 1−(1−p^r)^b stays near 1 while random-pair
    # candidates collapse as ~b·2^−r.
    import numpy as np

    rng = np.random.default_rng(42)
    base = emb.orderBy("vec_id").limit(2000).collect()
    ids = np.array([r.vec_id for r in base], dtype=np.int64)
    V = np.array([r.embedding for r in base], dtype=np.float64)
    pick = np.arange(0, len(V), 10)
    eps = float(np.sqrt(1.0 / 0.95 ** 2 - 1.0))
    W = rng.standard_normal((len(pick), V.shape[1]))
    Vp = V[pick]
    # orthogonalize the perturbation against each base vector so the
    # planted cosine is exactly 1/sqrt(1+ε²) = 0.95
    W -= (np.einsum("ij,ij->i", W, Vp)
          / np.einsum("ij,ij->i", Vp, Vp))[:, None] * Vp
    W *= (np.linalg.norm(Vp, axis=1)
          / np.linalg.norm(W, axis=1))[:, None] * eps
    twin_ids = ids.max() + 1 + np.arange(len(pick))
    planted = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in
         zip(ids, V)] +
        [(int(i), [float(x) for x in v]) for i, v in
         zip(twin_ids, Vp + W)],
        "vec_id long, embedding array<double>",
    ).repartition(par).persist()
    prod_true = {
        (r.id_a, r.id_b)
        for r in neardup_pairs(planted, threshold=0.9,
                               bucketed=False).collect()
    }
    planted_sweep = {}
    for r_planes in (4, 8, 12):
        cands = srp_candidate_pairs(planted, band_planes=r_planes,
                                    n_bands=12)
        got = {(x.id_a, x.id_b) for x in cands.collect()}
        n_all = planted.count()
        planted_sweep[r_planes] = {
            "candidates": len(got),
            "fraction_of_all_pairs": round(
                len(got) / (n_all * (n_all - 1) // 2), 4),
            "recall_at_tau0.9": (
                round(len(got & prod_true) / len(prod_true), 4)
                if prod_true else None
            ),
        }
    planted.unpersist()
    emb.unpersist()
    spark.stop()

    lo, hi = points["0.001"], points["0.1"]

    def expo(metric, n_key):
        if lo[metric] == 0 or hi[metric] == 0:
            return None
        return round(
            math.log(hi[metric] / lo[metric])
            / math.log(hi[n_key] / lo[n_key]), 3
        )

    exps = {
        "srp_candidates": expo("srp_candidates", "n_emb"),
        "minhash_candidates": expo("minhash_candidates", "n_docs"),
        "exact_pairs": expo("exact_pairs", "n_docs"),
    }
    summary = {
        "metric": "lsh_candidate_growth_exponents",
        "points": points,
        "exponents": exps,
        "srp_prune_sweep_sf0.1": sweep,
        # the claims under test: the MinHash path grows with an
        # exponent well below the quadratic control's, and the SRP
        # candidate constant collapses as band_planes rises (the
        # production regime) while r=4 stays the documented dense
        # contract-threshold oracle-recall setting
        "minhash_subquadratic": bool(
            exps["minhash_candidates"] is not None
            and exps["exact_pairs"] is not None
            and exps["minhash_candidates"] < exps["exact_pairs"] - 0.3
        ),
        "srp_prunes_with_band_planes": bool(
            sweep[12]["candidates"] < sweep[8]["candidates"]
            < sweep[4]["candidates"]
        ),
        "srp_planted_tau0.9_sweep": planted_sweep,
        "n_planted_true_pairs": len(prod_true),
        # the production story: at a realistic near-dup threshold
        # (planted cos≈0.95 twins) the pruned banding keeps
        # (near-)full recall while the candidate set collapses to a
        # few percent of all pairs
        "srp_production_recall_holds": bool(
            prod_true
            and planted_sweep[8]["recall_at_tau0.9"] is not None
            and planted_sweep[8]["recall_at_tau0.9"] >= 0.95
            and planted_sweep[8]["fraction_of_all_pairs"] <= 0.1
        ),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/lsh_growth.json", "w") as fh:
        json.dump(summary, fh, indent=2)
    return summary


def span_growth(cpus: int = 32) -> dict:
    """Scale envelope of the d07/d08 span-dup signal (VERDICT r3 #7):
    the span table is O(total tokens) rows through one shuffle — the
    question is whether everything downstream of it stays LINEAR in
    corpus size and how much the stop-span cap bounds the flag join.

    Measured across sf0.001/0.01/0.1: span rows (shuffle volume),
    distinct spans (groupBy output), flag-join build rows for the
    exact path (spans with freq ≥ min_count — the only rows the
    optimized join back carries) and for the capped path (freq ≤
    cap), the hottest span key, and wall time for both variants.
    The growth exponent is the log-log slope sf0.001 → sf0.1.
    """
    import math

    from pyspark.sql import functions as F

    from hepcrawl_spark.operators.dedup import span_dupfrac
    from hepcrawl_spark.operators.textops import tokens_col
    from hepcrawl_spark.session import get_spark

    spark = get_spark("span-growth", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    points = {}
    for sf in ("0.001", "0.01", "0.1"):
        docs = spark.read.parquet(f"/root/testdata/sf{sf}/documents.parquet")
        n_docs = docs.count()
        toks = docs.select(tokens_col(F.col("text")).alias("t"))
        sp = toks.filter(F.size("t") >= 3).select(
            F.explode(
                F.expr("transform(sequence(1, size(t) - 2),"
                       " i -> concat_ws(' ', t[i-1], t[i], t[i+1]))")
            ).alias("s")
        )
        freq = sp.groupBy("s").agg(F.count(F.lit(1)).alias("f"))
        stats = freq.agg(
            F.sum("f").alias("span_rows"),
            F.count(F.lit(1)).alias("distinct_spans"),
            F.sum(F.when(F.col("f") >= 2, 1).otherwise(0)).alias("dup_keys"),
            F.sum(F.when(F.col("f") <= 4, 1).otherwise(0)).alias("kept_keys"),
            F.max("f").alias("hottest_key"),
        ).collect()[0]

        t0 = time.time()
        span_dupfrac(docs, w=3, min_count=2).count()
        exact_sec = round(time.time() - t0, 3)
        t0 = time.time()
        span_dupfrac(docs, w=3, min_count=2, max_span_df=4).count()
        capped_sec = round(time.time() - t0, 3)
        points[sf] = {
            "n_docs": n_docs,
            "span_rows": stats.span_rows,
            "distinct_spans": stats.distinct_spans,
            "flagjoin_build_rows_exact": stats.dup_keys,
            "flagjoin_build_rows_capped": stats.kept_keys,
            "hottest_span_key": stats.hottest_key,
            "exact_sec": exact_sec,
            "capped_sec": capped_sec,
        }
    spark.stop()

    lo, hi = points["0.001"], points["0.1"]

    def expo(metric):
        if not lo[metric] or not hi[metric]:
            return None
        return round(math.log(hi[metric] / lo[metric])
                     / math.log(hi["n_docs"] / lo["n_docs"]), 3)

    summary = {
        "metric": "span_dupfrac_growth",
        "points": points,
        "exponents": {
            k: expo(k)
            for k in ("span_rows", "distinct_spans",
                      "flagjoin_build_rows_exact",
                      "flagjoin_build_rows_capped",
                      "exact_sec", "capped_sec")
        },
        # the envelope claim: every table in the plan grows ~linearly
        # with the corpus (exponent ≈ 1, never ≈ 2 — nothing here is
        # a pair join), and the cap bounds the hottest flag-join key
        # at a constant
        "all_linear": all(
            e is not None and e <= 1.3
            for k, e in [
                ("span_rows", expo("span_rows")),
                ("distinct_spans", expo("distinct_spans")),
                ("flagjoin_build_rows_exact",
                 expo("flagjoin_build_rows_exact")),
            ]
        ),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/span_growth.json", "w") as fh:
        json.dump(summary, fh, indent=2)
    return summary


def host_capacity(n_list=(2, 8, 32)) -> dict:
    """Aggregate CPU throughput of n independent python processes
    (no coordination) — the host's scaling ceiling."""
    code = ("import zlib,time;t0=time.time();x=0\n"
            "for i in range(3_000_000): x ^= zlib.crc32(str(i).encode())\n"
            "print(time.time()-t0)")
    out = {}
    for n in n_list:
        ps = [subprocess.Popen([sys.executable, "-c", code],
                               stdout=subprocess.PIPE) for _ in range(n)]
        times = [float(p.communicate()[0]) for p in ps]
        out[n] = round(sum(1.0 / t for t in times), 2)
    return out


PROBE_MIN = 8.0


def multi_executor_pair(gate: bool = True, probe_wait_sec: int = 1800,
                        probe_poll_sec: int = 120, reps_scale: int = 1,
                        legs: int = 2) -> dict:
    """One executor-mode scaling pair (local-cluster[1,2] →
    [4,2], best-of-``legs`` legs), probe-gated by default: poll the
    8-process host-capacity probe until it reads ≥ ``PROBE_MIN``
    (calm window) or ``probe_wait_sec`` elapses; the pair is marked
    ``gated`` only when it started inside a calm window.  Every pair
    (gated or not) is appended to BENCH/scaling_executors_r5.json so
    the raw spread stays on record alongside the gated series.

    ``reps_scale`` multiplies the workload (see ``REPS_SCALE``): the
    1x job's 4-executor leg finishes in ~86 s, small enough that the
    per-leg fixed floor (stage barriers, task launch, Arrow worker
    spin-up) costs measurable efficiency; larger scales measure the
    regime a long-running crawl actually operates in.
    """
    probe = None
    waited = 0
    if gate:
        while True:
            probe = host_capacity([8])[8]
            if probe >= PROBE_MIN or waited >= probe_wait_sec:
                break
            time.sleep(probe_poll_sec)
            waited += probe_poll_sec
    results = {}
    env = dict(os.environ, SPARK_DRIVER_MEM="16g",
               SPARK_GRAFT_REPS_SCALE=str(reps_scale))
    for n in (1, 4):
        best = None
        for _ in range(legs):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--executors", str(n)],
                capture_output=True, text=True, check=True, env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            run = json.loads(out.stdout.strip().splitlines()[-1])
            if best is None or run["throughput"] > best["throughput"]:
                best = run
        results[n] = best
    eff = round(
        (results[4]["throughput"] / results[1]["throughput"]) / 4.0, 3
    )
    pair = {
        "metric": "scaling_efficiency_executors_N_to_4N",
        "value": eff,
        "pair": "local-cluster[1,2] -> local-cluster[4,2]",
        "probe8_at_start": probe,
        "gated": bool(gate and probe is not None and probe >= PROBE_MIN),
        "probe_waited_sec": waited,
        "reps_scale": reps_scale,
        "legs": legs,
        "runs": results,
        "meets_north_rule": eff >= 0.8,
    }
    os.makedirs("BENCH", exist_ok=True)
    path = "BENCH/scaling_executors_r5.json"
    try:
        with open(path) as fh:
            log = json.load(fh)
    except (OSError, ValueError):
        log = {"metric": "scaling_efficiency_executors_r5", "pairs": []}
    log["pairs"].append(pair)
    gated_vals = sorted(p["value"] for p in log["pairs"] if p["gated"])
    all_vals = sorted(p["value"] for p in log["pairs"])
    log["gated_values"] = gated_vals
    log["gated_median"] = (
        gated_vals[len(gated_vals) // 2] if gated_vals else None
    )
    log["raw_values"] = all_vals
    with open(path, "w") as fh:
        json.dump(log, fh, indent=2)
    return pair


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--cpus" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])
        print(json.dumps(run_once(cpus, sf_dir)))
        return
    if "--executors" in sys.argv:
        # N separate executor JVMs × 2 cores (own heap, own GC, own
        # python workers) — the closest in-sandbox analog of "N
        # executors" in the north rule; driver stays out of the
        # executor count
        n = int(sys.argv[sys.argv.index("--executors") + 1])
        print(json.dumps(run_once(
            n * 2, sf_dir,
            # executor heap must grow with the workload multiplier: a
            # 6,144 MB executor starves (and local-cluster hangs
            # rather than fails) on the 2x explode
            master=(
                f"local-cluster[{n},2,"
                f"{int(os.environ.get('SPARK_GRAFT_EXEC_MB', 6144))}]"
            )
        )))
        return
    if "--lsh-growth" in sys.argv:
        print(json.dumps(lsh_growth()))
        return
    if "--span-growth" in sys.argv:
        print(json.dumps(span_growth()))
        return
    if "--multi-executor" in sys.argv:
        # 1 executor vs 4 executors (N → 4N executor JVMs).  The
        # probe gate is the built-in default (VERDICT r3 #4): the
        # round-3 spread (0.66–0.88 over one afternoon) demonstrably
        # tracked the host-capacity probe, not the build, so a pair
        # is only banked when the 8-process probe reads ≥ PROBE_MIN
        # work-units/s at the start of the window.  --no-gate runs
        # ungated (the raw-spread record).
        reps_scale = (
            int(sys.argv[sys.argv.index("--reps-scale") + 1])
            if "--reps-scale" in sys.argv else 1
        )
        legs = (
            int(sys.argv[sys.argv.index("--legs") + 1])
            if "--legs" in sys.argv else 2
        )
        print(json.dumps(multi_executor_pair(
            gate="--no-gate" not in sys.argv,
            reps_scale=reps_scale, legs=legs)))
        return

    cap = host_capacity()
    results = {}
    env = dict(os.environ, SPARK_DRIVER_MEM="32g")
    for cpus in (2, 8, 32):
        best = None
        for _ in range(2):  # best-of-2: host wall-clock variance ~10%
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cpus", str(cpus)],
                capture_output=True, text=True, check=True, env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            run = json.loads(out.stdout.strip().splitlines()[-1])
            if best is None or run["throughput"] > best["throughput"]:
                best = run
        results[cpus] = best

    def eff(a, b):
        return round((results[b]["throughput"] / results[a]["throughput"]) / 4.0, 3)

    summary = {
        "metric": "scaling_efficiency_N_to_4N",
        "value": eff(2, 8),
        "pair": "local[2] -> local[8]",
        "eff_8_32": eff(8, 32),
        "host_capacity_probe": cap,
        "runs": results,
        "meets_north_rule": eff(2, 8) >= 0.8,
    }
    print(json.dumps(summary))
    # measured numbers + methodology are curated in BENCH/BASELINE.md;
    # raw re-runs land beside it for comparison
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling_latest.json", "w") as fh:
        json.dump(summary, fh, indent=2)


if __name__ == "__main__":
    main()
