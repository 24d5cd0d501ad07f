"""URL-seen membership (F1) — the dedup gate in front of the scheduler.

Three modes:

- ``off``    — reference parity: the reference explicitly disables
  duplicate filtering (``DUPEFILTER_CLASS = BaseDupeFilter``,
  /root/reference/hepcrawl/settings.py:32-33), so every candidate is
  admitted and the "seen set" is the multiset of scheduled URLs.
- ``exact``  — distributed exact dedup: left-anti join of candidate
  fingerprints against the seen table + first-by-seq within the batch.
  One shuffle on a 64-bit key; scalable but the state table grows with
  the frontier.
- ``cuckoo`` — the 10^10-scale path: the seen set lives in S cuckoo
  shards (~16 bits/key), sharded by ``xxhash64(url_host) % S`` so one
  host's URLs always probe one shard.  Probe+insert runs as a single
  ``cogroup().applyInPandas`` over (candidates-by-shard, state-by-shard):
  a hand-rolled hash anti-join whose build side is the persistent
  filter.  Output is a union of admitted rows and refreshed shard blobs
  (split by ``row_kind`` afterwards) — one shuffle, state rows tiny.
"""

from __future__ import annotations

from typing import Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .bloom import BloomShard
from .cuckoo import CuckooShard

# candidate rows entering the seen gate (url identity already attached)
CANDIDATE_FIELDS = [
    ("url", StringType()),
    ("canon_url", StringType()),
    ("url_host", StringType()),
    ("fingerprint", LongType()),
    ("priority", LongType()),
    ("depth", IntegerType()),
    ("seq", LongType()),
    ("source", StringType()),
    ("format", StringType()),
]
CANDIDATE_SCHEMA = StructType([StructField(n, t) for n, t in CANDIDATE_FIELDS])

CUCKOO_STATE_SCHEMA = StructType([
    StructField("shard", IntegerType()),
    StructField("blob", BinaryType()),
])

_UNION_SCHEMA = StructType(
    [StructField("row_kind", StringType())]
    + CANDIDATE_SCHEMA.fields
    + [StructField("shard", IntegerType()), StructField("blob", BinaryType())]
)


def shard_of_host(host_col, num_shards: int):
    return F.pmod(F.xxhash64(host_col), F.lit(num_shards)).cast("int")


def empty_cuckoo_state(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], CUCKOO_STATE_SCHEMA)


def empty_exact_state(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], "fingerprint long")


def _dedup_within_batch(candidates: DataFrame) -> DataFrame:
    """Keep the first-enqueued (min seq) row per fingerprint."""
    w = Window.partitionBy("fingerprint").orderBy(F.col("seq").asc())
    return (
        candidates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def filter_unseen(
    candidates: DataFrame,
    state: DataFrame | None,
    mode: str = "cuckoo",
    num_shards: int = 64,
    shard_buckets: int = 1 << 16,
) -> Tuple[DataFrame, DataFrame | None]:
    """(admitted, new_state).  ``candidates`` must carry CANDIDATE columns."""
    spark = candidates.sparkSession
    candidates = candidates.select(*[n for n, _ in CANDIDATE_FIELDS])

    if mode == "off":
        return candidates, state

    if mode == "exact":
        if state is None:
            state = empty_exact_state(spark)
        batch = _dedup_within_batch(candidates)
        admitted = batch.join(
            state.select("fingerprint").hint("shuffle_hash"),
            on="fingerprint",
            how="left_anti",
        )
        new_state = state.union(admitted.select("fingerprint"))
        return admitted, new_state

    if mode == "cuckoo":
        if state is None:
            state = empty_cuckoo_state(spark)
        with_shard = candidates.withColumn(
            "shard", shard_of_host(F.col("url_host"), num_shards)
        )

        def probe_and_insert(key, cand_pdf: pd.DataFrame, state_pdf: pd.DataFrame):
            shard_id = int(key[0])
            if len(state_pdf) and state_pdf["blob"].iloc[0] is not None:
                shard = CuckooShard.from_bytes(bytes(state_pdf["blob"].iloc[0]))
            else:
                shard = CuckooShard(n_buckets=shard_buckets)
            out_rows = []
            if len(cand_pdf):
                cand_pdf = cand_pdf.sort_values("seq", kind="mergesort")
                pre_seen = shard.contains_many(
                    cand_pdf["fingerprint"].to_numpy()
                )
                batch_seen: set[int] = set()
                for (_, row), was_seen in zip(cand_pdf.iterrows(), pre_seen):
                    h = int(row["fingerprint"])
                    if was_seen or h in batch_seen:
                        continue
                    batch_seen.add(h)
                    shard.insert(h)
                    rec = {name: row[name] for name, _ in CANDIDATE_FIELDS}
                    rec.update(row_kind="url", shard=shard_id, blob=None)
                    out_rows.append(rec)
            out_rows.append({
                "row_kind": "state",
                **{name: None for name, _ in CANDIDATE_FIELDS},
                "shard": shard_id,
                "blob": shard.to_bytes(),
            })
            return pd.DataFrame(out_rows, columns=_UNION_SCHEMA.fieldNames())

        unioned = with_shard.groupBy("shard").cogroup(
            state.groupBy("shard")
        ).applyInPandas(probe_and_insert, _UNION_SCHEMA)
        unioned = unioned.persist()
        admitted = unioned.filter(F.col("row_kind") == "url").select(
            *[n for n, _ in CANDIDATE_FIELDS]
        )
        new_state = unioned.filter(F.col("row_kind") == "state").select(
            "shard", "blob"
        )
        return admitted, new_state

    if mode == "bloom":
        # the OTHER membership backend the north rule names: same
        # sharded cogroup probe as cuckoo, but the per-shard state is a
        # Bloom bit array (bloom.BloomShard).  No false negatives —
        # admitted ⊆ exact-admitted; a ~6e-4 false-positive rate drops
        # that fraction of genuinely-new URLs, the standard Bloom trade
        # (shards stay mergeable by bitwise OR, which cuckoo can't do).
        # fail fast on the driver: BloomShard requires power-of-two
        # m_bits (= shard_buckets * 16), but shard_buckets is shared
        # with cuckoo mode where ANY count works — without this check
        # a bad value only surfaces as an opaque executor task failure
        # inside the cogroup UDF
        m_bits = shard_buckets * 16
        # shard_buckets <= 0 gives m_bits & (m_bits - 1) == 0, so the
        # power-of-two test alone would wave the degenerate value through
        if shard_buckets <= 0 or m_bits & (m_bits - 1):
            raise ValueError(
                f"bloom mode needs power-of-two shard_buckets*16 bits; "
                f"got shard_buckets={shard_buckets} (m_bits={m_bits}). "
                f"Use a power of two (the cuckoo-mode default works)."
            )
        if state is None:
            state = empty_cuckoo_state(spark)  # same (shard, blob) schema
        with_shard = candidates.withColumn(
            "shard", shard_of_host(F.col("url_host"), num_shards)
        )

        def bloom_probe(key, cand_pdf: pd.DataFrame, state_pdf: pd.DataFrame):
            import numpy as np

            shard_id = int(key[0])
            if len(state_pdf) and state_pdf["blob"].iloc[0] is not None:
                shard = BloomShard.from_bytes(bytes(state_pdf["blob"].iloc[0]))
            else:
                shard = BloomShard(m_bits=shard_buckets * 16, k=8)
            out_rows = []
            if len(cand_pdf):
                cand_pdf = cand_pdf.sort_values("seq", kind="mergesort")
                hashes = cand_pdf["fingerprint"].to_numpy()
                pre_seen = shard.contains_many(hashes)
                batch_seen: set[int] = set()
                admitted_hashes = []
                for (_, row), was_seen in zip(cand_pdf.iterrows(), pre_seen):
                    h = int(row["fingerprint"])
                    if was_seen or h in batch_seen:
                        continue
                    batch_seen.add(h)
                    admitted_hashes.append(h)
                    rec = {name: row[name] for name, _ in CANDIDATE_FIELDS}
                    rec.update(row_kind="url", shard=shard_id, blob=None)
                    out_rows.append(rec)
                # int64 (possibly negative) — BloomShard remaps to uint64
                shard.insert_many(np.array(admitted_hashes, dtype=np.int64))
            out_rows.append({
                "row_kind": "state",
                **{name: None for name, _ in CANDIDATE_FIELDS},
                "shard": shard_id,
                "blob": shard.to_bytes(),
            })
            return pd.DataFrame(out_rows, columns=_UNION_SCHEMA.fieldNames())

        unioned = with_shard.groupBy("shard").cogroup(
            state.groupBy("shard")
        ).applyInPandas(bloom_probe, _UNION_SCHEMA)
        unioned = unioned.persist()
        admitted = unioned.filter(F.col("row_kind") == "url").select(
            *[n for n, _ in CANDIDATE_FIELDS]
        )
        new_state = unioned.filter(F.col("row_kind") == "state").select(
            "shard", "blob"
        )
        return admitted, new_state

    raise ValueError(f"unknown seen mode: {mode!r}")


def merge_seen_states(state_a: Optional[DataFrame],
                      state_b: Optional[DataFrame],
                      mode: str = "exact") -> Optional[DataFrame]:
    """Union two crawls' URL-seen states into one — the fleet-merge
    operation a distributed crawler needs when frontiers combine: a
    vertical crawl folds into the main crawl, or a rendezvous
    re-shard (``sharding.hrw_shard``) moves a host group onto a
    worker that already holds state for the shard.

    ``mode="exact"``: fingerprint-set union — one DISTINCT over the
    concatenated frames, hash-partitioned on the fingerprint.

    ``mode="bloom"``: per-shard blob union by bitwise OR — Bloom's
    headline algebraic property (``BloomShard.merge``), which cuckoo
    deliberately does not offer (deletion instead).  Shards pair by
    id in one cogroup; a shard present on one side passes through
    unchanged.  Merging never loses a member (no false negatives,
    before or after), and the union's false-positive rate is that of
    the OR'd bit pattern — budget fill accordingly.

    Both directions of error stay one-sided after a merge, so the
    gate's admitted ⊆ exact-admitted contract survives fleet
    reorganizations.
    """
    if state_a is None:
        return state_b
    if state_b is None:
        return state_a
    if mode == "exact":
        return state_a.unionByName(state_b).distinct()
    if mode != "bloom":
        raise ValueError(f"unsupported merge mode {mode!r}")

    
    def _or_blobs(key, a_pdf: pd.DataFrame, b_pdf: pd.DataFrame):
        blobs = list(a_pdf["blob"]) + list(b_pdf["blob"])
        if not blobs:
            return pd.DataFrame({"shard": [], "blob": []})
        merged = BloomShard.from_bytes(bytes(blobs[0]))
        for blob in blobs[1:]:
            merged = merged.merge(BloomShard.from_bytes(bytes(blob)))
        return pd.DataFrame(
            {"shard": [key[0]], "blob": [merged.to_bytes()]}
        )

    return (
        state_a.groupBy("shard")
        .cogroup(state_b.groupBy("shard"))
        .applyInPandas(_or_blobs, schema=CUCKOO_STATE_SCHEMA)
    )


def evict_seen(state: Optional[DataFrame], evictions: DataFrame,
               mode: str = "exact",
               num_shards: int = 64) -> Optional[DataFrame]:
    """Remove URLs from the seen state so they can be fetched again —
    the recrawl loop's missing half: ``recrawl.recrawl_candidates``
    decides WHAT is due, and this makes the gate forget it, without
    rebuilding the filter.  ``evictions`` must carry ``fingerprint``
    (and ``url_host`` for the sharded mode).

    ``mode="exact"``: one anti-join on the fingerprint key.
    ``mode="cuckoo"``: per-shard ``CuckooShard.delete`` in one
    cogroup — deletion is THE capability cuckoo filters trade
    fp-rate for over Bloom (Fan et al. 2014), and this is the
    operation that justifies carrying it.  ``mode="bloom"`` raises:
    a Bloom filter cannot unset shared bits — schedule recrawls with
    the cuckoo or exact backend (the documented trade in bloom.py).

    State shards without evictions pass through unchanged; evictions
    for absent shards are no-ops.
    """
    if state is None:
        return None
    if mode == "exact":
        return state.join(
            evictions.select("fingerprint").distinct(),
            on="fingerprint", how="left_anti",
        )
    if mode == "bloom":
        raise ValueError(
            "bloom seen-state cannot delete (shared bits); use the "
            "cuckoo or exact backend for recrawl eviction"
        )
    if mode != "cuckoo":
        raise ValueError(f"unsupported evict mode {mode!r}")

    ev = evictions.select(
        shard_of_host(F.col("url_host"), num_shards).alias("shard"),
        "fingerprint",
    )

    def _evict(key, st_pdf: pd.DataFrame, ev_pdf: pd.DataFrame):
        if not len(st_pdf):
            return pd.DataFrame({"shard": [], "blob": []})
        shard = CuckooShard.from_bytes(bytes(st_pdf["blob"].iloc[0]))
        for fp in ev_pdf["fingerprint"]:
            shard.delete(int(fp))  # raw signed, same as the gate
        return pd.DataFrame({"shard": [key[0]],
                             "blob": [shard.to_bytes()]})

    return (
        state.groupBy("shard")
        .cogroup(ev.groupBy("shard"))
        .applyInPandas(_evict, schema=CUCKOO_STATE_SCHEMA)
    )
