"""URL-seen gate (F1): cuckoo/bloom shard unit behavior + Spark
seen-filter modes (off = reference parity, exact, cuckoo, bloom)."""

import numpy as np
import pytest

from hepcrawl_spark.frontier.bloom import BloomShard
from hepcrawl_spark.frontier.cuckoo import CuckooShard
from hepcrawl_spark.frontier.fingerprint import with_url_identity
from hepcrawl_spark.frontier.seen import (
    CANDIDATE_SCHEMA,
    empty_cuckoo_state,
    filter_unseen,
)


def test_cuckoo_insert_contains_roundtrip():
    shard = CuckooShard(n_buckets=1 << 10)
    rng = np.random.RandomState(7)
    keys = rng.randint(-(2 ** 62), 2 ** 62, size=2000).tolist()
    for k in keys:
        if not shard.contains(k):
            assert shard.insert(k)
    for k in keys:
        assert shard.contains(k)
    # vectorized probe agrees with scalar
    probe = shard.contains_many(np.array(keys, dtype=np.int64))
    assert probe.all()


def test_cuckoo_serialization_roundtrip():
    shard = CuckooShard(n_buckets=1 << 8)
    for k in range(500):
        h = hash(("url", k))
        if not shard.contains(h):
            shard.insert(h)
    clone = CuckooShard.from_bytes(shard.to_bytes())
    assert np.array_equal(clone.buckets, shard.buckets)
    assert clone.count == shard.count
    assert clone.contains(hash(("url", 123)))


def test_cuckoo_false_positive_rate_reasonable():
    shard = CuckooShard(n_buckets=1 << 12)
    rng = np.random.RandomState(11)
    ins = rng.randint(-(2 ** 62), 2 ** 62, size=8000)
    for k in ins.tolist():
        shard.insert(k)
    fresh = rng.randint(-(2 ** 62), 2 ** 62, size=20000)
    fp_rate = shard.contains_many(fresh).mean()
    assert fp_rate < 0.01


def _candidates(spark, urls, start_seq=0):
    rows = []
    for i, u in enumerate(urls):
        rows.append((u, None, None, None, 0, 0, start_seq + i, "arXiv", "arxiv-oai"))
    df = spark.createDataFrame(rows, CANDIDATE_SCHEMA)
    return with_url_identity(df.drop("canon_url", "url_host", "fingerprint"))


@pytest.mark.parametrize("mode", ["exact", "cuckoo", "bloom"])
def test_seen_filter_dedups_across_batches(spark, mode):
    urls1 = [f"http://h{i % 3}.org/p{i}" for i in range(30)]
    cand1 = _candidates(spark, urls1)
    admitted1, state1 = filter_unseen(cand1, None, mode=mode, num_shards=8)
    assert admitted1.count() == 30

    # second batch: 10 repeats + 5 new (+ an in-batch duplicate pair)
    urls2 = urls1[:10] + [f"http://h9.org/new{i}" for i in range(5)] + \
        ["http://h9.org/new0"]
    cand2 = _candidates(spark, urls2, start_seq=100)
    admitted2, _ = filter_unseen(cand2, state1, mode=mode, num_shards=8)
    got = sorted(r.url for r in admitted2.collect())
    assert got == sorted(f"http://h9.org/new{i}" for i in range(5))


def test_seen_filter_off_admits_duplicates(spark):
    # reference parity: dupefilter disabled (settings.py:32-33)
    urls = ["http://a.org/x"] * 3
    cand = _candidates(spark, urls)
    admitted, _ = filter_unseen(cand, None, mode="off")
    assert admitted.count() == 3


def test_seen_canonicalization_merges_equivalent_urls(spark):
    cand = _candidates(spark, [
        "http://A.org/x?b=2&a=1",
        "http://a.org/x?a=1&b=2#frag",
    ])
    admitted, _ = filter_unseen(cand, None, mode="exact")
    assert admitted.count() == 1


def test_cuckoo_state_persists_blobs(spark):
    cand = _candidates(spark, [f"http://h{i}.org/{i}" for i in range(10)])
    _, state = filter_unseen(cand, empty_cuckoo_state(spark), mode="cuckoo",
                             num_shards=4)
    blobs = state.collect()
    assert {r.shard for r in blobs} <= set(range(4))
    assert all(r.blob is not None and len(r.blob) > 32 for r in blobs)


def test_cuckoo_matches_exact_on_event_candidates(spark):
    """f05's quality claim: on the sf0.01 frontier the cuckoo gate
    admits exactly the exact-mode set (FP probability ~2^-13 per probe
    at this occupancy — a mismatch here means a real regression)."""
    import __spark_entry__ as em
    from hepcrawl_spark.frontier.seen import filter_unseen

    cand = em._event_candidates(spark, "/root/testdata/sf0.01")
    exact, _ = filter_unseen(cand, None, mode="exact")
    cuckoo, _ = filter_unseen(cand, None, mode="cuckoo", num_shards=8)
    e = {(r.url, r.seq) for r in exact.select("url", "seq").collect()}
    c = {(r.url, r.seq) for r in cuckoo.select("url", "seq").collect()}
    assert c == e


# --- Bloom backend (the other filter the north rule names) ---------------

def test_bloom_no_false_negatives_and_roundtrip():
    s = BloomShard(m_bits=1 << 16, k=8)
    hs = np.random.RandomState(7).randint(
        -2**63, 2**63 - 1, size=4000, dtype=np.int64
    )
    s.insert_many(hs)
    assert s.contains_many(hs).all()  # Bloom guarantee: never forgets
    b = BloomShard.from_bytes(s.to_bytes())
    assert (b.words == s.words).all() and b.count == s.count
    assert b.contains(int(hs[0]))


def test_bloom_false_positive_rate_reasonable():
    s = BloomShard(m_bits=1 << 16, k=8)
    rng = np.random.RandomState(11)
    seen = rng.randint(-2**63, 2**63 - 1, size=4000, dtype=np.int64)
    fresh = rng.randint(-2**63, 2**63 - 1, size=20000, dtype=np.int64)
    s.insert_many(seen)
    fp = s.contains_many(fresh).mean()
    assert fp < 0.01  # ~16 bits/key, k=8 → ~6e-4 expected


def test_bloom_merge_is_bitwise_union():
    a, b = BloomShard(1 << 12, 4), BloomShard(1 << 12, 4)
    a.insert(1234)
    b.insert(-99)
    m = a.merge(b)
    assert m.contains(1234) and m.contains(-99)
    with pytest.raises(ValueError):
        a.merge(BloomShard(1 << 13, 4))


def test_bloom_admits_subset_of_exact_on_event_candidates(spark):
    """f06's quality claim: Bloom admits a SUBSET of the exact-mode set
    (false positives may drop new URLs; false negatives cannot exist),
    and on the sf0.01 frontier the subset is the full set."""
    import __spark_entry__ as em

    cand = em._event_candidates(spark, "/root/testdata/sf0.01")
    exact, _ = filter_unseen(cand, None, mode="exact")
    bloom, _ = filter_unseen(cand, None, mode="bloom", num_shards=8)
    e = {(r.url, r.seq) for r in exact.select("url", "seq").collect()}
    b = {(r.url, r.seq) for r in bloom.select("url", "seq").collect()}
    assert b <= e
    assert len(b) >= 0.99 * len(e)  # fp budget at this occupancy
    assert b == e  # measured: zero false positives on this corpus


def test_bloom_rejects_bad_shard_buckets_on_driver(spark):
    """The fail-fast covers BOTH degenerate classes: non-power-of-two
    bit counts AND shard_buckets <= 0 (where 0 & -1 == 0 would slip
    past the power-of-two test alone)."""
    cand = _candidates(spark, ["http://h0.org/a"])
    for bad in (3, 0, -16):
        with pytest.raises(ValueError, match="power-of-two"):
            filter_unseen(cand, None, mode="bloom", shard_buckets=bad)


def test_bloom_state_persists_blobs(spark):
    cand = _candidates(spark, [f"http://h{i}.org/{i}" for i in range(10)])
    _, state = filter_unseen(cand, None, mode="bloom", num_shards=4)
    blobs = state.collect()
    assert {r.shard for r in blobs} <= set(range(4))
    assert all(r.blob is not None and len(r.blob) > 24 for r in blobs)


@pytest.mark.parametrize("mode", ["exact", "bloom"])
def test_merge_seen_states_unions_two_crawls(spark, mode):
    """Fleet merge: two independently built states union into one
    that refuses BOTH crawls' URLs and still admits fresh ones."""
    from hepcrawl_spark.frontier.seen import merge_seen_states

    urls_a = [f"http://h{i % 4}.org/a{i}" for i in range(40)]
    urls_b = [f"http://h{i % 4}.org/b{i}" for i in range(40)]
    _, state_a = filter_unseen(
        _candidates(spark, urls_a), None, mode=mode, num_shards=4)
    _, state_b = filter_unseen(
        _candidates(spark, urls_b, start_seq=1000), None,
        mode=mode, num_shards=4)
    merged = merge_seen_states(state_a, state_b, mode=mode)

    probe = _candidates(
        spark, urls_a[:10] + urls_b[:10]
        + [f"http://h9.org/fresh{i}" for i in range(5)],
        start_seq=5000,
    )
    admitted, _ = filter_unseen(probe, merged, mode=mode, num_shards=4)
    got = sorted(r.url for r in admitted.collect())
    assert got == sorted(f"http://h9.org/fresh{i}" for i in range(5))
    # one-sided after merge too: nothing inserted is ever admitted
    # (no false negatives) — checked by the empty intersection above
    if mode == "bloom":
        assert {r.shard for r in merged.collect()} <= set(range(4))
    # None passthrough
    assert merge_seen_states(None, state_a, mode=mode) is state_a
    assert merge_seen_states(state_a, None, mode=mode) is state_a


@pytest.mark.parametrize("mode", ["exact", "cuckoo"])
def test_evict_seen_reopens_recrawl_urls(spark, mode):
    """Recrawl loop: evicting a due URL makes the gate admit it again
    while everything else stays refused."""
    from hepcrawl_spark.frontier.seen import evict_seen

    urls = [f"http://h{i % 4}.org/page{i}" for i in range(20)]
    cand = _candidates(spark, urls)
    _, state = filter_unseen(cand, None, mode=mode, num_shards=4)

    from pyspark.sql import functions as F

    due = cand.filter(F.col("url").contains("page3") |
                      F.col("url").contains("page7"))
    state2 = evict_seen(state, due, mode=mode, num_shards=4)

    probe = _candidates(spark, urls, start_seq=100)
    admitted, _ = filter_unseen(probe, state2, mode=mode, num_shards=4)
    got = sorted(r.url for r in admitted.collect())
    assert got == sorted(
        ["http://h3.org/page3", "http://h3.org/page7"])


def test_evict_seen_bloom_refuses(spark):
    from hepcrawl_spark.frontier.seen import evict_seen

    cand = _candidates(spark, ["http://h0.org/a"])
    _, state = filter_unseen(cand, None, mode="bloom", num_shards=4)
    with pytest.raises(ValueError, match="cannot delete"):
        evict_seen(state, cand, mode="bloom")
