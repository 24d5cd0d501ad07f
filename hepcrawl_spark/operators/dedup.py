"""Near-duplicate detection: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale ladder (the 100 TB story):

- ``exact_dedup``          — one hash-groupBy; the cheapest gate.
- ``minhash_lsh_pairs``    — the scale path: per-document signatures
  are a single whole-stage-codegen expression (no shuffle), banding
  explodes only b small keys per doc, and the candidate join touches
  only colliding buckets.  Candidates are then *exactly* verified, so
  precision is 1.0 and recall is 1-(1-s^r)^b (~5e-8 misses at
  s ≥ 0.8 with r=4, b=32).
- ``ngram_jaccard_pairs``  — exact all-pairs Jaccard via an inverted
  shingle index; the correctness oracle for MinHash.  Quadratic in
  posting-list sizes, so at scale it runs only on LSH candidates
  (that is exactly what ``minhash_lsh_pairs`` does internally).
- ``simhash_pairs``        — Hamming-ball near-dup via 4×16-bit band
  pigeonhole join (any pair within Hamming ≤ 3 of 64 bits shares at
  least one exact 16-bit band; wider thresholds trade recall).

Everything is JVM-native column expressions — signatures, banding and
verification never leave whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textops import tokens_col

MINHASH_PERMS = 128
MINHASH_BAND_ROWS = 4  # r; b = PERMS / r = 32 bands
# r=4 keeps the candidate volume tiny on corpora whose random-pair
# similarity is ~0.1-0.3 (expected band hits per pair = b*s^4), while
# recall at s>=0.8 stays 1 - (1-0.8^4)^32 = 1 - 4.6e-8.

_PRIME = 2147483647  # 2^31-1; universal-hash modulus

def _splitmix(i: int) -> int:
    """Deterministic 64-bit mix (SplitMix64) for permutation constants."""
    z = (i * 0x9E3779B97F4A7C15 + 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def _perm_consts(n: int):
    """(a_i, b_i) universal-hash constants: a odd, both < 2^30 so
    a*h32 + b never overflows int64 (h32 < 2^32)."""
    return [
        ((_splitmix(2 * i) & 0x3FFFFFFF) | 1, _splitmix(2 * i + 1) & 0x3FFFFFFF)
        for i in range(n)
    ]


def shingles_col(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (space-joined), lowercased.

    SQL mirror: slide a window over ``regexp_split_to_array`` output.
    """
    t = tokens_col(text)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(t) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(t, i + j + 1) for j in range(n)]
        ),
    )
    return F.array_distinct(
        F.when(F.size(t) >= n, grams).otherwise(F.array().cast("array<string>"))
    )


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate groups by content hash (md5 of raw text).

    One hash-groupBy with map-side partial aggregation; the canonical
    survivor is the smallest id (deterministic).
    """
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_md5"))
        .groupBy("text_md5")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
    )


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.8,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Exact n-gram Jaccard similarity pairs via inverted shingle index.

    pairs sharing ≥1 shingle → |A∩B| by count, |A∪B| = |A|+|B|-|A∩B|.
    Jaccard is a small-int ratio → bit-exact across engines.

    Scale note: the shingle self-join is quadratic in posting-list
    length; at corpus scale use ``minhash_lsh_pairs`` (which verifies
    with this exact measure but only on LSH candidates).
    """
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles_col(F.col(text_col), n)).alias("shingle"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), on="shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    j = (
        inter.join(F.broadcast(sizes.withColumnRenamed("n_sh", "n_a")),
                   inter.doc_a == F.col("doc_id")).drop("doc_id")
        .join(F.broadcast(sizes.withColumnRenamed("n_sh", "n_b")),
              inter.doc_b == F.col("doc_id")).drop("doc_id")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "jaccard"
    )


def minhash_signature(text: Column, n: int = 3,
                      perms: int = MINHASH_PERMS) -> Column:
    """MinHash signature as one single-pass fold — no shuffle.

    Each shingle is string-hashed ONCE (xxhash64, JVM-side), then the
    ``perms`` permutation values derive arithmetically via a universal
    hash family sig_i = min over shingles of (a_i*h32 + b_i) mod p —
    the standard MinHash construction, and ~perms× cheaper than
    re-hashing the string per permutation (higher-order-function
    lambdas evaluate interpreted, so per-element work must be integer
    arithmetic, not string hashing).
    """
    sh = shingles_col(text, n)
    hs = F.transform(sh, lambda s: F.xxhash64(s).bitwiseAND(F.lit(0xFFFFFFFF)))
    consts = _perm_consts(perms)
    const_arr = F.array(*[
        F.struct(F.lit(a).alias("a"), F.lit(b).alias("b")) for a, b in consts
    ])
    init = F.array_repeat(F.lit(1 << 62).cast("long"), perms)
    return F.aggregate(
        hs,
        init,
        lambda acc, h: F.zip_with(
            acc, const_arr,
            lambda m, c: F.least(m, (c["a"] * h + c["b"]) % F.lit(_PRIME)),
        ),
    )


def minhash_lsh_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.8,
                      perms: int = MINHASH_PERMS,
                      band_rows: int = MINHASH_BAND_ROWS,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """MinHash + banded LSH candidate generation, exact-Jaccard verify.

    Output (doc_a, doc_b, jaccard) — identical to exact
    ``ngram_jaccard_pairs`` up to LSH recall (1-(1-s^r)^b; ~1e-14 miss
    at s=0.8, r=2, b=32).
    """
    n_bands = perms // band_rows
    # signature compute is per-row CPU-bound: spread a narrow input
    # (e.g. a single-row-group parquet) across the cluster first
    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        shingles_col(F.col(text_col), n).alias("sh"),
        minhash_signature(F.col(text_col), n, perms).alias("sig"),
    ).filter(F.size("sh") > 0)

    banded = base.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.xxhash64(
                    b,
                    F.concat_ws(
                        "_",
                        F.transform(
                            F.slice(
                                F.col("sig"), b * band_rows + 1, band_rows
                            ),
                            lambda h: h.cast("string"),
                        ),
                    ),
                ),
            )
        ).alias("band_key"),
    )
    cands = (
        banded.alias("a")
        .join(banded.alias("b"), on="band_key")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    sets_a = base.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sets_b = base.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    verified = (
        cands.join(sets_a, on="doc_a").join(sets_b, on="doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.size("sh_a") + F.size("sh_b") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("doc_a", "doc_b", "jaccard")


def simhash_col(text: Column, bits: int = 64) -> Column:
    """64-bit SimHash over whitespace tokens as one single-pass fold.

    One independent universal-hash bit per position: per bit, sum ±1
    over tokens; the fingerprint packs sign bits via a high-to-low
    fold.
    """
    toks = tokens_col(text)
    # hash each token ONCE; per-bit ±1 derives arithmetically via the
    # universal family (see minhash_signature for why).
    hs = F.transform(toks, lambda tk: F.xxhash64(tk).bitwiseAND(F.lit(0xFFFFFFFF)))
    consts = _perm_consts(bits)
    const_arr = F.array(*[
        F.struct(F.lit(a).alias("a"), F.lit(b).alias("b")) for a, b in consts
    ])
    bitsums = F.aggregate(
        hs,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc, const_arr,
            lambda s, c: s + (((c["a"] * h + c["b"]) % F.lit(_PRIME))
                              .bitwiseAND(F.lit(1)) * 2 - 1),
        ),
    )
    # pack with bitwise shift (wraps at the sign bit; ANSI-safe,
    # unlike arithmetic acc*2 which overflows when building bit 63)
    return F.aggregate(
        F.reverse(bitsums),
        F.lit(0).cast("long"),
        lambda acc, s: F.shiftleft(acc, 1).bitwiseOR(
            F.when(s > 0, 1).otherwise(0).cast("long")
        ),
    )


def simhash_pairs(docs: DataFrame, hamming_max: int = 3,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs within a Hamming ball via band pigeonhole.

    Split the 64-bit fingerprint into 4 contiguous 16-bit bands; any
    pair with Hamming distance ≤ 3 matches exactly on ≥ 1 band, so the
    candidate join is an equi-join on (band_id, band_value), then an
    exact ``bit_count(xor)`` filter.
    """
    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    sims = docs.select(
        F.col(id_col).alias("doc_id"),
        simhash_col(F.col(text_col)).alias("simhash"),
    )
    bands = sims.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col("simhash"), 16 * k)
                .bitwiseAND(F.lit(0xFFFF))
                for k in range(4)
            ])
        ).alias("band_id", "band_val"),
    )
    pairs = (
        bands.alias("a")
        .join(bands.alias("b"), on=["band_id", "band_val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= hamming_max)
