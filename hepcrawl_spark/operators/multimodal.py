"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata struct
— the same shape a 100 TB multimodal corpus uses (WARC payloads,
image shards).  The Spark-side plumbing is real and tested: schema,
Arrow-batched ``mapInPandas`` decode signature, partition-friendly
batch shape.  The *codec* itself is stubbed: the image/audio libraries
are not in this container, so ``decode_media`` computes deterministic
fake dimensions from the payload bytes, and ``real_decode_hook`` marks
where PIL/ffmpeg plug in (raises ``NotImplementedError``).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("n_bytes", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("frame_offsets", ArrayType(LongType())),
])


def real_decode_hook(payload: bytes, media_type: str):
    """Where a real codec (PIL / soundfile / pyav) plugs in.

    Deliberately unimplemented in this container — the deterministic
    fake below keeps the distributed plumbing testable.
    """
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "decode_media uses the deterministic fake decoder"
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for image decode: dimensions derived from
    byte length (mirrors the oracle arithmetic exactly)."""
    n = len(payload)
    return 16 + n % 624, 16 + (n * 7) % 464, 3


def _decode_batches(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for doc_id, payload, mtype in zip(
            pdf["doc_id"], pdf["media"], pdf["media_type"]
        ):
            data = bytes(payload) if payload is not None else b""
            width, height, channels = _fake_decode(data)
            n = len(data)
            # frame sampling stub: every ~quarter of the payload
            stride = max(1, n // 4)
            offsets = list(range(0, n, stride))[:4] if n else []
            out.append({
                "doc_id": int(doc_id),
                "media_type": mtype,
                "n_bytes": n,
                "width": width,
                "height": height,
                "channels": channels,
                "frame_offsets": offsets,
            })
        if out:
            yield pd.DataFrame(out, columns=MEDIA_META_SCHEMA.fieldNames())


def decode_media(media_df: DataFrame) -> DataFrame:
    """(doc_id, media binary, media_type) → typed metadata rows.

    Arrow-batched ``mapInPandas``; only the three needed columns ship
    into Python (column pruning reaches the scan), and output rows are
    1:1 with inputs so partitioning is preserved.
    """
    narrowed = media_df.select("doc_id", "media", "media_type")
    return narrowed.mapInPandas(_decode_batches, MEDIA_META_SCHEMA)


def resize_plan(meta: DataFrame, target: int = 224) -> DataFrame:
    """Resize plumbing: output dimensions that fit the longest side to
    ``target`` preserving aspect ratio, minimum 1 px.

    Pure integer arithmetic in whole-stage codegen (the pixel
    resample itself is codec work that plugs into
    ``real_decode_hook``); exactly mirrored by the DuckDB oracle, so
    the scheduling/plumbing layer is correctness-gated even though the
    codec is stubbed.
    """
    longest = F.greatest(F.col("width"), F.col("height")).cast("long")
    out_w = F.greatest(
        F.lit(1).cast("long"),
        F.floor((F.col("width").cast("long") * target) / longest),
    )
    out_h = F.greatest(
        F.lit(1).cast("long"),
        F.floor((F.col("height").cast("long") * target) / longest),
    )
    return meta.select(
        "doc_id", "width", "height",
        out_w.alias("out_width"),
        out_h.alias("out_height"),
    )


def frame_sample(meta: DataFrame) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled frame with its
    byte offset and length (≤ 4 frames, stride = max(1, n_bytes//4) —
    the ``decode_media`` sampling contract).

    ``posexplode`` over the typed offsets array; the frame byte-slice
    extraction itself is the codec seam.  Lengths are integer
    arithmetic → oracle-mirrorable.
    """
    stride = F.greatest(F.lit(1).cast("long"),
                        F.floor(F.col("n_bytes") / 4).cast("long"))
    return (
        meta.filter(F.col("n_bytes") > 0)
        .select(
            "doc_id", "n_bytes",
            stride.alias("_stride"),
            F.posexplode("frame_offsets").alias("frame_id", "offset"),
        )
        .select(
            "doc_id",
            F.col("frame_id").cast("long").alias("frame_id"),
            "offset",
            F.least(F.col("_stride"),
                    F.col("n_bytes") - F.col("offset")).alias("frame_len"),
        )
    )


def with_media_payload(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Synthesize an opaque media payload column from document text
    (UTF-8 bytes) — the sandbox stand-in for real image bytes."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("media"),
        F.lit("image/fake").alias("media_type"),
    )


# ---------------------------------------------------------------------------
# MIME sniffing from magic bytes (the in-band cousin of T22's HEAD)
# ---------------------------------------------------------------------------

# (hex prefix, mime) — the file(1)-style magic table for the types a
# crawl actually meets; checked in order, first match wins.  The
# reference resolves ambiguous types with a network HEAD request
# (/root/reference/hepcrawl/utils.py:154-162); content sniffing is the
# transport-free half a 100 TB batch pipeline runs instead.
MAGIC_PREFIXES: list[tuple[str, str]] = [
    ("89504E47", "image/png"),
    ("47494638", "image/gif"),
    ("25504446", "application/pdf"),
    ("504B0304", "application/zip"),
    ("FFD8FF", "image/jpeg"),
    ("4F676753", "audio/ogg"),
    ("52494646", "audio/wav"),
    ("1F8B", "application/gzip"),
]

_SNIFF_BYTES = max(len(h) for h, _ in MAGIC_PREFIXES) // 2


def sniff_mime(media_df: DataFrame, bin_col: str = "media",
               out_col: str = "sniffed_type") -> DataFrame:
    """Add ``sniffed_type`` from the payload's leading magic bytes
    (``application/octet-stream`` when nothing matches).

    One codegen projection: a BINARY ``substring`` of the first
    :data:`_SNIFF_BYTES` bytes (never the whole payload — a 100 MB
    video costs the same as a 1 KB icon), hex-encoded, then a
    first-match CASE over :data:`MAGIC_PREFIXES`.  No Python, no
    shuffle; the claimed ``media_type`` column stays untouched so
    downstream can meter type-spoofing (claimed != sniffed) for free.
    """
    h = F.hex(F.substring(F.col(bin_col), 1, _SNIFF_BYTES))
    verdict = F.lit("application/octet-stream")
    for prefix, mime in reversed(MAGIC_PREFIXES):
        verdict = F.when(h.startswith(prefix), F.lit(mime)) \
            .otherwise(verdict)
    return media_df.select("*", verdict.alias(out_col))


# ---------------------------------------------------------------------------
# Perceptual-hash media dedup (average-hash + Hamming band join)
# ---------------------------------------------------------------------------

PHASH_SAMPLES = 60  # 60-bit hash: 4 x 15-bit bands, sign bit untouched


def _phash_samples(b: Column, start0: Column, length: Column) -> Column:
    """60 evenly spaced single-byte samples of ``b[start0 : start0 +
    length]`` — absolute-offset addressing so a frame slice costs 60
    one-byte reads of the ORIGINAL binary, never a slice copy."""
    S = PHASH_SAMPLES
    return F.array(*[
        F.conv(
            F.hex(b.substr(
                (start0 + F.floor((F.lit(j) * length) / F.lit(S))
                 + 1).cast("int"),
                F.lit(1),
            )), 16, 10
        ).cast("long")
        for j in range(S)
    ])


def _phash_fold(samples: Column) -> Column:
    """bit_i = sample_i > mean, packed by a positional fold
    (``acc*2 + bit`` — lambda-safe on both engines)."""
    S = PHASH_SAMPLES

    def _build(sm):
        tot = F.aggregate(sm, F.lit(0).cast("long"),
                          lambda a, x: a + x)

        def _pack(t2):
            bits = F.transform(
                sm,
                lambda x: F.when(F.lit(S) * x > t2,
                                 F.lit(1).cast("long"))
                           .otherwise(F.lit(0).cast("long")),
            )
            return F.aggregate(bits, F.lit(0).cast("long"),
                               lambda a, x: a * 2 + x)

        return F.element_at(F.transform(F.array(tot), _pack), 1)

    return F.element_at(F.transform(F.array(samples), _build), 1)


def phash_media(media_df: DataFrame, bin_col: str = "media",
                id_col: str = "doc_id") -> DataFrame:
    """60-bit average-hash fingerprint per media payload — the
    aHash/pHash family every public image-dedup pipeline uses
    (near-identical images land within a small Hamming ball).

    The "pixel" source here is the payload's raw bytes sampled at 60
    evenly spaced offsets — the honest sandbox stand-in for the
    decoded grayscale grid (``real_decode_hook`` is where real pixels
    would enter; the hash arithmetic, banding and pair join are the
    real, tested scale path).  bit_i = sample_i > mean, compared by
    integer cross-multiplication (``S * b_i > sum``), packed by a
    positional fold (``acc*2 + bit`` — lambda-safe on both engines,
    where a per-index shift is not).

    100 TB shape: one codegen projection; each sample is a 1-byte
    BINARY ``substr`` + hex — per-row cost is 60 byte reads no matter
    how large the payload (the m04 lesson).  Zero-length payloads are
    excluded (no signal).
    """
    n = F.length(F.col(bin_col))
    ph = _phash_fold(_phash_samples(F.col(bin_col), F.lit(0).cast("long"), n))
    return media_df.where(n > 0).select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_bytes"),
        ph.alias("phash"),
    )


def phash_pairs(media_df: DataFrame, hamming_max: int = 3,
                bin_col: str = "media",
                id_col: str = "doc_id") -> DataFrame:
    """Near-duplicate media pairs within a Hamming ball via band
    pigeonhole — the media twin of ``dedup.simhash_pairs``: split the
    60-bit hash into 4 contiguous 15-bit bands; any pair at Hamming
    distance <= 3 agrees exactly on >= 1 band, so candidates come
    from an equi-join on (band_id, band_val) and the exact
    ``bit_count(xor)`` filter keeps the ball.  EXACT for
    ``hamming_max <= 3`` (pigeonhole over 4 bands), which is why the
    full-cross-join oracle can check it.

    100 TB shape: the join shuffles (band, value) keys — 4 rows per
    image, never the payloads; a viral exact-duplicate image makes a
    hot band bucket that AQE skew-split spreads.
    """
    hashes = phash_media(media_df, bin_col, id_col)
    bands = hashes.select(
        "doc_id", "phash",
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col("phash"), 15 * k)
                .bitwiseAND(F.lit(0x7FFF))
                for k in range(4)
            ])
        ).alias("band_id", "band_val"),
    )
    return (
        bands.alias("a")
        .join(bands.alias("b"), on=["band_id", "band_val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= hamming_max)
    )


def frame_scene_cuts(media_df: DataFrame, hamming_thresh: int = 12,
                     bin_col: str = "media",
                     id_col: str = "doc_id") -> DataFrame:
    """Shot-boundary (scene-cut) detection over the sampled frame
    grid — the standard cheap video-curation step: hash each sampled
    frame perceptually and call a cut wherever consecutive frames'
    hashes diverge past a Hamming threshold (near-identical
    consecutive frames collapse; a training pipeline keeps one frame
    per scene instead of four copies of the same shot).

    Frames are the ``decode_media`` stub's contract re-derived in
    pure codegen (stride = max(1, n//4), offsets i·stride < n); each
    frame's 60-bit aHash samples the ORIGINAL binary at absolute
    offsets — 60 one-byte reads per frame, no slice copy (the m04
    lesson).  Real decoders slot in at ``real_decode_hook``; the
    hashing, windowing and verdict are the real scale path.

    Output per frame: (doc_id, frame_id, offset, phash,
    hamming_prev — NULL on each document's first frame — and
    ``scene_cut`` = first frame or distance > threshold).

    100 TB shape: one codegen projection + a window partitioned by
    doc over ≤ 4 rows each — no Python, no corpus-sized state; the
    only shuffle is the per-doc window's hash partition.
    """
    n = F.length(F.col(bin_col))
    stride = F.greatest(F.lit(1).cast("long"),
                        F.floor(n / 4).cast("long"))
    frames = (
        media_df.where(n > 0)
        .select(
            F.col(id_col).alias("doc_id"),
            F.col(bin_col).alias("_b"),
            n.cast("long").alias("_n"),
            stride.alias("_stride"),
        )
        .select(
            "doc_id", "_b", "_n", "_stride",
            F.posexplode(
                F.filter(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(3)),
                        lambda i: i.cast("long") * F.col("_stride"),
                    ),
                    lambda o: o < F.col("_n"),
                )
            ).alias("frame_id", "_off"),
        )
    )
    flen = F.least(F.col("_stride"), F.col("_n") - F.col("_off"))
    scored = frames.select(
        "doc_id",
        F.col("frame_id").cast("long").alias("frame_id"),
        F.col("_off").alias("offset"),
        _phash_fold(
            _phash_samples(F.col("_b"), F.col("_off"), flen)
        ).alias("phash"),
    )
    w = Window.partitionBy("doc_id").orderBy("frame_id")
    out = scored.withColumn(
        "hamming_prev",
        F.when(
            F.lag("phash").over(w).isNotNull(),
            F.bit_count(
                F.col("phash").bitwiseXOR(F.lag("phash").over(w))
            ).cast("int"),
        ),
    )
    return out.withColumn(
        "scene_cut",
        (F.col("hamming_prev").isNull()
         | (F.col("hamming_prev") > F.lit(int(hamming_thresh))))
        .cast("int"),
    )
