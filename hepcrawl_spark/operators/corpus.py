"""End-to-end corpus cleaning pipeline — the composition a web-scale
training-data pipeline runs over raw crawled documents:

    Gopher quality gate → language ID → exact dedup → fingerprint

Reference analog: the spiders' record pipeline composes the same way
(filter → classify → dedup → emit; see
/root/reference/hepcrawl/pipelines.py:61-117 for the emit side); here
the corpus-scale version is a single declarative plan.

Plan shape at 100 TB: ONE codegen scan pass computes every per-doc
signal from a once-bound token array (no Python, no repeated
tokenization); the Gopher verdict filters BEFORE the pipeline's only
shuffle — the content-hash dedup exchange — so only surviving
documents move; the survivor per content hash is chosen by a
row_number window partitioned by that hash (never a global window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textops import (
    bind_once,
    fingerprint_col,
    gopher_signals,
    tokens_col,
)


def clean_corpus(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 lang_threshold: float = 0.04,
                 **gopher_thresholds) -> DataFrame:
    """Documents that pass the Gopher rules, exact-deduped by content
    hash (smallest id survives), tagged with language guess, token
    count and rolling-hash fingerprint.

    ``lang_threshold`` is the ``lang_id`` stopword-ratio cut; the
    ratio is re-derived from the already-computed signal struct
    (stopword_cnt / token_cnt) so the token array is folded exactly
    once per document.
    """
    sig = bind_once(
        tokens_col(F.col(text_col)),
        lambda t: F.struct(
            gopher_signals(t, **gopher_thresholds).alias("g"),
            fingerprint_col(t).alias("fp"),
        ),
    )
    base = (
        docs.select(
            F.col(id_col),
            F.md5(F.col(text_col)).alias("_md5"),
            sig.alias("_s"),
        )
        .filter(F.col("_s.g.passes") == 1)
    )
    w = Window.partitionBy("_md5").orderBy(F.col(id_col).asc())
    ratio = (F.col("_s.g.stopword_cnt").cast("double")
             / F.col("_s.g.token_cnt").cast("double"))
    return (
        base.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            id_col,
            F.when(ratio >= F.lit(lang_threshold), F.lit("en"))
             .otherwise(F.lit("und")).alias("guessed_lang"),
            F.col("_s.g.token_cnt").alias("token_cnt"),
            F.col("_s.fp").alias("fingerprint"),
        )
    )
