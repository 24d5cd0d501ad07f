"""Training-data pipeline operators over web-text corpora.

These extend the crawl engine with the operations a 100 TB
training-data pipeline needs downstream of extraction:

- ``textops``    — tokenization, language-ID, quality scoring,
  document fingerprinting (all JVM-native column expressions).
- ``dedup``      — exact, n-gram-Jaccard, MinHash+LSH, SimHash
  near-duplicate detection.
- ``similarity`` — embedding cosine similarity: brute-force top-k
  and LSH-bucketed approximate nearest neighbours.
- ``multimodal`` — opaque binary media columns with typed metadata;
  decode/feature plumbing as Arrow-batched ``mapInPandas``.

Every operator is a pure function DataFrame → DataFrame, designed so
the hot path stays inside whole-stage codegen (built-in
``pyspark.sql.functions``); Python appears only in the clearly-marked
multimodal decode stubs.
"""
