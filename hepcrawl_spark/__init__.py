"""hepcrawl_spark — a from-scratch PySpark-native crawl-frontier + record
extraction engine with the query/data-processing capabilities of
bittirousku/hepcrawl (reference, read-only at /root/reference).

Architecture (Spark-first, NOT a port):

- ``frontier/``  — distributed URL frontier: seen-filter (exact anti-join /
  bloom / cuckoo shards), per-host politeness scheduler (window functions
  over salted host partitions), robots gate, round loop, resumable
  checkpoint store with per-partition lineage + metrics.
- ``extractors/`` — per-format record extraction (arXiv OAI, JATS, MARC21,
  NLM, Elsevier CONSYN, JSON APIs, thesis HTML) executed as vectorized
  Arrow batches via ``mapInPandas``; never per-row Python UDFs.
- ``functions/`` — the scalar transform library reproducing the reference's
  field cleaning semantics byte-identically (hepcrawl/inputs.py,
  outputs.py, utils.py, dateutils.py), plus Spark-SQL column helpers.
- ``ops/``       — large-scale training-data operators: dedup (exact,
  MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine), ANN similarity
  search, text quality/language-id/token stats, multimodal plumbing.
- ``sources/``   — pages/seeds/robots table readers + package (zip/tar)
  expansion + synthetic deterministic corpus generator.
- ``plans/``     — end-to-end crawl pipelines (seed → schedule → fetch-join
  → extract → sink) mirroring the reference spiders' flows.
"""

__version__ = "0.1.0"
