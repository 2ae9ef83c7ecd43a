"""meilisearchcrawler_spark — a PySpark-native fetch-extract-index engine.

A from-scratch reimplementation of the *capabilities* of
``laurentftech/MeilisearchCrawler`` (reference snapshot read-only at
``/root/reference/``) as an idiomatic Spark dataflow:

* URL frontier + fetch scheduler as driver-orchestrated DataFrame
  micro-batch rounds over checkpointed tables (Iceberg-shaped commits;
  parquet-manifest catalog stands in for Iceberg in this sandbox).
* Partitioned Bloom-filter URL-seen set over canonicalized+hashed URLs
  (pre-filter only; exact anti-joins are authoritative).
* Per-host politeness budgets + salted host-hash repartitioning for
  hot-host skew.
* All per-row work in Arrow/pandas UDFs — no per-row Python in the hot
  path.

The reference's behaviors are cited throughout as
``crawler.py:<line>`` (into /root/reference/meilisearchcrawler/).
"""

__version__ = "0.1.0"
