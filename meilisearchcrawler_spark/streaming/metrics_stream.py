"""Live crawl-metrics stream — Structured Streaming over the catalog's
``metrics`` deltas.

The reference writes ``data/status.json`` every ~20 pages for its
dashboard (crawler.py:885-890, S9) and the API tails it
(api/services/crawler_status.py:12-25). Here the equivalent live view
is a file-source stream over the metrics table directory: every round
commit drops new parquet files, the stream picks them up, and a
windowless running aggregate (``outputMode="complete"``) maintains the
per-(site, action) counter rollup (A2) that the dashboard reads.

The crawl itself deliberately stays a driver-orchestrated batch loop
(deterministic ordering — SURVEY.md §7); streaming is the *read* side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

METRICS_SCHEMA = "site string, action string, count long, round int"


def metrics_stream(spark: SparkSession, catalog_root: str) -> DataFrame:
    """Streaming DataFrame over the metrics deltas (one subdir per
    round commit)."""
    path = os.path.join(catalog_root, "metrics")
    return (spark.readStream.schema(METRICS_SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(path))


def live_counter_rollup(stream: DataFrame) -> DataFrame:
    """Running CrawlStats rollup (A2, crawler.py:764-827): cumulative
    per-(site, action) counts plus the latest round seen."""
    return (stream.groupBy("site", "action")
            .agg(F.sum("count").alias("total"),
                 F.max("round").alias("last_round")))


def run_rollup_once(spark: SparkSession, catalog_root: str,
                    checkpoint_dir: str) -> list:
    """Drain everything currently committed (availableNow trigger) into
    an in-memory sink and return the rollup rows — the test/demo entry;
    a deployment would use the same query with a continuous trigger and
    a dashboard-facing sink."""
    query = (live_counter_rollup(metrics_stream(spark, catalog_root))
             .writeStream.outputMode("complete")
             .format("memory").queryName("crawl_status")
             .option("checkpointLocation", checkpoint_dir)
             .trigger(availableNow=True)
             .start())
    query.awaitTermination()
    return spark.sql("SELECT * FROM crawl_status").collect()
