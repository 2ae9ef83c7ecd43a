"""Search-query logging sink + stats rollups — the write path behind
A4 (reference: ``StatsDB.log_search`` inserts one ``search_queries``
row per request, api/services/stats_db.py:127-185; the aggregations at
225-412 read it back).

Spark-first shape: searches arrive as a micro-batch; per-query source
hit counts come from one groupBy+pivot over the batch's result rows,
joined to the request parameters — one append-only ``search_queries``
delta per batch, same catalog-commit discipline as the crawl tables.
:func:`search_stats` is the read-side rollup (the q28 family runs the
same aggregation shapes through the driver oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SOURCES = ["meilisearch", "cse", "wiki"]  # stats_db.py:154-157


def build_search_log(params: DataFrame, results: DataFrame,
                     now: float) -> DataFrame:
    """One ``search_queries`` row per request (stats_db.py:127-185).

    ``params``: one row per request — (query_id long, query string,
    lang string, limit_requested int, use_cse boolean, use_reranking
    boolean, use_hybrid boolean, processing_time_ms double, cache_hit
    boolean).
    ``results``: one row per returned hit — (query_id long, source
    string in SOURCES).
    """
    counts = (results.groupBy("query_id")
              .pivot("source", SOURCES).count())
    per_source = [F.coalesce(F.col(s), F.lit(0)).alias(f"{s}_results")
                  for s in SOURCES]
    total = sum(F.coalesce(F.col(s), F.lit(0)) for s in SOURCES)
    return (params.join(counts, "query_id", "left")
            .select("query_id", "query", "lang", "limit_requested",
                    "use_cse", "use_reranking", "use_hybrid",
                    total.alias("total_results"), *per_source,
                    "processing_time_ms", "cache_hit",
                    F.lit(int(now)).alias("timestamp"),
                    F.lit(float(now)).alias("created_at")))


def search_stats(log: DataFrame, now: float) -> DataFrame:
    """Read-side rollup per lang (stats_db.get_search_stats shapes,
    stats_db.py:225-412): volumes, latency, cache-hit rate, last-hour
    count, per-source averages."""
    last_hour = (F.col("timestamp") >= F.lit(int(now) - 3600)).cast("int")
    return (log.groupBy("lang").agg(
        F.count("*").alias("n_queries"),
        F.round(F.avg("processing_time_ms"), 4).alias("avg_ms"),
        F.round(F.avg(F.col("cache_hit").cast("int")), 6).alias("cache_hit_rate"),
        F.sum(last_hour).alias("n_last_hour"),
        F.round(F.avg("total_results"), 4).alias("avg_results"),
        F.round(F.avg("meilisearch_results"), 4).alias("avg_meili"),
        F.round(F.avg("cse_results"), 4).alias("avg_cse"),
        F.round(F.avg("wiki_results"), 4).alias("avg_wiki"),
        F.sum(F.col("use_hybrid").cast("int")).alias("n_hybrid")))


def top_queries(log: DataFrame, k: int = 10) -> DataFrame:
    """A5 (stats_db.py:357-386): most frequent queries, ties by query."""
    return (log.groupBy("query").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("query")).limit(k))
