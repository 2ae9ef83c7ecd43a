"""Page-tree analytics — URL path segmentation (P17), hierarchy
rollup (A8), freshness bucketing (P16/A9), recrawl priority (T5).

Reference: ``dashboard/pages/Page_Tree.py`` — path split (139-147),
per-(site, path-prefix) counts with child sums (194-226), freshness
categories (118-137), ``0.7·last_crawl_days + 0.3·freshness_days``
top-10 recrawl list (265-284). All pure column algebra over the
engine's ``documents`` table: one explode + one groupBy per rollup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def path_segments(url: Column) -> Column:
    """P17: non-empty path segments of a URL."""
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    return F.filter(F.split(path, "/"), lambda s: s != "")


def pagetree_rollup(docs: DataFrame, url_col: str = "url",
                    site_col: str = "site") -> DataFrame:
    """A8: page count per (site, path-prefix) at every depth.
    ``posexplode`` of the segment array → cumulative prefix via
    ``slice`` → groupBy. One shuffle; prefixes of a URL are generated
    map-side."""
    segs = path_segments(F.col(url_col))
    exploded = docs.select(
        F.col(site_col).alias("site"), segs.alias("segs"),
        F.posexplode_outer(segs).alias("level", "segment"))
    prefix = F.concat_ws(
        "/", F.slice(F.col("segs"), 1, F.col("level") + 1))
    return (exploded
            .select("site", (F.col("level") + 1).alias("depth"),
                    prefix.alias("path_prefix"))
            .groupBy("site", "depth", "path_prefix")
            .agg(F.count("*").alias("n_pages")))


def freshness_bucket(age_days: Column) -> Column:
    """P16 (Page_Tree.py:118-137)."""
    return (F.when(age_days <= 0, "today")
            .when(age_days <= 7, "week")
            .when(age_days <= 30, "month")
            .when(age_days <= 90, "1-3mo")
            .otherwise("3mo+"))


def freshness_histogram(docs: DataFrame, now_ts: float,
                        indexed_col: str = "indexed_at") -> DataFrame:
    """A9: documents per freshness category."""
    age_days = (F.lit(now_ts) - F.col(indexed_col)) / F.lit(86400.0)
    return (docs.groupBy(freshness_bucket(age_days).alias("freshness"))
            .agg(F.count("*").alias("n")))


def recrawl_priority(docs: DataFrame, now_ts: float, k: int = 10) -> DataFrame:
    """T5 (Page_Tree.py:265-284): weighted staleness score, top-k."""
    crawl_days = (F.lit(now_ts) - F.col("last_crawled_at")) / F.lit(86400.0)
    fresh_days = (F.lit(now_ts) - F.col("indexed_at")) / F.lit(86400.0)
    score = F.round(0.7 * crawl_days + 0.3 * fresh_days, 6)
    return (docs.select("id", "url", score.alias("priority_score"))
            .orderBy(F.desc("priority_score"), F.asc("id"))
            .limit(k))
