"""Multi-source result merge — merger.py:32-95 semantics (J5 + T2 + U1).

Process: normalize URLs (P2, merger.py:97-130), dedup with source
priority (Meilisearch wins over CSE), weight scores (0.7 / 0.3), sort
by weighted score descending, cap at ``limit``. The reference's Python
sort is stable with Meilisearch rows first; the Spark order adds
explicit tiebreaks (source priority, original rank) so the result is
deterministic under ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.urls import normalize_url_merge_col


def merge_results(meili: DataFrame, cse: DataFrame, limit: int = 20,
                  meilisearch_weight: float = 0.7,
                  cse_weight: float = 0.3) -> DataFrame:
    """Inputs need columns (url, score, rank) where rank is the
    source-local position (0-based). Output: url, source, score
    (weighted), deduped by normalized URL with Meilisearch priority,
    top-``limit`` by score."""
    m = meili.select(
        "url", "rank",
        (F.col("score") * F.lit(meilisearch_weight)).alias("score"),
        F.lit("meilisearch").alias("source"), F.lit(0).alias("priority"))
    c = cse.select(
        "url", "rank",
        (F.col("score") * F.lit(cse_weight)).alias("score"),
        F.lit("google_cse").alias("source"), F.lit(1).alias("priority"))
    both = m.unionByName(c).withColumn(
        "norm_url", normalize_url_merge_col(F.col("url")))
    w = Window.partitionBy("norm_url").orderBy(F.asc("priority"), F.asc("rank"))
    deduped = (both.withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") == 1).drop("_rn", "norm_url"))
    return (deduped
            .orderBy(F.desc("score"), F.asc("priority"), F.asc("rank"))
            .limit(limit))


def merge_oracle(meili: list[dict], cse: list[dict], limit: int = 20,
                 meilisearch_weight: float = 0.7,
                 cse_weight: float = 0.3) -> list[dict]:
    """Direct port of merger.py:57-88 for test comparison."""
    from ..functions.urls import normalize_url_merge

    seen: set[str] = set()
    merged: list[dict] = []
    for r in meili:
        n = normalize_url_merge(r["url"])
        if n not in seen:
            merged.append({**r, "score": r["score"] * meilisearch_weight,
                           "source": "meilisearch"})
            seen.add(n)
    for r in cse:
        n = normalize_url_merge(r["url"])
        if n not in seen:
            merged.append({**r, "score": r["score"] * cse_weight,
                           "source": "google_cse"})
            seen.add(n)
    merged.sort(key=lambda r: r["score"], reverse=True)
    return merged[:limit]
