"""The full search post-processing pipeline — search.py:78-165
semantics (SURVEY §3.2 steps 4-5).

Order (exactly the route's): safety-filter each source (F17) → wiki
dedup by id, first occurrence wins (J6) → ``deduped_wiki +
merge(meili, cse, limit·2)`` (U1 + J5/T2, wiki rows *prepended*
unweighted) → optional rerank over the concatenation (T3) → final
``[:limit]`` with vectors stripped (the -90% payload optimization,
search.py:163-165).

Inputs are source DataFrames with (id, url, title, excerpt, content,
score, vectors, rank); each source is already overscanned by its
fetcher (T7: meili limit·2, wiki 5 per instance — that part is the
fetch call, not post-processing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .merge import merge_results
from .rerank import rerank
from .safety import is_safe_col

_COLS = ["id", "url", "title", "excerpt", "content", "score", "vectors", "rank"]


def _safety(df: DataFrame, cfg: dict) -> DataFrame:
    return df.filter(is_safe_col(cfg, F.col("url"), F.col("title"),
                                 F.col("excerpt"), F.col("content")))


def search_pipeline(meili: DataFrame, cse: DataFrame, wiki: DataFrame,
                    limit: int, safety_cfg: dict | None = None,
                    query_embedding: list[float] | None = None) -> DataFrame:
    safety_cfg = safety_cfg or {}
    meili = _safety(meili.select(*_COLS), safety_cfg)
    cse = _safety(cse.select(*_COLS), safety_cfg)
    wiki = _safety(wiki.select(*_COLS), safety_cfg)

    # J6: wiki dedup by id, first occurrence (search.py:144-151)
    wdedup = Window.partitionBy("id").orderBy(F.asc("rank"))
    wiki = (wiki.withColumn("_rn", F.row_number().over(wdedup))
            .filter(F.col("_rn") == 1).drop("_rn"))

    # merge meili+cse (weights inside), then *prepend* wiki rows —
    # wiki scores are unweighted and order is wiki-first (search.py:152)
    merged = merge_results(
        meili.select("url", "score", "rank"),
        cse.select("url", "score", "rank"), limit=limit * 2)
    meta = (meili.withColumn("_prio", F.lit(0))
            .unionByName(cse.withColumn("_prio", F.lit(1))))
    wmeta = Window.partitionBy("url").orderBy(F.asc("_prio"), F.asc("rank"))
    meta = (meta.withColumn("_rn", F.row_number().over(wmeta))
            .filter(F.col("_rn") == 1)
            .select("url", "id", "title", "excerpt", "content", "vectors"))
    merged_docs = (merged.join(meta, "url", "left")
                   .select("id", "url", "title", "excerpt", "content",
                           "score", "vectors",
                           # position wiki rows ahead: offset merged ranks
                           (F.row_number().over(
                               Window.orderBy(F.desc("score"),
                                              F.asc("priority"),
                                              F.asc("rank")))
                            + F.lit(1_000_000)).alias("rank")))
    wiki_rows = wiki.select("id", "url", "title", "excerpt", "content",
                            "score", "vectors", "rank")
    combined = wiki_rows.unionByName(merged_docs)

    if query_embedding is not None:
        out = rerank(combined, query_embedding, top_k=limit)
    else:
        # no rerank: keep list order (wiki first, then merged by score)
        out = combined.orderBy(F.asc("rank")).limit(limit)
    # strip vectors from the response (search.py:163-165)
    return out.drop("vectors")


def search_pipeline_oracle(meili: list[dict], cse: list[dict],
                           wiki: list[dict], limit: int,
                           safety_cfg: dict | None = None,
                           query_embedding: list[float] | None = None) -> list[dict]:
    """Sequential port of search.py:140-165 for test comparison."""
    from .merge import merge_oracle
    from .rerank import rerank_oracle
    from .safety import is_safe_oracle

    cfg = safety_cfg or {}
    meili = [r for r in meili if is_safe_oracle(cfg, r)]
    cse = [r for r in cse if is_safe_oracle(cfg, r)]
    wiki = [r for r in wiki if is_safe_oracle(cfg, r)]
    seen_ids: set = set()
    deduped_wiki = []
    for r in wiki:
        if r["id"] not in seen_ids:
            deduped_wiki.append(dict(r))
            seen_ids.add(r["id"])
    merged = merge_oracle(meili, cse, limit=limit * 2)
    combined = deduped_wiki + merged
    if query_embedding is not None:
        combined = rerank_oracle(combined, query_embedding, top_k=limit)
    final = combined[:limit]
    return [{k: v for k, v in r.items() if k != "vectors"} for r in final]
