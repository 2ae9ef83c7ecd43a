"""Hybrid keyword+semantic search scoring — the reference's flagship
search mode (``search_params["hybrid"] = Hybrid(semantic_ratio=0.5)``,
api/services/meilisearch_client.py:110-125; route flag
api/routes/search.py:62,83). The reference delegates the blend to
Meilisearch; here it is re-expressed Spark-first:

* :func:`bm25_scores` — keyword relevance as pure DataFrame algebra:
  tokenize → explode → **prune to the query terms before any shuffle**
  → partial-agg term frequencies → broadcast-joined document
  frequencies → BM25. One corpus scan, one (doc, term) aggregation;
  the df/N/avgdl side inputs are tiny broadcasts. No UDF anywhere.
* :func:`hybrid_topk` — ``(1-ratio)·keyword + ratio·semantic`` with
  Meilisearch's default ``semantic_ratio=0.5``; keyword scores are
  max-normalized into [0,1] (the analog of Meilisearch's bounded
  ranking score), semantic is cosine vs the query embedding (0 for
  docs without a vector). Top-k compiles to TakeOrderedAndProject.

Scale path: the keyword leg only materializes rows for documents
containing a query term (the ``isin`` prune reaches the scan), and the
semantic leg composes with :func:`~meilisearchcrawler_spark.operators.
similarity.ann_topk_lsh` when a full cosine pass is too wide.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.similarity import _dot, _norm

BM25_K1 = 1.2
BM25_B = 0.75
DEFAULT_SEMANTIC_RATIO = 0.5  # meilisearch_client.py:111


def tokenize(col: Column) -> Column:
    """Lowercased alphanumeric tokens (shared with the DuckDB oracle:
    ``list_filter(string_split_regex(lower(x), '[^a-z0-9]+'), ...)``)."""
    return F.filter(F.split(F.lower(col), "[^a-z0-9]+"),
                    lambda x: x != "")


def bm25_scores(docs: DataFrame, query_terms: list[str],
                text_col: str = "text", id_col: str = "doc_id",
                k1: float = BM25_K1, b: float = BM25_B) -> DataFrame:
    """BM25 keyword relevance per document for a literal query-term
    list. Returns (id_col, kw_score) for documents matching ≥1 term."""
    from pyspark.sql.window import Window

    toks = (docs.select(id_col, tokenize(F.col(text_col)).alias("_toks"))
            .withColumn("_dl", F.size("_toks")))
    stats = toks.agg(F.count("*").alias("_n"), F.avg("_dl").alias("_avgdl"))
    terms = (toks.select(id_col, "_dl", F.explode("_toks").alias("term"))
             .filter(F.col("term").isin(list(query_terms))))
    tf = terms.groupBy(id_col, "term", "_dl").agg(F.count("*").alias("tf"))
    # document frequency as a window over the already-pruned tf rows —
    # no second corpus scan, and the shuffle moves only matching rows
    dfreq = F.count("*").over(Window.partitionBy("term"))
    return (tf.withColumn("df", dfreq)
            .crossJoin(F.broadcast(stats))
            .withColumn("_idf", F.log(
                1.0 + (F.col("_n") - F.col("df") + 0.5) / (F.col("df") + 0.5)))
            .withColumn("_w", F.col("_idf") * F.col("tf") * (k1 + 1.0)
                        / (F.col("tf") + k1 * (1.0 - b
                                               + b * F.col("_dl") / F.col("_avgdl"))))
            .groupBy(id_col).agg(F.sum("_w").alias("kw_score")))


def hybrid_topk(docs: DataFrame, embeddings: DataFrame,
                query_terms: list[str], query_vec: list[float],
                semantic_ratio: float = DEFAULT_SEMANTIC_RATIO,
                k: int = 20, text_col: str = "text",
                id_col: str = "doc_id", vec_id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Blended top-k: ``(1-ratio)·bm25_norm + ratio·cosine``. Returns
    (id, keyword_score, semantic_score, score) ordered by (score desc,
    id asc); ordering uses the rounded score so ranks are stable across
    engines (the DuckDB oracle orders identically)."""
    kw = bm25_scores(docs, query_terms, text_col=text_col, id_col=id_col)
    kmax = kw.agg(F.max("kw_score").alias("_kmax"))
    base = (docs.select(id_col)
            .join(kw, id_col, "left")
            .join(embeddings.select(F.col(vec_id_col).alias(id_col), vec_col),
                  id_col, "left")
            .crossJoin(F.broadcast(kmax)))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    import numpy as np

    qn = float(np.sqrt(np.sum(np.asarray(query_vec, dtype=np.float64) ** 2)))
    v = F.col(vec_col).cast("array<double>")
    cos = _dot(v, q) / (F.when(_norm(v) == 0, F.lit(1.0)).otherwise(_norm(v))
                        * F.lit(qn))
    sem = F.when(F.col(vec_col).isNull(), F.lit(0.0)).otherwise(cos)
    kwn = F.when(F.col("_kmax").isNull() | (F.col("_kmax") == 0), F.lit(0.0)) \
           .otherwise(F.coalesce(F.col("kw_score"), F.lit(0.0)) / F.col("_kmax"))
    score = F.round((1.0 - semantic_ratio) * kwn + semantic_ratio * sem, 6)
    return (base.select(F.col(id_col),
                        F.round(kwn, 6).alias("keyword_score"),
                        F.round(sem, 6).alias("semantic_score"),
                        score.alias("score"))
            .orderBy(F.desc("score"), F.asc(id_col))
            .limit(k))


def hybrid_oracle(docs: list[dict], embeddings: dict[int, list[float]],
                  query_terms: list[str], query_vec: list[float],
                  semantic_ratio: float = DEFAULT_SEMANTIC_RATIO,
                  k: int = 20) -> list[dict]:
    """Sequential reference implementation of the same blend, for the
    pytest oracle (mirrors the Meilisearch semantics the Spark form
    claims)."""
    import math
    import re

    tok = lambda t: [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]  # noqa: E731
    toks = {d["doc_id"]: tok(d["text"]) for d in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / max(n, 1)
    dfreq = {t: sum(1 for ts in toks.values() if t in ts) for t in query_terms}
    kw: dict[int, float] = {}
    for did, ts in toks.items():
        s = 0.0
        for t in query_terms:
            tf = ts.count(t)
            if not tf:
                continue
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (BM25_K1 + 1.0) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * len(ts) / avgdl))
        if s:
            kw[did] = s
    kmax = max(kw.values(), default=0.0)
    qn = math.sqrt(sum(x * x for x in query_vec))
    out = []
    for d in docs:
        did = d["doc_id"]
        kwn = (kw.get(did, 0.0) / kmax) if kmax else 0.0
        vec = embeddings.get(did)
        if vec is None:
            sem = 0.0
        else:
            vn = math.sqrt(sum(x * x for x in vec)) or 1.0
            sem = sum(a * b for a, b in zip(vec, query_vec)) / (vn * qn)
        score = round((1.0 - semantic_ratio) * kwn + semantic_ratio * sem, 6)
        out.append({"doc_id": did, "keyword_score": round(kwn, 6),
                    "semantic_score": round(sem, 6), "score": score})
    out.sort(key=lambda r: (-r["score"], r["doc_id"]))
    return out[:k]
