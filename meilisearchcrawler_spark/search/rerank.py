"""Semantic rerank — reranker.py:23-92 semantics (T3).

Rows with a vector get score = cosine(query, vector); rows without
keep ``original_score × 0.1`` (the heavy penalty, reranker.py:70-76);
sort descending, take top-k. Cosine runs JVM-side via
``zip_with``/``aggregate`` (the reference's numpy matmul is already
vectorized — this is the distributed equivalent, no UDF)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rerank(results: DataFrame, query_embedding: list[float], top_k: int,
           vec_col: str = "vectors", id_col: str = "url") -> DataFrame:
    """Input columns: id_col, score (original), ``vec_col``
    (array<float>, nullable), rank (source-local position for
    deterministic tie-breaks)."""
    q = F.array(*[F.lit(float(x)) for x in query_embedding])
    qn = float(np.linalg.norm(np.asarray(query_embedding, dtype=np.float64)))
    v = F.col(vec_col).cast("array<double>")
    dot = F.aggregate(F.zip_with(v, q, lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    # reference guards zero norms with 1e-9 (reranker.py:63-64)
    cos = dot / (F.when(norm == 0, F.lit(1e-9)).otherwise(norm) * F.lit(qn))
    score = F.when(F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) > 0), cos) \
             .otherwise(F.col("score") * F.lit(0.1))
    return (results
            .withColumn("original_score", F.col("score"))
            .withColumn("score", F.round(score, 9))
            .orderBy(F.desc("score"), F.asc("rank"))
            .limit(top_k))


def rerank_oracle(results: list[dict], query_embedding: list[float],
                  top_k: int) -> list[dict]:
    """Direct port of reranker.py:44-88 for test comparison."""
    q = np.asarray(query_embedding, dtype=np.float64)
    qn = np.linalg.norm(q)
    out = []
    for r in results:
        r = dict(r)
        vec = r.get("vectors")
        if vec:
            v = np.asarray(vec, dtype=np.float64)
            n = np.linalg.norm(v) or 1e-9
            r["original_score"] = r["score"]
            r["score"] = float(np.dot(v / n, q / qn))
        else:
            r["score"] = r["score"] * 0.1
        out.append(r)
    out.sort(key=lambda x: x["score"], reverse=True)
    return out[:top_k]
