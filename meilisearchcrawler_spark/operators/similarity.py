"""Embedding similarity — rerank + ANN over ``array<float>`` columns.

The reference's reranker computes cosine(query, doc) over Meilisearch
hits with a numpy matmul (reranker.py:44-88, T3) and penalizes missing
vectors ×0.1 (reranker.py:70-76). Here:

* :func:`cosine_scores` / :func:`cosine_topk` — brute-force baseline,
  pure column algebra (``zip_with`` + ``aggregate``) so the scan stays
  JVM-side; ``TakeOrderedAndProject`` handles the top-k (no full sort).
* :func:`hyperplane_buckets` / :func:`ann_topk_lsh` — the scale path:
  random-hyperplane LSH buckets (sign bits of dot products with
  deterministic seeded hyperplanes). At 100 TB the bucket-join probes
  only matching buckets instead of scanning every vector; the
  hyperplanes are a literal array (broadcast-free plan constant).

Missing-vector penalty semantics follow reranker.py:70-76.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_scores(df: DataFrame, query_vec: list[float],
                  vec_col: str = "embedding") -> DataFrame:
    """Cosine vs a literal query vector; rows with a null vector score
    0.0. (The reference's ×0.1 missing-vector *penalty on the original
    keyword score*, reranker.py:70-76, needs that score column — it
    lives in :func:`meilisearchcrawler_spark.search.rerank.rerank`.)"""
    qn = float(np.sqrt(np.sum(np.asarray(query_vec, dtype=np.float64) ** 2)))
    # one server-side-parsed SQL expression (see hyperplane_buckets:
    # per-element literal Columns cost driver time linear in dim)
    v = f"cast({vec_col} as array<double>)"
    dot = (f"aggregate(zip_with({v}, {_arr_sql(query_vec)}, "
           f"(x, y) -> x * y), 0.0D, (acc, val) -> acc + val)")
    norm = f"sqrt(aggregate({v}, 0.0D, (acc, val) -> acc + val * val))"
    cos = (f"({dot}) / ((case when {norm} = 0.0D then 1.0D "
           f"else {norm} end) * {qn!r}D)")
    score = F.when(F.col(vec_col).isNull(), F.lit(0.0)).otherwise(F.expr(cos))
    return df.withColumn("score", F.round(score, 6))


def cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Brute-force top-k: orderBy(score desc, id asc).limit(k) compiles
    to TakeOrderedAndProject — per-partition heaps, no global sort."""
    return (
        cosine_scores(df, query_vec, vec_col)
        .select(id_col, "score")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def make_hyperplanes(dim: int, nbits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic seeded Gaussian hyperplanes (plan constants)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim)).round(6).tolist()


def _arr_sql(vals) -> str:
    return "array(" + ",".join(f"{float(x)!r}D" for x in vals) + ")"


def hyperplane_buckets(df: DataFrame, planes: list[list[float]],
                       vec_col: str = "embedding") -> DataFrame:
    """Sign-bit LSH bucket id per row: bit i = (v · plane_i) >= 0.

    The expression is assembled as ONE SQL string (``F.expr``) instead
    of nested Column operations: nbits × dim literal plane arrays built
    per-element through py4j cost ~2 s of DRIVER time per query (the
    round-3 q22 bench regression — plan construction, not execution),
    while a single server-side parse is ~50 ms. Same analyzed plan,
    JVM-side whole-stage codegen either way."""
    v = f"cast({vec_col} as array<double>)"
    terms = []
    for i, plane in enumerate(planes):
        dot = (f"aggregate(zip_with({v}, {_arr_sql(plane)}, "
               f"(x, y) -> x * y), 0.0D, (acc, val) -> acc + val)")
        terms.append(f"(case when {dot} >= 0 then {1 << i}L else 0L end)")
    return df.withColumn("bucket", F.expr(" + ".join(terms)))


def ann_topk_lsh(df: DataFrame, query_vec: list[float], k: int = 10,
                 nbits: int = 8, seed: int = 42,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 multiprobe_hamming: int = 1) -> DataFrame:
    """Approximate top-k: score only rows whose LSH bucket is within
    ``multiprobe_hamming`` bits of the query's bucket (multi-probe
    keeps recall up on boundary vectors). The bucket filter is a plan
    literal set — it prunes *before* the expensive dot products."""
    dim = len(query_vec)
    planes = make_hyperplanes(dim, nbits, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    qbucket = 0
    for i, plane in enumerate(planes):
        if float(np.dot(qv, np.asarray(plane))) >= 0:
            qbucket |= 1 << i
    probe = [
        b for b in range(1 << nbits)
        if bin(b ^ qbucket).count("1") <= multiprobe_hamming
    ]
    bucketed = hyperplane_buckets(df, planes, vec_col)
    pruned = bucketed.filter(F.col("bucket").isin(probe))
    return (
        cosine_scores(pruned, query_vec, vec_col)
        .select(id_col, "bucket", "score")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def cosine_near_pairs_exact(df: DataFrame, threshold: float = 0.9,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id") -> DataFrame:
    """Embedding-cosine near-duplicate pairs, exact form: normalized
    self-join with ``id_a < id_b`` and cosine ≥ threshold. Correctness
    baseline for small inputs and the DuckDB oracle twin; at corpus
    scale use :func:`cosine_near_pairs_lsh`."""
    v = F.col(vec_col).cast("array<double>")
    n = F.when(_norm(v) == 0, F.lit(1.0)).otherwise(_norm(v))
    unit = df.select(F.col(id_col),
                     F.transform(v, lambda x: x / n).alias("_unit"))
    a, b = unit.alias("a"), unit.alias("b")
    cos = F.round(_dot(F.col("a._unit"), F.col("b._unit")), 6)
    return (a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    cos.alias("cosine"))
            .filter(F.col("cosine") >= threshold))


def cosine_near_pairs_lsh(df: DataFrame, threshold: float = 0.9,
                          nbits: int = 12, seed: int = 42,
                          max_block_hamming: int = 2,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id",
                          dim: int | None = None) -> DataFrame:
    """Scale path: hyperplane-LSH blocking then exact cosine on
    candidates. Pairs at cosine ≥ t disagree on a hyperplane with
    probability arccos(t)/π per bit, so near-dup pairs land within a
    few Hamming bits; the block-permutation join (as in SimHash) finds
    every pair within ``max_block_hamming`` bucket bits without an n²
    cross join. Approximate by design — recall is tested, not assumed.

    Pass ``dim`` explicitly in production plans; the ``first()`` sniff
    is a convenience fallback that triggers an extra job."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = make_hyperplanes(dim, nbits, seed)
    bucketed = hyperplane_buckets(df, planes, vec_col)
    v = F.col(vec_col).cast("array<double>")
    n = F.when(_norm(v) == 0, F.lit(1.0)).otherwise(_norm(v))
    unit = bucketed.select(F.col(id_col), F.col("bucket"),
                           F.transform(v, lambda x: x / n).alias("_unit"))
    nblocks = max_block_hamming + 1
    width = max(nbits // nblocks, 1)
    blocks = [
        F.struct(F.lit(bi).alias("block_id"),
                 F.shiftrightunsigned(F.col("bucket"), bi * width)
                 .bitwiseAND(F.lit((1 << width) - 1)).alias("block_val"))
        for bi in range(nblocks)
    ]
    blocked = unit.select(id_col, "_unit", "bucket",
                          F.explode(F.array(*blocks)).alias("b")) \
                  .select(id_col, "_unit", "bucket", "b.block_id", "b.block_val")
    a, b = blocked.alias("a"), blocked.alias("b")
    cos = F.round(_dot(F.col("a._unit"), F.col("b._unit")), 6)
    return (a.join(b, (F.col("a.block_id") == F.col("b.block_id"))
                   & (F.col("a.block_val") == F.col("b.block_val"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"), cos.alias("cosine"))
            .filter(F.col("cosine") >= threshold)
            .distinct())
