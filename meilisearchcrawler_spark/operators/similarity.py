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


# --------------------------------------------------------------- IVF ANN

def _dot_sql(vec_sql: str, vals: list[float]) -> str:
    return (f"aggregate(zip_with({vec_sql}, {_arr_sql(vals)}, "
            f"(x, y) -> x * y), 0.0D, (acc, val) -> acc + val)")


def _ivf_cid_expr(centroids: list[list[float]], vec_col: str) -> Column:
    """Coarse-quantizer assignment as ONE server-side-parsed SQL
    expression: cid = argmax_i dot(v, c_i), ties -> lowest cid
    (``array_position`` returns the FIRST index of the max). Plan
    literal, JVM-side, map-only — assignment never shuffles."""
    v = f"cast({vec_col} as array<double>)"
    ds = "array(" + ",".join(_dot_sql(v, c) for c in centroids) + ")"
    return F.expr(
        f"cast(array_position({ds}, array_max({ds})) as int) - 1")


def ivf_train(df: DataFrame, n_centroids: int = 16, iters: int = 1,
              vec_col: str = "embedding", id_col: str = "vec_id",
              dim: int | None = None,
              sample_mod: int = 1) -> list[list[float]]:
    """Deterministic IVF coarse-quantizer training (Lloyd iterations
    under the inner-product assignment), Spark-side.

    * Seed centroids = the vectors of the ``n_centroids`` smallest ids
      (``TakeOrderedAndProject`` — bounded collect), rounded to 6 dp so
      the plan literal is reproducible across engines.
    * Each iteration assigns the TRAINING SAMPLE (``pmod(id,
      sample_mod) = 0`` — at corpus scale train on a thin deterministic
      slice, not 100 TB) via the literal argmax expression (map-only),
      then recomputes each centroid as the element-wise mean — ``dim``
      ``avg`` aggregates in ONE map-side-partial groupBy, no explode,
      no per-element shuffle rows. Empty clusters keep their previous
      centroid. Centroids are rounded to 6 dp every iteration: both
      this trainer and the DuckDB oracle replay see identical plan
      constants regardless of FP summation order.

    Centroids are tiny (n_centroids x dim) — they travel as plan
    literals, exactly like the LSH hyperplanes."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    sample = df
    if sample_mod > 1:
        sample = df.filter(F.pmod(F.col(id_col), F.lit(sample_mod)) == 0)
    seed_rows = (sample.select(id_col, vec_col)
                 .orderBy(id_col).limit(n_centroids).collect())
    cents = [[round(float(x), 6) for x in r[vec_col]] for r in seed_rows]
    for _ in range(iters):
        assigned = sample.withColumn("_cid", _ivf_cid_expr(cents, vec_col))
        means = (assigned.groupBy("_cid")
                 .agg(*[F.round(F.avg(F.col(vec_col)[i].cast("double")), 6)
                        .alias(f"c{i}") for i in range(dim)])
                 .collect())
        by_cid = {int(r["_cid"]): [float(r[f"c{i}"]) for i in range(dim)]
                  for r in means}
        cents = [by_cid.get(i, cents[i]) for i in range(len(cents))]
    return cents


def ivf_assign(df: DataFrame, centroids: list[list[float]],
               vec_col: str = "embedding") -> DataFrame:
    """Adds ``cid`` — the row's inverted-list id. Map-only (plan-
    literal centroids); at write time PARTITION the index table BY
    ``cid`` so a probe scan file-skips every unprobed list."""
    return df.withColumn("cid", _ivf_cid_expr(centroids, vec_col))


def ivf_topk(df: DataFrame, query_vec: list[float], k: int = 10,
             n_centroids: int = 16, nprobe: int = 4, iters: int = 1,
             vec_col: str = "embedding", id_col: str = "vec_id",
             sample_mod: int = 1,
             centroids: list[list[float]] | None = None) -> DataFrame:
    """IVF approximate top-k (the Faiss-style alternative to
    :func:`ann_topk_lsh`): coarse-quantize, probe only the ``nprobe``
    inverted lists whose centroids score highest against the query,
    exact cosine + top-k within the probed lists.

    The probe set is computed driver-side from the (tiny) centroid
    table and lands in the plan as a literal ``cid IN (...)`` — with a
    ``cid``-partitioned index table the pruning happens at the parquet
    file level, before any dot product. Recall is governed by
    ``nprobe`` (tested, not assumed)."""
    if centroids is None:
        centroids = ivf_train(df, n_centroids=n_centroids, iters=iters,
                              vec_col=vec_col, id_col=id_col,
                              dim=len(query_vec), sample_mod=sample_mod)
    qv = np.asarray(query_vec, dtype=np.float64)
    scores = [float(np.dot(qv, np.asarray(c, dtype=np.float64)))
              for c in centroids]
    probe = sorted(range(len(centroids)),
                   key=lambda i: (-scores[i], i))[:nprobe]
    cand = ivf_assign(df, centroids, vec_col).filter(F.col("cid").isin(probe))
    return (
        cosine_scores(cand, query_vec, vec_col)
        .select(id_col, "cid", "score")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
