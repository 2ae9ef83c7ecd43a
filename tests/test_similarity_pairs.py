"""Embedding-cosine near-dup: the LSH scale path must recover the
exact baseline's pairs (recall check at near-dup thresholds)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from meilisearchcrawler_spark.operators.similarity import (
    cosine_near_pairs_exact,
    cosine_near_pairs_lsh,
)


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(21)
    rows = []
    for i in range(200):
        v = rng.standard_normal(32)
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v]))
    # true near-dups: small perturbations of existing vectors
    for j in range(20):
        base = np.array(rows[j].embedding)
        noisy = base + rng.standard_normal(32) * 0.05 * np.linalg.norm(base) / np.sqrt(32)
        rows.append(Row(vec_id=1000 + j, embedding=[float(x) for x in noisy]))
    return spark.createDataFrame(rows)


def test_exact_pairs_find_planted_neardups(vectors):
    pairs = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in cosine_near_pairs_exact(vectors, threshold=0.9).collect()}
    for j in range(20):
        assert (j, 1000 + j) in pairs, f"planted pair {j} missing"
        assert pairs[(j, 1000 + j)] >= 0.9
    # random 32-d vectors almost never reach cosine 0.9
    assert len(pairs) <= 25


def test_lsh_pairs_recall(vectors):
    exact = {(r["id_a"], r["id_b"])
             for r in cosine_near_pairs_exact(vectors, threshold=0.9).collect()}
    lsh = {(r["id_a"], r["id_b"])
           for r in cosine_near_pairs_lsh(vectors, threshold=0.9,
                                          nbits=12, max_block_hamming=2).collect()}
    assert lsh <= exact  # candidates are cosine-verified: no false positives
    recall = len(lsh & exact) / max(len(exact), 1)
    assert recall >= 0.9, f"LSH recall {recall:.2f} below 0.9 ({len(lsh)}/{len(exact)})"


def test_ivf_full_probe_equals_brute_force(vectors):
    """nprobe = n_centroids degenerates to exact search: every list is
    probed, so the top-k must equal the brute-force baseline."""
    from meilisearchcrawler_spark.operators.similarity import (
        cosine_topk, ivf_topk)

    q = vectors.filter("vec_id = 3").first()["embedding"]
    exact = [(r["vec_id"], r["score"])
             for r in cosine_topk(vectors, q, k=10).collect()]
    full = [(r["vec_id"], r["score"])
            for r in ivf_topk(vectors, q, k=10, n_centroids=8,
                              nprobe=8).collect()]
    assert full == exact


def test_ivf_probe_finds_planted_neardup(vectors):
    """The planted near-dup of the query's base vector must land in the
    probed lists (a near-dup scores ~max against the same centroids)."""
    from meilisearchcrawler_spark.operators.similarity import ivf_topk

    q = vectors.filter("vec_id = 3").first()["embedding"]
    got = ivf_topk(vectors, q, k=5, n_centroids=8, nprobe=2).collect()
    ids = [r["vec_id"] for r in got]
    assert ids[0] == 3                      # the query vector itself
    assert 1003 in ids, f"planted near-dup missing from {ids}"
    assert got[0]["score"] == 1.0


def test_ivf_train_deterministic_and_rounded(vectors):
    from meilisearchcrawler_spark.operators.similarity import ivf_train

    c1 = ivf_train(vectors, n_centroids=8, iters=1, dim=32)
    c2 = ivf_train(vectors, n_centroids=8, iters=1, dim=32)
    assert c1 == c2
    assert len(c1) == 8 and all(len(c) == 32 for c in c1)
    for c in c1:
        for x in c:
            assert x == round(x, 6)  # 6-dp plan constants, both engines


def test_ivf_empty_cluster_keeps_seed(spark):
    """Two tight clusters, 4 requested lists: the seed vectors that end
    up losing every assignment must survive as their (rounded) seeds,
    not vanish — list count is part of the probe contract."""
    from pyspark.sql import Row

    from meilisearchcrawler_spark.operators.similarity import ivf_train

    rows = []
    for i in range(40):
        base = [10.0, 0.0] if i % 2 == 0 else [0.0, 10.0]
        rows.append(Row(vec_id=i,
                        embedding=[base[0] + (i % 5) * 0.001,
                                   base[1] + (i % 7) * 0.001]))
    df = spark.createDataFrame(rows)
    cents = ivf_train(df, n_centroids=4, iters=2, dim=2)
    assert len(cents) == 4
    seeds = [[round(float(x), 6) for x in r["embedding"]]
             for r in df.orderBy("vec_id").limit(4).collect()]
    # under IP assignment both tight clusters collapse onto the
    # largest-norm centroids; at least one seed survives untouched
    assert any(c in seeds for c in cents)
