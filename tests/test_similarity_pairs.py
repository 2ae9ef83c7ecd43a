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
