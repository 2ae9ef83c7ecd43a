"""Engine session configuration invariants.

The settings asserted here are load-bearing scale decisions, not
tuning defaults — each one was measured (ROUND4.md / BENCH_SCALING.md)
and regressing it silently would reintroduce a known cliff.
"""

from __future__ import annotations

import inspect


def _builder_configs() -> dict[str, str]:
    """Static read of ``get_spark``'s builder .config(...) pairs — the
    session test must not depend on whatever session pytest already
    created (SparkSession.builder.getOrCreate reuses it)."""
    import re

    from meilisearchcrawler_spark import session

    src = inspect.getsource(session.get_spark)
    return dict(re.findall(r'\.config\("([^"]+)",\s*"?([^")]*)"?\)', src))


def test_parquet_in_pushdown_threshold_pinned():
    """parquet-mr's recursive Or-tree builder stack-overflows at ~10^4
    pushed In-values (measured, BENCH_r04 scan10k probe) — the engine
    session must pin the threshold at the safe default so no engine
    path (or cluster-level override) can ever reach the overflow."""
    cfgs = _builder_configs()
    assert cfgs.get("spark.sql.parquet.pushdown.inFilterThreshold") == "10"


def test_aqe_byte_based_coalescing_pinned():
    """Byte-based AQE coalescing (parallelismFirst=false + 16m
    advisory) — kilobyte round frames must coalesce below core count
    (measured 22% of full-crawl wall at local[32], ROUND4.md #2)."""
    cfgs = _builder_configs()
    assert cfgs.get(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst") == "false"
    assert cfgs.get(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes") == "16m"
    assert cfgs.get("spark.sql.adaptive.enabled") == "true"
