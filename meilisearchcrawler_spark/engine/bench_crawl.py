"""Crawl-engine benchmark helpers.

``crawl_throughput`` runs a full fetch-extract-index crawl over a
deterministic synthetic web and reports fetched-and-indexed pages/sec —
the BASELINE.json metric. ``bench_scaling.py`` (repo root) runs the
same job at two parallelism levels for the N→4N efficiency evidence.

The fixture is sized so per-URL work (parse, hash, link explode)
dominates per-round orchestration overhead, which is what actually
scales with executors at 10^10-URL scale.
"""

from __future__ import annotations

import os
import tempfile
import time

from pyspark.sql import SparkSession

from ..config import CrawlConfig
from ..fixtures.webgen import generate_web, write_parquet
from .crawler import CrawlEngine

_FIXTURE_CACHE: dict[tuple, tuple] = {}


def bench_fixture(n_sites: int = 8, pages_per_site: int = 400, seed: int = 123,
                  base_dir: str | None = None):
    """Deterministic bench web, cached on disk across runs."""
    key = (n_sites, pages_per_site, seed)
    if key in _FIXTURE_CACHE:
        return _FIXTURE_CACHE[key]
    base = base_dir or os.path.join(tempfile.gettempdir(), "mcspark_benchweb")
    out = os.path.join(base, f"s{seed}_n{n_sites}_p{pages_per_site}")
    marker = os.path.join(out, "_DONE")
    fx = generate_web(seed=seed, n_sites=n_sites, pages_per_site=pages_per_site)
    if not os.path.exists(marker):
        paths = write_parquet(fx, out)
        with open(marker, "w") as f:
            f.write("ok")
    paths = {name: os.path.join(out, f"{name}.parquet")
             for name in ("pages", "seeds", "robots", "url_seen")}
    _FIXTURE_CACHE[key] = (fx, paths)
    return fx, paths


def crawl_throughput(spark: SparkSession, n_sites: int = 8,
                     pages_per_site: int = 400, round_budget: int = 1024,
                     host_budget: int | None = 512,
                     shuffle_partitions: int | None = None) -> dict:
    """Full crawl over the bench web; returns pages/sec + composition."""
    fx, paths = bench_fixture(n_sites, pages_per_site)
    root = tempfile.mkdtemp(prefix="mcspark_benchcat_")
    sp = shuffle_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32"))
    cfg = CrawlConfig(round_budget=round_budget, host_budget=host_budget,
                      shuffle_partitions=sp)
    eng = CrawlEngine(spark, root, paths["pages"], fx.seeds, fx.robots, cfg,
                      initial_url_seen=fx.url_seen)
    t0 = time.perf_counter()
    rounds = eng.run(max_rounds=1000)
    sec = time.perf_counter() - t0
    metrics = eng.catalog.read("metrics")
    counts = {r["action"]: r["n"] for r in
              metrics.groupBy("action").agg(
                  __import__("pyspark.sql.functions", fromlist=["sum"])
                  .sum("count").alias("n")).collect()} if metrics is not None else {}
    fetched = sum(counts.get(a, 0) for a in
                  ("fetched", "not_modified", "not_indexed_content_type", "error"))
    indexed = counts.get("indexed", 0)
    return {
        "sec": sec,
        "rounds": rounds,
        "pages_fetched": fetched,
        "pages_indexed": indexed,
        "pages_per_sec": round(fetched / sec, 2) if sec > 0 else None,
        "indexed_per_sec": round(indexed / sec, 2) if sec > 0 else None,
        "actions": counts,
    }
