#!/usr/bin/env python
"""Round-5 compaction A/B: concurrent snapshot writes with ordered
commits (``parallel``, _COMPACT_POOL_WORKERS=4 — the working tree)
vs serialized writes (``serial``, pool width patched to 1 — the
pre-round-5 behavior; commit order is identical in both). One JVM,
variants interleaved, median-of-N.

Each rep builds a fresh catalog at the frontier10m shape (10^6-row
filler tier by default — compaction rewrites the whole corpus, so the
filler size IS the work size), runs rounds until exactly one
compaction fires (compact_every=3), and records that compaction's
wall via a timing wrapper.

Writes one JSON line with per-variant medians + raw walls.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from meilisearchcrawler_spark.config import CrawlConfig  # noqa: E402
from meilisearchcrawler_spark.engine import crawler as crawler_mod  # noqa: E402
from meilisearchcrawler_spark.engine.bench_crawl import bench_fixture  # noqa: E402
from meilisearchcrawler_spark.engine.crawler import (  # noqa: E402
    CrawlEngine, bucket_col)
from meilisearchcrawler_spark.session import get_spark  # noqa: E402

N_FILLER = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
REPEAT = int(os.environ.get("AB_REPEAT", "3"))


def one_run(spark, fx, paths, workers: int) -> float:
    crawler_mod._COMPACT_POOL_WORKERS = workers
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    root = tempfile.mkdtemp(prefix="mcspark_cab_")
    cfg = CrawlConfig(round_budget=2_000, shuffle_partitions=cpus,
                      bloom_probe_mode="cogroup", compact_every=3)
    eng = CrawlEngine(spark, root, paths["pages"], fx.seeds, fx.robots, cfg,
                      initial_url_seen=fx.url_seen)
    sites = [s["site"] for s in fx.seeds]
    filler = (spark.range(N_FILLER)
              .select(F.concat(F.lit("site"), (F.col("id") % len(sites)))
                      .alias("site"),
                      F.concat(F.lit("http://filler.invalid/p"), F.col("id"))
                      .alias("url"),
                      F.lit("filler.invalid").alias("host"),
                      F.lit(0).cast("int").alias("depth"),
                      (F.col("id") + 1_000_000_000).alias("counter"))
              .withColumn("bucket", bucket_col(F.col("url"),
                                               cfg.seen_buckets)))
    rel = eng.catalog.stage("frontier_adds", filler, 0, max_files=0)
    eng.catalog.commit_round(eng.catalog.committed_round,
                             {"frontier_adds": [rel]}, eng.catalog.state)
    # out-of-band frontier injection: driver-side size tracking is now
    # stale; mark it unknown so the engine falls back to budget bounds
    for _st in eng.sites.values():
        _st.frontier_rows = None

    walls: list[float] = []
    orig = CrawlEngine._compact

    def timed(self):
        t0 = time.perf_counter()
        orig(self)
        walls.append(time.perf_counter() - t0)

    CrawlEngine._compact = timed
    try:
        for _ in range(3):  # compact_every=3 → exactly one compaction
            eng.run_round()
    finally:
        CrawlEngine._compact = orig
    assert len(walls) == 1, walls
    return walls[0]


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 8),
                      app_name="mcspark-compact-ab")
    spark.sparkContext.setLogLevel("ERROR")
    fx, paths = bench_fixture()
    one_run(spark, fx, paths, 4)  # warmup (JIT + fixture cache)

    runs: dict[str, list[float]] = {"serial": [], "parallel": []}
    for rep in range(REPEAT):
        for name, workers in (("serial", 1), ("parallel", 4)):
            w = one_run(spark, fx, paths, workers)
            runs[name].append(round(w, 3))
            print(f"# rep {rep} {name}: compact {w:.2f}s",
                  file=sys.stderr, flush=True)
    med = {k: round(statistics.median(v), 3) for k, v in runs.items()}
    print(json.dumps({"metric": "compact_ab_wall",
                      "protocol": f"interleaved_one_jvm_median_of_{REPEAT}",
                      "n_filler": N_FILLER,
                      "median": med, "raw": runs}))
    spark.stop()


if __name__ == "__main__":
    main()
