#!/usr/bin/env python
"""Round-5 latency-width A/B: static exchange width sized to the
selection bound (``sel``, _LATENCY_WIDTH_FROM_SEL_BOUND=True — a
2k-URL round over 16 sites gets width 8 for its ~257k-row candidate
prefix) vs the pop bound only (``pop``, False — such rounds compile
width 1). One JVM, variants interleaved per rep, median-of-N.

Each rep builds a fresh frontier10m-shaped catalog (filler tier via
argv, default 10^7) and runs ROUNDS rounds with compact_every=3,
recording total wall and the per-round walls, so the pre-compaction
(full-scan) and post-compaction (pruned) regimes are both visible.

Writes one JSON line.
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

N_FILLER = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 6
REPEAT = int(os.environ.get("AB_REPEAT", "3"))


def one_run(spark, fx, paths, use_sel_bound: bool) -> list[float]:
    crawler_mod._LATENCY_WIDTH_FROM_SEL_BOUND = use_sel_bound
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    root = tempfile.mkdtemp(prefix="mcspark_swab_")
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
    walls = []
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        eng.run_round()
        walls.append(round(time.perf_counter() - t0, 2))
    return walls


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 8),
                      app_name="mcspark-selwidth-ab")
    spark.sparkContext.setLogLevel("ERROR")
    fx, paths = bench_fixture()
    one_run(spark, fx, paths, True)  # warmup

    runs: dict[str, list[list[float]]] = {"pop": [], "sel": []}
    for rep in range(REPEAT):
        for name, flag in (("pop", False), ("sel", True)):
            walls = one_run(spark, fx, paths, flag)
            runs[name].append(walls)
            print(f"# rep {rep} {name}: total {sum(walls):.1f}s "
                  f"rounds={walls}", file=sys.stderr, flush=True)
    med = {k: round(statistics.median([sum(w) for w in v]), 2)
           for k, v in runs.items()}
    print(json.dumps({"metric": "selwidth_ab_total_wall",
                      "protocol": f"interleaved_one_jvm_median_of_{REPEAT}",
                      "n_filler": N_FILLER, "rounds": ROUNDS,
                      "median_total": med, "raw_round_walls": runs}))
    spark.stop()


if __name__ == "__main__":
    main()
