#!/usr/bin/env python
"""Interleaved A/B of the small-round latency mode at the frontier10m
harness (round-5; the box's run-to-run swing is larger than the
effect, so the two variants run ROUND-BY-ROUND interLEAVED in ONE JVM:
two engines over identical 10^7-row-filler catalogs, one with
``latency_round_rows=0`` (AQE barrier actions — the round-4 engine),
one with the default latency mode; each iteration runs one round of
each, so both see the same box conditions).

Writes one JSON line: per-round wall pairs + totals.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from meilisearchcrawler_spark.config import CrawlConfig  # noqa: E402
from meilisearchcrawler_spark.engine.bench_crawl import bench_fixture  # noqa: E402
from meilisearchcrawler_spark.engine.crawler import (  # noqa: E402
    CrawlEngine, bucket_col)
from meilisearchcrawler_spark.session import get_spark  # noqa: E402

N_FILLER = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 6


def build(spark, fx, paths, latency_rows):
    cfg = CrawlConfig(round_budget=2_000, shuffle_partitions=32,
                      bloom_probe_mode="cogroup", compact_every=3,
                      latency_round_rows=latency_rows)
    root = tempfile.mkdtemp(prefix=f"mcspark_ab{latency_rows}_")
    eng = CrawlEngine(spark, root, paths["pages"], fx.seeds, fx.robots,
                      cfg, initial_url_seen=fx.url_seen)
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
    return eng


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 8),
                      app_name="mcspark-latency-ab")
    spark.sparkContext.setLogLevel("ERROR")
    fx, paths = bench_fixture()
    engines = {"aqe": build(spark, fx, paths, 0),
               "latency": build(spark, fx, paths, 100_000)}

    out = {k: [] for k in engines}
    for i in range(ROUNDS):
        for name, eng in engines.items():
            t0 = time.perf_counter()
            eng.run_round()
            dt = round(time.perf_counter() - t0, 2)
            out[name].append(dt)
        print(f"# round {i}: aqe {out['aqe'][-1]}s "
              f"latency {out['latency'][-1]}s", file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "frontier10m_latency_mode_ab",
        "rounds": out,
        "total": {k: round(sum(v), 1) for k, v in out.items()},
        "steady_noncompact": {
            k: [v[i] for i in (3, 4) if i < len(v)] for k, v in out.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
