#!/usr/bin/env python
"""Per-ACTION decomposition of the bench.py crawl_round rounds (the
bench-shape sibling of profile_frontier_actions.py). Wraps the
driver-blocking DataFrame entry points with call-site attribution and
prints a ranked per-round table for one crawl."""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql.readwriter import DataFrameWriter  # noqa: E402

from meilisearchcrawler_spark.engine import crawler as crawler_mod  # noqa: E402
from meilisearchcrawler_spark.engine.bench_crawl import crawl_throughput  # noqa: E402
from meilisearchcrawler_spark.session import get_spark  # noqa: E402

CALLS: list[tuple[str, float]] = []
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _site() -> str:
    for fr in reversed(traceback.extract_stack()[:-2]):
        if fr.filename.startswith(REPO) and "profile_bench" not in fr.filename:
            return f"{os.path.basename(fr.filename)}:{fr.lineno}:{fr.name}"
    return "?"


def wrap(cls, name):
    orig = getattr(cls, name)

    def w(self, *a, **kw):
        t0 = time.perf_counter()
        try:
            return orig(self, *a, **kw)
        finally:
            CALLS.append((f"{name}@{_site()}",
                          time.perf_counter() - t0))
    setattr(cls, name, w)


def main() -> None:
    try:
        from pyspark.sql.classic.dataframe import DataFrame as CDataFrame
        targets = [CDataFrame]
    except ImportError:
        targets = [DataFrame]
    for cls in targets:
        for m in ("collect", "count", "first"):
            wrap(cls, m)
    wrap(DataFrameWriter, "parquet")
    wrap(SparkSession, "createDataFrame")

    out_rounds = []
    orig_run_round = crawler_mod.CrawlEngine.run_round

    def run_round(self):
        CALLS.clear()
        t0 = time.perf_counter()
        progressed = orig_run_round(self)
        wall = time.perf_counter() - t0
        agg: dict[str, list[float]] = {}
        for site, dt in CALLS:
            agg.setdefault(site, []).append(dt)
        top = sorted(((sum(v), len(v), k) for k, v in agg.items()),
                     reverse=True)
        blocked = sum(dt for _, dt in CALLS)
        print(f"# round: wall {wall:.1f}s, "
              f"blocked-in-actions {blocked:.1f}s over {len(CALLS)} calls",
              file=sys.stderr, flush=True)
        for tot, n, k in top[:14]:
            print(f"#   {tot:6.2f}s x{n:<3d} {k}", file=sys.stderr,
                  flush=True)
        out_rounds.append({
            "wall": round(wall, 2), "blocked": round(blocked, 2),
            "n_calls": len(CALLS),
            "top": [{"site": k, "sec": round(t, 2), "n": n}
                    for t, n, k in top[:15]]})
        return progressed

    crawler_mod.CrawlEngine.run_round = run_round

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 8),
                      app_name="mcspark-benchact")
    spark.sparkContext.setLogLevel("ERROR")
    r = crawl_throughput(spark)
    print(f"# crawl: {r['sec']:.2f}s rounds={r['round_secs']}",
          file=sys.stderr)
    print(json.dumps({"metric": "bench_action_profile",
                      "crawl_sec": round(r["sec"], 2),
                      "rounds": out_rounds}))
    spark.stop()


if __name__ == "__main__":
    main()
