#!/usr/bin/env python
"""Per-ACTION decomposition of the frontier10m round (follow-up to
profile_frontier_round.py, which showed select_pops ~8-14 s and
exec_rest ~7-10 s dominating the fixed cost while the lineage cuts —
round-4's suspect — are only ~1.7 s).

Wraps DataFrame.collect/count/first + DataFrameWriter.parquet +
SparkSession.createDataFrame, attributing each driver-blocking call to
its engine call site (innermost repo frame), and prints a per-round
ranked table. Identifies WHICH driver actions to merge/overlap/remove.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.readwriter import DataFrameWriter  # noqa: E402

from meilisearchcrawler_spark.config import CrawlConfig  # noqa: E402
from meilisearchcrawler_spark.engine.bench_crawl import bench_fixture  # noqa: E402
from meilisearchcrawler_spark.engine.crawler import (  # noqa: E402
    CrawlEngine, bucket_col)
from meilisearchcrawler_spark.session import get_spark  # noqa: E402

N_FILLER = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 6

CALLS: list[tuple[str, float]] = []
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _site() -> str:
    for fr in reversed(traceback.extract_stack()[:-2]):
        if fr.filename.startswith(REPO) and "profile_frontier" not in fr.filename:
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
    # PySpark 4: instances are pyspark.sql.classic.dataframe.DataFrame,
    # which OVERRIDES collect/count/first — patching the base class
    # alone intercepts nothing
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

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 8),
                      app_name="mcspark-actprof")
    spark.sparkContext.setLogLevel("ERROR")
    fx, paths = bench_fixture()
    root = tempfile.mkdtemp(prefix="mcspark_aprof_")
    cfg = CrawlConfig(round_budget=2_000, shuffle_partitions=int(cpus),
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

    out_rounds = []
    for i in range(ROUNDS):
        CALLS.clear()
        t0 = time.perf_counter()
        progressed = eng.run_round()
        wall = time.perf_counter() - t0
        agg: dict[str, list[float]] = {}
        for site, dt in CALLS:
            agg.setdefault(site, []).append(dt)
        top = sorted(((sum(v), len(v), k) for k, v in agg.items()),
                     reverse=True)
        blocked = sum(dt for _, dt in CALLS)
        print(f"# round {i}: wall {wall:.1f}s, "
              f"blocked-in-actions {blocked:.1f}s over {len(CALLS)} calls",
              file=sys.stderr, flush=True)
        for tot, n, k in top[:12]:
            print(f"#   {tot:6.2f}s x{n:<3d} {k}", file=sys.stderr,
                  flush=True)
        out_rounds.append({
            "wall": round(wall, 2), "blocked": round(blocked, 2),
            "n_calls": len(CALLS),
            "top": [{"site": k, "sec": round(t, 2), "n": n}
                    for t, n, k in top[:15]]})
        if not progressed:
            break

    print(json.dumps({"metric": "frontier10m_action_profile",
                      "rounds": out_rounds}))
    spark.stop()


if __name__ == "__main__":
    main()
