#!/usr/bin/env python
"""Decompose the per-round driver cost at the EXACT bench.py
crawl_round shape (8 sites x 3000 pages, round_budget 100k, broadcast
Bloom, compact_every=8 -> no compaction inside the 5-round crawl).

Same monkeypatch phase split as scripts/profile_frontier_round.py:

  select_pops   candidate prefix + admission + stats collect
  cuts          lazy localCheckpoint lineage cuts
  flush_commit  staged write join + manifest commit
  exec_rest     _execute_round minus cuts/flush (metrics + bloom
                collects, link dedup actions, plan construction)
  other         run_round outside select/exec (views, latency scope)

Writes one JSON line; per-rep per-round phase tables on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meilisearchcrawler_spark.engine import catalog as catalog_mod  # noqa: E402
from meilisearchcrawler_spark.engine import crawler as crawler_mod  # noqa: E402
from meilisearchcrawler_spark.engine.bench_crawl import crawl_throughput  # noqa: E402
from meilisearchcrawler_spark.session import get_spark  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3

PHASES: dict[str, float] = {}


def timed(name):
    def deco(fn):
        def wrap(*a, **kw):
            t0 = time.perf_counter()
            try:
                return fn(*a, **kw)
            finally:
                PHASES[name] = PHASES.get(name, 0.0) + (
                    time.perf_counter() - t0)
        return wrap
    return deco


def main() -> None:
    crawler_mod.CrawlEngine._select_pops = timed("select_pops")(
        crawler_mod.CrawlEngine._select_pops)
    crawler_mod.CrawlEngine._cut = timed("cuts")(
        crawler_mod.CrawlEngine._cut)
    crawler_mod.CrawlEngine._execute_round = timed("exec_total")(
        crawler_mod.CrawlEngine._execute_round)
    crawler_mod.CrawlEngine._compact = timed("compact")(
        crawler_mod.CrawlEngine._compact)
    catalog_mod.CheckpointCatalog.commit_round = timed("flush_commit")(
        catalog_mod.CheckpointCatalog.commit_round)

    # per-round phase rows: hook run_round to snapshot PHASES deltas
    orig_run_round = crawler_mod.CrawlEngine.run_round
    rounds_log: list[dict] = []

    def run_round(self):
        base = dict(PHASES)
        t0 = time.perf_counter()
        out = orig_run_round(self)
        wall = time.perf_counter() - t0
        row = {k: round(v - base.get(k, 0.0), 2) for k, v in PHASES.items()
               if v - base.get(k, 0.0) > 0.005}
        row["exec_rest"] = round(
            (PHASES.get("exec_total", 0.0) - base.get("exec_total", 0.0))
            - (PHASES.get("cuts", 0.0) - base.get("cuts", 0.0))
            - (PHASES.get("flush_commit", 0.0)
               - base.get("flush_commit", 0.0)), 2)
        row["wall"] = round(wall, 2)
        row["other"] = round(
            wall
            - (PHASES.get("select_pops", 0.0) - base.get("select_pops", 0.0))
            - (PHASES.get("exec_total", 0.0) - base.get("exec_total", 0.0))
            - (PHASES.get("compact", 0.0) - base.get("compact", 0.0)), 2)
        row.pop("exec_total", None)
        rounds_log.append(row)
        print(f"# round: {row}", file=sys.stderr, flush=True)
        return out

    crawler_mod.CrawlEngine.run_round = run_round

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 8),
                      app_name="mcspark-benchprof")
    spark.sparkContext.setLogLevel("ERROR")

    reps = []
    for i in range(REPS):
        rounds_log.clear()
        PHASES.clear()
        r = crawl_throughput(spark)
        reps.append({"sec": round(r["sec"], 2), "rounds": r["rounds"],
                     "round_secs": r["round_secs"],
                     "pages_fetched": r["pages_fetched"],
                     "phases": list(rounds_log)})
        print(f"# rep {i}: sec={r['sec']:.2f} rounds={r['rounds']} "
              f"round_secs={r['round_secs']}", file=sys.stderr, flush=True)

    print(json.dumps({"metric": "bench_round_phase_sec", "reps": reps}))
    spark.stop()


if __name__ == "__main__":
    main()
