#!/usr/bin/env python
"""Interleaved one-JVM A/B of the round-6 pre-selection noop kick
(_PRESEL_KICK: async noop materialization of the admission frame
during popped-checkpoint planning) on the bench.py
crawl_round workload (guide S1: measure in one process so box drift
hits both variants equally).

Variants toggle one module flag in meilisearchcrawler_spark.engine.crawler:
  old: _PRESEL_KICK = False  (plan first, materialize in first eager job)
  new: _PRESEL_KICK = True

Usage: python scripts/bench_preselkick_ab.py [reps=5]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meilisearchcrawler_spark.engine import crawler as crawler_mod  # noqa: E402
from meilisearchcrawler_spark.engine.bench_crawl import crawl_throughput  # noqa: E402
from meilisearchcrawler_spark.session import get_spark  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 8),
                      app_name="mcspark-ab-preselkick")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, list] = {"old": [], "new": []}
    rounds: dict[str, list] = {"old": [], "new": []}
    # warmup (codegen + fixture listing) not attributed to either side
    crawl_throughput(spark)
    for rep in range(REPS):
        for name, flag in (("old", False), ("new", True)):
            crawler_mod._PRESEL_KICK = flag
            t0 = time.perf_counter()
            r = crawl_throughput(spark)
            sec = time.perf_counter() - t0
            out[name].append(round(r["sec"], 3))
            rounds[name].append(r["round_secs"])
            print(f"# rep {rep} {name}: {r['sec']:.2f}s "
                  f"rounds={r['round_secs']} fetched={r['pages_fetched']} "
                  f"indexed={r['pages_indexed']}",
                  file=sys.stderr, flush=True)
    res = {
        "metric": "crawl_round_ab_preselkick",
        "reps": REPS,
        "old_median": round(statistics.median(out["old"]), 3),
        "new_median": round(statistics.median(out["new"]), 3),
        "old_raw": out["old"],
        "new_raw": out["new"],
        "old_rounds": rounds["old"],
        "new_rounds": rounds["new"],
    }
    print(json.dumps(res))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "preselkick_ab_out.json"), "w") as f:
        json.dump(res, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
