#!/usr/bin/env python
"""Round-5 write-merge A/B: the dedicated frontier_pops / visited /
content_hashes per-round delta writes (variant ``old`` = commit
8c814b1) vs the derived-view design (``new`` = working tree), measured
on the bench.py crawl_round workload. Same protocol as the round-5 AQE
bisect: the two variants run INTERLEAVED as alternating fresh pinned
subprocesses on one otherwise-idle box, median-of-N — code differs, so
(unlike conf knobs) they cannot share a JVM; a fresh session per rep
for both keeps the comparison symmetric.

Writes one JSON line with per-variant medians + raw runs.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPEAT = int(os.environ.get("AB_REPEAT", "5"))
NEW_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OLD_ROOT = os.environ.get("AB_OLD_ROOT", "/tmp/mcspark_old")

SNIPPET = r"""
import json
from meilisearchcrawler_spark.session import get_spark
spark = get_spark(master="local[32]", driver_memory="48g")
from meilisearchcrawler_spark.engine.bench_crawl import crawl_throughput
crawl_throughput(spark, 4, 400, round_budget=100_000)  # warmup
r = crawl_throughput(spark)
print(json.dumps({"sec": r["sec"], "pages": r["pages_fetched"]}))
spark.stop()
"""


def run_variant(root: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", SNIPPET], capture_output=True, text=True,
        cwd=root, env={**os.environ, "PYTHONPATH": root}, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    runs = {"old": [], "new": []}
    for rep in range(REPEAT):
        for name, root in (("old", OLD_ROOT), ("new", NEW_ROOT)):
            r = run_variant(root)
            runs[name].append(r["sec"])
            print(f"# rep {rep} {name}: {r}", file=sys.stderr, flush=True)
    med = {k: round(statistics.median(v), 3) for k, v in runs.items()}
    iqr = {k: round(sorted(v)[-(len(v) + 1) // 4] - sorted(v)[len(v) // 4], 3)
           for k, v in runs.items()}
    print(json.dumps({"metric": "writemerge_ab_crawl_round",
                      "protocol": f"interleaved_fresh_session_median_of_{REPEAT}",
                      "median": med, "iqr": iqr, "raw": runs}))


if __name__ == "__main__":
    main()
