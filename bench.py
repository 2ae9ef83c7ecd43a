#!/usr/bin/env python
"""Headline benchmark — one JSON line on stdout.

Runs the flagship queries from ``__spark_entry__`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32), then a crawl-engine
throughput round if the engine is available.

Output: {"metric": "...", "value": <total sec>, "unit": "sec",
         "queries": {...}, "sf": ...}

Scaling evidence (local[8] vs local[32]) is produced by
``bench_scaling.py`` and recorded in BENCH_SCALING.md — this script is
the per-round single-config probe.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from meilisearchcrawler_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q01_pricing_summary",   # filtered scan + partial agg
    "q03_seen_join",         # broadcast join + agg
    "q05_priority_dedup",    # window dedup
    "q06_frontier_pop",      # frontier admission window + top-k
    "q16_dedup_exact",       # hash-groupBy dedup
    "q18_lsh_pairs",         # minhash + LSH self-join
    "q21_cosine_topk",       # brute-force cosine rerank
    "q22_ann_lsh",           # LSH-pruned ANN
    "q23_text_quality",      # full-corpus quality features
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 8),
                      app_name="mcspark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        # warm the file listing/readers once so timings measure the query
        df = fn(spark, sf_dir)
        t0 = time.perf_counter()
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s rows={n}", file=sys.stderr)

    crawl = None
    try:
        from meilisearchcrawler_spark.engine.bench_crawl import crawl_throughput
        crawl = crawl_throughput(spark)
        timings["crawl_round"] = round(crawl["sec"], 3)
    except Exception as exc:  # engine still under construction
        print(f"# crawl bench skipped: {exc}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if crawl:
        out["crawl_pages_per_sec"] = crawl["pages_per_sec"]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
