#!/usr/bin/env python
"""Round-5 bisect for the BENCH_r04 crawl_round regression (verdict #1)
and the bloom_delta probe move (verdict #5).

BENCH_r04 (driver) measured crawl_round 45.459 s vs r3's 39.405 s while
a same-code local rerun measured 36.957 s. Prime suspect per the
verdict: the round-4 AQE session knobs
(``coalescePartitions.parallelismFirst=false`` +
``advisoryPartitionSizeInBytes=16m``) interacting with the driver
environment. Both are runtime-settable session confs, so the variants
can run INTERLEAVED in one JVM — the only protocol that means anything
on this box (single-shot timings swing ±40%).

Variants:
  r4       parallelismFirst=false, advisory=16m  (current session default)
  r3       parallelismFirst=true,  advisory=64m  (Spark defaults, the
           config BENCH_r03 ran under)
  pf_only  parallelismFirst=false, advisory=64m  (isolates which knob)

Per interleave rep each variant runs one full crawl_throughput round
plus the 1e6-row bloom_delta probe. Output: one JSON line + a detail
file scripts/aqe_bisect_out.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from meilisearchcrawler_spark.engine.bench_crawl import crawl_throughput  # noqa: E402
from meilisearchcrawler_spark.engine.bloom import bitmap_delta  # noqa: E402
from meilisearchcrawler_spark.session import get_spark  # noqa: E402

VARIANTS = {
    "r4": {"spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
           "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m"},
    "r3": {"spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
           "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m"},
    "pf_only": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m"},
}

REPEAT = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "5"))


def bloom_probe(spark, n=1_000_000, parts=64, bits=1 << 17, k=7):
    def build_delta(key, pdf):
        return pd.DataFrame([{
            "pid": int(key[0]),
            "bits": bitmap_delta(pdf["url_hash"].to_numpy(), bits, k)
            .tobytes()}])

    hashes = (spark.range(n)
              .select(F.xxhash64("id").alias("url_hash"))
              .select(F.pmod(F.col("url_hash"), F.lit(parts))
                      .cast("int").alias("pid"), "url_hash"))
    hashes.persist().count()
    t0 = time.perf_counter()
    (hashes.groupBy("pid")
     .applyInPandas(build_delta, schema="pid int, bits binary").collect())
    dt = time.perf_counter() - t0
    hashes.unpersist()
    return round(dt, 3)


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 8),
                      app_name="mcspark-aqe-bisect")
    spark.sparkContext.setLogLevel("ERROR")

    # warm: fixture generation/reload + JIT, not counted
    crawl_throughput(spark)
    bloom_probe(spark)

    crawl: dict[str, list[float]] = {v: [] for v in VARIANTS}
    bloom: dict[str, list[float]] = {v: [] for v in VARIANTS}
    pages: dict[str, float] = {}
    for rep in range(REPEAT):
        for name, confs in VARIANTS.items():
            for ck, cv in confs.items():
                spark.conf.set(ck, cv)
            r = crawl_throughput(spark)
            crawl[name].append(r["sec"])
            pages[name] = r["pages_fetched"]
            bloom[name].append(bloom_probe(spark))
            print(f"# rep{rep} {name}: crawl {r['sec']:.2f}s "
                  f"bloom {bloom[name][-1]:.3f}s", file=sys.stderr)

    out = {}
    for name in VARIANTS:
        cs, bs = sorted(crawl[name]), sorted(bloom[name])
        med = statistics.median(cs)
        out[name] = {
            "crawl_median": round(med, 3),
            "crawl_iqr": round(np.percentile(cs, 75) - np.percentile(cs, 25), 3)
            if len(cs) >= 4 else round(cs[-1] - cs[0], 3),
            "crawl_runs": [round(t, 2) for t in crawl[name]],
            "pages_per_sec": round(pages[name] / med, 2),
            "bloom_median": round(statistics.median(bs), 3),
            "bloom_runs": [round(t, 3) for t in bloom[name]],
        }
    detail = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "aqe_bisect_out.json")
    with open(detail, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: {"crawl": v["crawl_median"],
                          "bloom": v["bloom_median"]}
                      for k, v in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
