#!/usr/bin/env python
"""N→4N full-crawl evidence at PRODUCTION round size (round-3 verdict
next-step #2): the round-3 full-crawl row measured 0.185 efficiency at
toy size (2k-page rounds, fixed per-round cost dominant); this protocol
crawls a 640k-page web whose depth-3 wave admits ~3×10^5 URLs in one
round — the 10^5-10^6-URLs-of-fetch-work-per-round regime the engine is
designed for.

Protocol (interleaved medians, warm sessions, CPU-PINNED levels):
  per rep, per level: a fresh subprocess pinned with
  ``taskset -c 0-(N-1)`` (an unpinned ``local[8]`` only caps TASK
  slots — JVM GC/shuffle/IO threads still burn all 32 cores, flattering
  the small level and understating the true 8→32 ratio) runs:
  session → warmup crawl on the small web (absorbs codegen/first-task
  costs; excluded) → fetch-stage probe on the mega store → timed full
  mega crawl. Plus, once per level, the raw-multiprocessing kernel
  ceiling over the SAME mmap-ed mega store, identically pinned.

The page store is the mmap-ed uncompressed Arrow IPC twin
(pagestore.LazyPageStore): with per-worker private parquet copies, 32
workers held 32 decompressed copies of a 400 MB store and
memory-bandwidth contention INVERTED the scaling (mp kernel measured
0.46× speedup 8→32; with the shared mmap it measures 2.6-3.2×).

Interpretation gate: the full-crawl number is judged against the
same-run stage and mp-kernel ceilings — a shared-memory box cannot
exhibit the multi-node ≥0.8 rule for ANY implementation of this kernel
when its own mp ceiling is below that.

Writes one JSON line; append the addendum table to BENCH_SCALING.md.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEVELS = [8, 32]
REPEAT = int(os.environ.get("SPARK_GRAFT_MEGA_REPEAT", "3"))
# SPARK_GRAFT_MEGA10=1 → the 10^6-URL wave the crawler module header
# targets (round-4 verdict #8: the <10% fixed-cost and wave-efficiency
# claims were extrapolated from the 283k wave; measure them).
# The depth-3 wave's unique-page count per site saturates at
# pool×(1-e^(-draws/pool)) ≈ 53k for a 160k pool under fanout (45,60)
# — measured 458,424 total fetches at 8 sites — so the wave scales
# with SITE count: SPARK_GRAFT_MEGA10_SITES=16 (default) ≈ a 0.9×10^6
# wave; =8 is the half-scale point recorded alongside it.
MEGA10 = os.environ.get("SPARK_GRAFT_MEGA10") == "1"
if MEGA10:
    MEGA = dict(n_sites=int(os.environ.get("SPARK_GRAFT_MEGA10_SITES",
                                           "16")),
                pages_per_site=160_000, seed=321, fanout=(45, 60))
    BUDGET = 1_500_000
else:
    MEGA = dict(n_sites=8, pages_per_site=80_000, seed=321, fanout=(45, 60))
    BUDGET = 1_000_000
FIXTURE_KEYS = ("n_sites", "pages_per_site", "seed", "fanout")


def _session(cores: int):
    from pyspark.sql import SparkSession

    from meilisearchcrawler_spark.session import ship_package

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"mcspark-mega-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                "false")
        .config("spark.sql.constraintPropagation.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    ship_package(spark)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def worker(cores: int) -> None:
    """One pinned measurement: warmup → fetch stage → full mega crawl."""
    from meilisearchcrawler_spark.engine.bench_crawl import (
        crawl_throughput, fetch_stage_throughput)

    spark = _session(cores)
    crawl_throughput(spark, 8, 400, round_budget=100_000)  # warmup
    f = fetch_stage_throughput(spark, n_urls=120_000,
                               **{k: MEGA[k] for k in FIXTURE_KEYS})
    c = crawl_throughput(spark, round_budget=BUDGET,
                         **{k: MEGA[k] for k in FIXTURE_KEYS})
    spark.stop()
    print(json.dumps({
        "cores": cores, "fetch_stage": f["urls_per_sec"],
        "full_crawl": c["pages_per_sec"], "crawl_sec": round(c["sec"], 1),
        "wave_urls": c["pages_fetched"], "rounds": c["rounds"],
        "round_secs": c.get("round_secs", [])}))


def _mp_work(args):
    n, pages_path, cfgs, rows = args
    import pandas as pd

    from meilisearchcrawler_spark.engine.crawler import _make_fetch_udf

    class _Bc:
        value = cfgs

    udf = _make_fetch_udf(pages_path, _Bc())
    pdf = pd.DataFrame(rows)
    done = 0
    while done < n:
        list(udf(iter([pdf])))
        done += len(pdf)
    return done


def kernel(cores: int, per_worker: int = 12_800) -> None:
    from meilisearchcrawler_spark.engine.bench_crawl import bench_fixture

    fx, paths = bench_fixture(**MEGA)
    cfgs = {s["site"]: {"seed_url": s["seed_url"],
                        "selector": s.get("selector"), "lang": "fr",
                        "max_depth": 3, "no_index": [], "exclude": [],
                        "max_pages": 0} for s in fx.seeds}
    rows = [{"site": p["site"], "url": p["url"], "host": p["host"],
             "depth": 1, "counter": i, "pos_in_round": 0,
             "cached_etag": None, "cached_last_modified": None}
            for i, p in enumerate(fx.pages[:3200])]
    del fx
    t0 = time.perf_counter()
    with mp.Pool(cores) as pool:
        total = sum(pool.map(_mp_work,
                             [(per_worker, paths["pages"], cfgs, rows)]
                             * cores))
    print(json.dumps({"cores": cores,
                      "kernel_mp": round(total / (time.perf_counter() - t0),
                                         1)}))


def _pinned(cores: int, *args: str) -> dict:
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable,
           os.path.abspath(__file__), *args, str(cores)]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    from meilisearchcrawler_spark.engine.bench_crawl import bench_fixture

    bench_fixture(8, 400)              # warmup web
    fx, _ = bench_fixture(**MEGA)      # mega web (cached on disk)
    print(f"# mega web ready: {len(fx.pages)} pages", file=sys.stderr)
    del fx

    runs: dict[int, dict[str, list[float]]] = {
        c: {"fetch_stage": [], "full_crawl": [], "crawl_sec": [],
            "wave_urls": []} for c in LEVELS}
    round_secs: dict[int, list[list[float]]] = {c: [] for c in LEVELS}
    for rep in range(REPEAT):
        for cores in LEVELS:
            r = _pinned(cores, "--worker")
            for k in ("fetch_stage", "full_crawl", "crawl_sec",
                      "wave_urls"):
                runs[cores][k].append(r[k])
            round_secs[cores].append(r.get("round_secs", []))
            print(f"# rep {rep} pinned[{cores}]: {r}", file=sys.stderr,
                  flush=True)
    kern = {c: _pinned(c, "--kernel")["kernel_mp"] for c in LEVELS}

    med = {c: {k: round(statistics.median(v), 1)
               for k, v in runs[c].items()} for c in LEVELS}
    for c in LEVELS:
        med[c]["kernel_mp"] = kern[c]

    def eff(key):
        return round((med[32][key] / med[8][key]) / 4, 3)

    out = {
        "metric": ("mega10_round_scaling_8_to_32" if MEGA10
                   else "mega_round_scaling_8_to_32"),
        "protocol": f"cpu_pinned_interleaved_warm_median_of_{REPEAT}",
        "pages": MEGA["n_sites"] * MEGA["pages_per_site"],
        "round_budget": BUDGET,
        "round_secs": {str(c): round_secs[c] for c in LEVELS},
        "full_crawl_eff": eff("full_crawl"),
        "fetch_stage_eff": eff("fetch_stage"),
        "kernel_mp_eff": eff("kernel_mp"),
        "rates": med,
        "raw_runs": {str(c): runs[c] for c in LEVELS},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
    elif len(sys.argv) >= 3 and sys.argv[1] == "--kernel":
        kernel(int(sys.argv[2]))
    else:
        main()
