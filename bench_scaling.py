#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north rule: ≥0.8 efficiency
N→4N executors; sandbox protocol per BASELINE.md: the same job at
local[8] and local[32] on the same input).

Round-3 protocol (per the round-2 verdict #4): INTERLEAVED
medians-of-REPEAT. Each repetition runs local[8] then local[32]
back-to-back in fresh sessions, so slow box-load drift hits both
levels equally; the reported rate per level is the MEDIAN across
repetitions, with the raw runs recorded.

Jobs, each run at both parallelism levels:

1. **fetch-extract stage** — one engine round's fetch+parse+hash
   ``mapInPandas`` over an identical 600k-URL admitted set. This is
   the work that scales with executors at 10^10-URL scale.
2. **image decode stage** — decode+verify over 60k payload rows.
3. **full crawl** — end-to-end rounds; at sandbox fixture size the
   constant per-round commit/orchestration cost dominates and its
   efficiency understates the engine (real rounds carry 10^6-10^7
   URLs).
4. **kernel ceiling** — the same fetch kernel through raw
   ``multiprocessing`` (no Spark), bounding what the hardware allows.

Writes BENCH_SCALING.md and prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402

from meilisearchcrawler_spark.engine.bench_crawl import (  # noqa: E402
    bench_fixture,
    crawl_throughput,
    fetch_stage_throughput,
    image_stage_throughput,
)
from meilisearchcrawler_spark.session import ship_package  # noqa: E402

LEVELS = [8, 32]
REPEAT = int(os.environ.get("SPARK_GRAFT_SCALING_REPEAT", "5"))
N_URLS = 600_000
N_IMAGES = 60_000


def session(cores: int) -> SparkSession:
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"mcspark-scaling-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    ship_package(spark)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _mp_work(n: int) -> int:
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import pandas as pd

    from meilisearchcrawler_spark.engine.bench_crawl import bench_fixture as bf
    from meilisearchcrawler_spark.engine.crawler import _make_fetch_udf

    fx, paths = bf()
    cfgs = {s["site"]: {"seed_url": s["seed_url"], "selector": s.get("selector"),
                        "lang": "fr", "max_depth": 3, "no_index": [],
                        "exclude": [], "max_pages": 0}
            for s in fx.seeds}
    class _Bc:  # stand-in for the Spark broadcast handle
        value = cfgs

    udf = _make_fetch_udf(paths["pages"], _Bc())
    rows = [{"site": p["site"], "url": p["url"], "host": p["host"], "depth": 1,
             "counter": i, "pos_in_round": 0, "cached_etag": None,
             "cached_last_modified": None}
            for i, p in enumerate(fx.pages[:3200])]
    pdf = pd.DataFrame(rows)
    done = 0
    while done < n:
        list(udf(iter([pdf])))
        done += len(pdf)
    return done


def kernel_ceiling(workers: int, per_worker: int = 19_200) -> float:
    t0 = time.perf_counter()
    with mp.Pool(workers) as pool:
        total = sum(pool.map(_mp_work, [per_worker] * workers))
    return round(total / (time.perf_counter() - t0), 1)


def main() -> None:
    bench_fixture()  # materialize the shared web before timing anything
    runs: dict[int, dict[str, list[float]]] = {
        c: {"fetch_stage": [], "image_stage": [], "full_crawl": []}
        for c in LEVELS}
    for rep in range(REPEAT):
        for cores in LEVELS:            # interleaved: 8 then 32, per rep
            spark = session(cores)
            runs[cores]["fetch_stage"].append(
                fetch_stage_throughput(spark, n_urls=N_URLS)["urls_per_sec"])
            runs[cores]["image_stage"].append(
                image_stage_throughput(spark, n_images=N_IMAGES)["images_per_sec"])
            runs[cores]["full_crawl"].append(
                crawl_throughput(spark)["pages_per_sec"])
            spark.stop()
            print(f"# rep {rep} local[{cores}]: "
                  f"{ {k: v[-1] for k, v in runs[cores].items()} }",
                  file=sys.stderr)
    kern = {c: kernel_ceiling(c) for c in LEVELS}

    med = {c: {k: round(statistics.median(v), 1)
               for k, v in runs[c].items()} for c in LEVELS}
    for c in LEVELS:
        med[c]["kernel_mp"] = kern[c]

    def eff(key):
        return round((med[32][key] / med[8][key]) / 4, 3)

    summary = {
        "metric": "scaling_efficiency_8_to_32",
        "protocol": f"interleaved_median_of_{REPEAT}",
        "fetch_stage_eff": eff("fetch_stage"),
        "image_stage_eff": eff("image_stage"),
        "full_crawl_eff": eff("full_crawl"),
        "kernel_mp_eff": eff("kernel_mp"),
        "rates": med,
        "raw_runs": {c: runs[c] for c in LEVELS},
    }
    print(json.dumps(summary))

    rows = [
        ("fetch_stage (600k URLs)", "fetch_stage", "URLs/s"),
        ("image_stage (60k images)", "image_stage", "images/s"),
        ("full_crawl (24k-page web)", "full_crawl", "pages/s"),
        ("kernel ceiling (mp, no Spark)", "kernel_mp", "URLs/s"),
    ]
    lines = [
        "# BENCH_SCALING — N→4N evidence (local[8] vs local[32])",
        "",
        "Sandbox protocol (BASELINE.md): the same job at two parallelism",
        "levels on the same input; efficiency = (rate_32 / rate_8) / 4.",
        f"Round-3 protocol: INTERLEAVED median-of-{REPEAT} — each rep runs",
        "local[8] then local[32] back-to-back so box-load drift cancels;",
        "raw per-rep rates recorded below.",
        "",
        "| job | local[8] | local[32] | speedup | efficiency |",
        "|---|---|---|---|---|",
    ]
    for label, key, unit in rows:
        lo, hi = med[8][key], med[32][key]
        lines.append(f"| {label} | {lo} {unit} | {hi} {unit} | "
                     f"{round(hi / lo, 2)}× | {round(hi / lo / 4, 3)} |")
    lines += [
        "",
        "Reading:",
        "- The fetch-extract and image-decode stages are the per-URL work",
        "  that scales with executors at 10^10-URL scale.",
        "- The raw-multiprocessing row bounds what this box allows for the",
        "  identical kernel (memory-bandwidth contention at 32 procs);",
        "  the Spark gap vs that ceiling is JVM↔Arrow plumbing, which",
        "  amortizes with executor count on a real cluster (each executor",
        "  pipes its own Arrow stream).",
        "- Full-crawl rounds add a constant per-round commit/orchestration",
        "  cost that dominates at the sandbox fixture size and amortizes",
        "  at real round sizes (10^6-10^7 URLs/round).",
        "",
        "Raw per-rep rates:",
        "```json",
        json.dumps({str(c): runs[c] for c in LEVELS}, indent=1),
        "```",
    ]
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_SCALING.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
