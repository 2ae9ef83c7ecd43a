#!/usr/bin/env python
"""Headline benchmark — one JSON line on stdout.

Runs the flagship queries from ``__spark_entry__`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32), then the crawl-engine
throughput round, the image stage, and the scale probes.

Protocol (round-3, per the round-2 verdict): every headline query and
the crawl round run REPEAT (default 5) times; the reported number is
the MEDIAN, with the IQR alongside — a single shot cannot distinguish
a regression from this box's ±40% run-to-run swing.

Output: {"metric": "...", "value": <total sec>, "unit": "sec",
         "queries": {...medians...}, "iqr": {...}, "sf": ...}

Scaling evidence (local[8] vs local[32]) is produced by
``bench_scaling.py`` and recorded in BENCH_SCALING.md — this script is
the per-round single-config probe.
"""

from __future__ import annotations

import json
import os
import statistics
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

REPEAT = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "5"))


def med_iqr(ts: list[float]) -> tuple[float, float]:
    med = statistics.median(ts)
    if len(ts) >= 4:
        q = statistics.quantiles(ts, n=4)
        iqr = q[2] - q[0]
    else:
        iqr = max(ts) - min(ts)
    return round(med, 3), round(iqr, 3)


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
    iqr: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        # warm the file listing/readers once so timings measure the query
        df = fn(spark, sf_dir)
        df.count()
        ts = []
        for _ in range(REPEAT):
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            ts.append(time.perf_counter() - t0)
        timings[name], iqr[name] = med_iqr(ts)
        print(f"# {name}: median {timings[name]}s iqr {iqr[name]} rows={n} "
              f"runs={[round(t, 2) for t in ts]}", file=sys.stderr)

    crawl = None
    try:
        from meilisearchcrawler_spark.engine.bench_crawl import crawl_throughput
        runs = []
        for _ in range(REPEAT):
            runs.append(crawl_throughput(spark))
        secs = [r["sec"] for r in runs]
        timings["crawl_round"], iqr["crawl_round"] = med_iqr(secs)
        crawl = sorted(runs, key=lambda r: r["sec"])[len(runs) // 2]
        crawl["pages_per_sec"] = round(
            crawl["pages_fetched"] / timings["crawl_round"], 2)
        print(f"# crawl_round: median {timings['crawl_round']}s "
              f"iqr {iqr['crawl_round']} "
              f"runs={[round(s, 1) for s in secs]}", file=sys.stderr)
    except Exception as exc:  # engine still under construction
        print(f"# crawl bench skipped: {exc}", file=sys.stderr)

    # the BASELINE metric is fetched-and-indexed *image* URLs/sec —
    # report the image decode+verify stage rate alongside the crawl
    # (kept OUT of the summed headline total, commit 4587c0e)
    image = None
    try:
        from meilisearchcrawler_spark.engine.bench_crawl import (
            image_stage_throughput,
        )
        imgs = [image_stage_throughput(spark, n_images=30_000)
                for _ in range(max(REPEAT - 2, 1))]
        image = sorted(imgs, key=lambda r: r["sec"])[len(imgs) // 2]
        print(f"# image_stage (median of {len(imgs)}): {image}",
              file=sys.stderr)
    except Exception as exc:
        print(f"# image bench skipped: {exc}", file=sys.stderr)

    # frontier pop-selection at production frontier sizes: the round-4
    # histogram-pruned on-disk layout must hold the scan ~flat as the
    # frontier grows 10x, vs the round-3 full-scan shape (old).
    pop_scale = None
    try:
        from meilisearchcrawler_spark.engine.bench_crawl import (
            frontier_pop_probe,
        )
        pop_scale = frontier_pop_probe(spark, reps=REPEAT)
        print(f"# frontier_pop scale: {pop_scale}", file=sys.stderr)
    except Exception as exc:
        print(f"# frontier pop bench skipped: {exc}", file=sys.stderr)

    # url_seen conditional-header lookup + visited anti-join at
    # production table sizes: the round-3 key-pruned/inverted plans
    # must stay ~flat 10^6→10^7 while the round-2 full-window/distinct
    # shapes grow linearly (the verdict's #1 gate).
    seen_scale = None
    try:
        from meilisearchcrawler_spark.engine.bench_crawl import seen_scale_probe
        seen_scale = seen_scale_probe(spark)
        print(f"# seen/visited scale: {seen_scale}", file=sys.stderr)
    except Exception as exc:
        print(f"# seen scale bench skipped: {exc}", file=sys.stderr)

    # Bloom maintenance at production round sizes: executor-side bitmap
    # deltas keep the driver payload fixed regardless of row count.
    bloom_scale = None
    try:
        import pandas as pd_  # noqa: N813
        from pyspark.sql import functions as F

        from meilisearchcrawler_spark.engine.bloom import bitmap_delta

        P, bits, k = 64, 1 << 17, 7

        def build_delta(key, pdf):
            return pd_.DataFrame([{
                "pid": int(key[0]),
                "bits": bitmap_delta(pdf["url_hash"].to_numpy(), bits, k)
                .tobytes()}])

        bloom_scale = {}
        for n in (1_000_000, 10_000_000):
            hashes = (spark.range(n)
                      .select(F.xxhash64("id").alias("url_hash"))
                      .select(F.pmod(F.col("url_hash"), F.lit(P))
                              .cast("int").alias("pid"), "url_hash"))
            hashes.persist().count()
            t0 = time.perf_counter()
            # width pinned as in the engine stage (crawler.py): the
            # CPU-bound bitmap build must not be byte-coalesced narrow
            rows = (hashes.repartition(min(P, int(cpus)), "pid")
                    .groupBy("pid")
                    .applyInPandas(build_delta, schema="pid int, bits binary")
                    .collect())
            bloom_scale[f"rows_{n:.0e}".replace("+0", "")] = round(
                time.perf_counter() - t0, 3)
            bloom_scale["driver_bytes"] = sum(len(r["bits"]) for r in rows)
            hashes.unpersist()
        print(f"# bloom_delta scale: {bloom_scale}", file=sys.stderr)
    except Exception as exc:
        print(f"# bloom delta bench skipped: {exc}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "protocol": f"median_of_{REPEAT}",
        "queries": timings,
        "iqr": iqr,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if crawl:
        out["crawl_pages_per_sec"] = crawl["pages_per_sec"]
    if image:
        out["image_urls_per_sec"] = image["images_per_sec"]
        out["image_stage_sec"] = image["sec"]
    # The stdout headline must stay SMALL: the driver keeps only the
    # last ~2000 chars of stdout and parses the last complete JSON line
    # in it — BENCH_r04's 2.2 kB line was clipped mid-object and the
    # round's record lost its machine-readable block (round-4 verdict
    # #2). Probe detail therefore goes to bench_probes.json (committed
    # per-round) + stderr; stdout carries the compact summary only.
    probes = {
        "frontier_pop_scale": pop_scale,
        "seen_scale": seen_scale,
        "bloom_delta_scale": bloom_scale,
    }
    probe_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_probes.json")
    with open(probe_path, "w") as f:
        json.dump({"headline": out, "probes": probes}, f, indent=1)
    print(f"# full probe detail -> {probe_path}", file=sys.stderr)
    if pop_scale:
        out["frontier_growth_10x"] = {
            "old": pop_scale.get("growth_10x_old"),
            "new": pop_scale.get("growth_10x_new")}
    if seen_scale:
        out["seen_growth_10x"] = {
            k.removeprefix("growth_10x_"): v
            for k, v in seen_scale.items()
            if k.startswith("growth_10x_") and k.endswith("_new")}
    if bloom_scale:
        out["bloom_delta_scale"] = bloom_scale
    line = json.dumps(out)
    if len(line) > 1800:  # hard guard: never exceed the tail window
        for k in ("seen_growth_10x", "frontier_growth_10x",
                  "bloom_delta_scale", "iqr"):
            out.pop(k, None)
            line = json.dumps(out)
            if len(line) <= 1800:
                break
    print(line)
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
