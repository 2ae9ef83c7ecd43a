#!/usr/bin/env python
"""Round-5 eager-stage A/B: staged delta writes submitted at
declaration (``eager``, CrawlConfig.eager_stage=True — each write's
job overlaps the round's remaining barrier actions) vs held to the
barrier flush pool (``deferred`` = the round-4 shape). The flag is a
plain config knob, so both variants run INTERLEAVED in ONE JVM on one
otherwise-idle box, median-of-N — the AQE-bisect protocol, stronger
than fresh-subprocess pairs because JVM/JIT/page-cache state is shared.

Also reports per-round walls of the median run so the small-round
(fixed-cost-bound) vs wave-round split is visible.

Writes one JSON line with per-variant medians + raw runs.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meilisearchcrawler_spark.engine.bench_crawl import crawl_throughput  # noqa: E402
from meilisearchcrawler_spark.session import get_spark  # noqa: E402

REPEAT = int(os.environ.get("AB_REPEAT", "5"))


def main() -> None:
    spark = get_spark(master="local[32]", driver_memory="48g")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: JIT + fixture disk cache + parquet readers
    crawl_throughput(spark, 4, 400, round_budget=100_000)

    runs: dict[str, list[dict]] = {"deferred": [], "eager": []}
    for rep in range(REPEAT):
        for name, flag in (("deferred", False), ("eager", True)):
            r = crawl_throughput(spark, cfg_extra={"eager_stage": flag})
            runs[name].append({"sec": r["sec"], "round_secs": r["round_secs"],
                               "pages": r["pages_fetched"]})
            print(f"# rep {rep} {name}: {r['sec']:.2f}s "
                  f"rounds={r['round_secs']}", file=sys.stderr, flush=True)
    med, iqr, med_rounds = {}, {}, {}
    for name, rs in runs.items():
        secs = [r["sec"] for r in rs]
        med[name] = round(statistics.median(secs), 3)
        s = sorted(secs)
        iqr[name] = round(s[-(len(s) + 1) // 4] - s[len(s) // 4], 3)
        med_rounds[name] = sorted(rs, key=lambda r: r["sec"])[
            len(rs) // 2]["round_secs"]
    print(json.dumps({
        "metric": "eagerflush_ab_crawl_round",
        "protocol": f"interleaved_one_jvm_median_of_{REPEAT}",
        "median": med, "iqr": iqr, "median_run_round_secs": med_rounds,
        "raw": {k: [r["sec"] for r in v] for k, v in runs.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
