#!/usr/bin/env python
"""Round-6 auxiliary benchmarks — everything the round-5 verdict asked
for that cannot live in the FROZEN ``bench.py``:

* **ANN recall tracking** (verdict #8): recall@10 of both ANN paths
  (q22 hyperplane-LSH, q34 IVF) against the exact cosine top-10 at
  ``$SPARK_GRAFT_SF_DIR`` — so a plane/centroid change that silently
  degrades recall shows up in a committed artifact, not only in the
  fixture-scale pytest gate.
* **Backfill at bench scale** (verdict #9): ``backfill_content`` over
  the 24k-page bench web with the stub extractor — rows/s and the
  never-drop invariant at scale.
* **Noop-sink isolation** (guide §1.4) for the headline queries:
  ``df.write.format("noop")`` computes every column, so these numbers
  time the full computation, not the count()-pruned plan bench.py
  times (kept separately; the driver's protocol is unchanged).

Output: one JSON line; also written to ``bench_extra_out.json``.
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

NOOP_QUERIES = [
    "q01_pricing_summary", "q03_seen_join", "q05_priority_dedup",
    "q06_frontier_pop", "q16_dedup_exact", "q18_lsh_pairs",
    "q21_cosine_topk", "q22_ann_lsh", "q23_text_quality",
]
REPEAT = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "5"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 8),
                      app_name="mcspark-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out: dict = {"metric": "bench_extra_r06", "sf_dir": sf_dir}

    # ---- ANN recall@10 (both paths) vs exact cosine top-10 ----------
    spark.sparkContext.setJobDescription("ann recall@10")
    exact = [r[0] for r in
             qs["q21_cosine_topk"](spark, sf_dir).select("vec_id").collect()]
    recall = {}
    for name in ("q22_ann_lsh", "q34_ann_ivf"):
        got = [r[0] for r in
               qs[name](spark, sf_dir).select("vec_id").collect()]
        recall[name] = round(len(set(got) & set(exact)) / len(exact), 3)
    out["ann_recall_at_10"] = recall

    # ---- backfill_content at bench scale ----------------------------
    try:
        from meilisearchcrawler_spark.engine.bench_crawl import bench_fixture
        from meilisearchcrawler_spark.operators.backfill import backfill_content

        spark.sparkContext.setJobDescription("backfill at bench scale")
        fx, paths = bench_fixture(n_sites=8, pages_per_site=3000,
                                  load_pages=False)
        pages = spark.read.parquet(paths["pages"])
        docs = pages.selectExpr(
            "url", "site", "html AS content",
            "CASE WHEN pmod(xxhash64(url), 4) = 0 THEN 'selector' "
            "     WHEN pmod(xxhash64(url), 4) = 1 THEN 'candidate' "
            "     ELSE 'fallback' END AS content_source",
            "substr(html, 1, 100) AS title",
            "substr(html, 1, 200) AS excerpt",
            "md5(html) AS content_hash",
            "cast(NULL AS array<struct<url:string,alt:string,"
            "description:string>>) AS images")
        n_docs = docs.count()

        def stub_extract(html: str, url: str) -> str | None:
            return ("x" * 300) if html and len(html) > 600 else None

        t0 = time.perf_counter()
        refreshed = backfill_content(docs, pages.select("url", "html"),
                                     stub_extract)
        n_out = refreshed.count()
        sec = time.perf_counter() - t0
        out["backfill"] = {
            "rows_in": n_docs, "rows_out": n_out,
            "never_drop_ok": n_out == n_docs,
            "sec": round(sec, 3),
            "rows_per_sec": round(n_docs / sec, 1),
        }
    except Exception as exc:  # records the failure instead of dying
        out["backfill"] = {"error": f"{type(exc).__name__}: {exc}"}

    # ---- noop-sink isolation of the headline queries ----------------
    noop = {}
    for name in NOOP_QUERIES:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"noop {name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts = []
        for _ in range(REPEAT):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        noop[name] = round(statistics.median(ts), 3)
        print(f"# noop {name}: {noop[name]}s "
              f"runs={[round(t, 2) for t in ts]}", file=sys.stderr)
    out["noop_queries"] = noop
    spark.sparkContext.setJobDescription(None)

    line = json.dumps(out)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_extra_out.json"), "w") as f:
        f.write(line + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
