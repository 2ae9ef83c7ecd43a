#!/usr/bin/env python
"""Dump .explain('formatted') for the headline queries to
plans/r06/<query>_<tag>.txt (tag = before/after, argv[1])."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from meilisearchcrawler_spark.session import get_spark  # noqa: E402

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
NAMES = sys.argv[2].split(",") if len(sys.argv) > 2 else [
    "q01_pricing_summary", "q03_seen_join", "q05_priority_dedup",
    "q06_frontier_pop", "q16_dedup_exact", "q18_lsh_pairs",
    "q21_cosine_topk", "q22_ann_lsh", "q23_text_quality",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 8),
                      app_name="mcspark-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in NAMES:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{TAG}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"# wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
