"""Search-query logging sink (A4 write path, stats_db.py:127-185) and
TEI metrics derivation (A10, crawler.py:172-259) vs sequential
expectations."""

from __future__ import annotations

import math
import random


class TestSearchLog:
    def _fixture(self, rng: random.Random):
        params, results = [], []
        for qid in range(25):
            params.append({
                "query_id": qid, "query": f"q{qid % 7}", "lang": "fr" if qid % 3 else "en",
                "limit_requested": 20, "use_cse": bool(qid % 2),
                "use_reranking": bool(qid % 4), "use_hybrid": bool(qid % 2),
                "processing_time_ms": round(rng.uniform(5, 120), 2),
                "cache_hit": qid % 5 == 0,
            })
            for src, n in (("meilisearch", rng.randrange(4)),
                           ("cse", rng.randrange(3)),
                           ("wiki", rng.randrange(2))):
                results += [{"query_id": qid, "source": src}] * n
        return params, results

    def test_log_rows_match_reference_insert(self, spark):
        from meilisearchcrawler_spark.search.statslog import build_search_log

        rng = random.Random(5)
        params, results = self._fixture(rng)
        now = 1_700_000_000.0
        log = build_search_log(
            spark.createDataFrame(params),
            spark.createDataFrame(results,
                                  schema="query_id long, source string"),
            now).collect()
        by_id = {r["query_id"]: r for r in log}
        assert len(by_id) == len(params)
        for p in params:
            want = {s: sum(1 for r in results
                           if r["query_id"] == p["query_id"] and r["source"] == s)
                    for s in ("meilisearch", "cse", "wiki")}
            got = by_id[p["query_id"]]
            assert got["meilisearch_results"] == want["meilisearch"]
            assert got["cse_results"] == want["cse"]
            assert got["wiki_results"] == want["wiki"]
            assert got["total_results"] == sum(want.values())
            assert got["timestamp"] == int(now)
            assert got["cache_hit"] == p["cache_hit"]

    def test_stats_rollup(self, spark):
        from meilisearchcrawler_spark.search.statslog import (
            build_search_log, search_stats, top_queries)

        rng = random.Random(5)
        params, results = self._fixture(rng)
        now = 1_700_000_000.0
        log = build_search_log(
            spark.createDataFrame(params),
            spark.createDataFrame(results, schema="query_id long, source string"),
            now)
        stats = {r["lang"]: r for r in search_stats(log, now).collect()}
        fr = [p for p in params if p["lang"] == "fr"]
        assert stats["fr"]["n_queries"] == len(fr)
        assert math.isclose(
            stats["fr"]["avg_ms"],
            round(sum(p["processing_time_ms"] for p in fr) / len(fr), 4),
            abs_tol=1e-9)
        assert math.isclose(
            stats["fr"]["cache_hit_rate"],
            round(sum(p["cache_hit"] for p in fr) / len(fr), 6), abs_tol=1e-9)
        assert stats["fr"]["n_last_hour"] == len(fr)  # all stamped at now
        top = top_queries(log, k=3).collect()
        from collections import Counter
        want = Counter(p["query"] for p in params).most_common()
        want.sort(key=lambda t: (-t[1], t[0]))
        assert [(r["query"], r["n"]) for r in top] == want[:3]


_PROM = """\
te_queue_size 5
te_request_count{method="batch"} 120
te_request_success{method="batch"} 118
te_request_inference_duration_sum 24.6
te_request_inference_duration_count 120
te_request_queue_duration_sum 6.0
te_request_queue_duration_count 120
te_batch_next_size_sum 660
te_batch_next_size_count 120
"""

_PROM_IDLE = """\
te_queue_size 0
te_request_count{method="batch"} 0
te_request_success{method="batch"} 0
te_request_inference_duration_sum 0
te_request_inference_duration_count 0
"""


class TestTeiMetrics:
    def test_parse_matches_reference_fields(self):
        from meilisearchcrawler_spark.operators.tei_metrics import parse_prometheus

        m = parse_prometheus(_PROM)
        assert m["te_queue_size"] == 5
        assert m["te_request_count_batch"] == 120
        assert m["te_request_inference_duration_sum"] == 24.6

    def test_derive_and_throttle(self, spark):
        from meilisearchcrawler_spark.operators.tei_metrics import (
            derive_tei_metrics, parse_prometheus, should_throttle_col)

        rows = []
        for ts, rep, text in [(1, "a", _PROM), (1, "b", _PROM_IDLE)]:
            for metric, value in parse_prometheus(text).items():
                rows.append({"scrape_ts": ts, "replica": rep,
                             "metric": metric, "value": float(value)})
        samples = spark.createDataFrame(
            rows, schema="scrape_ts long, replica string, metric string, value double")
        got = {r["replica"]: r for r in derive_tei_metrics(samples).collect()}
        a = got["a"]
        assert a["queue_size"] == 5 and a["total_requests"] == 120
        assert math.isclose(a["avg_inference_time_ms"],
                            round(24.6 / 120 * 1000, 4))
        assert math.isclose(a["avg_queue_time_ms"], 50.0)
        assert math.isclose(a["avg_batch_size"], 5.5)
        b = got["b"]
        # count=0 pairs derive no average (crawler.py:216-229)
        assert b["avg_inference_time_ms"] is None
        assert b["queue_size"] == 0
        # backpressure predicate: a throttles (queue 5 > 3), b does not
        flags = {r["replica"]: r["throttle"] for r in
                 derive_tei_metrics(samples)
                 .withColumn("throttle", should_throttle_col()).collect()}
        assert flags == {"a": True, "b": False}
