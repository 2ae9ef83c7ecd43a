"""CSE cache/quota state machine (S11) vs the sequential oracle — a
direct replay of cse_client.py:98-140's cache→quota→API decision path,
across micro-batches, a day rollover (quota reset), and TTL expiry."""

from __future__ import annotations

import json
import random

from pyspark.sql import functions as F

from meilisearchcrawler_spark.sources.cse import (
    cache_cleanup,
    cache_valid_view,
    cse_oracle,
    process_batch,
    quota_used,
)

T0 = 1_700_000_000.0


def _api_fixture(rng: random.Random):
    """Deterministic stand-in for the CSE API: per (query, lang) result
    payloads, some failing."""
    api = {}
    for i in range(30):
        q, lang = f"query {i % 12}", ("fr" if i % 2 else "en")
        api[(q, lang)] = {
            "results": json.dumps([{"url": f"http://r/{i}/{j}",
                                    "title": f"t{j}"} for j in range(3)]),
            "fails": (i % 7 == 3),
        }
    return api


def _batches(rng: random.Random):
    """Three micro-batches: same-day pair (quota carries over, repeats
    hit intra/prior cache), then a later day (quota resets, cache
    partially expired)."""
    qid = 0
    out = []
    for spec in [(T0, "2023-11-14", 9), (T0 + 3600, "2023-11-14", 9),
                 (T0 + 8 * 86400, "2023-11-22", 12)]:
        now, day, n = spec
        rows = []
        for _ in range(n):
            i = rng.randrange(14)
            rows.append({"qid": qid, "query": f"query {i}",
                         "lang": ("fr" if i % 2 else "en")})
            qid += 1
        out.append((now, day, rows))
    return out


def test_cse_matches_sequential_oracle(spark):
    rng = random.Random(23)
    api = _api_fixture(rng)
    batches = _batches(rng)
    api_df = spark.createDataFrame(
        [{"query": q, "lang": lang, "results": v["results"],
          "fails": v["fails"]} for (q, lang), v in api.items()],
        schema="query string, lang string, results string, fails boolean")

    cache_log = None
    quota_log = None
    o_cache: dict[str, dict] = {}
    o_quota: dict[str, int] = {}
    daily_quota = 5

    for bno, (now, day, rows) in enumerate(batches):
        qdf = spark.createDataFrame(
            rows, schema="qid long, query string, lang string")
        out = process_batch(qdf, cache_log, quota_log, api_df, now, day,
                            bno, daily_quota=daily_quota)
        got = sorted((r.asDict() for r in out["responses"].collect()),
                     key=lambda r: r["qid"])
        want = cse_oracle(rows, o_cache, o_quota, api, now, day,
                          daily_quota=daily_quota)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            for k in ("qid", "query", "lang", "results", "cache_hit",
                      "quota_blocked"):
                assert g[k] == w[k], (bno, g["qid"], k, g, w)
        # append the deltas (the catalog-commit analog)
        cd, qd = out["cache_delta"], out["quota_delta"]
        cache_log = cd if cache_log is None else cache_log.unionByName(cd)
        quota_log = qd if quota_log is None else quota_log.unionByName(qd)
        # state equality after the batch
        assert quota_used(quota_log, day) == o_quota.get(day, 0)
        view = cache_valid_view(cache_log, now)
        got_cache = {r["query_hash"]: r["results"] for r in view.collect()}
        want_cache = {h: e["results"] for h, e in o_cache.items()
                      if e["expires_at"] > now}
        assert got_cache == want_cache, (bno, "cache state")

    # TTL cleanup folds the log to live rows only (cse_client.py:333-347)
    final_now = batches[-1][0]
    folded = cache_cleanup(cache_log, final_now)
    assert ({r["query_hash"] for r in folded.collect()}
            == {h for h, e in o_cache.items() if e["expires_at"] > final_now})


def test_cse_quota_exhaustion_and_refail(spark):
    """Over-quota misses are quota_blocked (even would-fail API calls,
    which the reference blocks before attempting); failed API calls
    consume no quota and are retried by later occurrences."""
    api_df = spark.createDataFrame(
        [{"query": "ok", "lang": "fr", "results": "[1]", "fails": False},
         {"query": "boom", "lang": "fr", "results": "[2]", "fails": True}],
        schema="query string, lang string, results string, fails boolean")
    rows = [{"qid": i, "query": q, "lang": "fr"} for i, q in enumerate(
        ["boom", "ok", "boom", "x1", "x2", "boom", "x3"])]
    qdf = spark.createDataFrame(rows, schema="qid long, query string, lang string")
    out = process_batch(qdf, None, None, api_df, T0, "2023-11-14", 0,
                        daily_quota=2)
    got = {r["qid"]: r.asDict() for r in out["responses"].collect()}
    api = {("ok", "fr"): {"results": "[1]", "fails": False},
           ("boom", "fr"): {"results": "[2]", "fails": True}}
    want = cse_oracle(rows, {}, {}, api, T0, "2023-11-14", daily_quota=2)
    for w in want:
        g = got[w["qid"]]
        for k in ("results", "cache_hit", "quota_blocked"):
            assert g[k] == w[k], (w["qid"], k, g, w)
    # quota: only 'ok' and 'x1' fetched (boom fails, x2/x3 blocked)
    assert out["quota_delta"].first()["n_calls"] == 2
