"""Google-CSE scan with result cache + daily quota as *stateful
tables* (S11) — the Spark re-expression of the reference's SQLite pair
``cse_cache`` / ``cse_quota`` (api/services/cse_client.py:68-94 tables,
98-140 cache→quota→API decision path, 226-290 lookup/insert/check,
292-330 daily counter, 333-347 TTL cleanup).

The reference serves one query at a time; the engine processes a
micro-batch of queries (ordered by arrival ``qid``) against two
append-only catalog-style logs:

* ``cache_log``   (query_hash, query, lang, results, cached_at,
  expires_at, batch) — INSERT OR REPLACE becomes append + latest-wins
  per ``query_hash``; the 7-day TTL is a read predicate
  (``expires_at > now``), and :func:`cache_cleanup` is the compaction
  analog of ``cleanup_expired_cache``.
* ``quota_log``   (date, n_calls, batch) — the daily counter becomes a
  per-batch increment row; "used today" is a sum over the day's rows,
  so the daily reset (new date key) needs no delete.

Intra-batch sequencing mirrors the reference exactly: a repeated query
later in the batch hits the cache *only if* an earlier occurrence
actually fetched-and-cached (succeeded within quota and without API
error); quota slots are consumed in arrival order, so the batch's
first ``remaining`` fetchable misses succeed and the rest get empty
results — byte-for-byte the sequential decision sequence, verified by
:func:`cse_oracle` in the tests.

All decisions are window/join algebra over the query batch (bounded:
one request stream), never over the corpus; the fixture results table
stands in for the network API (S11 is a *scan*, the HTTP client is out
of engine scope like S1's socket layer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DAILY_QUOTA = 100     # cse_client.py:36 (free tier)
CACHE_DAYS = 7        # cse_client.py:35


def query_hash_col(query, lang):
    """``md5(f"{query}|{lang}")`` — cse_client.py:349-351."""
    return F.md5(F.concat(query, F.lit("|"), lang))


def cache_valid_view(cache_log: DataFrame | None, now: float) -> DataFrame | None:
    """Latest-wins per query_hash, TTL-filtered (cse_client.py:226-247:
    ``WHERE query_hash = ? AND expires_at > ?``)."""
    if cache_log is None:
        return None
    w = Window.partitionBy("query_hash").orderBy(F.desc("batch"))
    return (cache_log.withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") == 1) & (F.col("expires_at") > F.lit(now)))
            .drop("_rn"))


def quota_used(quota_log: DataFrame | None, day: str) -> int:
    """Sum of the day's increments (cse_client.py:274-290)."""
    if quota_log is None:
        return 0
    row = (quota_log.filter(F.col("date") == day)
           .agg(F.sum("n_calls").alias("n")).first())
    return int(row["n"] or 0)


def process_batch(queries: DataFrame, cache_log: DataFrame | None,
                  quota_log: DataFrame | None, api_results: DataFrame,
                  now: float, day: str, batch_no: int,
                  daily_quota: int = DAILY_QUOTA,
                  cache_days: int = CACHE_DAYS) -> dict[str, DataFrame]:
    """One micro-batch of CSE lookups.

    ``queries``: (qid long, query string, lang string) — qid is arrival
    order, the reference's sequential clock.
    ``api_results``: the fixture API table (query, lang, results string,
    fails boolean) standing in for the network call; a ``fails`` row
    reproduces the exception path (no cache write, no quota increment,
    empty results — cse_client.py:135-139).

    Returns ``responses`` (qid, query, lang, results, cache_hit,
    quota_blocked), ``cache_delta`` and ``quota_delta`` to append to
    the logs.
    """
    q = queries.withColumn("query_hash",
                           query_hash_col(F.col("query"), F.col("lang")))
    valid = cache_valid_view(cache_log, now)
    if valid is not None:
        q = q.join(F.broadcast(valid.select(
            "query_hash", F.col("results").alias("_cached"))),
            "query_hash", "left")
    else:
        q = q.withColumn("_cached", F.lit(None).cast("string"))
    q = q.join(F.broadcast(api_results.select(
        "query", "lang", F.col("results").alias("_api"),
        F.coalesce("fails", F.lit(False)).alias("_api_fails"))),
        ["query", "lang"], "left")
    q = (q.withColumn("_api_fails", F.coalesce("_api_fails", F.lit(False)))
         # unknown query = API returns no items, still a successful call
         .withColumn("_api", F.coalesce("_api", F.lit("[]"))))

    # first occurrence per hash among prior-cache misses drives the
    # fetch; later occurrences ride its outcome (sequential cache write)
    wq = Window.partitionBy("query_hash").orderBy("qid")
    q = (q.withColumn("_occ", F.row_number().over(wq))
         .withColumn("_is_fetch_head",
                     F.col("_cached").isNull() & (F.col("_occ") == 1)))
    # quota state at each row's turn: the reference checks the quota
    # BEFORE the API call (and an API error increments nothing), so the
    # counter at row r = used_today + successful fetch heads earlier in
    # the batch, which is min(fetchable-heads-before, remaining) —
    # monotone, window-computable in arrival order. The global-order
    # window is bounded: it ranks one request micro-batch, not a corpus.
    used = quota_used(quota_log, day)
    remaining = max(daily_quota - used, 0)
    wprev = Window.orderBy("qid").rowsBetween(Window.unboundedPreceding, -1)
    fetchable = (F.col("_is_fetch_head") & ~F.col("_api_fails")).cast("int")
    q = q.withColumn("_fetchable_before",
                     F.coalesce(F.sum(fetchable).over(wprev), F.lit(0)))
    q = q.withColumn(
        "_blocked_now",
        F.least(F.col("_fetchable_before"), F.lit(remaining)) + F.lit(used)
        >= F.lit(daily_quota))
    q = q.withColumn("_allowed",
                     F.col("_is_fetch_head") & ~F.col("_api_fails")
                     & ~F.col("_blocked_now"))
    # outcome of the head, visible to every occurrence of the hash
    whash = Window.partitionBy("query_hash")
    q = (q.withColumn("_head_cached",
                      F.max(F.col("_allowed").cast("int")).over(whash) == 1)
         .withColumn("_head_qid",
                     F.min(F.when(F.col("_is_fetch_head"), F.col("qid")))
                     .over(whash)))

    hit_prior = F.col("_cached").isNotNull()
    hit_intra = (~hit_prior & F.col("_head_cached")
                 & (F.col("qid") > F.col("_head_qid")))
    served_api = F.col("_allowed") | hit_intra
    # the reference's quota gate fires on any cache miss that finds the
    # day exhausted — including queries whose API call would have failed
    quota_blocked = ~hit_prior & ~hit_intra & F.col("_blocked_now")

    responses = q.select(
        "qid", "query", "lang",
        F.when(hit_prior, F.col("_cached"))
        .when(served_api, F.col("_api"))
        .otherwise(F.lit("[]")).alias("results"),
        (hit_prior | hit_intra).alias("cache_hit"),
        quota_blocked.alias("quota_blocked"))

    cache_delta = (q.filter(F.col("_allowed"))
                   .select("query_hash", "query", "lang",
                           F.col("_api").alias("results"),
                           F.lit(float(now)).alias("cached_at"),
                           F.lit(float(now) + cache_days * 86400.0)
                           .alias("expires_at"),
                           F.lit(batch_no).alias("batch")))
    quota_delta = (q.filter(F.col("_allowed"))
                   .agg(F.count("*").alias("n_calls"))
                   .select(F.lit(day).alias("date"), "n_calls",
                           F.lit(batch_no).alias("batch"))
                   .filter(F.col("n_calls") > 0))
    return {"responses": responses, "cache_delta": cache_delta,
            "quota_delta": quota_delta}


def cache_cleanup(cache_log: DataFrame, now: float) -> DataFrame:
    """Compaction form of cleanup_expired_cache (cse_client.py:333-347):
    the folded log keeps only live latest-wins rows."""
    view = cache_valid_view(cache_log, now)
    return view if view is not None else cache_log.limit(0)


# ---------------------------------------------------------------------------
# Sequential oracle — a direct port of CSEClient.search's decision loop
# ---------------------------------------------------------------------------


def cse_oracle(queries: list[dict], cache: dict[str, dict],
               quota: dict[str, int], api: dict[tuple[str, str], dict],
               now: float, day: str, daily_quota: int = DAILY_QUOTA,
               cache_days: int = CACHE_DAYS) -> list[dict]:
    """Replays cse_client.py:98-140 one query at a time, mutating
    ``cache``/``quota`` in place. ``api[(query, lang)]`` = {"results":
    str, "fails": bool}; missing keys mean an empty-but-successful API
    answer."""
    import hashlib

    out = []
    for row in queries:
        qh = hashlib.md5(f"{row['query']}|{row['lang']}".encode()).hexdigest()
        entry = cache.get(qh)
        if entry is not None and entry["expires_at"] > now:
            out.append({**row, "results": entry["results"],
                        "cache_hit": True, "quota_blocked": False})
            continue
        if quota.get(day, 0) >= daily_quota:
            out.append({**row, "results": "[]",
                        "cache_hit": False, "quota_blocked": True})
            continue
        spec = api.get((row["query"], row["lang"]),
                       {"results": "[]", "fails": False})
        if spec["fails"]:
            out.append({**row, "results": "[]",
                        "cache_hit": False, "quota_blocked": False})
            continue
        cache[qh] = {"results": spec["results"],
                     "cached_at": now,
                     "expires_at": now + cache_days * 86400.0}
        quota[day] = quota.get(day, 0) + 1
        out.append({**row, "results": spec["results"],
                    "cache_hit": False, "quota_blocked": False})
    return out
