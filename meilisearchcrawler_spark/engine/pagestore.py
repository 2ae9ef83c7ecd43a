"""Executor-side synthetic page store — the fetch UDF's "network".

In production the fetch ``mapInPandas`` issues conditional HTTP GETs
with per-URL retry/backoff and errors-as-data (crawler.py:971-1001
semantics; SURVEY.md §4 "fetch UDF failure semantics"). In this
sandbox there is no network, so the same UDF resolves URLs against a
deterministic parquet page store instead. The store is loaded once per
executor process and memoized by path — the moral equivalent of the
per-executor HTTP session/connection pool.
"""

from __future__ import annotations

_CACHE: dict[str, dict[str, dict]] = {}


def load_store(path: str) -> dict[str, dict]:
    store = _CACHE.get(path)
    if store is None:
        import pyarrow.parquet as pq

        table = pq.read_table(path)
        store = {row["url"]: row for row in table.to_pylist()}
        _CACHE[path] = store
    return store
