"""Executor-side synthetic page store — the fetch UDF's "network".

In production the fetch ``mapInPandas`` issues conditional HTTP GETs
with per-URL retry/backoff and errors-as-data (crawler.py:971-1001
semantics; SURVEY.md §4 "fetch UDF failure semantics"). In this
sandbox there is no network, so the same UDF resolves URLs against a
deterministic parquet page store instead. The store is loaded once per
executor process and memoized by path — the moral equivalent of the
per-executor HTTP session/connection pool.

The store is *lazy*: the parquet stays columnar (Arrow) with only a
url→row index built eagerly; full Python row dicts materialize on
demand per fetched URL. Eagerly `to_pylist()`-ing an 80k-page web cost
~10 s and ~300 MB **per Python worker**, which dominated crawl rounds;
the lazy form loads in well under a second and touches only the rows a
worker actually fetches.
"""

from __future__ import annotations


class LazyPageStore:
    def __init__(self, path: str):
        import pyarrow.parquet as pq

        self._table = pq.read_table(path).combine_chunks()
        self._cols = {name: self._table.column(name).chunk(0)
                      for name in self._table.column_names}
        self._idx = {u: i for i, u in
                     enumerate(self._cols["url"].to_pylist())}
        self._rows: dict[int, dict] = {}

    def get(self, url: str) -> dict | None:
        i = self._idx.get(url)
        if i is None:
            return None
        row = self._rows.get(i)
        if row is None:
            row = {name: col[i].as_py() for name, col in self._cols.items()}
            self._rows[i] = row
        return row


_CACHE: dict[str, LazyPageStore] = {}


def load_store(path: str) -> LazyPageStore:
    store = _CACHE.get(path)
    if store is None:
        store = LazyPageStore(path)
        _CACHE[path] = store
    return store
