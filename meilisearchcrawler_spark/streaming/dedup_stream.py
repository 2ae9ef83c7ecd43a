"""Stateful streaming URL dedup — the Structured-Streaming analog of
F1's visited gate, as a custom stateful operator
(``applyInPandasWithState``).

A discovered-URL stream (e.g. the frontier feed of a continuously-run
crawl) is grouped by ``pmod(url_hash, n_buckets)``; each bucket keeps
its seen-hash set as operator state and emits only first occurrences.
State checkpointing makes the dedup exactly-once across restarts —
the streaming counterpart of the engine's bloom_parts/visited pair.

Scale note: the per-bucket state here is the exact hash set (testable
semantics); the production variant stores the same partitioned Bloom
bitmap the batch engine commits (16 KB/bucket, FP-tolerant pre-filter
in front of an idempotent sink), which is a one-line swap of the state
payload. Bucket count bounds state-row width either way.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

OUT_SCHEMA = "url_hash long, url string, site string"
STATE_SCHEMA = "seen array<long>"


def _dedup_fn(key, pdf_iter, state):
    seen = set(state.get[0]) if state.exists else set()
    out = []
    for pdf in pdf_iter:
        for row in pdf.itertuples(index=False):
            h = int(row.url_hash)
            if h not in seen:
                seen.add(h)
                out.append({"url_hash": h, "url": row.url,
                            "site": row.site})
    state.update((sorted(seen),))
    yield pd.DataFrame(out, columns=["url_hash", "url", "site"])


def streaming_url_dedup(stream: DataFrame, n_buckets: int = 64) -> DataFrame:
    """First occurrence of every url_hash across the whole stream
    lifetime; input needs (url_hash long, url string, site string)."""
    return (stream
            .withColumn("_bucket",
                        F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int"))
            .groupBy("_bucket")
            .applyInPandasWithState(
                _dedup_fn, OUT_SCHEMA, STATE_SCHEMA,
                "append", GroupStateTimeout.NoTimeout))
