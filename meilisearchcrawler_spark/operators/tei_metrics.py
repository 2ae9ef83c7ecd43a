"""TEI embedding-service metrics derivation (A10) — the reference's
``TEIMetricsMonitor`` scrapes the Text-Embeddings-Inference Prometheus
endpoint and derives queue depth, request counters, average inference /
queue latency (sum÷count × 1000) and average batch size, then uses
them for backpressure (crawler.py:172-259).

Spark-first shape: a fleet of TEI replicas emits counter *samples*
into a table (scrape_ts, replica, metric, value) — here the parse step
is :func:`parse_prometheus`, a direct port of ``_parse_metrics``
(crawler.py:194-239), usable inside a ``mapInPandas`` ingest of raw
scrape bodies. :func:`derive_tei_metrics` computes the reference's
derived fields per (scrape_ts, replica) as one pivot+column-algebra
pass, and :func:`should_throttle_col` is the crawler.py:241-259
backpressure predicate as a column. (The engine itself does not
throttle on these — SURVEY §4 drops ST5 in favor of Spark's memory
manager — but the derivation is the reference's operator surface.)
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# raw counter names, crawler.py:199-233
RAW_METRICS = (
    "te_queue_size",
    "te_request_count_batch",
    "te_request_success_batch",
    "te_request_inference_duration_sum",
    "te_request_inference_duration_count",
    "te_request_queue_duration_sum",
    "te_request_queue_duration_count",
    "te_batch_next_size_sum",
    "te_batch_next_size_count",
)

_PATTERNS = {
    "te_queue_size": r"^te_queue_size\s+(\d+)",
    "te_request_count_batch": r'^te_request_count\{method="batch"\}\s+(\d+)',
    "te_request_success_batch": r'^te_request_success\{method="batch"\}\s+(\d+)',
    "te_request_inference_duration_sum": r"^te_request_inference_duration_sum\s+([\d.]+)",
    "te_request_inference_duration_count": r"^te_request_inference_duration_count\s+(\d+)",
    "te_request_queue_duration_sum": r"^te_request_queue_duration_sum\s+([\d.]+)",
    "te_request_queue_duration_count": r"^te_request_queue_duration_count\s+(\d+)",
    "te_batch_next_size_sum": r"^te_batch_next_size_sum\s+([\d.]+)",
    "te_batch_next_size_count": r"^te_batch_next_size_count\s+(\d+)",
}


def parse_prometheus(text: str) -> dict[str, float]:
    """Port of TEIMetricsMonitor._parse_metrics (crawler.py:194-239):
    raw counter samples from one scrape body (derivation happens
    relationally in :func:`derive_tei_metrics`)."""
    out: dict[str, float] = {}
    for name, pat in _PATTERNS.items():
        m = re.search(pat, text, re.MULTILINE)
        if m:
            out[name] = float(m.group(1))
    return out


def derive_tei_metrics(samples: DataFrame) -> DataFrame:
    """Reference-derived fields per (scrape_ts, replica) from a counter
    sample table (scrape_ts long, replica string, metric string, value
    double): queue_size, total/successful requests,
    avg_inference_time_ms, avg_queue_time_ms, avg_batch_size
    (crawler.py:199-239 semantics — a sum/count pair only yields an
    average when count > 0)."""
    wide = (samples.groupBy("scrape_ts", "replica")
            .pivot("metric", list(RAW_METRICS)).agg(F.first("value")))

    def ratio(num: str, den: str, scale: float) -> Column:
        return F.when(F.coalesce(F.col(den), F.lit(0)) > 0,
                      F.round(F.col(num) / F.col(den) * scale, 4))

    return wide.select(
        "scrape_ts", "replica",
        F.col("te_queue_size").cast("long").alias("queue_size"),
        F.col("te_request_count_batch").cast("long").alias("total_requests"),
        F.col("te_request_success_batch").cast("long")
        .alias("successful_requests"),
        ratio("te_request_inference_duration_sum",
              "te_request_inference_duration_count", 1000.0)
        .alias("avg_inference_time_ms"),
        ratio("te_request_queue_duration_sum",
              "te_request_queue_duration_count", 1000.0)
        .alias("avg_queue_time_ms"),
        ratio("te_batch_next_size_sum", "te_batch_next_size_count", 1.0)
        .alias("avg_batch_size"))


def should_throttle_col() -> Column:
    """crawler.py:241-259: throttle when the queue backs up (>3) or
    inference is slow (>200 ms); missing metrics never throttle."""
    return (F.coalesce(F.col("queue_size"), F.lit(0)) > 3) | (
        F.coalesce(F.col("avg_inference_time_ms"), F.lit(0.0)) > 200.0)
