"""``eager_stage`` submits each staged delta write at declaration
(overlapping the round's remaining barrier actions) instead of holding
them all to the barrier flush pool. Staging only creates orphan dirs —
visibility comes from the manifest commit either way — so the committed
catalog contents must be identical row-for-row across the two modes."""

from __future__ import annotations

from meilisearchcrawler_spark.config import CrawlConfig
from meilisearchcrawler_spark.engine.crawler import CrawlEngine
from meilisearchcrawler_spark.fixtures.webgen import generate_web, write_parquet

TABLES = ("crawl_log", "documents", "url_seen_log", "refreshes",
          "frontier_adds", "lineage", "metrics", "bloom_parts")


def _rows(eng, table):
    df = eng.catalog.read(table)
    if df is None:
        return None
    return sorted(tuple(r) for r in
                  df.select(*sorted(df.columns)).collect())


def test_eager_stage_equivalence(spark, tmp_path):
    fx = generate_web(seed=23, n_sites=2, pages_per_site=30)
    paths = write_parquet(fx, str(tmp_path / "web"))
    engines = {}
    for name, flag in (("deferred", False), ("eager", True)):
        eng = CrawlEngine(spark, str(tmp_path / f"cat_{name}"),
                          paths["pages"], fx.seeds, fx.robots,
                          CrawlConfig(round_budget=4, shuffle_partitions=4,
                                      eager_stage=flag),
                          initial_url_seen=fx.url_seen)
        eng.run()
        engines[name] = eng
    checked = 0
    for table in TABLES:
        a = _rows(engines["deferred"], table)
        b = _rows(engines["eager"], table)
        assert a == b, f"{table} diverged between deferred and eager staging"
        if a is not None:
            checked += 1
    # the crawl must actually have produced the core tables
    assert checked >= 6
    assert _rows(engines["eager"], "crawl_log")
