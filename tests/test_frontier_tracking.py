"""Round-6 optimization internals: driver-tracked frontier sizes, the
small-round candidate-prefix shortcut, and the adaptive Bloom-probe
skip. All three only change PLAN shape / driver bookkeeping — these
tests pin (a) the tracked size against the actual live frontier every
round, (b) row-identity of the shortcut prefix, and (c) that a legacy
checkpoint (state without ``frontier_rows``) still resumes and
completes identically."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from meilisearchcrawler_spark.config import CrawlConfig
from meilisearchcrawler_spark.engine.crawler import (
    CrawlEngine, candidate_prefix)
from meilisearchcrawler_spark.fixtures.webgen import generate_web, write_parquet

from meilisearchcrawler_spark.session import ship_package


def _web(tmp_path, seed=19, n_sites=2, pages_per_site=24):
    fx = generate_web(seed=seed, n_sites=n_sites,
                      pages_per_site=pages_per_site)
    out = tmp_path / "web"
    out.mkdir(exist_ok=True)
    paths = write_parquet(fx, str(out))
    return fx, paths


def _live_counts(eng) -> dict[str, int]:
    live = eng._live_frontier()
    if live is None:
        return {}
    return {r["site"]: r["cnt"] for r in
            live.groupBy("site").agg(F.count("*").alias("cnt")).collect()}


def test_frontier_rows_tracks_live_frontier(spark, tmp_path):
    """After every round (including across a compaction, which folds
    pops without changing the live set), the driver-tracked
    ``frontier_rows`` equals the actual live-frontier row count."""
    ship_package(spark)
    fx, paths = _web(tmp_path)
    eng = CrawlEngine(spark, str(tmp_path / "cat"), paths["pages"],
                      fx.seeds, fx.robots,
                      CrawlConfig(round_budget=6, shuffle_partitions=4,
                                  compact_every=2),
                      initial_url_seen=fx.url_seen)
    for _ in range(40):
        progressed = eng.run_round()
        actual = _live_counts(eng)
        for name, st in eng.sites.items():
            assert st.frontier_rows is not None
            assert st.frontier_rows == actual.get(name, 0), \
                f"{name}: tracked {st.frontier_rows} != {actual.get(name, 0)}"
        if not progressed:
            break
    assert not any(s.active for s in eng.sites.values())
    # drained crawl: every tracked size is exactly zero
    assert all(s.frontier_rows == 0 for s in eng.sites.values())


def test_legacy_state_without_frontier_rows_resumes(spark, tmp_path):
    """A checkpoint whose state predates ``frontier_rows`` resumes with
    the field unknown (None), keeps the budget-only bounds, and
    completes with a crawl_log identical to an uninterrupted run."""
    ship_package(spark)
    fx, paths = _web(tmp_path)
    cfg = dict(round_budget=6, shuffle_partitions=4)

    full = CrawlEngine(spark, str(tmp_path / "full"), paths["pages"],
                       fx.seeds, fx.robots, CrawlConfig(**cfg),
                       initial_url_seen=fx.url_seen)
    full.run(max_rounds=300)
    want = sorted(map(tuple, full.catalog.read("crawl_log")
                      .select("site", "round", "pos_in_round", "url",
                              "counter", "action").collect()))

    part = CrawlEngine(spark, str(tmp_path / "part"), paths["pages"],
                       fx.seeds, fx.robots, CrawlConfig(**cfg),
                       initial_url_seen=fx.url_seen)
    part.run(max_rounds=2)
    # strip the round-6 field from the committed state, as a pre-round-6
    # checkpoint would have written it
    mpath = os.path.join(str(tmp_path / "part"), "manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    for site_state in manifest["state"]["sites"].values():
        site_state.pop("frontier_rows")
    with open(mpath, "w") as f:
        json.dump(manifest, f)

    resumed = CrawlEngine(spark, str(tmp_path / "part"), paths["pages"],
                          fx.seeds, fx.robots, CrawlConfig(**cfg),
                          initial_url_seen=fx.url_seen)
    assert all(s.frontier_rows is None for s in resumed.sites.values())
    resumed.run(max_rounds=300)
    got = sorted(map(tuple, resumed.catalog.read("crawl_log")
                     .select("site", "round", "pos_in_round", "url",
                             "counter", "action").collect()))
    assert got == want


def test_escalation_stats_skip_is_row_identical(spark, tmp_path):
    """With tracked sizes under ``prefix_k`` the escalation stats
    collect is skipped (round-6). The crawl_log must be identical to
    the stats-path run (tracking disabled module-wide), and the skip
    must never fire when a site's frontier could fill its prefix."""
    from meilisearchcrawler_spark.engine import crawler as crawler_mod

    ship_package(spark)
    fx, paths = _web(tmp_path)
    cfg = dict(round_budget=6, shuffle_partitions=4)

    def log_of(root):
        eng = CrawlEngine(spark, root, paths["pages"], fx.seeds, fx.robots,
                          CrawlConfig(**cfg), initial_url_seen=fx.url_seen)
        eng.run(max_rounds=300)
        return sorted(map(tuple, eng.catalog.read("crawl_log")
                          .select("site", "round", "pos_in_round", "url",
                                  "counter", "action").collect()))

    want = log_of(str(tmp_path / "skip"))      # tracked: skip active
    crawler_mod._FRONTIER_SIZE_BOUNDS = False  # stats path for every round
    try:
        got = log_of(str(tmp_path / "stats"))
    finally:
        crawler_mod._FRONTIER_SIZE_BOUNDS = True
    assert got == want


def test_candidate_prefix_small_is_row_identical(spark):
    """``small=True`` must return exactly the two-phase prefix's rows
    (it only skips the pre-pruning passes)."""
    ship_package(spark)
    rows = [
        {"site": f"s{i % 3}", "url": f"u{i}", "host": "h",
         "depth": i % 4, "counter": i}
        for i in range(200)
    ]
    frontier = spark.createDataFrame(rows)
    for k in (1, 7, 50, 300):
        a = sorted(map(tuple, candidate_prefix(frontier, k).collect()))
        b = sorted(map(tuple,
                       candidate_prefix(frontier, k, small=True).collect()))
        assert a == b, f"prefix_k={k} diverges"
