"""Round-4 frontier layout: the histogram pop cutoff must NEVER prune
a row that belongs to any site's heap-order top-``need`` prefix, the
histogram must describe the snapshot exactly, and the engine's pruned
pop view must select the same candidates as a full live-frontier scan.

These pin the math directly; the equivalence suite pins the end-to-end
behavior (compaction runs inside every multi-round equivalence test).
"""

from __future__ import annotations

import random

import pytest

from meilisearchcrawler_spark.engine.crawler import (
    _HIST_RANKS,
    candidate_prefix,
    frontier_hist,
    pop_cutoff,
)


def _hist_of(rows: list[tuple[str, int, int]]) -> dict:
    """Reference histogram builder: counts + geometric-rank counter
    quantiles per (site, depth), ranks always including the last row."""
    by: dict = {}
    for site, depth, counter in rows:
        by.setdefault(site, {}).setdefault(depth, []).append(counter)
    hist: dict = {}
    for site, depths in by.items():
        hist[site] = {}
        for depth, counters in depths.items():
            counters.sort()
            ranks = [[r, counters[r - 1]] for r in _HIST_RANKS
                     if r <= len(counters)]
            if not ranks or ranks[-1][0] != len(counters):
                ranks.append([len(counters), counters[-1]])
            hist[site][str(depth)] = {"n": len(counters), "ranks": ranks}
    return hist


def _top_need(rows, site, need):
    """Heap-order (depth desc, counter asc) top-need rows of one site."""
    mine = sorted((r for r in rows if r[0] == site),
                  key=lambda r: (-r[1], r[2]))
    return mine[:need]


def _kept(rows, cut):
    if cut is None:
        return list(rows)
    g, c = cut
    return [r for r in rows if r[1] > g or (r[1] == g and r[2] <= c)]


class TestPopCutoff:
    def test_covers_top_need_randomized(self):
        rng = random.Random(7)
        for trial in range(25):
            n_sites = rng.randint(1, 4)
            rows = []
            for s in range(n_sites):
                for i in range(rng.randint(1, 400)):
                    rows.append((f"s{s}", rng.randint(0, 4),
                                 rng.randint(0, 10_000)))
            # distinct counters per site (frontier invariant)
            seen = set()
            rows = [r for r in rows
                    if (r[0], r[2]) not in seen and not seen.add((r[0], r[2]))]
            hist = _hist_of(rows)
            needs = {f"s{s}": rng.randint(1, 200) for s in range(n_sites)}
            cut = pop_cutoff(hist, needs)
            kept = set(_kept(rows, cut))
            for site, need in needs.items():
                for row in _top_need(rows, site, need):
                    assert row in kept, (trial, cut, site, row)

    def test_rank_ladder_slack_bounded(self):
        # one site, one depth, 10_000 rows, need 100 → the ladder picks
        # rank 512: kept rows ≤ one geometric step above the need
        rows = [("a", 2, i) for i in range(10_000)]
        cut = pop_cutoff(_hist_of(rows), {"a": 100})
        kept = _kept(rows, cut)
        assert 100 <= len(kept) <= 512

    def test_none_when_site_needs_everything(self):
        rows = [("a", 1, i) for i in range(50)]
        assert pop_cutoff(_hist_of(rows), {"a": 51}) is None
        assert pop_cutoff(_hist_of(rows), {"a": 50}) is not None

    def test_missing_site_does_not_constrain(self):
        rows = [("a", 3, i) for i in range(1000)]
        cut = pop_cutoff(_hist_of(rows), {"a": 10, "delta_only_site": 10})
        assert cut is not None and cut[0] == 3

    def test_union_over_sites_is_min_g_max_c(self):
        rows = ([("deep", 4, i) for i in range(1000)]
                + [("shallow", 1, i) for i in range(1000)])
        cut = pop_cutoff(_hist_of(rows), {"deep": 10, "shallow": 10})
        assert cut is not None
        g, c = cut
        assert g == 1  # shallow site's band
        kept = set(_kept(rows, cut))
        for site in ("deep", "shallow"):
            for row in _top_need(rows, site, 10):
                assert row in kept

    def test_no_hist_means_no_pruning(self):
        assert pop_cutoff(None, {"a": 1}) is None
        assert pop_cutoff({}, {"a": 1}) is None


class TestFrontierHistSpark:
    def test_matches_reference_builder(self, spark):
        rng = random.Random(11)
        rows = [(f"s{rng.randint(0, 2)}", rng.randint(0, 3), i)
                for i in range(500)]
        df = spark.createDataFrame(rows, "site string, depth int, counter long")
        got = frontier_hist(df)
        assert got == _hist_of(rows)


class TestEnginePrunedPopView:
    def test_pruned_view_selects_same_candidates(self, spark, tmp_path):
        """After a compaction, candidate_prefix over the engine's
        histogram-pruned pop view must equal candidate_prefix over the
        full live frontier (the pruning is invisible to selection)."""
        from meilisearchcrawler_spark.config import CrawlConfig
        from meilisearchcrawler_spark.engine.crawler import CrawlEngine
        from meilisearchcrawler_spark.fixtures.webgen import (
            generate_web, write_parquet)

        fx = generate_web(seed=9, n_sites=2, pages_per_site=40)
        paths = write_parquet(fx, str(tmp_path / "web"))
        eng = CrawlEngine(spark, str(tmp_path / "cat"), paths["pages"],
                          fx.seeds, fx.robots,
                          CrawlConfig(round_budget=6, shuffle_partitions=8,
                                      compact_every=2),
                          initial_url_seen=fx.url_seen)
        eng.run(max_rounds=5)  # ≥2 compactions → pruned regime active
        assert eng.catalog.meta.get("frontier_hist")
        budgets = {s: 6 for s in eng.sites}
        prefix_k = 6 * 8 + 64
        pruned = eng._pop_frontier(budgets, prefix_k)
        if pruned is None:
            pytest.skip("frontier exhausted before the probe")
        full = eng._live_frontier()
        full = full.filter(full.site.isin(list(budgets)))
        want = sorted(tuple(r) for r in candidate_prefix(full, prefix_k)
                      .select("site", "url", "depth", "counter").collect())
        got = sorted(tuple(r) for r in candidate_prefix(pruned, prefix_k)
                     .select("site", "url", "depth", "counter").collect())
        assert got == want
