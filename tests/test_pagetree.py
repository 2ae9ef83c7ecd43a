"""P17/A8/P16/T5 page-tree operators over URL-shaped data."""

from __future__ import annotations

from pyspark.sql import Row

from meilisearchcrawler_spark.operators import pagetree as P


def test_pagetree_rollup(spark):
    docs = spark.createDataFrame([
        Row(site="s", url="http://h/a/b/c"),
        Row(site="s", url="http://h/a/b"),
        Row(site="s", url="http://h/a/x"),
        Row(site="s", url="http://h/"),
        Row(site="t", url="http://h/a"),
    ])
    rows = {(r["site"], r["depth"], r["path_prefix"]): r["n_pages"]
            for r in P.pagetree_rollup(docs).collect()}
    assert rows[("s", 1, "a")] == 3       # /a/b/c, /a/b, /a/x
    assert rows[("s", 2, "a/b")] == 2     # /a/b/c, /a/b
    assert rows[("s", 3, "a/b/c")] == 1
    assert rows[("s", 2, "a/x")] == 1
    assert rows[("t", 1, "a")] == 1
    # root page has no segments → posexplode_outer keeps it at null
    assert ("s", 1, "") not in rows


def test_freshness_and_recrawl(spark):
    now = 1_700_000_000.0
    day = 86400.0
    docs = spark.createDataFrame([
        Row(id="a", url="u1", indexed_at=now - 0.5 * day, last_crawled_at=now - 1 * day),
        Row(id="b", url="u2", indexed_at=now - 10 * day, last_crawled_at=now - 20 * day),
        Row(id="c", url="u3", indexed_at=now - 100 * day, last_crawled_at=now - 100 * day),
    ])
    hist = {r["freshness"]: r["n"]
            for r in P.freshness_histogram(docs, now).collect()}
    assert hist == {"week": 1, "month": 1, "3mo+": 1}
    top = P.recrawl_priority(docs, now, k=2).collect()
    # c: 0.7*100+0.3*100 = 100; b: 0.7*20+0.3*10 = 17
    assert [r["id"] for r in top] == ["c", "b"]
    assert abs(top[0]["priority_score"] - 100.0) < 1e-6
    assert abs(top[1]["priority_score"] - 17.0) < 1e-6
