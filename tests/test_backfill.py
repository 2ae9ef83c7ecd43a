"""Trafilatura backfill job (round-4 verdict next-step #7): re-extract
exactly the candidate/fallback rows with a pluggable extractor, accept
per the reference's len>250 gate (crawler.py:524-526), keep heuristic
text otherwise — verified with a deterministic stub extractor (the
real library stays out of this container)."""

from __future__ import annotations

from meilisearchcrawler_spark.functions.text import (
    clean_text,
    create_excerpt,
    get_content_hash,
)
from meilisearchcrawler_spark.operators.backfill import (
    backfill_content,
    backfill_stats,
)

DOC_SCHEMA = (
    "id string, site string, url string, title string, excerpt string, "
    "content string, content_source string, "
    "images array<struct<url:string,alt:string,description:string>>, "
    "lang string, content_hash string"
)

LONG = ("Une phrase assez longue pour contribuer au contenu extrait. "
        * 12).strip()


def _doc(url, source, content="texte heuristique", images=None):
    return {
        "id": f"id-{url}", "site": "s1", "url": url, "title": f"T {url}",
        "excerpt": content[:40], "content": content,
        "content_source": source, "images": images or [],
        "lang": "fr", "content_hash": "old-" + url,
    }


def _pages(spark, rows):
    return spark.createDataFrame(rows, schema="url string, html string")


def test_backfill_replaces_only_gated_targets(spark):
    docs = spark.createDataFrame([
        _doc("u-sel", "selector"),
        _doc("u-cand", "candidate",
             images=[{"url": "http://s/i.png", "alt": "a",
                      "description": "a"}]),
        _doc("u-fall", "fallback"),
        _doc("u-decline", "candidate"),   # extractor returns None
        _doc("u-short", "fallback"),      # extractor under the gate
        _doc("u-nohtml", "candidate"),    # no page HTML available
    ], schema=DOC_SCHEMA)
    pages = _pages(spark, [
        {"url": "u-sel", "html": f"<html><body>{LONG}</body></html>"},
        {"url": "u-cand", "html": "<html><body>cand</body></html>"},
        {"url": "u-fall", "html": "<html><body>fall</body></html>"},
        {"url": "u-decline", "html": "<html><body>x</body></html>"},
        {"url": "u-short", "html": "<html><body>y</body></html>"},
    ])

    def stub_extractor(html, url):
        if url == "u-decline":
            return None
        if url == "u-short":
            return "court"
        return f"EXTRAIT {url}. {LONG}"

    out = {r["url"]: r.asDict(recursive=True)
           for r in backfill_content(docs, pages, stub_extractor).collect()}
    assert len(out) == 6

    # selector rows are never consulted — byte-identical, even though
    # page HTML exists and the extractor would have accepted
    assert out["u-sel"]["content"] == "texte heuristique"
    assert out["u-sel"]["content_source"] == "selector"
    assert out["u-sel"]["content_hash"] == "old-u-sel"

    # accepted extractions: content cleaned+truncated like the crawl
    # path, excerpt + content_hash rebuilt with the P4 composition
    for url in ("u-cand", "u-fall"):
        want_content = clean_text(f"EXTRAIT {url}. {LONG}")
        want_excerpt = create_excerpt(want_content)
        got = out[url]
        assert got["content_source"] == "backfill"
        assert got["content"] == want_content
        assert got["excerpt"] == want_excerpt
        assert got["content_hash"] == get_content_hash(
            want_content, got["title"],
            [dict(d) for d in got["images"]], want_excerpt)

    # declined / under-gate / missing-HTML rows keep the heuristic row
    for url in ("u-decline", "u-short", "u-nohtml"):
        got = out[url]
        assert got["content"] == "texte heuristique"
        assert got["content_source"] in ("candidate", "fallback")
        assert got["content_hash"] == "old-" + url


def test_backfill_stats_counts_sources(spark):
    docs = spark.createDataFrame([
        _doc("a", "selector"), _doc("b", "candidate"),
        _doc("c", "candidate"), _doc("d", "fallback"),
    ], schema=DOC_SCHEMA)
    got = {r["content_source"]: r["n"]
           for r in backfill_stats(docs).collect()}
    assert got == {"selector": 1, "candidate": 2, "fallback": 1}
