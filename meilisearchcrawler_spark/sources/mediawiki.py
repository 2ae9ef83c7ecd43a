"""MediaWiki source (S3/S4) + wikitext cleanup (P12) + safety (F15) +
namespace filter (F16).

Reference: ``mediawiki_crawler.py`` — paginated ``allpages`` id listing
(84-139), 50-id batch content fetch (145-244), iterative wikitext
cleaner (262-334), FR "unsafe keyword" title gate (246-260), stub gate
``len(content) < 50`` (209-211), ``content_hash = md5(title|content)``
(512-514 — note: *different composition* than the HTML path's P4).

Spark shape: the id listing is a driver-side paginated scan (the
reference pages through the API the same way; at 10^10 scale the
listing itself becomes a table scan), ids become a DataFrame, and the
batch fetch + cleanup runs in ``mapInPandas`` over id batches against
a fixture wiki store (the sandbox "API").
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from ..functions.text import create_excerpt
from ..functions.urls import generate_doc_id

UNSAFE_KEYWORDS = [
    "catastrophe de", "accident de", "attentat",
    "massacre", "tuerie", "génocide",
]

_END_SECTIONS = [
    r"==\s*Références?\s*==",
    r"==\s*Liens?\s+externes?\s*==",
    r"==\s*Voir\s+aussi\s*==",
    r"==\s*Sources?\s*==",
    r"==\s*Notes?\s+et\s+références?\s*==",
]


def is_safe_content(title: str, content: str) -> bool:
    """F15 (mediawiki_crawler.py:246-260): title-keyword gate."""
    title_lower = title.lower()
    return not any(k in title_lower for k in UNSAFE_KEYWORDS)


def clean_wikitext(content: str) -> str:
    """P12 (mediawiki_crawler.py:262-334): iterative ``{{template}}``
    fixpoint (≤10), table strip, HTML/ref strip, ``[[x|y]]``→``y``,
    category/file links, quote runs, end-section truncation (only past
    position 500), section headings, whitespace collapse, cap 3000."""
    if not content:
        return ""
    for _ in range(10):
        before = content
        content = re.sub(r"\{\{[^{}]*\}\}", "", content)
        if before == content:
            break
    for _ in range(3):
        before = content
        content = re.sub(r"\{\|[^{}]*\|\}", "", content, flags=re.DOTALL)
        if before == content:
            break
    content = re.sub(r"<[^>]+>", "", content)
    content = re.sub(r"<ref[^>]*>.*?</ref>", "", content, flags=re.DOTALL)
    content = re.sub(r"<ref[^>]*/?>", "", content)
    content = re.sub(r"\[\[(?:[^\|\]]+\|)?([^\]]+)\]\]", r"\1", content)
    content = re.sub(r"\[\[Catégorie:[^\]]+\]\]", "", content, flags=re.IGNORECASE)
    content = re.sub(r"\[\[(Fichier|File|Image):[^\]]+\]\]", "", content,
                     flags=re.IGNORECASE)
    content = re.sub(r"'{2,}", "", content)
    min_pos = len(content)
    for pattern in _END_SECTIONS:
        match = re.search(pattern, content, flags=re.IGNORECASE)
        if match and match.start() < min_pos:
            min_pos = match.start()
    if min_pos < len(content) and min_pos > 500:
        content = content[:min_pos]
    content = re.sub(r"={2,}[^=]+=={2,}", "", content)
    content = re.sub(r"\s+", " ", content)
    content = content.strip()
    return content[:3000]


def wiki_content_hash(title: str, content: str) -> str:
    """mediawiki_crawler.py:512-514 — md5 over ``f"{title}|{content}"``."""
    return hashlib.md5(f"{title}|{content}".encode()).hexdigest()


# ---------------------------------------------------------------------------
# listing + batch fetch over a fixture store
# ---------------------------------------------------------------------------


def list_page_ids(store: dict[int, dict], namespaces: list[int],
                  page_size: int = 500, max_pages: int = 0) -> list[int]:
    """S3 (mediawiki_crawler.py:84-139): paginated, continue-token
    style listing — namespace filter, no redirects, stable id order."""
    ids: list[int] = []
    all_ids = sorted(store)
    pos = 0
    while pos < len(all_ids):
        batch = all_ids[pos:pos + page_size]  # one "API page"
        for pid in batch:
            page = store[pid]
            if page.get("redirect"):
                continue
            if page.get("ns", 0) not in namespaces:
                continue
            ids.append(pid)
        pos += page_size
    if max_pages and max_pages > 0:
        ids = ids[:max_pages]
    return ids


FETCH_SCHEMA = StructType([
    StructField("page_id", IntegerType()),
    StructField("title", StringType()),
    StructField("url", StringType()),
    StructField("content", StringType()),
    StructField("excerpt", StringType()),
    StructField("thumbnail", StringType()),
    StructField("doc_id", StringType()),
    StructField("content_hash", StringType()),
    StructField("status", StringType()),  # ok | unsafe | stub | missing
])


def _make_wiki_fetch_udf(store: dict[int, dict], min_content: int = 50):
    def fetch(batches):
        for pdf in batches:
            out = []
            for pid in pdf["page_id"]:
                pid = int(pid)
                rec = {"page_id": pid, "title": None, "url": None,
                       "content": None, "excerpt": None, "thumbnail": None,
                       "doc_id": None, "content_hash": None, "status": "missing"}
                page = store.get(pid)
                if page is None or page.get("redirect"):
                    out.append(rec)
                    continue
                title = page["title"]
                content = clean_wikitext(page.get("wikitext", ""))
                if not is_safe_content(title, content):
                    rec.update(title=title, status="unsafe")
                elif len(content) < min_content:  # stub gate :209-211
                    rec.update(title=title, status="stub")
                else:
                    url = page["url"]
                    rec.update(
                        title=title, url=url, content=content,
                        excerpt=create_excerpt(content),
                        thumbnail=page.get("thumbnail"),
                        doc_id=generate_doc_id(url),
                        content_hash=wiki_content_hash(title, content),
                        status="ok")
                out.append(rec)
            yield pd.DataFrame(out, columns=[f.name for f in FETCH_SCHEMA.fields])

    return fetch


def fetch_wiki_documents(spark: SparkSession, store: dict[int, dict],
                         site: dict, namespaces: list[int] | None = None,
                         api_batch_size: int = 50) -> DataFrame:
    """S3+S4 end-to-end: listing → id DataFrame (one partition per API
    batch, mirroring the reference's 50-id requests) → batch fetch UDF
    → admitted documents."""
    ids = list_page_ids(store, namespaces or [0],
                        max_pages=site.get("max_pages", 0))
    if not ids:
        return spark.createDataFrame([], schema=FETCH_SCHEMA)
    n_batches = max(1, (len(ids) + api_batch_size - 1) // api_batch_size)
    id_df = spark.createDataFrame([(i,) for i in ids], schema="page_id int") \
                 .repartition(n_batches)
    fetched = id_df.mapInPandas(_make_wiki_fetch_udf(store), schema=FETCH_SCHEMA)
    return (fetched.filter(F.col("status") == "ok")
            .withColumn("site", F.lit(site["site"]))
            .withColumn("lang", F.lit(site.get("lang", "fr"))))


def wiki_search_scan(raw: "DataFrame", site_url: str, site_name: str,
                     lang: str, limit: int = 5) -> "DataFrame":
    """S12 — the MediaWiki search scan (WikiClient.search,
    api/services/wiki_client.py:104-161): ``list=search`` results
    transformed into SearchResult rows.

    ``raw`` models the API response items per query in API rank order:
    (query string, rank int, pageid long, title string, snippet
    string) — the HTTP layer (curl_cffi/aiohttp fallback, CORS,
    Cloudflare bypass) is out of engine scope like S1's socket layer.
    Reference mapping reproduced exactly: items missing pageid or
    title are skipped (wiki_client.py:142-143), id = ``wiki_{pageid}``,
    url = ``{site_url}?curid={pageid}``, the snippet stays HTML
    (wiki_client.py:150), score = 1.0. ``srlimit`` truncates the API
    response BEFORE the validity skip (the server returns ``limit``
    items; invalid ones consume slots), so the window cut precedes the
    filter."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("query").orderBy(F.asc("rank"))
    served = (raw.withColumn("_api_rn", F.row_number().over(w))
              .filter(F.col("_api_rn") <= limit))
    return (served
            .filter(F.col("pageid").isNotNull() & F.col("title").isNotNull())
            .withColumn("_rn", F.row_number().over(w))
            .select(
                "query",
                F.concat(F.lit("wiki_"), F.col("pageid")).alias("id"),
                F.concat(F.lit(site_url), F.lit("?curid="),
                         F.col("pageid")).alias("url"),
                "title",
                F.coalesce("snippet", F.lit("")).alias("excerpt"),
                F.lit("wiki").alias("source"),
                F.lit(site_name).alias("site"),
                F.lit(lang).alias("lang"),
                F.lit(1.0).alias("score"),
                (F.col("_rn") - 1).alias("rank")))


def wiki_search_oracle(items: list[dict], site_url: str, site_name: str,
                       lang: str, limit: int = 5) -> list[dict]:
    """Sequential port of WikiClient.search's result loop for tests
    (the server truncates to ``srlimit`` before the validity skip)."""
    out = []
    for item in items[:limit]:
        if item.get("pageid") is None or item.get("title") is None:
            continue
        out.append({
            "id": f"wiki_{item['pageid']}",
            "url": f"{site_url}?curid={item['pageid']}",
            "title": item["title"],
            "excerpt": item.get("snippet") or "",
            "source": "wiki", "site": site_name, "lang": lang,
            "score": 1.0, "rank": len(out),
        })
    return out
