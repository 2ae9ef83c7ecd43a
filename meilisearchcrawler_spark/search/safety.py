"""Search-side safety filter (F17) — safety.py:103-188 semantics.

Check chain per result: domain whitelist (when configured) → domain
blacklist → blocked keywords against lowercased url, title, and
excerpt+content → blocked regex patterns against
``f"{title} {excerpt} {content}"``. Domains compare lowercased and
``www.``-stripped (safety.py:190-208).

Pure column algebra: the config lists are plan literals (they are a
broadcast-sized YAML in the reference), keywords become one escaped
alternation per field, patterns keep their own regex semantics
(case-insensitive, as compiled at safety.py:80-82).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _domain(url: Column) -> Column:
    host = F.lower(F.coalesce(F.parse_url(url, F.lit("HOST")), F.lit("")))
    return F.regexp_replace(host, r"^www\.", "")


def _keyword_hit(text: Column, keywords: list[str]) -> Column:
    if not keywords:
        return F.lit(False)
    alternation = "|".join(re.escape(k.lower()) for k in keywords)
    return F.lower(F.coalesce(text, F.lit(""))).rlike(alternation)


def is_safe_col(config: dict,
                url: Column, title: Column,
                excerpt: Column, content: Column) -> Column:
    """Boolean safety column with the reference's exact check order."""
    blocked_domains = [d.lower() for d in (config.get("blocked_domains") or []) if d]
    allowed_domains = [d.lower() for d in (config.get("allowed_domains") or []) if d]
    keywords = [k.lower() for k in (config.get("blocked_keywords") or []) if k]
    patterns = [p for p in (config.get("blocked_patterns") or []) if p]

    domain = _domain(url)
    safe = F.lit(True)
    if allowed_domains:
        safe = safe & domain.isin(allowed_domains)
    if blocked_domains:
        safe = safe & ~domain.isin(blocked_domains)
    safe = safe & ~_keyword_hit(url, keywords)
    safe = safe & ~_keyword_hit(title, keywords)
    # excerpt+content are checked together (safety.py:170-177)
    joined = F.concat_ws(" ", F.coalesce(excerpt, F.lit("")),
                         F.coalesce(content, F.lit("")))
    safe = safe & ~_keyword_hit(joined, keywords)
    combined = F.concat_ws(" ", F.coalesce(title, F.lit("")),
                           F.coalesce(excerpt, F.lit("")),
                           F.coalesce(content, F.lit("")))
    for pattern in patterns:
        safe = safe & ~combined.rlike(f"(?i){pattern}")
    return safe


def filter_results(df: DataFrame, config: dict,
                   url_col: str = "url", title_col: str = "title",
                   excerpt_col: str = "excerpt",
                   content_col: str = "content") -> DataFrame:
    return df.filter(is_safe_col(config, F.col(url_col), F.col(title_col),
                                 F.col(excerpt_col), F.col(content_col)))


def is_safe_oracle(config: dict, result: dict) -> bool:
    """Direct port of safety.py:132-188 for test comparison."""
    from urllib.parse import urlparse

    blocked_domains = {d.lower() for d in (config.get("blocked_domains") or []) if d}
    allowed_domains = {d.lower() for d in (config.get("allowed_domains") or []) if d}
    keywords = [k.lower() for k in (config.get("blocked_keywords") or []) if k]
    patterns = [re.compile(p, re.IGNORECASE)
                for p in (config.get("blocked_patterns") or []) if p]

    domain = urlparse(str(result["url"])).netloc.lower()
    if domain.startswith("www."):
        domain = domain[4:]
    if allowed_domains and domain not in allowed_domains:
        return False
    if domain in blocked_domains:
        return False
    url_lower = str(result["url"]).lower()
    if any(k in url_lower for k in keywords):
        return False
    title_lower = (result.get("title") or "").lower()
    if any(k in title_lower for k in keywords):
        return False
    text_lower = (result.get("excerpt") or "").lower()
    if result.get("content"):
        text_lower += " " + result["content"].lower()
    if any(k in text_lower for k in keywords):
        return False
    combined = f"{result.get('title')} {result.get('excerpt') or ''} {result.get('content') or ''}"
    return not any(p.search(combined) for p in patterns)
