"""Deterministic synthetic web generator.

Produces the four crawl-input tables from FIXTURES.md (§2-§5): `seeds`,
`pages`, `robots`, and a pre-seeded `url_seen`, shaped after the
reference's own config-driven fixtures (sites.yml.example:1-42) and
exercising every admission/indexing branch of the reference loop:

* excluded URLs (global + per-site patterns, crawler.py:112-119,484-487)
* ignored-extension URLs (crawler.py:1168-1173)
* off-domain / invalid-scheme / localhost links (crawler.py:480-499)
* robots-disallowed paths (crawler.py:1174-1176)
* no-index pages (crawler.py:1033)
* duplicate-content clones (crawler.py:1034-1039)
* short-content pages (< 50 chars, crawler.py:1038)
* non-HTML responses (crawler.py:985-988)
* hard errors 404/500 (retry path crawler.py:995-1001)
* redirects (crawler.py:1022-1023)
* 304-able pages + fresh/stale cache entries (crawler.py:974-984,
  cache_db.py:83-93)
* link variants (fragments, trailing slashes) that collapse under P1

Everything derives from ``random.Random(seed)`` — same seed, same web.
"""

from __future__ import annotations

import random
import re
from dataclasses import dataclass, field

from ..functions import html as H
from ..functions import text as T
from ..functions.urls import normalize_url

# Logical epoch for the deterministic clock (replaces wall clock,
# SURVEY.md §7 hard part 2).
T0 = 1_700_000_000.0

_WORDS = (
    "spark frontier fetch crawl index document caption image politeness "
    "robots budget round partition shuffle broadcast bloom filter hash url "
    "depth counter queue batch arrow pandas vector column parquet iceberg "
    "snapshot commit resume lineage metric host domain schedule priority"
).split()


@dataclass
class WebFixture:
    seeds: list[dict]
    pages: list[dict]
    robots: list[dict]
    url_seen: list[dict]
    page_images: list[dict] = field(default_factory=list)

    def pages_by_url(self) -> dict[str, dict]:
        return {p["url"]: p for p in self.pages}


def _para(rng: random.Random, n_words: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n_words)).capitalize() + "."


def _sentences(rng: random.Random, n: int) -> str:
    return " ".join(_para(rng, rng.randint(6, 14)) for _ in range(n))


# in-container boilerplate variants — exercise the reference's
# class/aria decompose rules (crawler.py:558-561); no <a> tags (link
# discovery scans the whole document on both sides, crawler.py:1066)
_BOILER = [
    '<div class="sidebar">sidebar junk widget text</div>',
    '<div class="social-share">Partager sur les réseaux</div>',
    '<span aria-hidden="true">&#215;</span>',
    '<div class="promo-banner">promo cookie banner text</div>',
    '<div class="related-posts">related reading list</div>',
]


def _page_html(rng: random.Random, *, title_mode: str, container: str,
               body_text: str, links: list[str], images: list[dict],
               lang_attr: str | None) -> str:
    head = []
    if title_mode in ("og", "og+title"):
        head.append(f'<meta property="og:title" content="OG {body_text[:18]}">')
    if title_mode in ("title", "og+title"):
        head.append(f"<title>Title {body_text[:14]}</title>")
    h1 = f"<h1>H1 {body_text[:10]}</h1>" if title_mode in ("h1", "og+title") else ""
    img_tags = "".join(
        f'<img src="{im["src"]}" alt="{im["alt"]}" width="{im["w"]}" height="{im["h"]}">'
        for im in images
    )
    a_tags = "".join(f'<a href="{href}">l</a>' for href in links)
    boiler = rng.choice(_BOILER) if rng.random() < 0.35 else ""
    inner = f"{h1}<p>{body_text}</p>{boiler}{img_tags}{a_tags}"
    if container == "main":
        body = f"<main>{inner}</main>"
    elif container == "article":
        body = f"<article>{inner}</article>"
    elif container == "content_div":
        body = f'<div id="content">{inner}</div>'
    elif container == "role_main":
        body = f'<div role="main">{inner}</div>'
    elif container == "post_content":
        body = f'<div class="post-content wrap">{inner}</div>'
    elif container == "nested_div":
        # nested same-tag elements: extraction must find the MATCHING
        # close, not the first one (generic-HTML shape, crawler.py:520-561)
        body = (f'<div id="content"><div class="wrap"><div>{inner}</div>'
                f"<div>aside box</div></div></div>")
    else:
        body = inner
    lang = f' lang="{lang_attr}"' if lang_attr else ""
    return (
        f"<html{lang}><head>{''.join(head)}</head><body>"
        f'<nav><a href="/">home</a> site navigation menu links</nav>'
        f"{body}"
        f"<footer>Copyright footer boilerplate text</footer>"
        f"</body></html>"
    )


_DQ_ATTR = re.compile(r'([a-zA-Z-]+)="([^"]*)"')
_TAG_NAME = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)")


def _messify(html: str, rng: random.Random) -> str:
    """Rewrite canonical fixture HTML into the attribute/tag dialects
    real pages use — single-quoted and unquoted attribute values,
    mixed-case tag names — WITHOUT changing any attribute value or text
    byte, so a dialect-tolerant parser must extract the identical
    result (BeautifulSoup accepts all of these, ref crawler.py:520-561;
    oracle = the clean twin of the same seed)."""

    def requote(m: re.Match) -> str:
        name, val = m.group(1), m.group(2)
        r = rng.random()
        if r < 0.35 and "'" not in val:
            return f"{name}='{val}'"
        if r < 0.55 and val and not re.search(r"[\s\"'=<>`]", val):
            return f"{name}={val}"
        return m.group(0)

    def recase(m: re.Match) -> str:
        closing, name = m.group(1), m.group(2)
        r = rng.random()
        if r < 0.2:
            name = name.upper()
        elif r < 0.3:
            name = name.capitalize()
        out = f"<{closing}{name}"
        # inert data-* attribute with a literal '>' in its quoted value:
        # exercises the quote-aware tag scanner (a naive scanner ends
        # the token early) without changing any extracted value
        if not closing and rng.random() < 0.12:
            out += ' data-m="g>t"'
        # inert comment BEFORE the tag, containing an unpaired quote
        # and a bare '>': legal per HTML (only `-->` ends a comment),
        # kills both a non-comment-aware scanner (token leak) and a
        # quote-aware-only one (unmatchable at the unpaired quote) —
        # round-4 advisor item
        if not closing and rng.random() < 0.06:
            out = "<!-- don't > trust comments -->" + out
        return out

    return _TAG_NAME.sub(recase, _DQ_ATTR.sub(requote, html))


def generate_web(seed: int = 42, n_sites: int = 3,
                 pages_per_site: int = 40,
                 fanout: tuple[int, int] = (2, 5),
                 dialect: str = "clean") -> WebFixture:
    rng = random.Random(seed)
    seeds: list[dict] = []
    pages: list[dict] = []
    robots: list[dict] = []
    url_seen: list[dict] = []
    page_images: list[dict] = []
    img_counter = 0

    for s in range(n_sites):
        host = f"site{s}.example.com"
        base = f"http://{host}"
        seed_url = f"{base}/"
        selector = "#content" if s % 3 == 2 else None
        site = {
            "site": f"site{s}",
            "seed_url": seed_url,
            "type": "html",
            "max_pages": 0,
            "max_depth": 3,
            "delay": [0.5, 0.2, 1.0][s % 3],
            "exclude": ["/private"],
            "no_index": ["/noindex"],
            "lang": "fr",
            "selector": selector,
        }
        seeds.append(site)
        # real robots.txt content evaluated by urllib.robotparser on
        # both sides (crawler.py:405-429); the Allow carve-out before
        # the Disallow exercises rule-order semantics beyond prefix
        # matching, and odd sites get an agent-specific group
        rob_lines = []
        if s % 3 == 1:
            rob_lines += ["User-agent: SomeOtherBot", "Disallow: /", ""]
        rob_lines += ["User-agent: *", "Allow: /blocked/ok",
                      "Disallow: /blocked"]
        if s % 2:
            rob_lines.append("Crawl-delay: 0.25")
        robots.append({
            "host": host,
            "robots_txt": "\n".join(rob_lines),
            "disallow": ["/blocked"],   # legacy prefix form (bench compat)
            "crawl_delay": 0.25 if s % 2 else None,
            "fetch_fails": s == n_sites - 1,  # allow_all fallback path
        })

        # --- page topology ------------------------------------------------
        paths = ["/"] + [f"/p{i}" for i in range(1, pages_per_site)]
        # special pages (replace some tail paths)
        special = {}
        if pages_per_site >= 24:
            special[f"/p{pages_per_site - 1}"] = "error500"
            special[f"/p{pages_per_site - 2}"] = "error404"
            special[f"/p{pages_per_site - 3}"] = "nonhtml"
            special[f"/p{pages_per_site - 4}"] = "short"
            special[f"/p{pages_per_site - 5}"] = "dup_a"
            special[f"/p{pages_per_site - 6}"] = "dup_b"
            special[f"/p{pages_per_site - 7}"] = "redirect"
            special[f"/p{pages_per_site - 8}"] = "noindex_page"
            special[f"/p{pages_per_site - 9}"] = "blocked_page"
            special[f"/p{pages_per_site - 10}"] = "etag304"
            special[f"/p{pages_per_site - 11}"] = "cache_fresh"
            special[f"/p{pages_per_site - 12}"] = "cache_stale"
            # redirect whose raw response URL keeps a trailing slash —
            # doc_id/urljoin use the RAW url (crawler.py:1010), only the
            # frontier key is normalized
            special[f"/p{pages_per_site - 13}"] = "redirect_slash"
            # Last-Modified-only conditional GET (crawler.py:975-979):
            # no ETag on either side, the If-Modified-Since round-trip
            # alone must produce the 304 / refetch decision
            special[f"/p{pages_per_site - 14}"] = "lm304"
            special[f"/p{pages_per_site - 15}"] = "lm_changed"
            # under the Disallow'd prefix but carved back in by an
            # Allow rule — full robots semantics, crawlable
            special[f"/p{pages_per_site - 16}"] = "blocked_allowed_page"

        # rename pages that must match URL-pattern filters
        renamed = {}
        for path, kind in special.items():
            if kind == "noindex_page":
                renamed[path] = "/noindex/a"
            elif kind == "blocked_page":
                renamed[path] = "/blocked/a"
            elif kind == "blocked_allowed_page":
                renamed[path] = "/blocked/ok/a"
        paths = [renamed.get(p, p) for p in paths]
        special = {renamed.get(p, p): k for p, k in special.items()}

        dup_text = _sentences(rng, 8)

        for pi, path in enumerate(paths):
            url = normalize_url(base + path) if path != "/" else base
            kind = special.get(path, "normal")
            # outgoing links: forward edges to later pages + noise
            targets: list[str] = []
            later = paths[pi + 1:]
            n_fwd = min(len(later), rng.randint(*fanout))
            targets += [base + p for p in rng.sample(later, n_fwd)]
            if pi > 0 and rng.random() < 0.5:
                targets.append(base + rng.choice(paths[:pi]))  # back edge
            noise_pool = [
                f"{base}/private/x{pi}",                     # excluded (site)
                f"{base}/login?next={pi}",                   # excluded (global)
                f"{base}/files/f{pi}.pdf",                   # extension skip
                f"{base}/img/pic{pi}.JPG",                   # extension skip
                f"{base}/private/doc{pi}.pdf",               # excluded AND ext:
                                                             # exclusion wins, never
                                                             # marked visited
                "http://elsewhere.example.org/x",            # off-domain
                "ftp://site.example.com/x",                   # invalid scheme
                "http://localhost/x",                        # invalid host
                f"{base + rng.choice(paths)}#frag{pi}",      # collapses under P1
                (base + rng.choice(paths)).rstrip("/") + "/",  # trailing slash
            ]
            targets += rng.sample(noise_pool, rng.randint(2, 4))
            rng.shuffle(targets)

            # images on ~half the pages
            images = []
            if rng.random() < 0.5 and kind == "normal":
                for _ in range(rng.randint(1, 3)):
                    image_id = f"img{img_counter:06d}"
                    img_counter += 1
                    caption = _para(rng, rng.randint(3, 7))
                    w, h = rng.choice([(200, 150), (640, 480), (80, 60)])
                    images.append({
                        "src": f"/media/{image_id}.png",
                        "alt": caption, "w": w, "h": h,
                    })
                    if w >= 100 and h >= 100:
                        page_images.append({
                            "page_url": url, "image_id": image_id,
                            "caption": caption,
                        })

            if kind == "short":
                body_text = "tiny"
            elif kind in ("dup_a", "dup_b"):
                body_text = dup_text
            else:
                body_text = _sentences(rng, rng.randint(6, 20))

            title_mode = rng.choice(["og+title", "og", "title", "h1", "none"])
            container = (
                "content_div" if selector else
                rng.choice(["main", "article", "content_div", "plain",
                            "nested_div", "role_main", "post_content"])
            )
            lang_attr = rng.choice(["fr-FR", "en-US", "en", None])
            html = _page_html(rng, title_mode=title_mode, container=container,
                              body_text=body_text, links=targets,
                              images=images, lang_attr=lang_attr)
            if dialect == "messy":
                # dedicated per-page rng: the main rng's state must stay
                # identical to the clean twin's, so clean/messy webs
                # differ ONLY in markup dialect, never in structure
                html = _messify(html, random.Random(f"{seed}:{s}:{pi}"))

            row = {
                "url": url,
                "host": host,
                "site": site["site"],
                "status": 200,
                "content_type": "text/html",
                "etag": f'W/"{s}-{pi}-{rng.randint(0, 99999)}"',
                "last_modified": "Mon, 01 Jan 2024 00:00:00 GMT",
                "html": html,
                "redirect_to": None,
            }
            if kind == "error500":
                row["status"] = 500
            elif kind == "error404":
                row["status"] = 404
            elif kind == "nonhtml":
                row["content_type"] = "application/json"
            elif kind == "redirect":
                target = base + paths[1]
                row["redirect_to"] = target
            elif kind == "redirect_slash":
                row["redirect_to"] = base + paths[2] + "/"
            elif kind == "lm304":
                row["etag"] = None
            elif kind == "lm_changed":
                row["etag"] = None
                row["last_modified"] = "Tue, 02 Jan 2024 00:00:00 GMT"
            pages.append(row)

        # redirect rows serve the *target's* html (aiohttp follows
        # transparently, crawler.py:1022-1023)
        by_url = {p["url"]: p for p in pages}
        for p in pages:
            if p.get("redirect_to"):
                tgt = by_url.get(normalize_url(p["redirect_to"]))
                if tgt is not None:
                    p["html"] = tgt["html"]

        # --- pre-seeded cache entries (incremental-crawl branches) --------
        def _doc_hash(page: dict) -> str:
            parsed = H.parse_page(page["html"], page["url"], seed_url,
                                  selector, extract_link_targets=False)
            content = T.clean_text(parsed.content_raw)
            excerpt = T.create_excerpt(content)
            return T.get_content_hash(content, parsed.title, parsed.images, excerpt)

        for path, kind in special.items():
            url = normalize_url(base + path)
            page = next(p for p in pages if p["url"] == url)
            if kind == "etag304":
                url_seen.append({
                    "url": url, "content_hash": "stale-hash-irrelevant",
                    "doc_id": "prev", "last_crawl": T0 - 5 * 86400,
                    "etag": page["etag"], "last_modified": page["last_modified"],
                    "site": site["site"],
                })
            elif kind == "cache_fresh":
                url_seen.append({
                    "url": url, "content_hash": _doc_hash(page),
                    "doc_id": "prev", "last_crawl": T0 - 5 * 86400,
                    "etag": None, "last_modified": None, "site": site["site"],
                })
            elif kind == "cache_stale":
                url_seen.append({
                    "url": url, "content_hash": _doc_hash(page),
                    "doc_id": "prev", "last_crawl": T0 - 20 * 86400,
                    "etag": None, "last_modified": None, "site": site["site"],
                })
            elif kind == "lm304":
                # matching Last-Modified, no ETag anywhere → 304 purely
                # via If-Modified-Since
                url_seen.append({
                    "url": url, "content_hash": "stale-hash-irrelevant",
                    "doc_id": "prev", "last_crawl": T0 - 5 * 86400,
                    "etag": None, "last_modified": page["last_modified"],
                    "site": site["site"],
                })
            elif kind == "lm_changed":
                # cached Last-Modified older than the page's → full 200
                url_seen.append({
                    "url": url, "content_hash": "stale-hash-irrelevant",
                    "doc_id": "prev", "last_crawl": T0 - 5 * 86400,
                    "etag": None,
                    "last_modified": "Mon, 01 Jan 2024 00:00:00 GMT",
                    "site": site["site"],
                })

    return WebFixture(seeds=seeds, pages=pages, robots=robots,
                      url_seen=url_seen, page_images=page_images)


def write_parquet(fixture: WebFixture, out_dir: str) -> dict[str, str]:
    """Persist the fixture tables with pyarrow (no Spark session needed)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    paths = {}

    def _write(name: str, rows: list[dict], schema: pa.Schema | None = None):
        if not rows:
            return
        table = pa.Table.from_pylist(rows, schema=schema)
        path = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(table, path)
        paths[name] = path

    _write("pages", fixture.pages)
    # mmap-able twin of the page store (uncompressed Arrow IPC): every
    # executor Python worker shares ONE OS-page-cache copy of the
    # "network" instead of a private decompressed parquet copy — at 32
    # workers x a 100MB+ store, the private copies saturate memory
    # bandwidth and corrupt every scaling measurement (harness
    # infrastructure, not engine work)
    import pyarrow.feather as _feather

    _feather.write_feather(
        pa.Table.from_pylist(fixture.pages),
        os.path.join(out_dir, "pages.feather"), compression="uncompressed")
    _write("seeds", [
        {**s, "exclude": list(s["exclude"]), "no_index": list(s["no_index"])}
        for s in fixture.seeds
    ])
    _write("robots", fixture.robots)
    _write("url_seen", fixture.url_seen)
    _write("page_images", fixture.page_images)
    return paths
