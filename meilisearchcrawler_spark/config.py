"""Engine configuration.

Mirrors the reference's ``Config`` knobs (crawler.py:89-119) where they
are *semantics* (admission rules, caps, delays) and replaces the ones
that were single-node workarounds (memory throttling, TCP pool sizes)
with Spark-native equivalents. See SURVEY.md §4 for the mapping.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Reference: GLOBAL_EXCLUDE_PATTERNS, crawler.py:112-119. Substring
# patterns applied to every site's URL admission (is_excluded,
# crawler.py:484-487).
GLOBAL_EXCLUDE_PATTERNS: list[str] = [
    # Generic
    "/login", "/logout", "/signin", "/signup", "/register",
    "/cart", "/checkout", "/account", "/share", "/print", "/cdn-cgi/",
    # WordPress
    "/wp-admin/", "/wp-json/", "/wp-login.php", "/wp-cron.php",
    "xmlrpc.php", "?rest_route=", "?preview=", "/feed/",
]

# Reference: ignored extensions at pop time, crawler.py:1168-1173.
# Popped URLs ending in one of these are marked visited but never
# fetched.
IGNORED_EXTENSIONS: tuple[str, ...] = (
    ".jpg", ".jpeg", ".png", ".gif", ".bmp", ".svg",
    ".pdf", ".zip", ".rar", ".mp3", ".mp4", ".avi",
)

# Hosts that is_valid_url rejects (crawler.py:490-499).
INVALID_HOSTS: tuple[str, ...] = ("localhost", "127.0.0.1", "0.0.0.0")

USER_AGENT = "MeilisearchCrawlerSpark/0.1"

DEFAULT_DELAY = 0.5        # crawler.py:96
CACHE_DAYS = 14            # crawler.py:99, cache_db.py:83-93
MIN_CONTENT_LEN = 50       # crawler.py:1038
MAX_EXCERPT_LEN = 250      # crawler.py:574
MAX_CONTENT_LEN = 3000     # crawler.py:594
MAX_IMAGES_PER_PAGE = 5    # crawler.py:604
DEFAULT_MAX_DEPTH = 3      # crawler.py:952
DEFAULT_LANG = "fr"        # crawler.py:1040


@dataclass
class CrawlConfig:
    """Per-run engine knobs.

    ``round_budget`` generalizes the reference's CONCURRENT_REQUESTS=2
    batch size (crawler.py:100, 1157-1178): one engine round admits at
    most this many URLs globally. Equivalence tests set it to the
    reference batch size; scale runs set it to millions.

    ``host_budget`` is the per-host admission cap per round — the
    politeness budget: ``floor(round_wall_target / host_delay)`` slots
    per host per round (replaces the serialized RateLimiter,
    crawler.py:956-968). ``None`` disables the cap (single-host
    equivalence runs where the global budget already bounds it).

    ``max_queue_size`` reproduces MAX_QUEUE_SIZE=5000 (crawler.py:109,
    1203): when the frontier is at/over the cap at a page's turn within
    a round, that page's discovered links are dropped. ``None`` = off
    (scale mode: the frontier is disk-backed, the cap is unnecessary —
    SURVEY.md §4).
    """

    round_budget: int = 2              # CONCURRENT_REQUESTS, crawler.py:100
    host_budget: int | None = None
    max_pages: int = 0                 # 0 = unlimited (crawler.py:1082)
    max_depth: int = DEFAULT_MAX_DEPTH
    max_rounds: int | None = None      # direct round cap (tests/benches)
    # MAX_CRAWL_DURATION (crawler.py:108, loop check 1138-1143) on the
    # LOGICAL clock: a run() stops before a round once
    # rounds_this_run × round_seconds exceeds the cap — the reference
    # knob expressed deterministically (wall-clock would break
    # bit-identical resume).
    max_crawl_duration: float | None = None
    max_queue_size: int | None = None
    cache_days: float = CACHE_DAYS
    force_recrawl: bool = False
    exclude_patterns: list[str] = field(default_factory=list)
    no_index_patterns: list[str] = field(default_factory=list)
    # Logical clock: seconds advanced per round; replaces wall-clock
    # stamps (crawler.py:1044,1054) for deterministic resume.
    round_seconds: float = 1.0
    shuffle_partitions: int = 32
    # Salt factor for hot-host skew: hosts whose round quota exceeds
    # this many rows get spread over multiple shuffle partitions.
    host_partition_rows: int = 10_000
    bloom_num_partitions: int = 64     # power of two (bloom.py pmod note)
    bloom_bits_per_key: int = 10
    # "broadcast": driver holds the partition bitmaps and broadcasts
    # them once per round — right while the whole filter is ≤ ~100 MB.
    # "cogroup": the filter lives only as the committed bloom_parts
    # table; probes cogroup by pid and deltas merge executor-side — the
    # production shape (4096 × ~3 MB never transits the driver).
    bloom_probe_mode: str = "broadcast"
    # Fold table deltas every N rounds (Iceberg rewrite_data_files
    # analog) — bounds the union-read fan-in of hot tables.
    compact_every: int = 8
    # Hash-bucket count for the corpus-sized key tables (url_seen_log,
    # visited, content_hashes): every row carries
    # ``bucket = pmod(xxhash64(key), seen_buckets)`` and compaction
    # range-partitions + sorts by it, so the per-round membership reads
    # prune files via parquet min/max stats instead of scanning (the
    # Iceberg bucket-transform partition spec). Production: 4096.
    seen_buckets: int = 1024
    # Ceiling (rows) for FORCING a broadcast hint on round-scoped key
    # sets (admitted keys, discovered-link keys, membership results).
    # The hint overrides Spark's size threshold, so an unguarded hint
    # on a 10^7-link round would OOM the driver/executors; above this
    # bound the join is left to Spark's own strategy (AQE still
    # broadcasts at runtime if the actual size turns out small).
    broadcast_key_rows: int = 4_000_000
    # Adaptive pruning floor: collecting the round's bucket list costs
    # one small driver job, which only pays once the table is big
    # enough that file-skipping matters — below this on-disk size the
    # broadcast-filtered scan wins outright (AQE spirit). Tests force 0
    # to exercise the pruned path; production leaves the default.
    prune_min_bytes: int = 64 << 20
    # Small-round latency mode: when a round's popped-row bound is at
    # or below this, its barrier actions compile WITHOUT AQE so the
    # ~12-exchange selection pipeline and the staged writes each run
    # as ONE pipelined job instead of submitting every exchange as its
    # own query stage (~0.3-0.5 s of scheduling apiece — measured 6 s
    # of a 2k-URL round's 15 s wall at the frontier10m harness,
    # scripts/profile_frontier_actions.py). Data-bound waves above the
    # bound keep AQE (runtime coalescing + skew splitting matter
    # there); compaction always runs under AQE. 0 disables.
    latency_round_rows: int = 100_000
    # Eager stage flush: submit each staged delta write the moment the
    # round declares it instead of holding every write to the barrier
    # pool. Staged dirs are orphans until the manifest commit, so
    # visibility/crash semantics are unchanged; the write jobs'
    # scheduling overlaps the round's remaining barrier actions
    # (concurrent first-materialization of a shared cached/
    # localCheckpoint parent is safe — the round barrier already
    # overlaps the metrics and Bloom-delta collects the same way) and
    # the barrier flush only joins futures. Measured (round 5,
    # scripts/bench_eagerflush_ab.py, interleaved one-JVM median-of-5
    # on the bench.py crawl_round workload): 51.0 s deferred → 43.8 s
    # eager (−14%, raw ranges non-overlapping), every per-round wall
    # of the median run lower.
    eager_stage: bool = True
