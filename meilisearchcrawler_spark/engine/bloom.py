"""Partitioned Bloom filter over 64-bit URL hashes.

The reference's URL-seen set is a SQLite table probed per URL
(cache_db.py:17-29, crawler.py:1164). At 10^10 URLs a single bitmap at
1% FPR is ~12 GB — unbroadcastable — so the engine shards it:
``partition = url_hash mod P`` selects one of P independent bitmaps
(SURVEY.md §7 hard part 3; P=4096 × ~3 MB at full scale, P=64 in
tests). Properties:

* **pre-filter only, never authoritative**: a positive routes the
  candidate into the exact anti-join against the seen table; a negative
  skips that shuffle entirely. Seen-set equality stays exact.
* **incrementally checkpointable**: deltas are built *executor-side*
  (``bitmap_delta`` under ``groupBy(pmod(url_hash, P)).applyInPandas``)
  — the driver only ever sees ≤P bounded bitmap blobs per round, never
  the per-URL hashes — and the merged partitions commit atomically as
  the ``bloom_parts`` table with the round's other deltas.
* **two probe shapes**: ``broadcast`` (driver-held parts, one broadcast
  per round; right while the filter is ≤ ~100 MB) and ``cogroup`` (the
  filter lives only in the bloom_parts table; probe rows cogroup with
  it by partition id — the production shape where the full filter is
  GBs and must not transit the driver).
* **vectorized membership**: numpy bit ops over Arrow batches inside
  ``mapInPandas`` — no per-row Python.

Hashing: the two Bloom probe hashes derive from the already-computed
``xxhash64(canonical_url)`` (Kirsch-Mitzenmacher double hashing), so
executors never touch URL strings.
"""

from __future__ import annotations

import numpy as np

_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)


def _mix(h: np.ndarray) -> np.ndarray:
    """splitmix64-style avalanche to derive the second probe stream."""
    h = h.copy()
    h ^= h >> np.uint64(33)
    h *= _MIX1
    h ^= h >> np.uint64(33)
    h *= _MIX2
    h ^= h >> np.uint64(33)
    return h


def bitmap_delta(hashes: np.ndarray, bits: int, k: int) -> np.ndarray:
    """Bitmap with the probe bits of ``hashes`` set — the executor-side
    delta unit. All hashes must belong to one partition (the caller
    groups by ``pmod(url_hash, P)``); partition id does not affect bit
    positions."""
    h = hashes.astype(np.uint64)
    part = np.zeros(bits // 8, dtype=np.uint8)
    h2 = _mix(h) | np.uint64(1)
    for i in range(k):
        pos = (h + np.uint64(i) * h2) % np.uint64(bits)
        np.bitwise_or.at(part, (pos >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
    return part


def check_hashes(hashes: np.ndarray, part: np.ndarray, bits: int,
                 k: int) -> np.ndarray:
    """Vectorized membership of ``hashes`` against one partition bitmap."""
    h = hashes.astype(np.uint64)
    h2 = _mix(h) | np.uint64(1)
    hit = np.ones(len(h), dtype=bool)
    for i in range(k):
        pos = (h + np.uint64(i) * h2) % np.uint64(bits)
        byte = part[(pos >> np.uint64(3)).astype(np.int64)]
        hit &= (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1 == 1
    return hit


class PartitionedBloom:
    def __init__(self, num_partitions: int = 64, bits_per_partition: int = 1 << 20,
                 num_hashes: int = 7):
        # power-of-two partition count makes signed pmod(h, P) (Spark)
        # equal to unsigned h % P (numpy): 2^64 ≡ 0 (mod P)
        assert num_partitions & (num_partitions - 1) == 0, \
            "num_partitions must be a power of two"
        self.num_partitions = num_partitions
        self.bits = bits_per_partition
        self.k = num_hashes
        self.parts = [np.zeros(self.bits // 8, dtype=np.uint8)
                      for _ in range(num_partitions)]

    def or_delta(self, pid: int, delta: bytes) -> None:
        """OR an executor-built bitmap delta into one partition."""
        self.parts[int(pid)] |= np.frombuffer(delta, dtype=np.uint8)

    # -- core -------------------------------------------------------------

    def _partition_of(self, h: np.ndarray) -> np.ndarray:
        return (h % np.uint64(self.num_partitions)).astype(np.int64)

    def _probe_positions(self, h: np.ndarray) -> list[np.ndarray]:
        h1 = h
        h2 = _mix(h) | np.uint64(1)
        return [((h1 + np.uint64(i) * h2) % np.uint64(self.bits)) for i in range(self.k)]

    def might_contain(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership for an Arrow batch of int64 hashes."""
        h = hashes.astype(np.uint64)
        pids = self._partition_of(h)
        out = np.ones(len(h), dtype=bool)
        for pid in np.unique(pids):
            mask = pids == pid
            part = self.parts[int(pid)]
            sub = h[mask]
            hit = np.ones(mask.sum(), dtype=bool)
            for pos in self._probe_positions(sub):
                byte = part[(pos >> np.uint64(3)).astype(np.int64)]
                hit &= (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1 == 1
            out[mask] = hit
        return out

