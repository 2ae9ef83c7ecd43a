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
* **incrementally checkpointable**: each round ORs the new keys into
  the touched partitions and stages only those blobs; the catalog
  commit makes filter state resume with the tables.
* **vectorized membership**: numpy bit ops over Arrow batches inside
  ``mapInPandas`` — no per-row Python.

Hashing: the two Bloom probe hashes derive from the already-computed
``xxhash64(canonical_url)`` (Kirsch-Mitzenmacher double hashing), so
executors never touch URL strings.
"""

from __future__ import annotations

import os

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


class PartitionedBloom:
    def __init__(self, num_partitions: int = 64, bits_per_partition: int = 1 << 20,
                 num_hashes: int = 7):
        self.num_partitions = num_partitions
        self.bits = bits_per_partition
        self.k = num_hashes
        self.parts = [np.zeros(self.bits // 8, dtype=np.uint8)
                      for _ in range(num_partitions)]

    # -- core -------------------------------------------------------------

    def _partition_of(self, h: np.ndarray) -> np.ndarray:
        return (h % np.uint64(self.num_partitions)).astype(np.int64)

    def _probe_positions(self, h: np.ndarray) -> list[np.ndarray]:
        h1 = h
        h2 = _mix(h) | np.uint64(1)
        return [((h1 + np.uint64(i) * h2) % np.uint64(self.bits)) for i in range(self.k)]

    def add_hashes(self, hashes: np.ndarray) -> set[int]:
        """OR keys into their partitions; returns touched partition ids
        (the incremental-checkpoint unit)."""
        h = hashes.astype(np.uint64)
        pids = self._partition_of(h)
        touched: set[int] = set()
        for pid in np.unique(pids):
            mask = pids == pid
            part = self.parts[int(pid)]
            for pos in self._probe_positions(h[mask]):
                np.bitwise_or.at(part, (pos >> np.uint64(3)).astype(np.int64),
                                 np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
            touched.add(int(pid))
        return touched

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

    # -- checkpoint -------------------------------------------------------

    def save_partitions(self, blob_dir: str, pids: set[int] | None = None) -> None:
        for pid in (pids if pids is not None else range(self.num_partitions)):
            self.parts[int(pid)].tofile(os.path.join(blob_dir, f"bloom_{pid:05d}.bin"))

    @classmethod
    def load(cls, blob_dir: str, num_partitions: int,
             bits_per_partition: int, num_hashes: int = 7) -> "PartitionedBloom":
        bloom = cls(num_partitions, bits_per_partition, num_hashes)
        for pid in range(num_partitions):
            path = os.path.join(blob_dir, f"bloom_{pid:05d}.bin")
            if os.path.exists(path):
                bloom.parts[pid] = np.fromfile(path, dtype=np.uint8)
        return bloom
