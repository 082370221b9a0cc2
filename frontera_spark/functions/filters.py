"""Pure-numpy bloom and cuckoo filters over int64 fingerprints.

The BASELINE north rule asks for a "partitioned bloom-filter + cuckoo-filter
URL-seen set"; the reference's seen set is EXACT (frontera States store,
frontera/core/components.py:~150-200), so these are **negative pre-filters**
in front of the exact anti-join, never the source of truth (SURVEY.md §1.2,
§7.4.2): a membership "no" skips the join, a "maybe" routes through it.

Vectorized end-to-end (numpy bitwise ops on uint64 arrays — no per-item
Python in the hot membership path); serializable to bytes for shard files.
Hash mixing is splitmix64 (public domain construction).
"""

from __future__ import annotations

import numpy as np

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + _GOLDEN).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= _C1
    x ^= x >> np.uint64(27)
    x *= _C2
    x ^= x >> np.uint64(31)
    return x


def _as_u64(fps: np.ndarray) -> np.ndarray:
    return np.asarray(fps).astype(np.int64).view(np.uint64)


class BloomFilter:
    """Standard k-hash bloom over a power-of-2 bit array.

    Sized by (capacity, bits_per_key): m = next_pow2(capacity * bits_per_key);
    k = 8 gives ~0.06% FP at 16 bits/key. No deletes (the seen set only
    grows); superset semantics are what the dedup pre-filter needs.
    """

    K = 8

    def __init__(self, capacity: int, bits_per_key: int = 16, bits: np.ndarray | None = None):
        m = 1 << int(capacity * bits_per_key - 1).bit_length()
        self.m = m
        self.mask = np.uint64(m - 1)
        self.bits = bits if bits is not None else np.zeros(m // 8, dtype=np.uint8)
        self.n_items = 0

    def _indices(self, fps: np.ndarray) -> np.ndarray:
        """(len(fps), K) bit indices."""
        u = _as_u64(fps)
        h1 = _splitmix64(u)
        h2 = _splitmix64(u ^ _C2) | np.uint64(1)
        ks = np.arange(self.K, dtype=np.uint64)[None, :]
        return (h1[:, None] + ks * h2[:, None]) & self.mask

    def add_many(self, fps: np.ndarray) -> None:
        if len(fps) == 0:
            return
        idx = self._indices(fps).ravel()
        np.bitwise_or.at(self.bits, (idx >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
        self.n_items += len(fps)

    def contains_many(self, fps: np.ndarray) -> np.ndarray:
        """Vectorized membership: bool array; True = MAYBE present."""
        if len(fps) == 0:
            return np.zeros(0, dtype=bool)
        idx = self._indices(fps)
        byte = self.bits[(idx >> np.uint64(3)).astype(np.int64)]
        bit = (byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1
        return bit.all(axis=1)

    def to_bytes(self) -> bytes:
        header = np.array([self.m, self.n_items], dtype=np.int64).tobytes()
        return header + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        m, n_items = np.frombuffer(data[:16], dtype=np.int64)
        f = cls.__new__(cls)
        f.m = int(m)
        f.mask = np.uint64(m - 1)
        f.bits = np.frombuffer(data[16:], dtype=np.uint8).copy()
        f.n_items = int(n_items)
        return f


class CuckooFilter:
    """Cuckoo filter (Fan et al. 2014, public paper): 4-slot buckets of
    16-bit tags; partial-key cuckoo hashing gives ~0.03% FP at 95% load and,
    unlike bloom, supports DELETE — the shard path for revisit/recrawl where
    a fingerprint leaves the crawled set (frontera's revisiting backend
    re-queues crawled URLs, contrib/backends/sqlalchemy/revisiting.py).
    """

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int, table: np.ndarray | None = None):
        n_buckets = 1 << max(4, int(capacity / self.SLOTS * 1.05).bit_length())
        self.n_buckets = n_buckets
        self.mask = np.uint64(n_buckets - 1)
        # tag 0 = empty slot
        self.table = table if table is not None else np.zeros(
            (n_buckets, self.SLOTS), dtype=np.uint16
        )
        self.n_items = 0
        self._rng = np.random.default_rng(0xC0FFEE)  # deterministic evictions

    def _tag(self, u: np.ndarray) -> np.ndarray:
        t = (_splitmix64(u ^ _C1) & np.uint64(0xFFFF)).astype(np.uint16)
        return np.where(t == 0, np.uint16(1), t)  # reserve 0 for "empty"

    def _i1(self, u: np.ndarray) -> np.ndarray:
        return _splitmix64(u) & self.mask

    def _alt(self, i: np.ndarray, tag: np.ndarray) -> np.ndarray:
        return (i ^ _splitmix64(tag.astype(np.uint64))) & self.mask

    def _alt1(self, i: int, tag: int) -> int:
        # scalar path routed through a 1-element array: numpy scalar uint64
        # arithmetic raises RuntimeWarning on (intended) wraparound, and
        # silencing warnings globally would hide real overflow bugs
        return int(
            self._alt(np.array([i], dtype=np.uint64), np.array([tag], dtype=np.uint16))[0]
        )

    def _bulk_place(self, buckets: np.ndarray, tags: np.ndarray) -> np.ndarray:
        """Vectorized no-eviction placement: for each (bucket, tag), claim the
        next free slot if occupancy + in-batch rank < SLOTS. Returns a bool
        mask of placed items. Slot indices are unique by construction (rank
        within bucket), so the scatter write has no collisions."""
        if len(buckets) == 0:
            return np.zeros(0, dtype=bool)
        order = np.argsort(buckets, kind="stable")
        sb = buckets[order].astype(np.int64)
        st = tags[order]
        rank = np.arange(len(sb)) - np.searchsorted(sb, sb, side="left")
        occ = (self.table[sb] != 0).sum(axis=1)
        slot = occ + rank
        ok = slot < self.SLOTS
        self.table.ravel()[sb[ok] * self.SLOTS + slot[ok]] = st[ok]
        placed = np.zeros(len(buckets), dtype=bool)
        placed[order[ok]] = True
        return placed

    def add_many(self, fps: np.ndarray) -> int:
        """Insert; returns number that failed (filter full). Vectorized fast
        path (try bucket i1, then i2 for the leftovers); only items needing
        eviction chains fall back to the per-item loop — near-zero when
        capacity is sized right."""
        u = _as_u64(fps)
        tags, i1s = self._tag(u), self._i1(u)
        placed = self._bulk_place(i1s, tags)
        if not placed.all():
            rem = ~placed
            i2s = self._alt(i1s[rem], tags[rem])
            placed2 = self._bulk_place(i2s, tags[rem])
            placed[np.nonzero(rem)[0][placed2]] = True
        failed = 0
        for k in np.nonzero(~placed)[0]:  # eviction-path stragglers
            if self._insert_one(int(i1s[k]), int(tags[k])):
                placed[k] = True
            else:
                failed += 1
        self.n_items += int(placed.sum())
        return failed

    def _insert_one(self, i: int, tag: int) -> bool:
        for idx in (i, self._alt1(i, tag)):
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = tag
                return True
        # evict
        cur_i, cur_tag = i, tag
        for _ in range(self.MAX_KICKS):
            slot = int(self._rng.integers(self.SLOTS))
            cur_tag, self.table[cur_i, slot] = int(self.table[cur_i, slot]), cur_tag
            cur_i = self._alt1(cur_i, cur_tag)
            row = self.table[cur_i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur_tag
                return True
        return False

    def contains_many(self, fps: np.ndarray) -> np.ndarray:
        if len(fps) == 0:
            return np.zeros(0, dtype=bool)
        u = _as_u64(fps)
        tags, i1 = self._tag(u), self._i1(u)
        i2 = self._alt(i1, tags)
        in1 = (self.table[i1.astype(np.int64)] == tags[:, None]).any(axis=1)
        in2 = (self.table[i2.astype(np.int64)] == tags[:, None]).any(axis=1)
        return in1 | in2

    def delete_many(self, fps: np.ndarray) -> int:
        """Remove one matching tag per fingerprint; returns number deleted."""
        u = _as_u64(fps)
        tags, i1s = self._tag(u), self._i1(u)
        deleted = 0
        for tag, i1 in zip(tags, i1s):
            for idx in (int(i1), self._alt1(int(i1), int(tag))):
                row = self.table[idx]
                hit = np.nonzero(row == tag)[0]
                if len(hit):
                    row[hit[0]] = 0
                    deleted += 1
                    self.n_items -= 1
                    break
        return deleted

    def to_bytes(self) -> bytes:
        header = np.array([self.n_buckets, self.n_items], dtype=np.int64).tobytes()
        return header + self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        n_buckets, n_items = np.frombuffer(data[:16], dtype=np.int64)
        f = cls.__new__(cls)
        f.n_buckets = int(n_buckets)
        f.mask = np.uint64(n_buckets - 1)
        f.table = (
            np.frombuffer(data[16:], dtype=np.uint16).reshape(int(n_buckets), cls.SLOTS).copy()
        )
        f.n_items = int(n_items)
        f._rng = np.random.default_rng(0xC0FFEE)
        return f
