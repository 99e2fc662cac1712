"""Open-addressing uint64 membership table (the URL-seen set core).

Memory-shape for the 10^10-URL design point (SURVEY.md §2.4 ST4): a
flat ``uint64`` numpy array with linear probing — 8 bytes per slot, no
Python object overhead, so one shard holding 10^9 URLs at 0.6 load is
~13 GB; 16-64 shards spread that across a cluster.  (A 2-byte cuckoo
fingerprint table would be 4x smaller at the cost of false positives;
the full-hash table keeps the oracle-equality tests exact and the
snapshot format trivial.  Swapping the cell type is a local change.)

Batch operations are numpy-vectorized: one probe round per iteration
over the whole batch, not per key.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "SeenTable",
    "CuckooSeenTable",
    "BloomSeenTable",
    "Seen128Table",
    "make_seen_table",
    "restore_seen_table",
]

_EMPTY = np.uint64(0)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    # wraparound uint64 arithmetic is the point here; numpy warns on
    # scalar overflow even though the result is the intended mod-2^64
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(
            0xFFFFFFFFFFFFFFFF
        )
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(
            0xFFFFFFFFFFFFFFFF
        )
        return x ^ (x >> np.uint64(31))


class SeenTable:
    """uint64 set with vectorized batch contains/add.

    Key 0 is remapped to 1 (0 is the empty-slot sentinel) — an
    accepted, documented collision (FNV-1a never yields 0 for any
    input shorter than astronomically unlikely).
    """

    def __init__(self, initial_capacity: int = 1 << 16) -> None:
        cap = 1 << max(4, (initial_capacity - 1).bit_length())
        self._table = np.zeros(cap, dtype=np.uint64)
        self._mask = np.uint64(cap - 1)
        self._count = 0

    def __len__(self) -> int:
        return self._count

    # -- internals ---------------------------------------------------
    def _grow(self) -> None:
        old = self._table[self._table != _EMPTY]
        cap = len(self._table) * 2
        self._table = np.zeros(cap, dtype=np.uint64)
        self._mask = np.uint64(cap - 1)
        self._count = 0
        if len(old):
            self.add(old)

    @staticmethod
    def _clean(keys: np.ndarray) -> np.ndarray:
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        return np.where(keys == _EMPTY, np.uint64(1), keys)

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership for a batch of keys."""
        keys = self._clean(keys)
        n = len(keys)
        result = np.zeros(n, dtype=bool)
        if n == 0 or self._count == 0:
            return result
        idx = keys & self._mask
        pending = np.arange(n)
        while len(pending):
            slot = self._table[idx[pending]]
            found = slot == keys[pending]
            empty = slot == _EMPTY
            result[pending[found]] = True
            # continue probing only where slot is occupied by another key
            cont = ~(found | empty)
            pending = pending[cont]
            idx[pending] = (idx[pending] + np.uint64(1)) & self._mask
        return result

    def add(self, keys: np.ndarray) -> np.ndarray:
        """Insert a batch; returns a was-new mask (first occurrence in
        the batch counts as new once)."""
        keys = self._clean(keys)
        n = len(keys)
        new = np.zeros(n, dtype=bool)
        if n == 0:
            return new
        while (self._count + n) * 10 > len(self._table) * 6:  # load > 0.6
            self._grow()
        # sequential semantics per key, vectorized probing: resolve
        # duplicates within the batch by processing in stable order and
        # letting later duplicates find the earlier insert.
        idx = keys & self._mask
        pending = np.arange(n)
        while len(pending):
            slot = self._table[idx[pending]]
            empty = slot == _EMPTY
            if empty.any():
                # insert the FIRST pending key per empty slot; duplicates
                # of the same key targeting the same slot must not both
                # claim it, so insert unique (slot, key) winners only.
                cand = pending[empty]
                cand_idx = idx[cand]
                _, first_pos = np.unique(cand_idx, return_index=True)
                winners = cand[first_pos]
                # among winners, also dedup identical keys (two equal keys
                # probe identical sequences, so first occurrence wins)
                _, kfirst = np.unique(keys[winners], return_index=True)
                winners = winners[np.sort(kfirst)]
                self._table[idx[winners]] = keys[winners]
                new[winners] = True
                self._count += len(winners)
            # recompute: keys matching (either pre-existing or just
            # inserted) are done; others probe next slot
            slot = self._table[idx[pending]]
            done = slot == keys[pending]
            pending = pending[~done]
            idx[pending] = (idx[pending] + np.uint64(1)) & self._mask
        return new

    # -- snapshot / restore (checkpoint protocol) --------------------
    def dump(self) -> np.ndarray:
        """All stored keys (unordered)."""
        return self._table[self._table != _EMPTY].copy()

    def snapshot(self) -> dict[str, np.ndarray]:
        return {"table": self._table.copy()}

    @classmethod
    def restore(cls, state: dict[str, np.ndarray]) -> "SeenTable":
        obj = cls.__new__(cls)
        # force a writable copy: arrays from ray.get / np.load mmap are
        # read-only
        obj._table = np.array(state["table"], dtype=np.uint64, copy=True)
        obj._mask = np.uint64(len(obj._table) - 1)
        obj._count = int((obj._table != _EMPTY).sum())
        return obj


class CuckooSeenTable:
    """16-bit-fingerprint cuckoo membership table — the SURVEY §2.4 ST4
    memory-envelope backend.

    4-way buckets of ``uint16`` fingerprints: ~2.4 B/key at the
    advertised capacity (vs ≥13 B/key for the exact open-addressing
    table at its 0.6 load), so one shard holding 10^9 URLs is ~2.5 GB
    and a 10^10-URL frontier fits the 20-40 GB cluster-wide budget
    (reference keeps its seen set as an unbounded Go
    ``map[string]struct{}``, crawler.go:74-86 — neither scales; this
    is the classic cuckoo-filter answer).  False-positive rate
    ≈ 2·4/2^16 ≈ 1.2e-4 — a falsely-"seen" URL is silently never
    crawled, the standard accepted loss at web scale.  Keep the exact
    backend (default) where bit-parity with the simulator matters.

    Same batch API as :class:`SeenTable` (``contains`` / ``add`` /
    ``snapshot`` / ``restore`` / ``__len__``); ``dump`` raises —
    fingerprints cannot reconstruct keys.  Capacity is FIXED at
    construction: a partial-key filter cannot grow in place (the
    evicted-bucket bit is unrecoverable), so size it to the design
    point up front; overflow goes to a tiny stash, then raises.
    """

    SLOTS = 4
    MAX_KICKS = 500
    STASH_MAX = 64

    _FP_HASH: np.ndarray | None = None  # 65536-entry fp -> uint64 hash

    def __init__(self, capacity: int = 1 << 16) -> None:
        n_buckets = 1 << max(
            4, int(np.ceil(capacity / 0.84 / self.SLOTS) - 1).bit_length()
        )
        self._table = np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        self._mask = np.uint64(n_buckets - 1)
        self._count = 0
        self._stash: set[tuple[int, int]] = set()  # (bucket, fp)
        if CuckooSeenTable._FP_HASH is None:
            CuckooSeenTable._FP_HASH = _splitmix64(
                np.arange(1 << 16, dtype=np.uint64) | np.uint64(1 << 40)
            )

    def __len__(self) -> int:
        return self._count

    # -- internals ---------------------------------------------------
    def _derive(self, keys: np.ndarray):
        """(fingerprint, bucket1, bucket2) for a batch of keys — all
        masking in uint64 (never ``% python_int``: the uint64-modulo
        float promotion trap, see tests)."""
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        s = _splitmix64(keys)
        f = (s >> np.uint64(48)).astype(np.uint16)
        f = np.where(f == 0, np.uint16(1), f)
        i1 = s & self._mask
        i2 = i1 ^ (self._FP_HASH[f] & self._mask)
        return f, i1, i2

    def _alt(self, bucket: int, fp: int) -> int:
        return int(
            np.uint64(bucket) ^ (self._FP_HASH[fp] & self._mask)
        )

    def _in_stash(self, f: np.ndarray, i1: np.ndarray, i2: np.ndarray) -> np.ndarray:
        hit = np.zeros(len(f), dtype=bool)
        for bk, fp in self._stash:  # stash is ≤ STASH_MAX entries
            hit |= (f == fp) & ((i1 == bk) | (i2 == bk))
        return hit

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership for a batch of keys (may report false
        positives at the documented rate; never false negatives)."""
        if len(keys) == 0 or self._count == 0:
            return np.zeros(len(keys), dtype=bool)
        f, i1, i2 = self._derive(keys)
        res = (self._table[i1] == f[:, None]).any(axis=1)
        res |= (self._table[i2] == f[:, None]).any(axis=1)
        if self._stash:
            res |= self._in_stash(f, i1, i2)
        return res

    def add(self, keys: np.ndarray) -> np.ndarray:
        """Insert a batch; returns a was-new mask (first occurrence in
        the batch counts as new once; a false-positive hit counts as
        already-seen, the accepted semantics).

        Bulk path: one vectorized pass over each candidate bucket
        (primary, then alt) assigns per-bucket ranks with segment
        arithmetic and writes every fitting key in two fancy-indexed
        stores; only keys whose BOTH buckets are full (rare below ~0.8
        load) fall back to the per-key kick loop — this is what makes a
        10^8-key shard ingest seconds, not hours."""
        n = len(keys)
        new = np.zeros(n, dtype=bool)
        if n == 0:
            return new
        f, i1, i2 = self._derive(keys)
        # vectorized pre-check: keys already present skip insertion.
        # rows1 is reused for pass-1 round-1 free slots below — safe,
        # nothing writes between the gather and those first writes
        rows1 = self._table[i1]
        present = (rows1 == f[:, None]).any(axis=1)
        present |= (self._table[i2] == f[:, None]).any(axis=1)
        if self._stash:
            present |= self._in_stash(f, i1, i2)
        todo = np.flatnonzero(~present)
        if not len(todo):
            return new
        # in-batch dedup: two rows with the same fingerprint AND the
        # same (unordered) bucket pair are indistinguishable to the
        # filter (duplicate key, or an in-batch false positive — both
        # counted not-new, the pre-bulk semantics); i2 = i1 ^ h(f), so
        # (f, min(i1, i2)) keys the unordered pair — packed into ONE
        # uint64 (fp in the top 16 bits of a 40-bit-bucket layout) so
        # the dedup is a 1-D unique, not a void-dtype row sort
        pairkey = (
            f[todo].astype(np.uint64) << np.uint64(40)
        ) | np.minimum(i1[todo], i2[todo])
        _, first = np.unique(pairkey, return_index=True)
        todo = todo[first]

        tab = self._table
        remaining = todo
        first_round_free = rows1[todo] == 0  # reuse the gather
        for bucket_arr in (i1, i2):
            # scatter-retry rounds, no sorting: every key with a free
            # slot in its bucket writes its fp into the FIRST free slot;
            # colliding writers (same bucket+slot) are resolved by the
            # store itself (last writer wins) and losers — whose fp is
            # not visible in the bucket afterwards — retry next round.
            # Expected rounds ≈ max same-bucket multiplicity (tiny for
            # hash-spread keys); each round is pure gather/scatter.
            while len(remaining):
                b = bucket_arr[remaining]
                if first_round_free is not None:
                    free = first_round_free
                    first_round_free = None
                else:
                    free = tab[b] == 0
                hasf = free.any(axis=1)
                if not hasf.any():
                    break  # this bucket choice is full → next choice
                cand = remaining[hasf]
                bc = b[hasf]
                slot = np.argmax(free[hasf], axis=1)
                tab[bc, slot] = f[cand]
                placed = (tab[bc] == f[cand][:, None]).any(axis=1)
                remaining = np.concatenate(
                    [cand[~placed], remaining[~hasf]]
                )
            if not len(remaining):
                break

        # both buckets full: per-key cuckoo kicks (rare below ~0.8 load)
        for j in remaining.tolist():
            fj = int(f[j])
            a = int(i1[j])
            placed = False
            cur_i, cur_f = a, fj
            for kick in range(self.MAX_KICKS):
                # deterministic scrambled slot pick (no RNG state)
                slot = (cur_f * 0x9E37 + kick) & 3
                cur_f, tab[cur_i, slot] = int(tab[cur_i, slot]), cur_f
                cur_i = self._alt(cur_i, cur_f)
                z = np.flatnonzero(tab[cur_i] == 0)
                if len(z):
                    tab[cur_i, z[0]] = cur_f
                    placed = True
                    break
            if not placed:
                self._stash.add((cur_i, cur_f))
                if len(self._stash) > self.STASH_MAX:
                    raise RuntimeError(
                        "CuckooSeenTable over capacity — size the "
                        "table to the design point at construction"
                    )
        new[todo] = True
        self._count += len(todo)
        return new

    # -- snapshot / restore (checkpoint protocol) --------------------
    def dump(self) -> np.ndarray:
        raise NotImplementedError(
            "CuckooSeenTable stores fingerprints, not keys; use the "
            "exact backend where dump_seen is needed"
        )

    def snapshot(self) -> dict[str, np.ndarray]:
        stash = np.array(sorted(self._stash), dtype=np.int64).reshape(-1, 2)
        return {
            "cuckoo_table": self._table.copy(),
            "stash": stash,
            "count": np.array([self._count], dtype=np.int64),
        }

    @classmethod
    def restore(cls, state: dict[str, np.ndarray]) -> "CuckooSeenTable":
        obj = cls(16)  # builds _FP_HASH; table replaced below
        obj._table = np.array(state["cuckoo_table"], dtype=np.uint16, copy=True)
        obj._mask = np.uint64(len(obj._table) - 1)
        obj._stash = {(int(a), int(b)) for a, b in state["stash"]}
        obj._count = int(state["count"][0])
        return obj


class BloomSeenTable:
    """Classic blocked-free Bloom filter — the other half of the north
    rule's "bloom/cuckoo URL-seen" pair.

    ``bits_per_key`` bits per advertised capacity key (default 16 →
    2 B/key, k = 11 double-hashed probes, false-positive rate ≈ 4.6e-4
    at full capacity); storage is a flat ``uint64`` word array.  Like
    the cuckoo backend a false "seen" means a rare URL is silently
    never crawled; unlike cuckoo there is no stash/overflow cliff —
    past-capacity inserts just degrade the FPR smoothly, so it suits
    deployments that prefer graceful saturation to a hard bound.
    Deletion is impossible (no per-key cells), which the URL-seen set
    never needs.

    Same batch API as :class:`SeenTable` (``contains`` / ``add`` /
    ``snapshot`` / ``restore`` / ``__len__``); ``dump`` raises — bits
    cannot reconstruct keys.  ``__len__`` counts keys whose insert was
    definitely new (first occurrence, not already all-bits-set), an
    undercount by exactly the FPR.
    """

    BITS_PER_KEY = 16
    K = 11  # round(BITS_PER_KEY * ln 2)

    def __init__(self, capacity: int = 1 << 16) -> None:
        bits = 1 << max(9, int(capacity * self.BITS_PER_KEY - 1).bit_length())
        self._words = np.zeros(bits >> 6, dtype=np.uint64)
        self._bitmask = np.uint64(bits - 1)
        self._count = 0

    def __len__(self) -> int:
        return self._count

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(n, K) bit positions via Kirsch–Mitzenmacher double hashing:
        h_i = h1 + i*h2, h2 forced odd so the probe stride is a unit
        mod the power-of-two bit count (full-period)."""
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        h1 = _splitmix64(keys)
        h2 = _splitmix64(keys ^ np.uint64(0xA076_1D64_78BD_642F)) | np.uint64(1)
        i = np.arange(self.K, dtype=np.uint64)[None, :]
        with np.errstate(over="ignore"):
            return (h1[:, None] + i * h2[:, None]) & self._bitmask

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership (false positives at the documented
        rate; never false negatives)."""
        if len(keys) == 0 or self._count == 0:
            return np.zeros(len(keys), dtype=bool)
        pos = self._positions(keys)
        bits = (self._words[pos >> np.uint64(6)]
                >> (pos & np.uint64(63))) & np.uint64(1)
        return bits.all(axis=1)

    def add(self, keys: np.ndarray) -> np.ndarray:
        """Insert a batch; returns a was-new mask (first occurrence in
        the batch counts as new once; a false-positive hit counts as
        already-seen — the cuckoo backend's semantics)."""
        n = len(keys)
        new = np.zeros(n, dtype=bool)
        if n == 0:
            return new
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        pos = self._positions(keys)
        word, bit = pos >> np.uint64(6), pos & np.uint64(63)
        present = (
            ((self._words[word] >> bit) & np.uint64(1)).all(axis=1)
            if self._count
            else np.zeros(n, dtype=bool)
        )
        todo = np.flatnonzero(~present)
        if not len(todo):
            return new
        # first occurrence of each distinct key counts new once
        _, first = np.unique(keys[todo], return_index=True)
        todo = todo[np.sort(first)]
        # Exact SEQUENTIAL semantics for in-batch coverage: candidate i
        # is already-seen iff all its positions are covered by the
        # pre-batch state or by writes of ACCEPTED earlier candidates
        # (the one-shot `present` screen misses earlier-in-batch
        # coverage, drifting was-new and __len__ from a sequential
        # replay at the FPR rate).  Candidates needing resolution are
        # those coverable even in principle — every position pre-set or
        # written by some OTHER candidate — which is far rarer than the
        # FPR, so the ordered fallback loop below is effectively free.
        m = len(todo)
        flat = pos[todo]
        pre_cov = (
            (((self._words[word[todo]] >> bit[todo]) & np.uint64(1))
             .astype(bool))
            if self._count else np.zeros((m, self.K), dtype=bool)
        )
        uniq_pos, inv = np.unique(flat, return_inverse=True)
        inv = inv.reshape(m, self.K)
        writers = np.bincount(inv.ravel(), minlength=len(uniq_pos))
        suspicious = np.flatnonzero(
            (pre_cov | (writers[inv] >= 2)).all(axis=1)
        )
        accepted = np.ones(m, dtype=bool)
        if len(suspicious):
            definite = np.ones(m, dtype=bool)
            definite[suspicious] = False
            owner = np.full(len(uniq_pos), m, dtype=np.int64)
            didx = np.flatnonzero(definite)
            if len(didx):
                np.minimum.at(
                    owner, inv[didx].ravel(), np.repeat(didx, self.K)
                )
            extra: set[int] = set()  # pos ids written by accepted suspicious
            for s_i in suspicious.tolist():
                row = inv[s_i]
                covered = all(
                    bool(pre_cov[s_i, j])
                    or owner[row[j]] < s_i
                    or int(row[j]) in extra
                    for j in range(self.K)
                )
                if covered:
                    accepted[s_i] = False
                else:
                    extra.update(int(r) for r in row.tolist())
        keep = todo[accepted]
        np.bitwise_or.at(
            self._words, word[keep].ravel(),
            np.uint64(1) << bit[keep].ravel(),
        )
        new[keep] = True
        self._count += len(keep)
        return new

    # -- snapshot / restore (checkpoint protocol) --------------------
    def dump(self) -> np.ndarray:
        raise NotImplementedError(
            "BloomSeenTable stores bits, not keys; use the exact "
            "backend where dump_seen is needed"
        )

    def snapshot(self) -> dict[str, np.ndarray]:
        return {
            "bloom_words": self._words.copy(),
            "count": np.array([self._count], dtype=np.int64),
        }

    @classmethod
    def restore(cls, state: dict[str, np.ndarray]) -> "BloomSeenTable":
        obj = cls.__new__(cls)
        obj._words = np.array(state["bloom_words"], dtype=np.uint64, copy=True)
        obj._bitmask = np.uint64(len(obj._words) * 64 - 1)
        obj._count = int(state["count"][0])
        return obj


# per-SHARD capacity above which "auto" picks the cuckoo fingerprints:
# below it the exact table costs < ~128 MB/shard (13 B/key at 0.6 load)
# and keeps dump/parity; above it the 10^10 design point needs the
# ≤4 B/key envelope — memory, not fidelity, is the binding constraint
AUTO_CUCKOO_THRESHOLD = 10_000_000


def resolve_seen_backend(backend: str, capacity: int) -> str:
    """``"auto"`` → exact below :data:`AUTO_CUCKOO_THRESHOLD` keys per
    shard (bit-parity, dump-capable), cuckoo at or above it (the ST4
    memory envelope is the DEFAULT at scale, not an option)."""
    if backend == "auto":
        return "cuckoo" if capacity >= AUTO_CUCKOO_THRESHOLD else "exact"
    return backend


class Seen128Table:
    """Exact 128-bit membership: open-addressing keyed by the LO word
    with a parallel HI-word array confirming slot identity — 16 B/slot
    (~27 B/key at the 0.6 load bound).  The content-membership backend
    for :func:`crawl_ray.pipelines.dedup.incremental_dedup`: a false
    "already ingested" now requires two distinct texts sharing a full
    128-bit blake2b digest (cryptographically negligible), instead of
    the 64-bit birthday bound (~5 new docs wrongly dropped per 10^10 ×
    10^10 old×new at 64 bits).  Probe loops mirror :class:`SeenTable`;
    lo == 0 remaps to 1 (0 is the empty-slot sentinel)."""

    def __init__(self, initial_capacity: int = 1 << 16) -> None:
        cap = 1 << max(4, (initial_capacity - 1).bit_length())
        self._lo = np.zeros(cap, dtype=np.uint64)
        self._hi = np.zeros(cap, dtype=np.uint64)
        self._mask = np.uint64(cap - 1)
        self._count = 0

    def __len__(self) -> int:
        return self._count

    def _grow(self) -> None:
        occ = self._lo != _EMPTY
        old_lo, old_hi = self._lo[occ], self._hi[occ]
        cap = len(self._lo) * 2
        self._lo = np.zeros(cap, dtype=np.uint64)
        self._hi = np.zeros(cap, dtype=np.uint64)
        self._mask = np.uint64(cap - 1)
        self._count = 0
        if len(old_lo):
            self.add(old_lo, old_hi)

    @staticmethod
    def _clean(lo: np.ndarray, hi: np.ndarray):
        lo = np.ascontiguousarray(lo, dtype=np.uint64)
        hi = np.ascontiguousarray(hi, dtype=np.uint64)
        return np.where(lo == _EMPTY, np.uint64(1), lo), hi

    def contains(self, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
        lo, hi = self._clean(lo, hi)
        n = len(lo)
        result = np.zeros(n, dtype=bool)
        if n == 0 or self._count == 0:
            return result
        idx = lo & self._mask
        pending = np.arange(n)
        while len(pending):
            slo = self._lo[idx[pending]]
            found = (slo == lo[pending]) & (self._hi[idx[pending]] == hi[pending])
            empty = slo == _EMPTY
            result[pending[found]] = True
            pending = pending[~(found | empty)]
            idx[pending] = (idx[pending] + np.uint64(1)) & self._mask
        return result

    def add(self, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
        lo, hi = self._clean(lo, hi)
        n = len(lo)
        new = np.zeros(n, dtype=bool)
        if n == 0:
            return new
        while (self._count + n) * 10 > len(self._lo) * 6:  # load > 0.6
            self._grow()
        idx = lo & self._mask
        pending = np.arange(n)
        while len(pending):
            slo = self._lo[idx[pending]]
            empty = slo == _EMPTY
            if empty.any():
                cand = pending[empty]
                cand_idx = idx[cand]
                # first pending key per empty slot wins the slot ...
                _, first_pos = np.unique(cand_idx, return_index=True)
                winners = cand[first_pos]
                # ... and among winners, the first occurrence of each
                # DISTINCT (lo, hi) pair wins (equal pairs probe
                # identical sequences)
                pair = np.stack([lo[winners], hi[winners]], axis=1)
                _, kfirst = np.unique(pair, axis=0, return_index=True)
                winners = winners[np.sort(kfirst)]
                self._lo[idx[winners]] = lo[winners]
                self._hi[idx[winners]] = hi[winners]
                new[winners] = True
                self._count += len(winners)
            slo = self._lo[idx[pending]]
            shi = self._hi[idx[pending]]
            done = (slo == lo[pending]) & (shi == hi[pending])
            pending = pending[~done]
            idx[pending] = (idx[pending] + np.uint64(1)) & self._mask
        return new

    def snapshot(self) -> dict[str, np.ndarray]:
        return {"lo": self._lo.copy(), "hi": self._hi.copy()}

    @classmethod
    def restore(cls, state: dict[str, np.ndarray]) -> "Seen128Table":
        obj = cls.__new__(cls)
        obj._lo = np.array(state["lo"], dtype=np.uint64, copy=True)
        obj._hi = np.array(state["hi"], dtype=np.uint64, copy=True)
        obj._mask = np.uint64(len(obj._lo) - 1)
        obj._count = int((obj._lo != _EMPTY).sum())
        return obj


def make_seen_table(backend: str, capacity: int = 1 << 16):
    """Backend dispatch: ``"exact"`` (full-key, dump/parity-capable),
    ``"cuckoo"`` (≤4 B/key fingerprints, the 10^10 memory envelope),
    ``"bloom"`` (2 B/key bit array, no overflow cliff), or ``"auto"``
    (capacity-scaled — :func:`resolve_seen_backend`)."""
    backend = resolve_seen_backend(backend, capacity)
    if backend == "exact":
        return SeenTable(capacity)
    if backend == "cuckoo":
        return CuckooSeenTable(capacity)
    if backend == "bloom":
        return BloomSeenTable(capacity)
    raise ValueError(f"unknown seen-table backend: {backend!r}")


def restore_seen_table(state: dict):
    if "cuckoo_table" in state:
        return CuckooSeenTable.restore(state)
    if "bloom_words" in state:
        return BloomSeenTable.restore(state)
    if "lo" in state and "hi" in state:  # exact128 (incremental dedup)
        return Seen128Table.restore(state)
    return SeenTable.restore(state)
