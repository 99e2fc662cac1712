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

__all__ = ["SeenTable"]

_EMPTY = np.uint64(0)


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
        if (self._count + n) * 10 > len(self._table) * 6:  # load > 0.6
            while (self._count + n) * 10 > len(self._table) * 6:
                self._grow()
        # sequential semantics per key, vectorized probing: resolve
        # duplicates within the batch by processing in stable order and
        # letting later duplicates find the earlier insert.
        idx = keys & self._mask
        pending = np.arange(n)
        while len(pending):
            slot = self._table[idx[pending]]
            found = slot == keys[pending]
            empty = slot == _EMPTY
            if empty.any():
                # insert the FIRST pending key per empty slot; duplicates
                # of the same key targeting the same slot must not both
                # claim it, so insert unique (slot, key) winners only.
                cand = pending[empty]
                cand_idx = idx[cand]
                uniq_slots, first_pos = np.unique(cand_idx, return_index=True)
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
