"""Admission shard actors: URL-seen set + per-host politeness tokens.

One :class:`AdmissionShard` owns a slice of the host space
(``fnv1a64(host) % n_shards``), holding BOTH the seen-set entries and
the token-bucket state for its hosts (SURVEY.md §2.4 ST4/ST5).  Keying
the seen set by host (rather than by url hash) co-locates all state one
frontier host-group needs, so the engine makes exactly **one** batch
actor RPC per shard per round (:meth:`admit_table`) — no fan-out to
every seen shard, no per-host RPCs, no groupby shuffle.

Trade-off, documented: a single enormous host concentrates its seen
entries on one shard.  Mitigation at 10^10 scale: promote such hosts to
a two-level shard (host, url_hash bucket) with token state on bucket 0;
not needed at sandbox scale.

Determinism: hosts are disjoint across groups, and within a shard all
per-host state is independent, so concurrent calls for different hosts
commute.  Token refill uses the elapsed-rounds closed form
``min(burst, tokens + rate * elapsed)`` which equals the simulator's
per-round refill loop exactly.
"""

from __future__ import annotations

import json

import numpy as np

from crawl_ray.state.seen import make_seen_table, restore_seen_table

__all__ = ["AdmissionShard", "ADMIT", "DEFER", "DUP", "ROBOTS", "SEEN"]

ADMIT = 0
DEFER = 1
DUP = 2     # duplicate within the round (silent drop, metrics only)
ROBOTS = 3  # robots-disallowed (error row)
SEEN = 4    # already crawled in an earlier round (silent drop)


class AdmissionShard:
    """Plain class; the engine wraps it with ``ray.remote``."""

    def __init__(
        self,
        robots_disallow: dict[str, list[str]] | None = None,
        robots_rates: dict[str, tuple[float, int]] | None = None,
        default_rate: float = 2.0,
        default_burst: int = 4,
        seen_backend: str = "exact",
        seen_capacity: int = 1 << 16,
    ) -> None:
        self.seen = make_seen_table(seen_backend, seen_capacity)
        self.disallow = robots_disallow or {}
        self.rates = robots_rates or {}
        self.default = (default_rate, default_burst)
        # host -> [tokens, last_refill_round]
        self.tokens: dict[str, list[float]] = {}
        # ST1 client cookie jar (crawler.go:87), sharded by host like
        # all other per-host state: host -> {name: value}.  Host-scoped
        # session cookies (no path/expiry attributes — documented
        # simplification of RFC 6265); updated by the engine at each
        # round boundary, so round K requests see the jar as of the end
        # of round K-1 (the deterministic spec for the reference's racy
        # concurrent visibility).
        self.jar: dict[str, dict[str, str]] = {}

    def _bucket(self, host: str, rnd: int) -> float:
        rate, burst = self.rates.get(host, self.default)
        state = self.tokens.get(host)
        if state is None:
            state = [float(burst), float(rnd)]
            self.tokens[host] = state
        else:
            elapsed = rnd - state[1]
            if elapsed > 0:
                state[0] = min(float(burst), state[0] + rate * elapsed)
                state[1] = float(rnd)
        return state[0]

    def admit(
        self,
        host: str,
        url_hashes: np.ndarray,
        paths: list[str],
        rnd: int,
    ) -> np.ndarray:
        """Disposition per row, rows given in canonical order.

        Pipeline per row (matches ``simulator.simulate`` step 5):
        within-round dup → already-seen → robots → token bucket.
        Only admitted rows are marked seen (deferred rows must survive
        to a later round).
        """
        n = len(url_hashes)
        out = np.full(n, DEFER, dtype=np.int8)
        url_hashes = np.ascontiguousarray(url_hashes, dtype=np.uint64)

        # within-round dedup: first occurrence in canonical order wins
        _, first_idx = np.unique(url_hashes, return_index=True)
        is_first = np.zeros(n, dtype=bool)
        is_first[first_idx] = True
        out[~is_first] = DUP

        # already crawled in an earlier round
        already = self.seen.contains(url_hashes)
        seen_mask = is_first & already
        out[seen_mask] = SEEN
        candidates = np.flatnonzero(is_first & ~already)

        # robots disallow prefixes
        prefixes = self.disallow.get(host)
        if prefixes:
            keep = []
            for i in candidates.tolist():
                if any(paths[i].startswith(p) for p in prefixes):
                    out[i] = ROBOTS
                else:
                    keep.append(i)
            candidates = np.array(keep, dtype=np.int64)

        # token bucket: admit the first floor(tokens) candidates
        tokens = self._bucket(host, rnd)
        k = min(int(tokens), len(candidates))
        if k > 0:
            admitted = candidates[:k]
            out[admitted] = ADMIT
            self.tokens[host][0] = tokens - k
            self.seen.add(url_hashes[admitted])
        # remaining candidates stay DEFER
        return out

    def admit_table(self, rnd: int, *tables):
        """Batch admission for ALL of this shard's hosts in one RPC.

        ``tables`` are the per-block sub-tables routed to this shard
        (``fnv1a64(host) % n_shards``).  Rows are sorted (host,
        order_key) so each host's run is processed in canonical order —
        identical per-host semantics to per-host :meth:`admit` calls,
        with one RPC per shard per round instead of one per host (the
        per-host ``groupby.map_groups`` shuffle cost ~3 s/round of
        fixed overhead regardless of round size).
        """
        import pyarrow as pa
        import pyarrow.compute as pc

        all_tables = list(tables)
        if not all_tables:
            return None
        # empty blocks can surface with a pre-canonicalize schema
        # (engine _split_canon hedges likewise) — drop them BEFORE
        # concat or pa.concat_tables raises on the schema mismatch
        tables = [t for t in all_tables if t.num_rows]
        if not tables:
            return all_tables[0].slice(0, 0)
        t = tables[0] if len(tables) == 1 else pa.concat_tables(tables)
        t = t.combine_chunks()
        idx = pc.sort_indices(
            t, sort_keys=[("host", "ascending"), ("order_key", "ascending")]
        )
        t = t.take(idx)
        hosts = t.column("host").to_pylist()
        hashes = t.column("url_hash").to_numpy(zero_copy_only=False)
        paths = t.column("path").to_pylist()
        n = len(hosts)
        out = np.empty(n, dtype=np.int8)
        jar_cookies = [""] * n
        start = 0
        for i in range(1, n + 1):
            if i == n or hosts[i] != hosts[start]:
                out[start:i] = self.admit(
                    hosts[start], hashes[start:i], paths[start:i], rnd
                )
                jar = self.jar.get(hosts[start])
                if jar:
                    enc = json.dumps(jar, sort_keys=True)
                    jar_cookies[start:i] = [enc] * (i - start)
                start = i
        t = t.append_column("admit", pa.array(out, pa.int8()))
        return t.append_column(
            "jar_cookies", pa.array(jar_cookies, pa.string())
        )

    def update_cookies(self, updates: dict[str, dict[str, str]]) -> None:
        """Merge one round's harvested Set-Cookie payloads for this
        shard's hosts (already folded in canonical order by the
        engine — last write per name wins)."""
        for host, cookies in updates.items():
            self.jar.setdefault(host, {}).update(cookies)

    # -- introspection / checkpoint ----------------------------------
    def seen_count(self) -> int:
        return len(self.seen)

    def dump_seen(self) -> np.ndarray:
        return self.seen.dump()

    def snapshot(self) -> dict:
        return {
            "seen": self.seen.snapshot(),
            "tokens": {h: list(v) for h, v in self.tokens.items()},
            "jar": {h: dict(c) for h, c in self.jar.items()},
        }

    def restore(self, state: dict) -> None:
        self.seen = restore_seen_table(state["seen"])
        self.tokens = {h: list(v) for h, v in state["tokens"].items()}
        self.jar = {h: dict(c) for h, c in state.get("jar", {}).items()}
