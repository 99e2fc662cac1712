"""Admission shard actors: URL-seen set + per-host politeness tokens.

One :class:`AdmissionShard` owns a slice of the host space
(``fnv1a64(host) % n_shards``), holding BOTH the seen-set entries and
the token-bucket state for its hosts (SURVEY.md §2.4 ST4/ST5).  Keying
the seen set by host (rather than by url hash) co-locates all state one
frontier host-group needs, so the engine makes exactly **one** batch
actor RPC per shard per round (:meth:`admit_table`) — no fan-out to
every seen shard, no per-host RPCs, no groupby shuffle.

Trade-off: a single enormous host concentrates its seen entries AND
its per-round admission work on one shard.  Mitigation (implemented —
SURVEY §2.4/VERDICT r3 item 6): hosts named in ``hot_hosts`` are
promoted to TWO-LEVEL sharding — their rows route by ``fnv1a64(host #
url_hash-bucket) % n_shards`` so the O(rows) dup/seen/robots screening
spreads across shards, while the tiny token-bucket + cookie-jar state
stays on the host's HOME shard (``fnv1a64(host) % n_shards``).
Admission for a promoted host is two-phase: each bucket shard screens
locally and parks the candidates (within-round duplicates share a url
hash ⇒ the same bucket shard, so local dup detection is globally
exact), returning only its candidate COUNT; the engine sums counts,
draws ``k = min(floor(tokens), total)`` from the home shard, and — only
when ``k < total`` — pulls each shard's ``k`` smallest candidate
order-keys (:meth:`AdmissionShard.hot_keys`) to derive the global admit
threshold, then finalizes each shard's parked rows — admit the
globally k smallest, defer the rest.  Identical semantics to
the one-shot path (canonical order = ascending order_key within a
host), with per-round wall time bounded by rows/shard, not rows/host.

``hot_hosts`` may grow mid-crawl through the engine's DYNAMIC
promotion protocol (never shrink, never change routing for an
already-promoted host): when per-round host stats show a host
exceeding the shard-imbalance threshold, the engine (a) replays the
host's admitted-url hashes from the durable trace into the bucket
shards the new routing probes (:meth:`seen_ingest`), (b) flips the
host hot on every shard (:meth:`promote_hosts`), and (c) records the
promotion in the round manifest BEFORE the checkpoint snapshot — so
resumes restore the promoted set with bucket-shard snapshots that
already contain the migrated entries.  The host's pre-promotion
entries remain as unreachable garbage in the home shard's seen set
(hash-only backends cannot delete by host); membership stays exact
because promoted routing never consults the home shard.  Demotion is
unsupported — that WOULD mis-route, the same contract as changing
``n_admission_shards``.

Determinism: hosts are disjoint across groups, and within a shard all
per-host state is independent, so concurrent calls for different hosts
commute.  Token refill uses the elapsed-rounds closed form
``min(burst, tokens + rate * elapsed)`` which equals the simulator's
per-round refill loop exactly.
"""

from __future__ import annotations

import json
import os

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
        hot_hosts: tuple[str, ...] = (),
        promote_floor: int = 0,
    ) -> None:
        self.seen = make_seen_table(seen_backend, seen_capacity)
        self.disallow = robots_disallow or {}
        self.rates = robots_rates or {}
        self.default = (default_rate, default_burst)
        self.hot_hosts = frozenset(hot_hosts)
        # dynamic-promotion detection: non-hot host runs of at least
        # this many rows are reported (host -> rows) under the reserved
        # "" key of admit_table's meta so the engine can apply its
        # shard-imbalance promotion rule; 0 disables the bookkeeping
        self.promote_floor = int(promote_floor)
        # (round, host) -> parked candidate sub-table awaiting phase 2
        self._pending_hot: dict = {}
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
        paths,  # list[str] | pa.Array slice (see _screen)
        rnd: int,
    ) -> np.ndarray:
        """Disposition per row, rows given in canonical order.

        Pipeline per row (matches ``simulator.simulate`` step 5):
        within-round dup → already-seen → robots → token bucket.
        Only admitted rows are marked seen (deferred rows must survive
        to a later round).
        """
        url_hashes = np.ascontiguousarray(url_hashes, dtype=np.uint64)
        out, candidates = self._screen(host, url_hashes, paths)

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

    def _screen(self, host: str, url_hashes: np.ndarray, paths):
        """dup/seen/robots screening (phase 1 of admission; tokenless).
        Returns (codes, candidate row indices in canonical order).

        ``paths`` may be a Python list OR an Arrow array slice — it is
        materialized to Python strings only when the host actually has
        robots prefixes, so hosts without robots rules (the vast
        majority) never pay a per-row ``.as_py`` conversion."""
        n = len(url_hashes)
        out = np.full(n, DEFER, dtype=np.int8)

        # within-round dedup: first occurrence in canonical order wins
        _, first_idx = np.unique(url_hashes, return_index=True)
        is_first = np.zeros(n, dtype=bool)
        is_first[first_idx] = True
        out[~is_first] = DUP

        # already crawled in an earlier round
        already = self.seen.contains(url_hashes)
        out[is_first & already] = SEEN
        candidates = np.flatnonzero(is_first & ~already)

        # robots disallow prefixes
        prefixes = self.disallow.get(host)
        if prefixes:
            if not isinstance(paths, list):
                paths = paths.to_pylist()
            keep = []
            for i in candidates.tolist():
                if any(paths[i].startswith(p) for p in prefixes):
                    out[i] = ROBOTS
                else:
                    keep.append(i)
            candidates = np.array(keep, dtype=np.int64)
        return out, candidates

    def admit_table(self, rnd: int, *tables):
        """Batch admission for ALL of this shard's hosts in one RPC.

        ``tables`` are the per-block sub-tables routed to this shard
        (``fnv1a64(host) % n_shards``; two-level for ``hot_hosts``).
        Rows are sorted (host, order_key) so each host's run is
        processed in canonical order — identical per-host semantics to
        per-host :meth:`admit` calls, with one RPC per shard per round
        instead of one per host (the per-host ``groupby.map_groups``
        shuffle cost ~3 s/round of fixed overhead regardless of round
        size).

        Returns ``(table, hot_meta)``.  Rows of promoted hosts are NOT
        in ``table`` — they are screened (phase 1), parked, and later
        released by :meth:`finalize_hot`; ``hot_meta`` maps each parked
        host to its candidate count (tiny).  When the engine's token
        draw for a host is below its candidate total it pulls the
        draw-bounded smallest order-keys via :meth:`hot_keys` to pick
        the global admit threshold.
        """
        import pyarrow as pa
        import pyarrow.compute as pc

        # a round that died between phase 1 and phase 2 replays in
        # full — its parked rows are garbage
        for key in [k for k in self._pending_hot if k[0] != rnd]:
            del self._pending_hot[key]

        all_tables = list(tables)
        if not all_tables:
            return None, {}
        # empty blocks can surface with a pre-canonicalize schema
        # (engine _split_canon hedges likewise) — drop them BEFORE
        # concat or pa.concat_tables raises on the schema mismatch
        tables = [t for t in all_tables if t.num_rows]
        if not tables:
            return all_tables[0].slice(0, 0), {}
        t = tables[0] if len(tables) == 1 else pa.concat_tables(tables)
        t = t.combine_chunks()
        idx = pc.sort_indices(
            t, sort_keys=[("host", "ascending"), ("order_key", "ascending")]
        )
        t = t.take(idx)
        n = t.num_rows
        # host-run detection stays vectorized: dictionary-encode the
        # sorted host column and diff the integer codes — per-row
        # Python (a full to_pylist + string-compare loop) would make
        # this RPC O(rows) Python at a millions-row round budget.
        # Per-host work below is O(distinct hosts) Python.
        enc = pc.dictionary_encode(t.column("host")).combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        host_dict = enc.dictionary
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        ends = np.r_[starts[1:], n]
        hashes = t.column("url_hash").to_numpy(zero_copy_only=False)
        path_col = t.column("path")
        out = np.empty(n, dtype=np.int8)
        keep = np.ones(n, dtype=bool)
        jar_spans: list[tuple[int, int, str]] = []
        hot_meta: dict[str, dict] = {}
        big_rows: dict[str, int] = {}
        for s0, s1 in zip(starts.tolist(), ends.tolist()):
            host = host_dict[int(codes[s0])].as_py()
            if host in self.hot_hosts:
                run_hashes = np.ascontiguousarray(
                    hashes[s0:s1], dtype=np.uint64
                )
                h_codes, cand = self._screen(
                    host, run_hashes, path_col.slice(s0, s1 - s0)
                )
                sub = t.slice(s0, s1 - s0)
                self._pending_hot[(rnd, host)] = (sub, h_codes, cand)
                # phase-1 meta is the candidate COUNT only — keys
                # are pulled in phase 2 (hot_keys) and only for
                # hosts whose token draw is below their candidate
                # total, bounded by the draw k, never by burst
                # (burst can be 1<<30; shipping burst-bounded key
                # lists here would be candidate-sized)
                hot_meta[host] = {"n": int(len(cand))}
                keep[s0:s1] = False
            else:
                out[s0:s1] = self.admit(
                    host, hashes[s0:s1], path_col.slice(s0, s1 - s0), rnd
                )
                jar = self.jar.get(host)
                if jar:
                    jar_spans.append(
                        (s0, s1, json.dumps(jar, sort_keys=True))
                    )
                if self.promote_floor and (s1 - s0) >= self.promote_floor:
                    big_rows[host] = s1 - s0
        jar_cookies = np.full(n, "", dtype=object)
        for s0, s1, enc_json in jar_spans:
            jar_cookies[s0:s1] = enc_json
        if not keep.all():
            t = t.filter(pa.array(keep))
            out = out[keep]
            jar_cookies = jar_cookies[keep]
        t = t.append_column("admit", pa.array(out, pa.int8()))
        if big_rows:
            # reserved "" key (never a valid host): detection stats for
            # the engine's dynamic-promotion rule; stripped before
            # _finalize_hot ever sees the meta
            hot_meta[""] = {"rows": big_rows}
        return t.append_column(
            "jar_cookies", pa.array(jar_cookies, pa.string())
        ), hot_meta

    def draw_hot(self, rnd: int, requests: dict[str, int]) -> dict:
        """Phase-2 token draw for promoted hosts whose token-bucket and
        cookie-jar state lives on THIS (home) shard.  For each host:
        refill per the closed form, draw ``k = min(floor(tokens),
        candidates)``, and return ``(k, jar_json)`` — the same numbers
        the one-shot path would have used."""
        out = {}
        for host, total in requests.items():
            tokens = self._bucket(host, rnd)
            k = min(int(tokens), int(total))
            if k:
                self.tokens[host][0] = tokens - k
            jar = self.jar.get(host)
            out[host] = (k, json.dumps(jar, sort_keys=True) if jar else "")
        return out

    def hot_keys(self, rnd: int, wants: dict[str, int]) -> dict:
        """Phase-2 key pull for OVER-DRAW hosts only: for each host,
        return this shard's ``min(want, candidates)`` smallest parked
        candidate order-keys (candidates are already in canonical
        order).  ``want`` is the host's actual token draw ``k`` — the
        engine needs the global k-th smallest key, and each of the k
        globally-smallest keys is within the k smallest of its own
        shard, so this bounded pull is exact.  Vectorized ``take``;
        driver traffic is O(k) keys per shard, independent of burst
        and of the candidate total."""
        import pyarrow as pa

        out = {}
        for host, want in wants.items():
            parked = self._pending_hot.get((rnd, host))
            if parked is None:
                continue
            sub, _, cand = parked
            head = cand[: max(0, int(want))]
            if len(head):
                out[host] = sub.column("order_key").take(
                    pa.array(head)
                ).to_pylist()
        return out

    def finalize_hot(self, rnd: int, thresholds: dict, jars: dict):
        """Phase 2: finalize this shard's parked hot-host rows for
        ``rnd`` and return them as one table (same schema as
        :meth:`admit_table`'s).  ``thresholds[host]`` is the global
        admit cut the engine derived from the merged top-key lists:
        ``"ALL"`` admits every candidate, a ``bytes`` order-key admits
        candidates with key <= it, absent admits none (tokens
        exhausted).  Admitted rows are marked seen HERE — on the bucket
        shard that owns their url-hash slice — so later-round probes
        (routed identically) see them."""
        import pyarrow as pa

        parts = []
        for key in sorted(k for k in self._pending_hot if k[0] == rnd):
            _, host = key
            sub, codes, cand = self._pending_hot.pop(key)
            thr = thresholds.get(host)
            if len(cand) and thr is not None:
                if thr == "ALL":
                    adm = cand
                else:
                    # vectorized Arrow compare — this is the hot-host
                    # path, whose whole point is avoiding O(rows)
                    # Python per RPC; a to_pylist + per-key loop here
                    # re-introduced exactly that cost on over-draw
                    # rounds
                    import pyarrow.compute as pc_

                    keys = sub.column("order_key").take(pa.array(cand))
                    mask = pc_.less_equal(
                        keys, pa.scalar(thr, pa.binary())
                    ).to_numpy(zero_copy_only=False)
                    adm = cand[np.asarray(mask, dtype=bool)]
                if len(adm):
                    codes[adm] = ADMIT
                    h = sub.column("url_hash").to_numpy(zero_copy_only=False)
                    self.seen.add(np.ascontiguousarray(h[adm],
                                                       dtype=np.uint64))
            sub = sub.append_column("admit", pa.array(codes, pa.int8()))
            sub = sub.append_column(
                "jar_cookies",
                pa.array([jars.get(host, "")] * sub.num_rows, pa.string()),
            )
            parts.append(sub)
        if not parts:
            return None
        return parts[0] if len(parts) == 1 else pa.concat_tables(parts)

    def update_cookies(self, updates: dict[str, dict[str, str]]) -> None:
        """Merge one round's harvested Set-Cookie payloads for this
        shard's hosts (already folded in canonical order by the
        engine — last write per name wins)."""
        for host, cookies in updates.items():
            self.jar.setdefault(host, {}).update(cookies)

    def ping(self, table=None) -> bool:
        """Warmup RPC: the engine fires one (async, never awaited)
        right after constructing the shard pool so actor process spawn
        + imports + Arrow compute-kernel init + the first object-store
        table fetch all overlap the pre-round phases (store build, seed
        write, canonicalize) instead of landing on round 0's first
        admit_table — cold-measured ~0.7 s per actor (kernel registry
        + plasma/IPC deserialize paths); warmed, the same RPC is
        ~10 ms.  ``table`` is a tiny ray.put table whose only job is
        exercising the arg-fetch path; its contents are ignored."""
        import pyarrow as pa
        import pyarrow.compute as pc

        t = pa.table({"host": pa.array(["a"]),
                      "order_key": pa.array([b"x"], pa.binary())})
        pc.sort_indices(t, sort_keys=[("host", "ascending"),
                                      ("order_key", "ascending")])
        pc.dictionary_encode(t.column("host").combine_chunks())
        self.seen.contains(np.zeros(1, dtype=np.uint64))
        return True

    # -- dynamic hot-host promotion (engine-driven; see module doc) --
    def promote_hosts(self, hosts) -> None:
        """Flip hosts hot on this shard (idempotent, grow-only).  The
        engine calls this on EVERY shard at a promotion boundary (and
        again on resume, from the manifest's promoted set) so routing
        and parking agree cluster-wide from the next round on."""
        self.hot_hosts = self.hot_hosts | frozenset(hosts)

    def seen_ingest(self, hashes: np.ndarray) -> int:
        """Bulk-add url hashes to this shard's seen set — the migration
        sink at a promotion boundary: the engine replays a newly-hot
        host's admitted urls (from the durable trace) into the bucket
        shards its two-level routing will probe."""
        if len(hashes):
            self.seen.add(np.ascontiguousarray(hashes, dtype=np.uint64))
        return len(self.seen)

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
        self._pending_hot.clear()  # parked rows are round-transient

    def snapshot_to(self, path: str) -> None:
        """Write this shard's checkpoint npz SHARD-side — ``path`` is
        under the engine workdir, which the run-start storage guard
        requires to be cluster-shared on multi-node.  The driver never
        receives the seen table (at the 10^10-key design point a
        shard's table is GBs; shipping it through ``ray.get`` every
        checkpointed round was the last driver-sized transfer in the
        loop) and the npz compression runs on the shards in parallel
        instead of serially on the driver.  Atomic tmp+rename so a
        crash mid-write can't leave a torn file under a
        manifest-committed round."""
        snap = self.snapshot()
        tmp = f"{path}.tmp"
        with open(tmp, "wb") as f:
            np.savez_compressed(
                f,
                tokens=json.dumps(snap["tokens"]),
                jar=json.dumps(snap["jar"]),
                **{f"seen_{k}": v for k, v in snap["seen"].items()},
            )
            # rename alone orders nothing against the page cache: a
            # power loss after os.replace can still surface a
            # zero-length/truncated npz under a manifest-committed
            # round.  fsync file THEN rename THEN fsync the dir.
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        dfd = os.open(os.path.dirname(path) or ".", os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    def restore_from(self, path: str) -> None:
        """Load this shard's checkpoint npz SHARD-side (reverse of
        :meth:`snapshot_to`; understands the pre-round-3 single-array
        layout too) — the driver sends only the path."""
        with np.load(path) as z:
            seen_state = {
                k[len("seen_"):]: z[k]
                for k in z.files
                if k.startswith("seen_")
            }
            if not seen_state:  # pre-round-3 checkpoint layout
                seen_state = {"table": z["table"]}
            state = {
                "seen": seen_state,
                "tokens": json.loads(str(z["tokens"])),
                "jar": json.loads(str(z["jar"])) if "jar" in z.files else {},
            }
        self.restore(state)
