"""The Ray-Data-native crawl engine: BFS micro-batch round loop.

The reference's continuous queue-consumer loop (``crawler.go:119-144``)
becomes per-round Dataset pipelines (SURVEY.md §3.4):

    round K:  read frontier ∪ spill (Parquet)
              → canonicalize (map_batches; M1/M2)
              → [priority sort + budget split when over budget]  (O2)
              → explicit hash partition by host shard → one batch
                admission RPC per shard actor                    (ST4/ST5)
              → fetch join (J1) → ExtractActor pool (M6/M7, F1-F9)
              → links → round K+1 frontier; records/errors/trace sinks
              → snapshot shard state + atomic manifest            (§4.3)

Scale notes (the 100 TB design points, tested here at fixture scale):

* host partitioning is an explicit per-block split keyed
  ``fnv1a64(host) % n_shards`` feeding one batch RPC per stateful
  admission shard — co-partitioned with the shard-owned seen/token
  state, so no all-to-all shuffle runs in the common path.  The only
  per-round shuffle is the priority sort, and only when the pending
  frontier exceeds the round budget.
* every sink is per-round partitioned Parquet, so a killed run resumes
  at the last committed manifest without recomputing finished rounds.
* the frontier never materializes outside the object store; the round
  budget bounds every downstream stage.
* hot hosts are bounded by the token bucket: a host admits at most
  ``burst + rate·rounds`` fetches no matter how many links point at it;
  residual skew lands in the deferred spill, not in a task.
"""

from __future__ import annotations

import gc
import json
import os
import pathlib
import shutil
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from crawl_ray.schemas import ERRORS_SCHEMA, FRONTIER_SCHEMA, seq_root
from crawl_ray.simulator import CrawlConfig
from crawl_ray.sources.pages import (
    BroadcastPageStore,
    BucketedPageStore,
    build_broadcast_index,
)
from crawl_ray.stages.canonicalize import canonicalize_batch
from crawl_ray.stages.extract import (
    ExtractActor,
    links_to_frontier,
    make_fetch_fn,
)
from crawl_ray.state.admission import ADMIT, DEFER, DUP, ROBOTS, SEEN, AdmissionShard
from crawl_ray.urlnorm import fnv1a64_batch

__all__ = ["EngineConfig", "CrawlEngine", "CrawlRunResult"]


@dataclass
class EngineConfig(CrawlConfig):
    """CrawlConfig (shared with the simulator — identical semantics) +
    physical execution knobs."""

    n_admission_shards: int = 4
    # max fetch+extract tasks in flight at once; 0 = uncapped (let the
    # Ray scheduler fan out across the cluster).  Set to throttle the
    # crawl's CPU footprint on a shared cluster.
    extract_concurrency: int = 0
    extract_batch_size: int = 256
    # rounds at or below this many pending rows canonicalize + budget-split
    # on the driver (one ray.put) instead of paying the distributed
    # task chain's scheduling round trips; large rounds — the 10^10
    # design point — fan out as fused read+canonicalize(+partition)
    # tasks per row-group chunk
    small_round_threshold: int = 65536
    # target rows per fused read+canonicalize task on the distributed
    # path (consecutive row groups are grouped up to this size; a row
    # group larger than it stays one task)
    canon_chunk_rows: int = 32768
    # max rows per round-0 frontier part: seeds are written in multiple
    # parquet parts so the first round's canonicalize fans out across
    # the cluster instead of reading one giant file
    seed_part_rows: int = 8192
    page_store: str = "broadcast"  # "broadcast" | "bucketed"
    n_page_buckets: int = 64
    # URL-seen backend: "auto" (the default — exact below 10^7 keys per
    # shard, cuckoo at or above: the ST4 memory envelope is the DEFAULT
    # behavior at the 10^10 design point, not an option), "exact" (full
    # 64-bit keys; dump/parity-capable), "cuckoo" (16-bit fingerprints,
    # ~2.4 B/key; ≈1.2e-4 false-positive rate means a rare URL is
    # silently never crawled) or "bloom" (2 B/key bit array, ≈4.6e-4
    # FPR, no overflow cliff — degrades smoothly past capacity).
    # seen_capacity is PER SHARD and fixed at construction for the
    # cuckoo and bloom backends.
    seen_backend: str = "auto"
    seen_capacity: int = 1 << 16
    # max rows per overflow-spill parquet part: bounds individual spill
    # file sizes (resumable output — never one giant file) independent
    # of how Ray's sort blocked the over-budget tail
    spill_max_part_rows: int = 1 << 20
    checkpoint_interval: int = 1  # snapshot state every N rounds
    keep_trace: bool = True
    # Hosts promoted to TWO-LEVEL admission sharding (a handful of
    # enormous hosts holding an outsized frontier share — see
    # state/admission.py): their rows route by (host, url_hash-bucket)
    # so screening spreads across shards; token/jar state stays on the
    # home shard and is drawn once per round (phase 2).  This tuple is
    # the STATIC part of the promoted set; hosts that become hot
    # mid-crawl are promoted AUTOMATICALLY (below) and persisted in the
    # round manifest, so a resume restores them.  The set only grows.
    hot_hosts: tuple[str, ...] = ()
    # Dynamic promotion (A2 host stats → salting decision, SURVEY
    # §4.2): promote a host when its single round's admission rows
    # reach max(hot_promote_min_rows, hot_promote_factor × round
    # pending / n_shards) — i.e. the host alone carries several
    # shards' worth of screening work.  At the boundary the engine
    # replays the host's admitted urls from the trace into the bucket
    # shards (seen migration), so auto-promotion requires
    # keep_trace=True (it is silently inert otherwise).
    hot_host_auto: bool = True
    hot_promote_factor: float = 4.0
    hot_promote_min_rows: int = 4096
    # Fire one async no-op fetch+extract setup task per cluster CPU at
    # run start so module import + page-store deref happen OFF the
    # round loop's critical path (cold first run measured 2.2x the warm
    # one; the warmup otherwise lands inside the first big rounds).
    prewarm_workers: bool = True


@dataclass
class CrawlRunResult:
    workdir: str
    rounds: int = 0
    admitted: int = 0
    records: int = 0
    links: int = 0
    errors: int = 0
    metrics: list[dict] = field(default_factory=list)

    def _read_all(self, sub: str) -> pa.Table | None:
        tables = []
        for rd in sorted(pathlib.Path(self.workdir).glob("round=*")):
            d = rd / sub
            if d.exists():
                files = sorted(str(f) for f in d.glob("*.parquet"))
                tables.extend(pq.read_table(f) for f in files)
        tables = [t for t in tables if t.num_rows]
        if not tables:
            return None
        return pa.concat_tables(tables, promote_options="default")

    def records_table(self) -> pa.Table | None:
        return self._read_all("records")

    def errors_table(self) -> pa.Table | None:
        return self._read_all("errors")

    def trace_table(self) -> pa.Table | None:
        return self._read_all("trace")


def _validate_seeds(seeds: pa.Table) -> None:
    """Fail fast on a malformed seeds table.  The costly trap: a
    ``callbacks`` column that is not ``list<string>`` (e.g. built with
    ``set_column(..., [["list"], ...])``, which Arrow silently infers
    as a plain string column) — every row then routes to NO handler and
    the crawl completes with zero records and zero errors."""
    if "url" not in seeds.column_names:
        raise ValueError("seeds table needs a string 'url' column")
    ut = seeds.column("url").type
    if not (pa.types.is_string(ut) or pa.types.is_large_string(ut)):
        raise ValueError(f"seeds 'url' must be string, got {ut}")
    if "callbacks" in seeds.column_names:
        t = seeds.column("callbacks").type
        ok = (
            pa.types.is_list(t) or pa.types.is_large_list(t)
        ) and (
            pa.types.is_string(t.value_type)
            or pa.types.is_large_string(t.value_type)
        )
        if not ok:
            raise ValueError(
                f"seeds 'callbacks' must be list<string>, got {t} — build "
                "it with pa.array(rows, pa.list_(pa.string()))"
            )


def _robots_maps(robots: pa.Table | None):
    disallow: dict[str, list[str]] = {}
    rates: dict[str, tuple[float, int]] = {}
    if robots is not None:
        d = robots.to_pydict()
        for i, host in enumerate(d["host"]):
            if d["disallow_prefixes"][i]:
                disallow[host] = list(d["disallow_prefixes"][i])
            rates[host] = (float(d["rate_per_sec"][i]), int(d["burst"][i]))
    return disallow, rates


def _write(table: pa.Table, directory: pathlib.Path, name: str = "part-0.parquet") -> None:
    directory.mkdir(parents=True, exist_ok=True)
    pq.write_table(table, directory / name)


class CrawlEngine:
    """Assemble with spiders (U3) + config; ``run`` owns the loop.

    Does NOT call ``ray.init`` — the caller (driver, tests, bench CLI)
    owns the Ray session.
    """

    def __init__(
        self,
        spiders: list,
        config: EngineConfig | None = None,
        fetch_stage_factory=None,
    ) -> None:
        self.spiders = list(spiders)
        self.cfg = config or EngineConfig()
        # pluggable fetch (SURVEY S3 / crawler.go:180): a module-level
        # callable ``store -> stage`` where the stage maps a frontier
        # batch to the fetch batch contract (see crawl_ray.stages.fetch)
        # — default is the page-store lookup; a live-HTTP deployment
        # passes ``lambda _store: HttpFetchStage(...)``
        self.fetch_stage_factory = fetch_stage_factory
        # content-addressed worker-cache token: __qualname__ alone
        # cannot tell two `lambda _s: HttpFetchStage(transport=X)`
        # closures apart, so a second run in the same Ray session
        # would silently reuse the FIRST run's fetch stage from the
        # per-process worker cache.  Pickle bytes distinguish distinct
        # closures/configs exactly (identical bytes → safe reuse).
        import hashlib as _hashlib

        from ray import cloudpickle as _cp

        self._worker_token = _hashlib.blake2b(
            _cp.dumps((self.spiders, self.fetch_stage_factory)),
            digest_size=8,
        ).hexdigest()

    # -- seeds -------------------------------------------------------
    def write_seeds(self, seeds: pa.Table, workdir: str) -> None:
        """Round-0 frontier injection (the ``crawl-schedule`` analog)."""
        n = seeds.num_rows
        seeds = seeds.append_column(
            "seq_path", pa.array([seq_root(i) for i in range(n)], pa.binary())
        )
        front = pathlib.Path(workdir) / "round=0" / "frontier"
        step = max(1, int(self.cfg.seed_part_rows))
        for j, off in enumerate(range(0, max(n, 1), step)):
            _write(seeds.slice(off, step), front, f"part-{j}.parquet")

    # -- checkpoint helpers ------------------------------------------
    # (no manifest-only variant here: _resumable_round — manifest AND
    # snapshot-complete — is the ONE resume anchor; a second
    # semantically-weaker helper invited exactly the confusion commit
    # 5574d7d fixed)
    @staticmethod
    def _resumable_round(workdir: pathlib.Path, n_shards: int) -> int | None:
        """Latest manifest-committed round whose state snapshot is
        COMPLETE for this engine's shard count — the round
        ``run(resume=True)`` restores from.  ``checkpoint_interval > 1``
        leaves committed rounds WITHOUT state; those re-run
        deterministically from the older snapshot instead of restoring
        a seen-set that is missing their additions (or crashing on the
        absent npz).  A snapshot written with a DIFFERENT shard count
        is a hard error: seen entries are sharded ``fnv1a64(host) %
        n_shards``, so restoring a subset would silently re-crawl —
        the shard count is static across a crawl including resumes."""
        best = None
        for d in workdir.glob("round=*"):
            if not (d / "manifest.json").exists():
                continue
            state = d / "state"
            have = len(list(state.glob("shard_*.npz"))) if state.exists() else 0
            if have == 0:
                continue  # committed between checkpoints — re-runnable
            if have != n_shards:
                raise ValueError(
                    f"{d / 'state'} holds {have} shard snapshot(s) but the "
                    f"engine is configured with n_admission_shards="
                    f"{n_shards} — the shard count must be static across "
                    "a crawl, including resumes"
                )
            k = int(d.name.split("=")[1])
            best = k if best is None else max(best, k)
        return best

    def _snapshot(self, shards, round_dir: pathlib.Path) -> None:
        # each shard writes its own npz (seen-table state keyed by
        # backend: "table" for exact, "cuckoo_table"/"stash"/"count"
        # for ST4) under the shared workdir — the seen tables are
        # GB-sized at the 10^10-key design point and must never ship
        # through the driver; compression runs on the shards in
        # parallel instead of serially here
        state_dir = round_dir / "state"
        state_dir.mkdir(parents=True, exist_ok=True)
        ray.get([
            s.snapshot_to.remote(str(state_dir / f"shard_{i}.npz"))
            for i, s in enumerate(shards)
        ])

    @staticmethod
    def _restore(shards, round_dir: pathlib.Path) -> None:
        ray.get([
            shard.restore_from.remote(
                str(round_dir / "state" / f"shard_{i}.npz")
            )
            for i, shard in enumerate(shards)
        ])

    # -- the loop ----------------------------------------------------
    def build_store(self, pages_path: str):
        """Build the page store handle (J1). Separated from ``run`` so
        callers can prepare it outside a timed region — at real scale
        the pages table layout exists on disk and fetch is
        partition-local; the driver-built broadcast index is the
        small-corpus shortcut."""
        if self.cfg.page_store == "bucketed":
            return BucketedPageStore(pages_path)  # workers open files
        from crawl_ray.sources.pages import fetch_read_columns

        cols = fetch_read_columns(pq.read_schema(pages_path).names)
        index = build_broadcast_index(pq.read_table(pages_path, columns=cols))
        return ray.put(BroadcastPageStore(index))

    def run(
        self,
        pages_path: str,
        seeds: pa.Table | None,
        robots: pa.Table | None,
        workdir: str,
        resume: bool = False,
        store=None,
        stop=None,
    ) -> CrawlRunResult:
        cfg = self.cfg
        if seeds is not None:
            _validate_seeds(seeds)
        # frontier shards, spill, records and trace parts are written
        # TASK-side under workdir — on a multi-node cluster it must be
        # shared storage (crawl_ray.storage root-is-shared contract)
        from crawl_ray.storage import check_multinode_storage

        check_multinode_storage("CrawlEngine.run workdir", workdir)
        wd = pathlib.Path(workdir)
        # a workdir seeded via the `seed` CLI (round-0 frontier present,
        # no seeds table passed) is input, not stale state — keep it.
        # Also reached by resume=True when NO round ever committed
        # (seeded but never run): start fresh from the seeds rather
        # than refusing.
        pre_seeded = (
            seeds is None
            and any((wd / "round=0" / "frontier").glob("*.parquet"))
        )
        if not resume and wd.exists() and not pre_seeded:
            shutil.rmtree(wd)
        wd.mkdir(parents=True, exist_ok=True)

        disallow, rates = _robots_maps(robots)
        # num_cpus=0: shards are near-idle coordinators (brief batch RPCs
        # during the admission phase only); reserving fractional CPUs
        # permanently steals map-task slots — measured 25% of the
        # scheduler at num_cpus=4 — and distorts N-vs-4N comparisons
        ShardActor = ray.remote(num_cpus=0)(AdmissionShard)
        self.shutdown_shards()  # a prior run's actors would leak otherwise
        # detection floor for dynamic promotion: shards report non-hot
        # host runs at/above it (tiny dict per round); inert without
        # keep_trace — the promotion boundary replays seen urls from it
        promote_floor = (
            cfg.hot_promote_min_rows
            if cfg.hot_host_auto and cfg.keep_trace else 0
        )
        shards = [
            ShardActor.remote(
                disallow,
                rates,
                cfg.default_rate,
                cfg.default_burst,
                cfg.seen_backend,
                cfg.seen_capacity,
                tuple(cfg.hot_hosts),
                promote_floor,
            )
            for _ in range(cfg.n_admission_shards)
        ]
        # dynamically promoted hosts (manifest-persisted, grow-only);
        # static cfg.hot_hosts are NOT recorded here
        self._promoted: set[str] = set()
        # register immediately so an exception mid-run still lets the
        # caller's `finally: shutdown_shards()` reclaim the actors
        self._shards = shards
        # async spawn warmup: actor fork + imports + Arrow kernel init
        # + first plasma table fetch (~0.7 s/actor cold, measured)
        # overlap the store build / seed write / first canon instead of
        # blocking round 0's first admit_table RPC; refs held so Ray
        # can't cancel the queued pings
        warm_tbl = ray.put(pa.table({"w": pa.array([0], pa.int8())}))
        self._shard_pings = [s.ping.remote(warm_tbl) for s in shards]

        # page store (J1): broadcast index or bucketed partition-local
        if store is None:
            store = self.build_store(pages_path)

        # fetch+extract runs as plain tasks (per-process setup cache in
        # _fetch_extract_task); box the store ref so it ships by
        # reference, not by value, with every task submission
        store_box = [store]

        if cfg.prewarm_workers:
            # async: refs held on the engine (dropping them would let
            # Ray cancel queued warmup tasks), never ray.get — the
            # warmup overlaps the early small rounds
            n_warm = min(int(ray.cluster_resources().get("CPU", 8)), 64)
            self._prewarm_refs = [
                _prewarm_worker.remote(
                    store_box, self.spiders, cfg.max_depth,
                    self.fetch_stage_factory, self._worker_token,
                )
                for _ in range(n_warm)
            ]

        start_round = 0
        if resume:
            committed = self._resumable_round(wd, cfg.n_admission_shards)
            if committed is not None and seeds is not None:
                # the resume path never re-reads a seeds table — it
                # would be VALIDATED then silently dropped.  Refuse
                # loudly; the supported top-up flows are the `seed`
                # CLI (parts re-injected by `run --follow --resume`)
                # and --follow --seeds (converted to a seed part).
                raise ValueError(
                    "a seeds table cannot be applied to a resumed run "
                    "with committed rounds (it would be silently "
                    "ignored): seed via the `seed` CLI or --follow"
                )
            if committed is not None:
                self._restore(shards, wd / f"round={committed}")
                # restore dynamically promoted hosts from the manifest:
                # their seen entries live on bucket shards inside the
                # snapshots just restored, so routing must match
                manifest = json.loads(
                    (wd / f"round={committed}" / "manifest.json").read_text()
                )
                self._promoted = set(manifest.get("promoted_hosts", []))
                if self._promoted:
                    ray.get([
                        s.promote_hosts.remote(sorted(self._promoted))
                        for s in shards
                    ])
                start_round = committed + 1
                # A mid-round kill leaves partial task-side files from
                # the uncommitted round: its own outputs under
                # round=start_round/ and next-round frontier/spill parts
                # under round=start_round+1/.  The manifest is the ONLY
                # commit point — everything past it is garbage and must
                # go, or the re-run double-counts stale parts.
                for d in wd.glob("round=*"):
                    k = int(d.name.split("=")[1])
                    if k > start_round:
                        shutil.rmtree(d)
                    elif k == start_round:
                        # keep frontier+spill (written & committed by
                        # round `committed`); drop partial outputs
                        for sub in ("trace", "records", "errors", "state"):
                            shutil.rmtree(d / sub, ignore_errors=True)
                        (d / "metrics.json").unlink(missing_ok=True)
        if start_round == 0:
            if seeds is None and not pre_seeded:
                raise ValueError(
                    "seeds required for a fresh run (or seed the workdir "
                    "first with the `seed` CLI)"
                )
            if seeds is not None:
                for stale in wd.glob("round=*"):
                    shutil.rmtree(stale)
                self.write_seeds(seeds, workdir)
            else:
                # pre-seeded: keep round-0 frontier, drop any stale
                # later rounds / outputs from a previous run
                for d in wd.glob("round=*"):
                    if int(d.name.split("=")[1]) > 0:
                        shutil.rmtree(d)
                for sub in ("trace", "records", "errors", "state", "spill"):
                    shutil.rmtree(wd / "round=0" / sub, ignore_errors=True)
                (wd / "round=0" / "metrics.json").unlink(missing_ok=True)
                (wd / "round=0" / "manifest.json").unlink(missing_ok=True)

        result = CrawlRunResult(workdir=workdir)
        result.rounds = start_round

        self._run_rounds(wd, cfg, shards, store_box, result, start_round, stop)

        # final state for downstream inspection
        t_seen = time.perf_counter()
        result.metrics.append(
            {"round": -1, "seen_total": int(sum(ray.get([s.seen_count.remote() for s in shards]))),
             "t_seen_rpc": round(time.perf_counter() - t_seen, 3)}
        )
        return result

    def _run_rounds(
        self, wd, cfg, shards, store_box, result, start_round, stop=None
    ) -> None:
        for rnd in range(start_round, cfg.max_rounds + 1):
            # graceful drain (the NSQ consumer's SIGINT → Queue.Close
            # path, nsq/consumer/app.go:124-133): finish the committed
            # round, leave the next frontier on disk, let the caller
            # resume later
            if stop is not None and stop():
                break
            round_dir = wd / f"round={rnd}"
            frontier_files = sorted(
                str(f) for f in (round_dir / "frontier").glob("*.parquet")
            ) + sorted(str(f) for f in (round_dir / "spill").glob("*.parquet"))
            if not frontier_files:
                break
            result.rounds = rnd + 1
            now_us = cfg.virtual_t0 + rnd * 1_000_000
            metrics = {"round": rnd}
            t_phase = time.perf_counter()

            def _lap(name: str) -> None:
                nonlocal t_phase
                now = time.perf_counter()
                metrics[name] = round(now - t_phase, 3)
                t_phase = now

            # frontier size + fused-task chunk plan from parquet
            # metadata — no execution needed
            pending_meta, canon_chunks = _plan_canon_chunks(
                frontier_files, cfg.canon_chunk_rows,
                n_slots=int(ray.cluster_resources().get("CPU", 0)),
            )
            n_shards = len(shards)
            hot = tuple(cfg.hot_hosts) + tuple(
                sorted(self._promoted.difference(cfg.hot_hosts))
            )
            big_rows: dict[str, int] = {}
            inline_tbl: pa.Table | None = None
            fast_part_refs: list | None = None
            if pending_meta <= cfg.small_round_threshold:
                # SMALL ROUND: canonicalize + budget split inline on the
                # driver — one ray.put instead of a Dataset execution.
                tbl = pa.concat_tables(
                    [pq.read_table(f) for f in frontier_files],
                    promote_options="default",
                )
                tbl = canonicalize_batch(tbl, now_us=now_us, spiders=self.spiders)
                _lap("t_canon")
                okm = pc.equal(tbl.column("disposition"), "ok")
                live_tbl = tbl.filter(okm)
                bad_tbl = tbl.filter(pc.invert(okm))
                if bad_tbl.num_rows:
                    err = _union_to_errors_from_canon([bad_tbl])
                    _write(err, round_dir / "errors", "canon.parquet")
                    result.errors += err.num_rows
                if live_tbl.num_rows == 0:
                    metrics["pending"] = 0
                    self._finish_round(shards, round_dir, metrics, result, rnd)
                    continue
                if live_tbl.num_rows > cfg.round_budget:
                    live_tbl = live_tbl.sort_by("order_key")
                    spill_tbl = live_tbl.slice(cfg.round_budget).select(
                        FRONTIER_SCHEMA.names
                    )
                    _write(spill_tbl, wd / f"round={rnd + 1}" / "spill",
                           "overflow.parquet")
                    metrics["overflow_deferred"] = spill_tbl.num_rows
                    live_tbl = live_tbl.slice(0, cfg.round_budget)
                inline_tbl = live_tbl  # admission partitions it inline
                live_block_refs = []
            elif pending_meta <= cfg.round_budget:
                # FAST PATH: the priority split can never trigger, and
                # the un-partitioned canon block is never needed — so
                # read + canonicalize + shard-partition are FUSED into
                # ONE task per row-group chunk.  (The equivalent
                # read_parquet → map_batches → materialize() Dataset
                # execution costs a measured ~0.5 s of fixed planning
                # overhead per round for zero streaming benefit, and a
                # separate partition hop adds a scheduling round trip
                # per block.)  The per-chunk transform is the same
                # vectorized Arrow kernel.
                fast_part_refs = [
                    _read_canon_partition.options(
                        num_returns=n_shards + 1
                    ).remote(chunk, now_us, self.spiders, n_shards, hot)
                    for chunk in canon_chunks
                ]
                live_block_refs = []
                _lap("t_canon")
            else:
                # SLOW PATH (big over-budget round): count the live
                # side, then O2 priority sort + budget split before
                # admission.  Same fused read+canon tasks as the fast
                # path; the sort below builds its Dataset from the
                # already-canonicalized block refs.
                canon_refs = [
                    _read_canon.remote(chunk, now_us, self.spiders)
                    for chunk in canon_chunks
                ]
                _lap("t_canon")
                live_refs, nbad_refs, n_refs = [], [], []
                for i, ref in enumerate(canon_refs):
                    l_ref, nb_ref, n_ref = _split_canon.remote(
                        ref, str(round_dir / "errors"), i
                    )
                    live_refs.append(l_ref)
                    nbad_refs.append(nb_ref)
                    n_refs.append(n_ref)
                live_counts = ray.get(n_refs)
                result.errors += int(sum(ray.get(nbad_refs)))

                n_live = int(sum(live_counts))
                if n_live == 0:
                    metrics["pending"] = 0
                    self._finish_round(shards, round_dir, metrics, result, rnd)
                    continue

                live = ray.data.from_arrow_refs(
                    [r for r, n in zip(live_refs, live_counts) if n]
                )
                if n_live > cfg.round_budget:
                    live = live.sort("order_key")
                    head, tail = live.split_at_indices([cfg.round_budget])
                    # the over-budget tail can be frontier-sized (at a
                    # 10^10-URL frontier with a millions-sized budget,
                    # billions of rows) — written task-side, one part
                    # per block; only per-part row counts reach the
                    # driver (same pattern as _split_admission)
                    next_spill = wd / f"round={rnd + 1}" / "spill"
                    metrics["overflow_deferred"] = int(sum(ray.get([
                        _spill_overflow.remote(
                            ref, str(next_spill), i,
                            cfg.spill_max_part_rows,
                        )
                        for i, ref in enumerate(tail.to_arrow_refs())
                    ])))
                    live = head
                live_block_refs = list(live.to_arrow_refs())

            # Admission: explicit hash partition by host shard — each
            # block is split into per-shard sub-tables (plus bad-canon
            # rows) by a parallel task (fused into the canon task on
            # the fast path), then each shard gets ONE batch RPC
            # covering all of its hosts.  No groupby shuffle: the
            # per-host map_groups version cost ~3 s/round of fixed
            # all-to-all overhead regardless of round size.
            if inline_tbl is not None:
                # SMALL ROUND: shard-partition inline on the driver
                # (bounded by small_round_threshold by construction) —
                # skips one task-dispatch hop per round; the shard RPCs
                # themselves still run on the state-owning actors.  The
                # bad-canon part is empty here: inline_tbl was filtered
                # to disposition == "ok" above.
                parts = _shard_partition_fn(inline_tbl, n_shards, hot)
                pairs = [
                    shards[s].admit_table.options(num_returns=2).remote(
                        rnd, parts[s]
                    )
                    for s in range(n_shards)
                ]
                admission_refs = [p[0] for p in pairs]
                hot_metas = ray.get([p[1] for p in pairs])
                big_rows = _collect_big_rows(hot_metas)
                if any(hot_metas):
                    admission_refs.extend(
                        _finalize_hot(shards, rnd, hot_metas)
                    )
            else:
                part_refs = fast_part_refs if fast_part_refs is not None else [
                    _shard_partition.options(num_returns=n_shards + 1).remote(
                        ref, n_shards, hot
                    )
                    for ref in live_block_refs
                ]
                if part_refs:
                    pairs = [
                        shards[s].admit_table.options(num_returns=2).remote(
                            rnd, *[pr[s] for pr in part_refs]
                        )
                        for s in range(n_shards)
                    ]
                    admission_refs = [p[0] for p in pairs]
                    # phase 2 of two-level admission: tiny per-shard
                    # metas (counts + promotion-detection stats + the
                    # draw-bounded top keys), never the parked rows
                    hot_metas = ray.get([p[1] for p in pairs])
                    big_rows = _collect_big_rows(hot_metas)
                    if any(hot_metas):
                        admission_refs.extend(
                            _finalize_hot(shards, rnd, hot_metas)
                        )
                    admission_refs.extend(
                        pr[n_shards] for pr in part_refs
                    )  # bad
                else:
                    admission_refs = []

            # One pass of split tasks: deferred spill written task-side
            # (never concatenated on the driver — it can be frontier-sized);
            # admitted stays in the object store as block refs.  Small
            # rounds split inline instead: the whole round is bounded by
            # small_round_threshold, so the driver-side write is too.
            spill_dir = wd / f"round={rnd + 1}" / "spill"
            errors_dir = round_dir / "errors"
            admitted_refs, rests = [], []
            if inline_tbl is not None:
                for i, t in enumerate(ray.get(admission_refs)):
                    admitted, rest = _split_admission_fn(
                        t, str(spill_dir), str(errors_dir), i,
                        want_trace=cfg.keep_trace,
                    )
                    admitted_refs.append(
                        ray.put(admitted) if rest["n_admitted"] else None
                    )
                    rests.append(rest)
            else:
                trace_dir = (
                    str(round_dir / "trace") if cfg.keep_trace else None
                )
                rest_refs = []
                for i, ref in enumerate(admission_refs):
                    a_ref, r_ref = _split_admission.remote(
                        ref, str(spill_dir), str(errors_dir), i,
                        trace_dir, rnd,
                    )
                    admitted_refs.append(a_ref)
                    rest_refs.append(r_ref)
                rests = ray.get(rest_refs)
            _lap("t_admission")

            metrics["pending"] = sum(r["n_ok"] for r in rests)
            # robots/bad-canon rows were written to errors_dir where the
            # split ran; only their counts travel
            result.errors += sum(r["n_bad"] + r["n_robots"] for r in rests)
            metrics["dup_dropped"] = sum(r["dup"] for r in rests)
            metrics["seen_dropped"] = sum(r["seen"] for r in rests)
            metrics["deferred"] = sum(r["deferred"] for r in rests)
            n_admitted = sum(r["n_admitted"] for r in rests)
            metrics["admitted"] = n_admitted
            result.admitted += n_admitted

            if cfg.keep_trace and n_admitted and inline_tbl is not None:
                # small rounds only: trace is threshold-bounded here;
                # big-round split tasks already wrote theirs task-side
                traces = [r["trace"] for r in rests if r["trace"].num_rows]
                if traces:
                    trace = pa.concat_tables(traces)
                    trace = trace.append_column(
                        "round", pa.array([rnd] * trace.num_rows, pa.int32())
                    )
                    _write(trace, round_dir / "trace")

            if n_admitted:
                # Fetch + extract as plain tasks over batch-size slices
                # of the admitted blocks (a per-round map_batches would
                # rebuild its actor pool every round and never ramp up
                # inside a short round; a persistent pinned pool causes
                # worker churn — see _FetchExtractWorker docstring).
                #
                # Bucketed store: re-partition admitted rows by the
                # store's bucket key FIRST (SURVEY §2.5 J1a) so each
                # fetch task reads exactly one bucket file — without
                # this co-partitioning every task touches ~all buckets
                # and the per-worker bucket cache thrashes (measured
                # 17x slowdown).
                slices: list[tuple] = []
                if isinstance(store_box[0], BucketedPageStore):
                    nb = store_box[0].n_buckets
                    live_a = [r for r, rest in zip(admitted_refs, rests)
                              if rest["n_admitted"]]
                    if live_a:
                        gather = [
                            _gather_bucket.options(num_returns=2).remote(
                                b, nb, *live_a
                            )
                            for b in range(nb)
                        ]
                        counts = ray.get([g[1] for g in gather])
                        # whole-bucket tasks (unless a bucket is huge):
                        # each bucket file is then opened once cluster-
                        # wide instead of once per 256-row slice
                        bucket_batch = 4 * cfg.extract_batch_size
                        for (t_ref, _), c in zip(gather, counts):
                            for off in range(0, c, bucket_batch):
                                ln = min(bucket_batch, c - off)
                                slices.append((t_ref, off, ln))
                else:
                    for a_ref, rest in zip(admitted_refs, rests):
                        c = rest["n_admitted"]
                        for off in range(0, c, cfg.extract_batch_size):
                            ln = min(cfg.extract_batch_size, c - off)
                            slices.append((a_ref, off, ln))
                cap = cfg.extract_concurrency
                out_refs = []
                if cap and cap < len(slices):
                    # windowed submission: at most `cap` fetch+extract
                    # tasks in flight (the concurrency throttle)
                    pending: set = set()
                    for ref, off, ln in slices:
                        if len(pending) >= cap:
                            done, _ = ray.wait(list(pending), num_returns=1)
                            pending.difference_update(done)
                        r = _fetch_extract_task.remote(
                            ref, off, ln, store_box, self.spiders,
                            cfg.max_depth, self.fetch_stage_factory,
                            self._worker_token,
                        )
                        pending.add(r)
                        out_refs.append(r)
                else:
                    out_refs = [
                        _fetch_extract_task.remote(
                            ref, off, ln, store_box, self.spiders,
                            cfg.max_depth, self.fetch_stage_factory,
                            self._worker_token,
                        )
                        for ref, off, ln in slices
                    ]
                # One split pass: frontier + records written task-side.
                frontier_dir = wd / f"round={rnd + 1}" / "frontier"
                records_dir = round_dir / "records"
                u_refs = [
                    _split_union.remote(ref, str(frontier_dir),
                                        str(records_dir),
                                        str(errors_dir), i)
                    for i, ref in enumerate(out_refs)
                ]
                u_rests = ray.get(u_refs)
                _lap("t_extract")
                n_records = sum(r["n_records"] for r in u_rests)
                result.records += n_records
                metrics["records"] = n_records
                result.errors += sum(r["n_errors"] for r in u_rests)
                n_links = sum(r["n_links"] for r in u_rests)
                metrics["links"] = n_links
                result.links += n_links
                # ST1: fold this round's harvested Set-Cookie partials
                # (per-task pre-folded) and push to the host-sharded
                # jars BEFORE the checkpoint snapshot, so round K+1 —
                # including a resumed one — sees them
                folded: dict[tuple[str, str], tuple[bytes, str]] = {}
                for r in u_rests:
                    for key, cand in r["cookies"].items():
                        cur = folded.get(key)
                        if cur is None or cand[0] > cur[0]:
                            folded[key] = cand
                if folded:
                    per_shard: list[dict] = [{} for _ in shards]
                    for (host, name), (_, value) in folded.items():
                        # NB: uint64 % np.uint64 — a bare python-int
                        # modulus promotes to float64 and mis-routes
                        s = int(fnv1a64_batch([host])[0]
                                % np.uint64(len(shards)))
                        per_shard[s].setdefault(host, {})[name] = value
                    ray.get([
                        shards[s].update_cookies.remote(per_shard[s])
                        for s in range(len(shards)) if per_shard[s]
                    ])
                _lap("t_sink")

            # dynamic hot-host promotion boundary: a host whose single
            # round carried several shards' worth of screening rows is
            # promoted NOW — after this round's trace is durable (the
            # seen-migration source) and BEFORE the checkpoint snapshot
            # + manifest commit, so the snapshot holds the migrated
            # bucket-shard entries and the manifest names the host
            if big_rows and cfg.hot_host_auto and cfg.keep_trace:
                thresh = max(
                    cfg.hot_promote_min_rows,
                    int(cfg.hot_promote_factor * pending_meta
                        / max(n_shards, 1)),
                )
                new_hot = sorted(
                    h for h, n in big_rows.items()
                    if n >= thresh and h not in hot
                )
                if new_hot:
                    self._promote_hot_hosts(wd, shards, new_hot)
                    self._promoted.update(new_hot)
                    metrics["promoted_hosts"] = new_hot

            t_phase = time.perf_counter()
            self._finish_round(shards, round_dir, metrics, result, rnd)
            metrics["t_finish"] = round(time.perf_counter() - t_phase, 3)

            nxt = wd / f"round={rnd + 1}"
            if _dir_rows(nxt / "frontier") == 0 and _dir_rows(nxt / "spill") == 0:
                break

    def _promote_hot_hosts(self, wd, shards, hosts: list) -> None:
        """Dynamic promotion boundary (one-time per host): replay each
        newly-hot host's admitted urls from the durable trace into the
        bucket shards its two-level routing will probe, then flip the
        host hot on every shard.  The host's pre-promotion seen entries
        stay behind on the home shard as unreachable garbage (hash-only
        backends can't delete by host) — harmless, since promoted
        routing never consults the home shard.  Cost is one distributed
        trace scan per promotion event, O(crawled urls) — the same
        order as a single resume restore."""
        n_shards = len(shards)
        files = [
            str(f)
            for d in sorted(wd.glob("round=*"))
            for f in sorted((d / "trace").glob("*.parquet"))
        ]
        chunks = [files[i:i + 32] for i in range(0, len(files), 32)]
        for host in hosts:
            parts = [
                p for p in ray.get([
                    _host_seen_hashes.remote(c, host) for c in chunks
                ]) if len(p)
            ]
            if not parts:
                continue
            hashes = np.unique(np.concatenate(parts))
            nb = HOT_BUCKETS_PER_SHARD * n_shards
            route = _hot_route(host, n_shards)
            shard_ids = route[(hashes % np.uint64(nb)).astype(np.int64)]
            ray.get([
                shards[s].seen_ingest.remote(hashes[shard_ids == s])
                for s in range(n_shards)
                if (shard_ids == s).any()
            ])
        ray.get([s.promote_hosts.remote(list(hosts)) for s in shards])

    def _finish_round(self, shards, round_dir, metrics, result, rnd) -> None:
        if rnd % self.cfg.checkpoint_interval == 0:
            self._snapshot(shards, round_dir)
        (round_dir / "metrics.json").parent.mkdir(parents=True, exist_ok=True)
        (round_dir / "metrics.json").write_text(json.dumps(metrics))
        result.metrics.append(metrics)
        # atomic commit marker LAST (manifest = the commit point, §4.3)
        manifest = {"round": rnd, "metrics": metrics}
        promoted = sorted(getattr(self, "_promoted", ()))
        if promoted:
            # cumulative dynamically-promoted set: resume must restore
            # it alongside the snapshots (routing ↔ seen placement)
            manifest["promoted_hosts"] = promoted
        tmp = round_dir / ".manifest.tmp"
        tmp.write_text(json.dumps(manifest))
        os.replace(tmp, round_dir / "manifest.json")

    def dump_seen(self) -> np.ndarray:
        """Union of all shard seen sets (A3 cardinality oracle)."""
        parts = ray.get([s.dump_seen.remote() for s in self._shards])
        if not parts:
            return np.empty(0, dtype=np.uint64)
        return np.sort(np.concatenate(parts))

    def shutdown_shards(self) -> None:
        for s in getattr(self, "_shards", []):
            ray.kill(s)
        self._shards = []
        self._prewarm_refs = []
        self._shard_pings = []


class _FetchExtractWorker:
    """Fetch+extract execution state: the page-store handle and the
    parsed handler registry — what the reference rebuilt per response
    (``response.go:28``) and we build once per worker process (ST6).

    Not an actor: pinned actor pools proved pathological here — idle
    actor processes crowd Ray's bounded worker pool, so every stateless
    Dataset execution in the round loop paid worker-churn (measured
    3-4× slowdown of unrelated executions with a 32-actor pool on a
    32-CPU node). Plain tasks + this per-process cache get the same
    setup amortization with a fully elastic scheduler."""

    _GC_COLLECT_EVERY = 64  # safety net; DOM trees are cycle-free (weakref parents)

    def __init__(
        self, store, spiders: list, max_depth: int, fetch_factory=None
    ) -> None:
        self._fetch = (fetch_factory or make_fetch_fn)(store)
        self._extract = ExtractActor(spiders=spiders, max_depth=max_depth)
        self._calls = 0

    def process(self, block: pa.Table, offset: int, length: int) -> pa.Table:
        chunk = block.slice(offset, length)
        # Cyclic GC off during the parse-heavy region: gen0 scans over
        # thousands of short-lived DOM nodes per document cost ~25% of
        # kernel time (measured), and the trees are reclaimed by pure
        # refcounting (weakref parent links — no cycles). A rare
        # full collect catches stray cycles from user handler code.
        enabled = gc.isenabled()
        gc.disable()
        try:
            out = self._extract(self._fetch(chunk))
        finally:
            self._calls += 1
            if self._calls % self._GC_COLLECT_EVERY == 0:
                gc.collect()
            if enabled:
                gc.enable()
        return out


_WORKER_CACHE: dict = {}  # per worker process: cache key -> _FetchExtractWorker


def _store_cache_key(store) -> object:
    if isinstance(store, ray.ObjectRef):
        return store.hex()
    root = getattr(store, "root", None)
    return ("handle", root) if root is not None else ("handle", id(store))


def _get_worker(
    store_box: list, spiders: list, max_depth: int, fetch_factory=None,
    worker_token: str = "",
) -> "_FetchExtractWorker":
    """Build (or fetch from the per-process cache) the fetch+extract
    worker for this store/spider/config combination.  ``worker_token``
    is the engine's content hash of (spiders, fetch_factory) — the
    cache key component that tells apart distinct same-qualname
    closures (e.g. two transports injected in one session).  A caller
    omitting the token (direct ``_fetch_extract_task`` invocations in
    tests) falls back to the spider/factory qualname tuple so it can't
    silently reuse a worker built for a different spider set."""
    store = store_box[0]
    if not worker_token:
        worker_token = repr(
            tuple(getattr(s, "__qualname__", repr(s)) for s in spiders)
            + (getattr(fetch_factory, "__qualname__", repr(fetch_factory)),)
        )
    key = (_store_cache_key(store), max_depth, worker_token)
    worker = _WORKER_CACHE.get(key)
    if worker is None:
        if isinstance(store, ray.ObjectRef):
            store = ray.get(store)
        worker = _FetchExtractWorker(store, spiders, max_depth, fetch_factory)
        # single-slot cache: a new run's store evicts the previous one,
        # so repeated engine runs in one Ray session (tests, bench) don't
        # pin one full page index per run in every worker process
        _WORKER_CACHE.clear()
        _WORKER_CACHE[key] = worker
    return worker


@ray.remote
def _fetch_extract_task(
    block: pa.Table, offset: int, length: int,
    store_box: list, spiders: list, max_depth: int,
    fetch_factory=None, worker_token: str = "",
) -> pa.Table:
    """One fetch+extract work unit. ``store_box`` wraps the store (or
    its ObjectRef) in a list so Ray does NOT auto-deref it — the task
    derefs lazily and caches the built worker for the process
    lifetime."""
    worker = _get_worker(
        store_box, spiders, max_depth, fetch_factory, worker_token
    )
    return worker.process(block, offset, length)


@ray.remote
def _prewarm_worker(
    store_box: list, spiders: list, max_depth: int, fetch_factory=None,
    worker_token: str = "",
) -> int:
    """Async warmup unit: pay module import + store deref + parser
    construction on an idle worker process BEFORE the first real
    fetch+extract task lands there.  Submitted once per cluster CPU at
    run start and never waited on — concurrent submission spreads the
    tasks across distinct worker processes."""
    _get_worker(store_box, spiders, max_depth, fetch_factory, worker_token)
    return 0


# -- per-block split tasks --------------------------------------------------
# Each materialized stage output is post-processed by ONE parallel task per
# block instead of one Dataset execution per category — the categories are
# disjoint filters, so a single pass suffices and the driver only ever
# receives the small/bounded sides (counts, trace, robots errors, records).


@ray.remote(num_returns=2)
def _gather_bucket(b: int, n_buckets: int, *tables: pa.Table):
    """Collect one page-store bucket's rows from all admitted blocks
    (the frontier-side half of the partition-local fetch join)."""
    parts = []
    for t in tables:
        if t.num_rows == 0:
            continue
        hashes = t.column("url_hash").to_numpy(zero_copy_only=False)
        mask = (hashes % np.uint64(n_buckets)) == np.uint64(b)
        if mask.any():
            parts.append(t.filter(pa.array(mask)))
    if not parts:
        empty = tables[0].slice(0, 0)
        return empty, 0
    out = parts[0] if len(parts) == 1 else pa.concat_tables(parts)
    return out, out.num_rows


# url_hash buckets per shard for promoted hot hosts: enough that the
# fnv1a64(host#bucket) placement covers every shard with high
# probability and balances within a few % by LLN
HOT_BUCKETS_PER_SHARD = 8


def _hot_route(host: str, n_shards: int) -> np.ndarray:
    """bucket -> shard lookup table for one promoted host (the static
    two-level routing both _shard_partition and tests must share)."""
    nb = HOT_BUCKETS_PER_SHARD * n_shards
    return (
        fnv1a64_batch([f"{host}#{b}" for b in range(nb)])
        % np.uint64(n_shards)
    ).astype(np.int64)


def _shard_partition_fn(t: pa.Table, n_shards: int, hot_hosts: tuple = ()):
    """Split one canonicalized block into per-shard live sub-tables
    (``fnv1a64(host) % n_shards`` — the same key the shards own) plus
    the bad-canon rows tagged BADCANON.  Rows of ``hot_hosts`` (a
    handful of enormous hosts) route two-level instead:
    ``fnv1a64(host#bucket) % n_shards`` with ``bucket = url_hash %
    (HOT_BUCKETS_PER_SHARD * n_shards)`` — within-round duplicates
    share a url_hash so they still co-locate.  Returns ``n_shards +
    1`` tables.  Pure function: big rounds run it as a Ray task
    (``_shard_partition``), small rounds inline it on the driver."""
    if t.num_rows == 0 or "disposition" not in t.column_names:
        empty = t.slice(0, 0)
        return tuple([empty] * (n_shards + 1))
    okm = pc.equal(t.column("disposition"), "ok")
    live = t.filter(okm)
    bad = t.filter(pc.invert(okm))
    if bad.num_rows:
        bad = bad.append_column(
            "admit", pa.array([BADCANON] * bad.num_rows, pa.int8())
        )
    shard_ids = (
        fnv1a64_batch(live.column("host")) % np.uint64(n_shards)
    ).astype(np.int64)
    if hot_hosts and live.num_rows:
        nb = HOT_BUCKETS_PER_SHARD * n_shards
        bucket = None
        host_col = live.column("host")
        for hh in hot_hosts:
            m = pc.equal(host_col, hh).to_numpy(zero_copy_only=False)
            if not m.any():
                continue
            if bucket is None:
                uh = live.column("url_hash").to_numpy(zero_copy_only=False)
                bucket = (uh % np.uint64(nb)).astype(np.int64)
            shard_ids = np.where(m, _hot_route(hh, n_shards)[bucket],
                                 shard_ids)
    # combine_chunks before shipping: filter() preserves the input's
    # chunking (one chunk per parquet row group), and Ray's Arrow
    # serializer walks + copies offset buffers PER CHUNK — profiled at
    # ~half the whole round's admission wall on multi-chunk sub-tables;
    # contiguous one-chunk tables serialize in one pass
    parts = [
        live.filter(pa.array(shard_ids == s)).combine_chunks()
        for s in range(n_shards)
    ]
    return (*parts, bad)


_shard_partition = ray.remote(_shard_partition_fn)


def _collect_big_rows(hot_metas: list[dict]) -> dict:
    """Strip the shards' reserved dynamic-promotion detection entries
    (the ``""`` key) out of the phase-1 metas IN PLACE — so
    ``_finalize_hot`` only ever sees real parked hosts — and merge
    them into one host→rows dict for the engine's promotion rule."""
    big: dict[str, int] = {}
    for m in hot_metas:
        det = m.pop("", None)
        if det:
            for h, n in det["rows"].items():
                big[h] = big.get(h, 0) + int(n)
    return big


@ray.remote
def _host_seen_hashes(files: list, host: str) -> np.ndarray:
    """One promoted host's admitted (= seen-marked) url hashes from a
    chunk of trace parts — the seen-migration source at a dynamic
    promotion boundary.  Host extraction is the vectorized equivalent
    of ``urlnorm.url_host`` (netloc sans userinfo) over canonical
    urls."""
    tabs = [pq.read_table(f, columns=["url"]) for f in files]
    t = pa.concat_tables(tabs) if len(tabs) > 1 else tabs[0]
    urls = t.column("url").combine_chunks() if t.num_rows else None
    if urls is None or len(urls) == 0:
        return np.empty(0, dtype=np.uint64)
    netloc = pc.struct_field(
        pc.extract_regex(urls, r"^[^:/?#]+://(?P<n>[^/?#]*)"), "n"
    )
    hosts = pc.replace_substring_regex(netloc, r"^.*@", "")
    mask = pc.fill_null(pc.equal(hosts, host), False)
    sel = urls.filter(mask)
    if len(sel) == 0:
        return np.empty(0, dtype=np.uint64)
    return np.unique(fnv1a64_batch(sel))


def _finalize_hot(shards, rnd: int, hot_metas: list[dict]) -> list:
    """Phase 2 of two-level hot-host admission (state/admission.py):
    sum per-shard candidate counts, draw tokens at each host's HOME
    shard; hosts whose draw covers every candidate admit "ALL" with no
    key traffic at all (the steady state of a generous budget).  Only
    an OVER-draw host (k < total) pulls keys: each bucket shard returns
    its k smallest parked order-keys (exact — each of the k globally
    smallest is within the k smallest of its own shard), the driver
    merges them into the global admit threshold, then releases each
    shard's parked rows.  Driver traffic is O(over-draw hosts × k)
    keys — bounded by the token draw, never by burst or candidate
    count, and never rows."""
    n_shards = len(shards)
    totals: dict[str, int] = {}
    for m in hot_metas:
        for host, info in m.items():
            totals[host] = totals.get(host, 0) + info["n"]
    per_home: dict[int, dict[str, int]] = {}
    for host, tot in totals.items():
        if tot:
            s = int(fnv1a64_batch([host])[0] % np.uint64(n_shards))
            per_home.setdefault(s, {})[host] = tot
    draws: dict[str, tuple[int, str]] = {}
    if per_home:
        for d in ray.get([
            shards[s].draw_hot.remote(rnd, req)
            for s, req in per_home.items()
        ]):
            draws.update(d)
    thresholds: dict[str, object] = {}
    jars: dict[str, str] = {}
    key_wants: dict[str, int] = {}
    for host, tot in totals.items():
        k, jar = draws.get(host, (0, ""))
        if jar:
            jars[host] = jar
        if k <= 0:
            continue  # absent from thresholds = admit none
        if k >= tot:
            thresholds[host] = "ALL"
        else:
            key_wants[host] = k
    if key_wants:
        # only shards that parked rows for an over-draw host are asked
        per_shard_wants = [
            {h: k for h, k in key_wants.items() if h in m}
            for m in hot_metas
        ]
        key_lists = ray.get([
            shards[s].hot_keys.remote(rnd, w)
            for s, w in enumerate(per_shard_wants) if w
        ])
        keys: dict[str, list[bytes]] = {h: [] for h in key_wants}
        for kl in key_lists:
            for host, ks in kl.items():
                keys[host].extend(ks)
        for host, k in key_wants.items():
            thresholds[host] = sorted(keys[host])[k - 1]
    return [
        shards[s].finalize_hot.remote(rnd, thresholds, jars)
        for s, m in enumerate(hot_metas)
        if m
    ]


# footer reads per metadata task; also the serial/parallel cutover —
# below it one round trip of task dispatch would cost more than the
# footer reads themselves
_META_BATCH = 256


def _file_meta(path: str) -> tuple[int, tuple[int, ...]]:
    """One parquet footer read: ``(num_rows, per-row-group row counts)``
    — the single definition both the serial and fanned-out planning
    paths share (the plan-equality test depends on them agreeing)."""
    md = pq.read_metadata(path)
    return md.num_rows, tuple(
        md.row_group(i).num_rows for i in range(md.num_row_groups)
    )


@ray.remote
def _read_meta_batch(paths: list) -> list:
    """Parquet footer scan for one batch of frontier parts.  A big
    round's frontier arrives as one small part per upstream fetch task
    — millions of files at the 10^10 design point — so the footer pass
    must fan out instead of running serially on the driver."""
    return [_file_meta(p) for p in paths]


def _plan_canon_chunks(files: list[str], target_rows: int,
                       n_slots: int | None = None):
    """One metadata pass: total pending rows + the fused-task plan.

    A chunk is a tuple of ``(path, row_group_tuple)`` pairs holding
    ~``target_rows`` rows: large multi-row-group files SPLIT into
    several chunks, and many small files COALESCE into one — so the
    task count is bounded by total rows / target, never by file count.
    A single row group larger than the target stays one task — part
    sizes are bounded by our own writers (``seed_part_rows``,
    ``spill_max_part_rows``, per-task frontier parts).  Above
    ``_META_BATCH`` files the footer reads fan out as Ray tasks (the
    driver keeps only the integer row counts: O(files) ints, not
    O(files) serial I/O round trips).

    ``n_slots`` (cluster CPUs) shrinks the chunk target adaptively so
    a MID-SIZE round still fans out: a 50k-row round at the static
    32k target is 2 tasks on 32 idle CPUs, putting ~1 s of serial
    canonicalize on the round's critical path.  Target becomes
    ``clamp(total / (2·slots), 4096, target_rows)`` — at the 10^10
    design point total/(2·slots) far exceeds the static cap, so huge
    frontiers keep the bounded task count."""
    if len(files) > _META_BATCH:
        metas: list = []
        for part in ray.get([
            _read_meta_batch.remote(files[i:i + _META_BATCH])
            for i in range(0, len(files), _META_BATCH)
        ]):
            metas.extend(part)
    else:
        metas = [_file_meta(f) for f in files]
    total = sum(n_rows for n_rows, _ in metas)
    if n_slots and n_slots > 0:
        target_rows = max(4096, min(target_rows, -(-total // (2 * n_slots))))
    chunks: list[tuple[tuple[str, tuple[int, ...]], ...]] = []
    cur: list[tuple[str, list[int]]] = []
    cur_rows = 0

    def _flush():
        nonlocal cur, cur_rows
        if cur:
            chunks.append(tuple((p, tuple(r)) for p, r in cur))
            cur, cur_rows = [], 0

    for f, (n_rows, group_rows) in zip(files, metas):
        for i, g in enumerate(group_rows):
            if g == 0:
                continue
            if cur and cur[-1][0] == f:
                cur[-1][1].append(i)
            else:
                cur.append((f, [i]))
            cur_rows += g
            if cur_rows >= target_rows:
                _flush()
    _flush()
    return total, chunks


def _read_chunk(chunk: tuple) -> pa.Table:
    parts = [
        pq.ParquetFile(p).read_row_groups(list(rgs)) for p, rgs in chunk
    ]
    return parts[0] if len(parts) == 1 else pa.concat_tables(
        parts, promote_options="default"
    )


@ray.remote
def _read_canon(chunk: tuple, now_us: int, spiders: list) -> pa.Table:
    """Fused frontier read + canonicalize (M1/M2/M3) for one chunk of
    ``(path, row_group_tuple)`` pairs — the distributed path's
    per-block unit of work."""
    return canonicalize_batch(
        _read_chunk(chunk), now_us=now_us, spiders=spiders
    )


@ray.remote
def _read_canon_partition(
    chunk: tuple, now_us: int, spiders: list, n_shards: int, hot: tuple
):
    """FAST-path unit of work: read + canonicalize + shard-partition in
    ONE task (``num_returns = n_shards + 1``) — the separate partition
    hop costs a scheduling round trip per block, and the fast path
    never needs the un-partitioned canon block (only the priority-sort
    slow path does)."""
    t = canonicalize_batch(
        _read_chunk(chunk), now_us=now_us, spiders=spiders
    )
    return _shard_partition_fn(t, n_shards, hot)


@ray.remote(num_returns=3)
def _split_canon(t: pa.Table, errors_dir: str, part: int):
    """Slow-path live/bad split; bad-canon rows are written to the
    errors dir task-side (a frontier of malformed URLs would make the
    bad side frontier-sized) — only counts reach the driver."""
    # empty shuffle/map blocks can surface with the pre-stage schema
    if t.num_rows == 0 or "disposition" not in t.column_names:
        return t.slice(0, 0), 0, 0
    ok = pc.equal(t.column("disposition"), "ok")
    live = t.filter(ok)
    bad = t.filter(pc.invert(ok))
    if bad.num_rows:
        _write(_union_to_errors_from_canon([bad]),
               pathlib.Path(errors_dir), f"canon-slow-{part}.parquet")
    return live, bad.num_rows, live.num_rows


def _mask_count(mask) -> int:
    v = pc.sum(pc.cast(mask, pa.int64())).as_py()
    return int(v) if v is not None else 0


BADCANON = 6  # local admit code for disposition != "ok" rows (fused path)


@ray.remote
def _spill_overflow(
    t: pa.Table, spill_dir: str, part: int, max_part_rows: int
) -> int:
    """Write one over-budget frontier tail block to the next round's
    spill dir task-side (in ≤max_part_rows parquet parts); return only
    the row count to the driver."""
    if t.num_rows == 0:
        return 0
    t = t.select(FRONTIER_SCHEMA.names)
    for j, off in enumerate(range(0, t.num_rows, max_part_rows)):
        _write(t.slice(off, max_part_rows), pathlib.Path(spill_dir),
               f"overflow-{part}-{j}.parquet")
    return t.num_rows


def _split_admission_fn(t: pa.Table, spill_dir: str, errors_dir: str,
                        part: int, trace_dir: str | None = None,
                        rnd: int = 0, want_trace: bool = False):
    """Split one shard's admission result into the admitted block plus
    the per-category rest dict; deferred rows are written to the next
    round's spill dir, robots-blocked and bad-canon rows to the round's
    errors dir.  Pure function: big rounds run it as a Ray task
    (``_split_admission`` — spill, errors and trace are all written
    WHERE THE SPLIT RUNS because each can be budget- or frontier-sized
    in a pathological round, e.g. a robots file blocking the whole
    frontier; only counts reach the driver), small rounds inline it on
    the driver (bounded by ``small_round_threshold`` by construction,
    same file layout)."""
    if t.num_rows == 0 or "admit" not in t.column_names:
        empty = t.slice(0, 0)
        return empty, {
            "n_robots": 0, "n_bad": 0, "dup": 0, "seen": 0,
            "deferred": 0, "n_admitted": 0, "n_ok": 0, "trace": empty,
        }
    adm = t.column("admit")
    admitted = t.filter(pc.equal(adm, ADMIT))
    deferred = t.filter(pc.equal(adm, DEFER)).select(FRONTIER_SCHEMA.names)
    if deferred.num_rows:
        _write(deferred, pathlib.Path(spill_dir), f"deferred-{part}.parquet")
    bad = t.filter(pc.equal(adm, BADCANON))
    if bad.num_rows:
        _write(_union_to_errors_from_canon([bad]),
               pathlib.Path(errors_dir), f"canon-{part}.parquet")
    robots = t.filter(pc.equal(adm, ROBOTS))
    if robots.num_rows:
        _write(_canon_rows_to_errors(robots, "robots", "disallowed"),
               pathlib.Path(errors_dir), f"robots-{part}.parquet")
    # M5: the deterministic proxy pick is a pure function of
    # (url_hash, metadata), so the trace records it at admission time
    # — the same choice the fetch stage will make (stages/fetch.py).
    # Computed ONLY when tracing is on: with keep_trace=False the
    # per-row proxy pick (metadata .to_pylist() over the whole budget)
    # and the budget-sized driver transfer would be pure waste.
    trace = admitted.select(["url", "order_key", "depth"]).slice(0, 0)
    if trace_dir is not None or want_trace:
        from crawl_ray.stages.fetch import pick_proxy_batch

        trace = admitted.select(["url", "order_key", "depth"]).append_column(
            "proxy",
            pa.array(
                pick_proxy_batch(
                    admitted.column("url_hash").to_numpy(zero_copy_only=False),
                    admitted.column("metadata").to_pylist(),
                ),
                pa.string(),
            ),
        )
    if trace_dir is not None:
        if trace.num_rows:
            _write(
                trace.append_column(
                    "round", pa.array([rnd] * trace.num_rows, pa.int32())
                ),
                pathlib.Path(trace_dir),
                f"trace-{part}.parquet",
            )
        trace = trace.slice(0, 0)
    rest = {
        "n_robots": robots.num_rows,
        "n_bad": bad.num_rows,
        "dup": _mask_count(pc.equal(adm, DUP)),
        "seen": _mask_count(pc.equal(adm, SEEN)),
        "deferred": deferred.num_rows,
        "n_admitted": admitted.num_rows,
        "n_ok": t.num_rows - bad.num_rows,
        "trace": trace,
    }
    return admitted, rest


_split_admission = ray.remote(num_returns=2)(_split_admission_fn)


@ray.remote
def _split_union(t: pa.Table, frontier_dir: str, records_dir: str,
                 errors_dir: str, part: int) -> dict:
    if t.num_rows == 0 or "kind" not in t.column_names:
        return {"n_records": 0, "n_errors": 0, "n_links": 0, "cookies": {}}
    kind = t.column("kind")
    links = t.filter(pc.equal(kind, "link"))
    if links.num_rows:
        _write(links_to_frontier(links), pathlib.Path(frontier_dir),
               f"links-{part}.parquet")
    # records carry the extracted payload (fields can hold whole page
    # text) — written task-side; funneling them through the driver was
    # measured at 40+ s/round at 50k records
    records = t.filter(pc.equal(kind, "record")).select(
        ["url", "depth", "seq_path", "fields"]
    )
    if records.num_rows:
        _write(records, pathlib.Path(records_dir), f"records-{part}.parquet")
    # fetch/extract error rows are written task-side too — a fetch
    # storm (host down, robots flip, parser bug) makes the error
    # stream budget-sized, the same regime the records stream hit
    errors = t.filter(pc.equal(kind, "error")).select(
        ["url", "method", "depth", "seq_path", "error_kind", "error"]
    )
    if errors.num_rows:
        _write(errors, pathlib.Path(errors_dir),
               f"extract-{part}.parquet")
    return {
        "n_records": records.num_rows,
        "n_errors": errors.num_rows,
        "n_links": links.num_rows,
        # ST1 jar harvest, pre-folded per task to (host, name) → the
        # canonically-LAST value (max order key), so the driver-side
        # round fold is bounded by hosts × cookie-names — never by the
        # number of fetched pages
        "cookies": _fold_cookie_rows(
            t.filter(pc.equal(kind, "cookie"))
        ),
    }


def _fold_cookie_rows(rows: pa.Table) -> dict:
    """Fold kind="cookie" union rows (url, fields=Set-Cookie JSON) into
    ``(host, name) -> (order_key, value)`` keeping the canonically last
    write — the same order the simulator applies jar updates in."""
    from crawl_ray.stages.canonicalize import encode_order_key
    from crawl_ray.urlnorm import url_host

    out: dict[tuple[str, str], tuple[bytes, str]] = {}
    if rows.num_rows == 0:
        return out
    urls = rows.column("url").to_pylist()
    payloads = rows.column("fields").to_pylist()
    prios = rows.column("priority").to_pylist()
    depths = rows.column("depth").to_pylist()
    seqs = rows.column("seq_path").to_pylist()
    for i in range(rows.num_rows):
        host = url_host(urls[i])
        okey = encode_order_key(prios[i], depths[i], seqs[i])
        for name, value in json.loads(payloads[i]).items():
            cur = out.get((host, name))
            if cur is None or okey > cur[0]:
                out[(host, name)] = (okey, str(value))
    return out


# -- small helpers ---------------------------------------------------------


def _dir_rows(directory: pathlib.Path) -> int:
    """Total rows across a dir's parquet parts.  Above ``_META_BATCH``
    files the footer reads fan out as Ray tasks (the end-of-round
    termination check scans the next round's frontier+spill — millions
    of small parts at the 10^10 design point; a serial driver scan
    there is the same anti-pattern the canon planner already fans
    out)."""
    files = sorted(str(f) for f in directory.glob("*.parquet"))
    if len(files) > _META_BATCH:
        total = 0
        for part in ray.get([
            _read_meta_batch.remote(files[i:i + _META_BATCH])
            for i in range(0, len(files), _META_BATCH)
        ]):
            total += sum(n for n, _ in part)
        return total
    return sum(pq.read_metadata(f).num_rows for f in files)


def _union_to_errors_from_canon(tables: list[pa.Table]) -> pa.Table:
    src = pa.concat_tables(tables, promote_options="default")
    kinds = src.column("disposition").to_pylist()
    return pa.Table.from_arrays(
        [
            src.column("req_url").cast(pa.string()),
            pc.if_else(
                pc.equal(src.column("method"), ""),
                pa.scalar("GET"),
                src.column("method"),
            ).cast(pa.string()),
            src.column("depth").cast(pa.int32()),
            src.column("seq_path").cast(pa.binary()),
            pa.array(kinds, pa.string()),
            src.column("path").cast(pa.string()),  # holds the message for badurl
        ],
        schema=ERRORS_SCHEMA,
    )


def _canon_rows_to_errors(rows: pa.Table, kind: str, message: str) -> pa.Table:
    n = rows.num_rows
    return pa.Table.from_arrays(
        [
            rows.column("req_url").cast(pa.string()),
            pc.if_else(
                pc.equal(rows.column("method"), ""),
                pa.scalar("GET"),
                rows.column("method"),
            ).cast(pa.string()),
            rows.column("depth").cast(pa.int32()),
            rows.column("seq_path").cast(pa.binary()),
            pa.array([kind] * n, pa.string()),
            pc.binary_join_element_wise(
                pa.array([message + ": "] * n, pa.string()),
                rows.column("path").cast(pa.string()),
                "",
            ),
        ],
        schema=ERRORS_SCHEMA,
    )
