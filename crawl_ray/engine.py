"""The Ray-Data-native crawl engine: BFS micro-batch round loop.

The reference's continuous queue-consumer loop (``crawler.go:119-144``)
becomes per-round Dataset pipelines (SURVEY.md §3.4):

    round K:  read frontier ∪ spill (Parquet)
              → canonicalize (map_batches; M1/M2)
              → [priority sort + budget split when over budget]  (O2)
              → groupby(host).map_groups(admission)              (ST4/ST5)
              → fetch join (J1) → ExtractActor pool (M6/M7, F1-F9)
              → links → round K+1 frontier; records/errors/trace sinks
              → snapshot shard state + atomic manifest            (§4.3)

Scale notes (the 100 TB design points, tested here at fixture scale):

* the only per-round shuffles are the host groupby and — only when the
  pending frontier exceeds the round budget — one priority sort; both
  are keyed exactly as the north star prescribes.
* every sink is per-round partitioned Parquet, so a killed run resumes
  at the last committed manifest without recomputing finished rounds.
* the frontier never materializes outside the object store; the round
  budget bounds every downstream stage.
* hot hosts are bounded by the token bucket: a host admits at most
  ``burst + rate·rounds`` fetches no matter how many links point at it;
  residual skew lands in the deferred spill, not in a task.
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
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
from crawl_ray.urlnorm import fnv1a64

__all__ = ["EngineConfig", "CrawlEngine", "CrawlRunResult"]


@dataclass
class EngineConfig(CrawlConfig):
    """CrawlConfig (shared with the simulator — identical semantics) +
    physical execution knobs."""

    n_admission_shards: int = 4
    extract_concurrency: int = 4
    extract_batch_size: int = 256
    canonicalize_batch_size: int = 4096
    page_store: str = "broadcast"  # "broadcast" | "bucketed"
    n_page_buckets: int = 64
    checkpoint_interval: int = 1  # snapshot state every N rounds
    keep_trace: bool = True


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


def _filter_batches(ds, fn):
    """Vectorized filter: Arrow mask inside map_batches (Ray's row
    ``filter`` would run a Python predicate per row)."""
    return ds.map_batches(
        lambda t: t.filter(fn(t)), batch_format="pyarrow", zero_copy_batch=True
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

    def __init__(self, spiders: list, config: EngineConfig | None = None) -> None:
        self.spiders = list(spiders)
        self.cfg = config or EngineConfig()

    # -- seeds -------------------------------------------------------
    def write_seeds(self, seeds: pa.Table, workdir: str) -> None:
        """Round-0 frontier injection (the ``crawl-schedule`` analog)."""
        n = seeds.num_rows
        seeds = seeds.append_column(
            "seq_path", pa.array([seq_root(i) for i in range(n)], pa.binary())
        )
        _write(seeds, pathlib.Path(workdir) / "round=0" / "frontier")

    # -- checkpoint helpers ------------------------------------------
    @staticmethod
    def _committed_round(workdir: pathlib.Path) -> int | None:
        best = None
        for d in workdir.glob("round=*"):
            if (d / "manifest.json").exists():
                k = int(d.name.split("=")[1])
                best = k if best is None else max(best, k)
        return best

    def _snapshot(self, shards, round_dir: pathlib.Path) -> None:
        state_dir = round_dir / "state"
        state_dir.mkdir(parents=True, exist_ok=True)
        snaps = ray.get([s.snapshot.remote() for s in shards])
        for i, snap in enumerate(snaps):
            np.savez_compressed(
                state_dir / f"shard_{i}.npz",
                table=snap["seen"]["table"],
                tokens=json.dumps(snap["tokens"]),
            )

    @staticmethod
    def _restore(shards, round_dir: pathlib.Path) -> None:
        futures = []
        for i, shard in enumerate(shards):
            with np.load(round_dir / "state" / f"shard_{i}.npz") as z:
                state = {
                    "seen": {"table": z["table"]},
                    "tokens": json.loads(str(z["tokens"])),
                }
            futures.append(shard.restore.remote(state))
        ray.get(futures)

    # -- the loop ----------------------------------------------------
    def run(
        self,
        pages_path: str,
        seeds: pa.Table | None,
        robots: pa.Table | None,
        workdir: str,
        resume: bool = False,
    ) -> CrawlRunResult:
        cfg = self.cfg
        wd = pathlib.Path(workdir)
        if not resume and wd.exists():
            shutil.rmtree(wd)
        wd.mkdir(parents=True, exist_ok=True)

        disallow, rates = _robots_maps(robots)
        ShardActor = ray.remote(num_cpus=0.25)(AdmissionShard)
        shards = [
            ShardActor.remote(disallow, rates, cfg.default_rate, cfg.default_burst)
            for _ in range(cfg.n_admission_shards)
        ]

        # page store (J1): broadcast index or bucketed partition-local
        if cfg.page_store == "bucketed":
            store = BucketedPageStore(pages_path)  # cheap handle; workers open files
        else:
            index = build_broadcast_index(pq.read_table(pages_path, columns=["url", "html"]))
            store = ray.put(BroadcastPageStore(index))
        fetch_fn = make_fetch_fn(store)

        start_round = 0
        if resume:
            committed = self._committed_round(wd)
            if committed is not None:
                self._restore(shards, wd / f"round={committed}")
                start_round = committed + 1
        if start_round == 0:
            if seeds is None:
                raise ValueError("seeds required for a fresh run")
            for stale in wd.glob("round=*"):
                shutil.rmtree(stale)
            self.write_seeds(seeds, workdir)

        result = CrawlRunResult(workdir=workdir)
        result.rounds = start_round

        for rnd in range(start_round, cfg.max_rounds + 1):
            round_dir = wd / f"round={rnd}"
            frontier_files = sorted(
                str(f) for f in (round_dir / "frontier").glob("*.parquet")
            ) + sorted(str(f) for f in (round_dir / "spill").glob("*.parquet"))
            if not frontier_files:
                break
            result.rounds = rnd + 1
            now_us = cfg.virtual_t0 + rnd * 1_000_000
            metrics = {"round": rnd}

            ds = ray.data.read_parquet(frontier_files)
            ds = ds.map_batches(
                canonicalize_batch,
                fn_kwargs={"now_us": now_us},
                batch_format="pyarrow",
                batch_size=cfg.canonicalize_batch_size,
                zero_copy_batch=True,
            ).materialize()

            bad = _filter_batches(
                ds, lambda t: pc.not_equal(t.column("disposition"), "ok")
            ).materialize()
            if bad.count():
                err = _union_to_errors_from_canon(bad.to_arrow_refs())
                _write(err, round_dir / "errors", "canon.parquet")
                result.errors += err.num_rows
            live = _filter_batches(
                ds, lambda t: pc.equal(t.column("disposition"), "ok")
            ).materialize()

            n_live = live.count()
            metrics["pending"] = n_live
            if n_live == 0:
                # nothing fetchable this round; no new frontier/spill is
                # written, so the next iteration terminates on no files
                self._finish_round(shards, round_dir, metrics, result, rnd)
                continue

            # O2: priority sort + budget split only when over budget
            if n_live > cfg.round_budget:
                live = live.sort("order_key")
                head, tail = live.split_at_indices([cfg.round_budget])
                spill_tbl = _collect(tail).select(FRONTIER_SCHEMA.names)
                _write(spill_tbl, wd / f"round={rnd + 1}" / "spill", "overflow.parquet")
                metrics["overflow_deferred"] = spill_tbl.num_rows
                live = head

            # admission: ONE shuffle keyed by host; one shard RPC/group
            handles = shards
            n_shards = len(shards)

            def admission_fn(group: pa.Table) -> pa.Table:
                idx = pc.sort_indices(
                    group, sort_keys=[("order_key", "ascending")]
                )
                group = group.take(idx)
                host = group.column("host")[0].as_py()
                hashes = group.column("url_hash").to_numpy(zero_copy_only=False)
                paths = group.column("path").to_pylist()
                shard = handles[fnv1a64(host) % n_shards]
                disp = ray.get(shard.admit.remote(host, hashes, paths, rnd))
                return group.append_column("admit", pa.array(disp, pa.int8()))

            admission = (
                live.groupby("host")
                .map_groups(admission_fn, batch_format="pyarrow")
                .materialize()
            )

            admitted = _filter_batches(
                admission, lambda t: pc.equal(t.column("admit"), ADMIT)
            ).materialize()
            deferred = _collect(
                _filter_batches(
                    admission, lambda t: pc.equal(t.column("admit"), DEFER)
                )
            )
            if deferred.num_rows:
                _write(
                    deferred.select(FRONTIER_SCHEMA.names),
                    wd / f"round={rnd + 1}" / "spill",
                    "deferred.parquet",
                )
            robots_rows = _collect(
                _filter_batches(
                    admission, lambda t: pc.equal(t.column("admit"), ROBOTS)
                )
            )
            if robots_rows.num_rows:
                _write(
                    _canon_rows_to_errors(robots_rows, "robots", "disallowed"),
                    round_dir / "errors",
                    "robots.parquet",
                )
                result.errors += robots_rows.num_rows
            for name, code in (("dup_dropped", DUP), ("seen_dropped", SEEN)):
                metrics[name] = _count(
                    _filter_batches(
                        admission, lambda t, c=code: pc.equal(t.column("admit"), c)
                    )
                )
            metrics["deferred"] = deferred.num_rows
            n_admitted = admitted.count()
            metrics["admitted"] = n_admitted
            result.admitted += n_admitted

            if cfg.keep_trace and n_admitted:
                trace = _collect(admitted).select(["url", "order_key", "depth"])
                trace = trace.append_column(
                    "round", pa.array([rnd] * trace.num_rows, pa.int32())
                )
                _write(trace, round_dir / "trace")

            if n_admitted:
                union = (
                    admitted.map_batches(
                        fetch_fn, batch_format="pyarrow", zero_copy_batch=True
                    )
                    .map_batches(
                        ExtractActor,
                        fn_constructor_kwargs={
                            "spiders": self.spiders,
                            "max_depth": cfg.max_depth,
                        },
                        batch_format="pyarrow",
                        batch_size=cfg.extract_batch_size,
                        concurrency=(1, cfg.extract_concurrency),
                        zero_copy_batch=True,
                    )
                    .materialize()
                )
                records = _collect(
                    _filter_batches(union, lambda t: pc.equal(t.column("kind"), "record"))
                )
                if records.num_rows:
                    _write(
                        records.select(["url", "depth", "seq_path", "fields"]),
                        round_dir / "records",
                    )
                    result.records += records.num_rows
                errors = _collect(
                    _filter_batches(union, lambda t: pc.equal(t.column("kind"), "error"))
                )
                if errors.num_rows:
                    _write(
                        errors.select(
                            ["url", "method", "depth", "seq_path", "error_kind", "error"]
                        ),
                        round_dir / "errors",
                        "extract.parquet",
                    )
                    result.errors += errors.num_rows
                links = _collect(
                    _filter_batches(union, lambda t: pc.equal(t.column("kind"), "link"))
                )
                metrics["records"] = records.num_rows
                metrics["links"] = links.num_rows
                result.links += links.num_rows
                if links.num_rows:
                    _write(
                        links_to_frontier(links),
                        wd / f"round={rnd + 1}" / "frontier",
                    )

            self._finish_round(shards, round_dir, metrics, result, rnd)

            nxt = wd / f"round={rnd + 1}"
            if _dir_rows(nxt / "frontier") == 0 and _dir_rows(nxt / "spill") == 0:
                break

        # final state for downstream inspection
        result.metrics.append(
            {"round": -1, "seen_total": int(sum(ray.get([s.seen_count.remote() for s in shards])))}
        )
        self._shards = shards
        return result

    def _finish_round(self, shards, round_dir, metrics, result, rnd) -> None:
        if rnd % self.cfg.checkpoint_interval == 0:
            self._snapshot(shards, round_dir)
        (round_dir / "metrics.json").parent.mkdir(parents=True, exist_ok=True)
        (round_dir / "metrics.json").write_text(json.dumps(metrics))
        result.metrics.append(metrics)
        # atomic commit marker LAST (manifest = the commit point, §4.3)
        tmp = round_dir / ".manifest.tmp"
        tmp.write_text(json.dumps({"round": rnd, "metrics": metrics}))
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


# -- small helpers ---------------------------------------------------------


def _collect(ds) -> pa.Table:
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tables:
        refs = ds.to_arrow_refs()
        return ray.get(refs[0]) if refs else pa.table({})
    return pa.concat_tables(tables, promote_options="default").combine_chunks()


def _count(ds) -> int:
    return ds.count()


def _dir_rows(directory: pathlib.Path) -> int:
    total = 0
    for f in directory.glob("*.parquet"):
        total += pq.read_metadata(f).num_rows
    return total


def _union_to_errors_from_canon(refs) -> pa.Table:
    tables = [t for t in ray.get(refs) if t.num_rows]
    src = pa.concat_tables(tables, promote_options="default")
    kinds = src.column("disposition").to_pylist()
    return pa.Table.from_arrays(
        [
            src.column("url").cast(pa.string()),
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
            rows.column("url").cast(pa.string()),
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
