#!/usr/bin/env python
"""Benchmark harness (driver contract).

Default mode: ``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)`` once,
run the headline pipelines over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``), and print ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...},
     "sf": ..., "num_cpus": N}

``--scaling`` mode: run the flagship frontier crawl twice in FRESH
subprocesses (num_cpus=8 then num_cpus=32) over the same fixture and
report throughput at both plus scaling efficiency T32/(4*T8)
(BASELINE.md protocol; the sandbox stand-in for N vs 4N nodes).

Owns its Ray session (unlike ``__ray_entry__``): the driver invokes this
script as a standalone process.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

# timed per-query subset: one representative per operator family
BENCH_QUERIES = [
    "pricing_summary",
    "orders_per_nation",
    "events_hourly_window",
    "token_stats",
    "language_id",
    "exact_dedup",
    "minhash_lsh_pairs",
    "knn_brute",
    "extract_text",
    "crawl_flagship",
]


def _consume(result) -> int:
    """Force execution; return the row count."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, pa.Table):
        return result.num_rows
    if isinstance(result, pd.DataFrame):
        return len(result)
    return result.count()  # ray.data.Dataset


def _flagship_run(sf_dir: str, num_cpus: int = 32) -> dict:
    """One full frontier crawl; returns elapsed + urls processed.

    Benchmark configuration: generous politeness (high token rate, no
    robots throttling) so rounds run full and the number measures engine
    throughput — schedule + dedup + fetch + extract — rather than
    virtual-clock courtesy waits. The full admission path (token
    buckets, seen set, dedup) still executes for every URL.
    """
    import pyarrow.parquet as pq

    from crawl_ray.engine import CrawlEngine, EngineConfig
    from crawl_ray.fixtures import EPOCH_US, fixture_dir
    from crawl_ray.pipelines.crawl_queries import fixture_size_for
    from crawl_ray.spiders import flagship_spider

    n = fixture_size_for(sf_dir)
    d = fixture_dir(n)
    cfg = EngineConfig(
        round_budget=1 << 30,
        max_rounds=12,
        max_depth=8,
        virtual_t0=EPOCH_US,
        default_rate=1e9,
        default_burst=1 << 30,
        n_admission_shards=max(4, num_cpus // 4),
        extract_concurrency=max(4, num_cpus),
    )
    engine = CrawlEngine([flagship_spider], cfg)
    workdir = f"/tmp/crawl_ray_bench/flagship_n{n}"
    seeds = pq.read_table(f"{d}/seeds.parquet")
    t0 = time.perf_counter()
    try:
        result = engine.run(f"{d}/pages.parquet", seeds, None, workdir)
        trace = result.trace_table()
        records = result.records_table()
    finally:
        engine.shutdown_shards()
    elapsed = time.perf_counter() - t0
    fetched = trace.num_rows if trace is not None else 0
    extracted = records.num_rows if records is not None else 0
    urls = fetched + extracted
    return {
        "elapsed_s": round(elapsed, 3),
        "fetched": fetched,
        "extracted": extracted,
        "urls_per_s": round(urls / elapsed, 1) if elapsed else 0.0,
        "rounds": result.rounds,
    }


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    import __ray_entry__ as E

    qmap = E.queries()
    # untimed warmup: spin up Ray Data worker processes so the first
    # timed query doesn't absorb session startup (~tens of seconds)
    ray.data.range(1000, override_num_blocks=num_cpus).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).count()

    timings: dict[str, float] = {}
    flagship: dict = {}
    total = 0.0
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        if name == "crawl_flagship":
            flagship = _flagship_run(sf_dir, num_cpus)
            dt = flagship["elapsed_s"]
        else:
            _consume(qmap[name](sf_dir))
            dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
    out = {
        "metric": "headline-suite-wall-time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "flagship": flagship,
    }
    ray.shutdown()
    return out


def _crawl_once(sf_dir: str, num_cpus: int) -> None:
    """Internal: fresh-process flagship crawl for --scaling."""
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    res = _flagship_run(sf_dir, num_cpus)
    res["num_cpus"] = num_cpus
    ray.shutdown()
    print(json.dumps(res))


def run_scaling(sf_dir: str, lo: int, hi: int) -> dict:
    """Fresh process per parallelism level (BASELINE.md protocol)."""
    runs = {}
    for cpus in (lo, hi):
        env = dict(os.environ)
        env.pop("RAY_ADDRESS", None)
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"),
             "--_crawl-once", "--cpus", str(cpus), "--sf-dir", sf_dir],
            capture_output=True, text=True, env=env, cwd=REPO, check=True,
        )
        runs[cpus] = json.loads(proc.stdout.strip().splitlines()[-1])
    t_lo = runs[lo]["urls_per_s"]
    t_hi = runs[hi]["urls_per_s"]
    eff = round(t_hi / (t_lo * (hi / lo)), 3) if t_lo else 0.0
    return {
        "metric": "scaling-efficiency",
        "value": eff,
        "unit": "ratio",
        "sf": sf_dir,
        "cpus_lo": lo,
        "cpus_hi": hi,
        "throughput_lo_urls_per_s": t_lo,
        "throughput_hi_urls_per_s": t_hi,
        "runs": runs,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--scaling", action="store_true")
    p.add_argument("--_crawl-once", dest="crawl_once", action="store_true")
    p.add_argument("--cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    p.add_argument("--sf-dir",
                   default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--scaling-lo", type=int, default=8)
    args = p.parse_args()

    if args.crawl_once:
        _crawl_once(args.sf_dir, args.cpus)
        return
    if args.scaling:
        out = run_scaling(args.sf_dir, args.scaling_lo, args.cpus)
    else:
        out = run_bench(args.sf_dir, args.cpus)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
