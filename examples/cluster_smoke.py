"""Multi-node smoke: THE documented `ray job submit` entry point.

Runs the flagship URL-frontier crawl against a shared-storage workdir,
exercising the full deployment contract end-to-end:

* `ray.init(address="auto")` — attach to the running cluster (the job
  owner owns the session; the engine never calls ray.init itself);
* `CRAWL_RAY_STORE_ROOT` — the one shared-storage attestation knob
  (crawl_ray/storage.py): every task-side write (frontier shards,
  spill, trace, records, checkpoints) lands under it, and
  `check_multinode_storage` fails loudly BEFORE the crawl if the root
  is unattested node-local `/tmp` on a multi-node cluster;
* kill-resume: after the run commits, a second `engine.run(...,
  resume=True)` must restore from the last round manifest and change
  nothing — asserted here, so the smoke proves the checkpoint path on
  the actual deployment storage, not just in unit tests.

Cluster usage:

    export CRAWL_RAY_STORE_ROOT=/mnt/shared/crawl_ray
    ray job submit --working-dir . -- \
        python examples/cluster_smoke.py --pages /mnt/shared/pages.parquet

CI / single-node usage (no cluster, temp store root):

    python examples/cluster_smoke.py --ci --n-pages 500

Prints ONE JSON line: {"rounds": ..., "records": ..., "urls_per_s": ...,
"resume_ok": true, "workdir": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", default=None,
                    help="pages parquet on shared storage; omitted = "
                         "the deterministic synthetic web fixture")
    ap.add_argument("--seeds", default=None,
                    help="seeds parquet (required with --pages)")
    ap.add_argument("--robots", default=None)
    ap.add_argument("--ci", action="store_true",
                    help="single-node mode: address='local' and a temp "
                         "store root if CRAWL_RAY_STORE_ROOT is unset")
    ap.add_argument("--n-pages", type=int, default=2000,
                    help="fixture web size when --pages is omitted")
    ap.add_argument("--max-rounds", type=int, default=10)
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--run-name", default="cluster-smoke")
    args = ap.parse_args(argv)

    import pyarrow.parquet as pq

    import ray

    if not ray.is_initialized():
        # workers need the repo on their path too when crawl_ray isn't
        # pip-installed (a `ray job submit --working-dir .` ships it;
        # this covers direct CI invocation from any cwd)
        repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
        ray.init(
            address="local" if args.ci else "auto",
            include_dashboard=False,
            runtime_env={"env_vars": {"PYTHONPATH": os.pathsep.join(
                [repo, os.environ.get("PYTHONPATH", "")]).rstrip(os.pathsep)}},
        )

    from crawl_ray import storage

    if args.ci and not os.environ.get("CRAWL_RAY_STORE_ROOT"):
        storage.set_store_root(
            tempfile.mkdtemp(prefix="crawl_ray_smoke_")
        )
    workdir = storage.store_root() / "runs" / args.run_name
    # the same attestation gate every task-side store goes through —
    # on a multi-node cluster with an unconfigured root this raises
    # HERE, before any work scatters files across hosts
    storage.check_multinode_storage("cluster-smoke workdir", workdir)

    if args.pages:
        if not args.seeds:
            ap.error("--seeds is required with --pages")
        pages_path = args.pages
        seeds = pq.read_table(args.seeds)
        robots = pq.read_table(args.robots) if args.robots else None
        cfg_kw = {}
    else:
        from crawl_ray.fixtures import fixture_dir
        from crawl_ray.oracle_data import flagship_core_cfg

        d = fixture_dir(args.n_pages)
        pages_path = f"{d}/pages.parquet"
        seeds = pq.read_table(f"{d}/seeds.parquet")
        robots = pq.read_table(f"{d}/robots.parquet")
        cfg_kw = flagship_core_cfg(args.n_pages)

    from crawl_ray.engine import CrawlEngine, EngineConfig
    from crawl_ray.spiders import flagship_spider

    cfg = EngineConfig(
        **cfg_kw,
        n_admission_shards=args.shards,
    )
    if args.max_rounds and not cfg_kw:
        cfg.max_rounds = args.max_rounds

    engine = CrawlEngine([flagship_spider], cfg)
    t0 = time.perf_counter()
    try:
        result = engine.run(pages_path, seeds, robots, str(workdir))
        elapsed = time.perf_counter() - t0
        if result.records <= 0:
            raise SystemExit("smoke failed: zero records extracted")

        # kill-resume contract on the SAME storage: a resumed run must
        # restore the last committed manifest and add nothing
        resumed = engine.run(pages_path, None, robots, str(workdir),
                             resume=True)
        resume_ok = resumed.records == 0 and resumed.errors == 0
        if not resume_ok:
            raise SystemExit(
                f"resume not idempotent: +{resumed.records} records "
                f"+{resumed.errors} errors on an already-finished crawl"
            )
    finally:
        engine.shutdown_shards()

    print(json.dumps({
        "rounds": result.rounds,
        "admitted": result.admitted,
        "records": result.records,
        "errors": result.errors,
        "elapsed_s": round(elapsed, 3),
        "urls_per_s": round(result.admitted / elapsed, 1) if elapsed else 0,
        "resume_ok": resume_ok,
        "workdir": str(workdir),
        "store_root": str(storage.store_root()),
        "nodes": len([n for n in ray.nodes() if n.get("Alive")]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
