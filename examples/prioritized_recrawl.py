"""Priority-feedback crawl (O2 + link_pagerank): rank the web you
crawled, then spend the next crawl budget on what the web points at.

The loop a production crawler runs continuously:

  1. crawl a wave (here: the deterministic fixture web);
  2. ``link_pagerank`` over the crawled link graph — directed integer
     PageRank, the frontier-prioritization signal;
  3. re-seed the next wave with ``priority = rank``; the engine's
     priority frontier (SURVEY O2: sort(-priority, depth, seq) +
     round budget) fetches high-rank pages FIRST under a tight budget.

No network — the 'web' is the fixture page store.  Run:

    python examples/prioritized_recrawl.py
"""

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyarrow as pa

import ray

from crawl_ray.engine import CrawlEngine, EngineConfig
from crawl_ray.fixtures import EPOCH_US, fixture_dir
from crawl_ray.pipelines.crawl_queries import link_pagerank
from crawl_ray.spiders import flagship_spider


def main() -> None:
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    d = fixture_dir(2000)

    # 2) rank the crawled web (the fixture IS the crawled page store)
    top = link_pagerank("/root/testdata/sf0.01", k=12)
    urls = top.column("url").to_pylist()
    ranks = top.column("rank_micro").to_pylist()
    print(json.dumps({"top_ranked": urls[:3], "rank_micro": ranks[:3]}))

    # 3) re-seed the refetch wave, priority = rank (micro-units fit
    # float32 exactly up to 2^24; scale down for headroom)
    n = len(urls)
    seeds = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "method": pa.array(["GET"] * n, pa.string()),
            "referer": pa.array([""] * n, pa.string()),
            "callbacks": pa.array([["page"]] * n, pa.list_(pa.string())),
            "metadata": pa.array([""] * n, pa.string()),
            "deadline": pa.nulls(n, pa.timestamp("us")),
            "priority": pa.array(
                [r / 1024.0 for r in ranks], pa.float32()
            ),
        }
    )
    cfg = EngineConfig(
        round_budget=4,  # tight: forces the O2 priority split
        max_rounds=6,
        max_depth=0,  # refetch wave only — no link expansion
        virtual_t0=EPOCH_US,
        n_admission_shards=2,
        extract_concurrency=2,
    )
    engine = CrawlEngine([flagship_spider], cfg)
    workdir = "/tmp/crawl_ray_runs/prioritized_recrawl"
    shutil.rmtree(workdir, ignore_errors=True)
    try:
        result = engine.run(f"{d}/pages.parquet", seeds, None, workdir)
    finally:
        engine.shutdown_shards()

    trace = result.trace_table()
    rows = sorted(
        zip(
            trace.column("round").to_pylist(),
            trace.column("order_key").to_pylist(),
            trace.column("url").to_pylist(),
        )
    )
    rank_of = dict(zip(urls, ranks))
    crawl_order = [rank_of[u] for _, _, u in rows]
    # the engine fetched in descending-rank order across rounds
    assert crawl_order == sorted(crawl_order, reverse=True), crawl_order
    print(json.dumps(
        {
            "rounds": result.rounds,
            "fetched": len(rows),
            "round0_ranks": [rank_of[u] for r, _, u in rows if r == 0],
            "rank_ordered": True,
        }
    ))
    ray.shutdown()


if __name__ == "__main__":
    main()
