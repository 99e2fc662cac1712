"""Consumer-app assembly (U5) — the Ray-Data equivalent of the
reference's ``examples/imdb/main.go``: build a spider, construct the
engine with execution options, schedule seeds, run, and read the
error channel.

The reference (42 lines of Go, ``main.go:17-42``):

    c := crawl.New(WithQueue(1000), WithConcurrency(200),
                   WithSpiders(imdb.Spider))
    c.Schedule(ctx, &crawl.Request{URL: ..., Callbacks: ...})
    go func() { for err := range c.Errors() { log.Print(err) } }()
    c.Start()

Here the queue is the per-round frontier, concurrency is the
extract-stage actor width, Schedule is a seed row, Start is
``engine.run``, and the errors channel is the errors parquet sink.
Run it (no network — the 'web' is the deterministic fixture store):

    python examples/imdb_like.py
"""

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyarrow.parquet as pq

import ray

from crawl_ray.engine import CrawlEngine, EngineConfig
from crawl_ray.fixtures import fixture_dir
from crawl_ray.request import HandlerRegistry, Request
from crawl_ray.response import HandlerResult, ResponseView
from crawl_ray.spiders import HandlerError


def list_handler(resp: ResponseView, result: HandlerResult) -> None:
    """The imdb ``List`` analog (``spider/spider.go:30-45``): schedule
    every linked detail page, emit nothing."""
    if resp.status != 200:
        raise HandlerError(f"http status {resp.status}")
    for node in resp.find("ul li a"):
        href = node.attrs.get("href")
        if href:
            result.schedule(
                Request(url=href, referer=resp.url, callbacks=["movie"])
            )


def movie_handler(resp: ResponseView, result: HandlerResult) -> None:
    """The imdb ``Movie`` analog (``spider/spider.go:47-64``): one
    record per detail page."""
    if resp.status != 200:
        raise HandlerError(f"http status {resp.status}")
    result.emit(title=resp.text("h1"), url=resp.url)


def spider(registry: HandlerRegistry) -> None:
    registry.register("list", list_handler)
    registry.register("movie", movie_handler)


def main() -> None:
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    d = fixture_dir(500)  # the deterministic synthetic web
    engine = CrawlEngine(
        [spider],
        EngineConfig(
            round_budget=1000,       # WithQueue(1000)
            extract_concurrency=8,   # WithConcurrency
            max_rounds=4,
        ),
    )
    # Schedule: seed rows routed at the "list" callback (the column
    # must stay list<string> — a bare Python list would be inferred as
    # a string column and route nothing)
    import pyarrow as pa

    seeds = pq.read_table(f"{d}/seeds.parquet")
    seeds = seeds.set_column(
        seeds.column_names.index("callbacks"),
        "callbacks",
        pa.array([["list"]] * seeds.num_rows, pa.list_(pa.string())),
    )
    workdir = "/tmp/crawl_ray_runs/example"
    shutil.rmtree(workdir, ignore_errors=True)  # fresh run (engine.run
    # resumes an existing manifest — the checkpoint/restart feature —
    # which is not what a demo wants)
    try:
        result = engine.run(f"{d}/pages.parquet", seeds, None, workdir)
    finally:
        engine.shutdown_shards()
    # the errors channel: a parquet sink, not a goroutine
    errors = result.errors_table()
    print(json.dumps(
        {
            "rounds": result.rounds,
            "records": result.records,
            "errors": 0 if errors is None else errors.num_rows,
        }
    ))
    ray.shutdown()


if __name__ == "__main__":
    main()
