"""Live-HTTP consumer app (U5 over S3's real-network path) — the
Ray-Data equivalent of running the reference against an actual site
(``crawler.go:180-189``: the default ``http.Client`` transport).

Everything is identical to ``examples/imdb_like.py`` except the fetch
stage: ``fetch_stage_factory`` swaps the page-store join for
:class:`crawl_ray.stages.fetch.HttpFetchStage`, whose urllib transport
runs inside every Ray fetch task — real sockets, redirects recorded as
``final_url`` (reference ``response.go:46-48``), timeouts/DNS failures
surfaced as typed error rows (``request_error.go:6-14``).

The "site" here is a loopback ``http.server`` so the example is
runnable in a sandbox with no network; point ``seeds`` at a real host
(and set a polite ``default_rate``) to crawl one.

    python examples/live_http.py
"""

import http.server
import json
import os
import shutil
import sys
import threading

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyarrow as pa
import pyarrow.parquet as pq

import ray

from crawl_ray.engine import CrawlEngine, EngineConfig
from crawl_ray.spiders import flagship_spider
from crawl_ray.stages.fetch import HttpFetchStage

SITE = {
    "/": (
        "<html><title>home</title><body>"
        '<a href="/docs">docs</a> <a href="/about">about</a>'
        " welcome text</body></html>"
    ),
    "/docs": (
        "<html><title>docs</title><body>"
        '<a href="/">home</a> docs text</body></html>'
    ),
    "/about": "<html><title>about</title><body>about text</body></html>",
}


class _SiteHandler(http.server.BaseHTTPRequestHandler):
    def do_GET(self):
        body = SITE.get(self.path)
        if body is None:
            self.send_response(404)
            self.end_headers()
            return
        data = body.encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(data)))
        self.send_header("Content-Type", "text/html")
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):  # quiet
        pass


def main() -> None:
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _SiteHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    workdir = "/tmp/crawl_ray_example_live"
    shutil.rmtree(workdir, ignore_errors=True)

    # run() requires a pages path; the HTTP stage never reads it
    dummy = f"{workdir}_pages.parquet"
    pq.write_table(
        pa.table({"url": pa.array(["http://unused/"], pa.string()),
                  "html": pa.array([b"<html></html>"], pa.binary())}),
        dummy,
    )
    seeds = pa.table(
        {"url": pa.array([f"{base}/"], pa.string()),
         "callbacks": pa.array([["page"]], pa.list_(pa.string()))}
    )

    engine = CrawlEngine(
        [flagship_spider],
        EngineConfig(max_rounds=4, page_store="broadcast"),
        # the ONE line that makes the crawl live (S3 pluggable fetch):
        fetch_stage_factory=lambda _store: HttpFetchStage(timeout_s=10),
    )
    try:
        res = engine.run(dummy, seeds, None, workdir)
    finally:
        engine.shutdown_shards()
    srv.shutdown()

    records = res.records_table()
    print(f"crawled {res.records} pages over live HTTP from {base}")
    for url, fields in zip(records.column("url").to_pylist(),
                           records.column("fields").to_pylist()):
        f = json.loads(fields)
        print(f"  {url}  title={f['title']!r}  text={f['text'][:40]!r}")
    errors = res.errors_table()
    if errors is not None and errors.num_rows:
        print(f"errors: {errors.num_rows}")

    ray.shutdown()


if __name__ == "__main__":
    main()
