"""Live-HTTP integration: HttpFetchStage's DEFAULT urllib transport and
a full engine crawl against a real (loopback) HTTP server — the
reference's live-network path (crawler.go:180-189, 284-296) exercised
end-to-end, not through an injected fake."""

import http.server
import threading

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawl_ray.stages.fetch import HttpFetchStage
from crawl_ray.urlnorm import fnv1a64

PAGES = {
    "/": (
        '<html><title>root</title><body>'
        '<a href="/a">A</a> <a href="/b">B</a> root text</body></html>'
    ),
    "/a": "<html><title>a</title><body>leaf a</body></html>",
    "/b": "<html><title>b</title><body>leaf b</body></html>",
}


class _Handler(http.server.BaseHTTPRequestHandler):
    def do_GET(self):
        body = PAGES.get(self.path)
        if body is None:
            self.send_response(404)
            self.end_headers()
            return
        data = body.encode()
        self.send_response(200)
        if self.path == "/":
            self.send_header("Set-Cookie", "sid=root; Path=/")
        self.send_header("Content-Length", str(len(data)))
        self.send_header("Content-Type", "text/html")
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def live_server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _frontier_batch(urls):
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "url_hash": pa.array([fnv1a64(u) for u in urls], pa.uint64()),
            "headers": pa.array([""] * len(urls), pa.string()),
            "metadata": pa.array([""] * len(urls), pa.string()),
        }
    )


def test_default_transport_against_real_server(live_server):
    stage = HttpFetchStage(timeout_s=10)
    out = stage(
        _frontier_batch(
            [f"{live_server}/", f"{live_server}/a", f"{live_server}/missing"]
        )
    )
    assert out.column("status").to_pylist() == [200, 200, 404]
    html = out.column("html").to_pylist()
    assert b'<a href="/a">' in html[0]
    assert b"leaf a" in html[1]
    assert html[2] == b""
    # Set-Cookie harvested from the live response on the root only
    cookies = out.column("set_cookie").to_pylist()
    assert "sid" in cookies[0] and cookies[1] == ""


def test_engine_crawls_live_server(live_server, ray_session, tmp_path):
    """Full engine run with fetch_stage_factory swapped to live HTTP:
    the BFS reaches both leaves through real sockets from Ray workers,
    and the flagship extraction contract holds."""
    from crawl_ray.engine import CrawlEngine, EngineConfig
    from crawl_ray.spiders import flagship_spider

    # dummy page store (unused by the HTTP stage; run() requires a path)
    dummy = tmp_path / "pages.parquet"
    pq.write_table(
        pa.table({"url": pa.array(["http://unused/"], pa.string()),
                  "html": pa.array([b"<html></html>"], pa.binary())}),
        dummy,
    )
    seeds = pa.table(
        {"url": pa.array([f"{live_server}/"], pa.string()),
         "callbacks": pa.array([["page"]], pa.list_(pa.string()))}
    )
    cfg = EngineConfig(max_rounds=4, page_store="broadcast")
    engine = CrawlEngine(
        [flagship_spider], cfg,
        fetch_stage_factory=lambda _store: HttpFetchStage(timeout_s=10),
    )
    res = engine.run(str(dummy), seeds, None, str(tmp_path / "wd"))
    assert res.records == 3  # root + both leaves, each exactly once

    import json

    import pyarrow.dataset as pads

    rec_ds = pads.dataset(
        [str(p) for p in (tmp_path / "wd").glob("round=*/records/*.parquet")]
    ).to_table()
    fields = [json.loads(f) for f in rec_ds.column("fields").to_pylist()]
    titles = sorted(f["title"] for f in fields)
    assert titles == ["a", "b", "root"]
    # live bodies flowed through the real extraction kernel
    root = next(f for f in fields if f["title"] == "root")
    assert "root text" in root["text"]


class _RedirHandler(_Handler):
    def do_GET(self):
        import time

        if self.path == "/moved":
            self.send_response(302)
            self.send_header("Location", "/dir/page")
            self.end_headers()
            return
        if self.path == "/dir/page":
            data = (b'<html><title>moved-target</title><body>'
                    b'<a href="leaf">L</a></body></html>')
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)
            return
        if self.path == "/slow":
            time.sleep(3)
            self.send_response(200)
            self.end_headers()
            return
        super().do_GET()


@pytest.fixture(scope="module")
def redir_server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _RedirHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_final_url_follows_redirects(redir_server):
    """response.go:46-48: the response URL is the POST-redirect URL and
    relative links resolve against IT, not the request URL."""
    stage = HttpFetchStage(timeout_s=10)
    out = stage(_frontier_batch([f"{redir_server}/moved"]))
    assert out.column("status").to_pylist() == [200]
    assert out.column("final_url").to_pylist() == [f"{redir_server}/dir/page"]
    assert out.column("fetch_error_kind").to_pylist() == [""]

    # the extract stage resolves F9 links against final_url
    from crawl_ray.stages.extract import ExtractActor

    from crawl_ray.request import Request

    def _spider(reg):
        def page(resp, out_):
            for link in resp.links("a"):
                out_.schedule(Request(url=link, callbacks=["page"]))
        reg.register("page", page)

    n = out.num_rows
    batch = out
    for name, typ, val in [
        ("method", pa.string(), ""), ("referer", pa.string(), ""),
        ("form", pa.string(), ""), ("query", pa.string(), ""),
        ("cookies", pa.string(), ""), ("raw", pa.bool_(), False),
        ("depth", pa.int32(), 0), ("seq_path", pa.binary(), b""),
        ("priority", pa.float32(), 0.0),
    ]:
        batch = batch.append_column(name, pa.array([val] * n, typ))
    batch = batch.append_column(
        "callbacks", pa.array([["page"]] * n, pa.list_(pa.string()))
    )
    union = ExtractActor([_spider])(batch)
    links = union.filter(
        pa.compute.equal(union.column("kind"), "link")
    ).column("url").to_pylist()
    assert links == [f"{redir_server}/dir/leaf"], (
        "relative link must resolve against the post-redirect URL"
    )


def test_typed_transport_errors(redir_server):
    """request_error.go:6-14: transport failures are typed error rows,
    never fake 404 responses; an HTTP error STATUS stays a response."""
    stage = HttpFetchStage(timeout_s=0.5)
    out = stage(_frontier_batch([
        f"{redir_server}/slow",          # read timeout
        "http://127.0.0.1:9/",           # connection refused (discard port)
        "http://no-such-host.invalid/",  # DNS failure
        f"{redir_server}/missing",       # HTTP 404 — a RESPONSE, not an error
    ]))
    kinds = out.column("fetch_error_kind").to_pylist()
    status = out.column("status").to_pylist()
    assert kinds[0] == "timeout"
    assert kinds[1] == "connection"
    assert kinds[2] == "dns"
    assert kinds[3] == "" and status[3] == 404
    assert status[0] == 0 and status[1] == 0 and status[2] == 0
    msgs = out.column("fetch_error").to_pylist()
    assert msgs[0] and msgs[1] and msgs[2] and msgs[3] == ""


def test_engine_surfaces_typed_fetch_errors(redir_server, ray_session, tmp_path):
    """Engine-level: a timing-out URL lands on the errors stream with
    its typed kind (the reference's Errors() channel, crawler.go:134-135)
    and never produces a record."""
    from crawl_ray.engine import CrawlEngine, EngineConfig
    from crawl_ray.spiders import flagship_spider

    dummy = tmp_path / "pages.parquet"
    pq.write_table(
        pa.table({"url": pa.array(["http://unused/"], pa.string()),
                  "html": pa.array([b"<html></html>"], pa.binary())}),
        dummy,
    )
    seeds = pa.table(
        {"url": pa.array([f"{redir_server}/", f"{redir_server}/slow"],
                         pa.string()),
         "callbacks": pa.array([["page"], ["page"]], pa.list_(pa.string()))}
    )
    cfg = EngineConfig(max_rounds=4, page_store="broadcast")
    engine = CrawlEngine(
        [flagship_spider], cfg,
        fetch_stage_factory=lambda _s: HttpFetchStage(timeout_s=0.5),
    )
    try:
        res = engine.run(str(dummy), seeds, None, str(tmp_path / "wd"))
        errors = res.errors_table()
        assert errors is not None
        kinds = dict(zip(errors.column("url").to_pylist(),
                         errors.column("error_kind").to_pylist()))
        assert kinds.get(f"{redir_server}/slow") == "timeout"
        assert res.records == 3  # root + 2 leaves still extracted
    finally:
        engine.shutdown_shards()


_ECHO: dict = {"rows": []}


class _EchoHandler(http.server.BaseHTTPRequestHandler):
    def _respond(self):
        n = int(self.headers.get("Content-Length") or 0)
        body = self.rfile.read(n) if n else b""
        _ECHO["rows"].append({
            "method": self.command,
            "path": self.path,
            "cookie": self.headers.get("Cookie", ""),
            "content_type": self.headers.get("Content-Type", ""),
            "body": body.decode(),
        })
        data = b"<html><body>ok</body></html>"
        self.send_response(200)
        self.send_header("Content-Length", str(len(data)))
        self.send_header("Set-Cookie", "a=1; Path=/")
        self.send_header("Set-Cookie", "b=2; Path=/")
        self.end_headers()
        self.wfile.write(data)

    do_GET = _respond
    do_POST = _respond

    def log_message(self, *a):
        pass


@pytest.fixture()
def echo_server():
    _ECHO["rows"] = []
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _EchoHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_live_post_body_cookies_and_multi_set_cookie(echo_server):
    """The live transport must send the M1-constructed request — POST
    method + urlencoded form body + the merged Cookie header (request
    cookies + admission jar) — and harvest EVERY Set-Cookie header."""
    import json as _json

    stage = HttpFetchStage(timeout_s=10)
    url = f"{echo_server}/submit"
    batch = pa.table({
        "url": pa.array([url], pa.string()),
        "url_hash": pa.array([fnv1a64(url)], pa.uint64()),
        "headers": pa.array([""], pa.string()),
        "metadata": pa.array([""], pa.string()),
        "method": pa.array(["POST"], pa.string()),
        "form": pa.array([_json.dumps({"q": ["x y"], "s": ["Go"]})],
                         pa.string()),
        "cookies": pa.array([_json.dumps({"pref": ["1"]})], pa.string()),
        "jar_cookies": pa.array([_json.dumps({"sid": "abc"})], pa.string()),
    })
    out = stage(batch)
    assert out.column("status").to_pylist() == [200]
    row = _ECHO["rows"][0]
    assert row["method"] == "POST"
    assert row["content_type"].startswith("application/x-www-form-urlencoded")
    assert row["body"] == "q=x+y&s=Go"
    assert "pref=1" in row["cookie"] and "sid=abc" in row["cookie"]
    # every Set-Cookie header harvested, not just the first
    assert _json.loads(out.column("set_cookie").to_pylist()[0]) == {
        "a": "1", "b": "2"
    }


def test_two_transports_one_session_no_stale_worker(ray_session, tmp_path):
    """Two engines in ONE Ray session with distinct same-qualname
    transport lambdas: the per-process worker cache must key on the
    factory's CONTENT, not its __qualname__ — the old key silently
    reused engine 1's transport for engine 2's tasks."""
    import json as _json

    import pyarrow.dataset as pads

    from crawl_ray.engine import CrawlEngine, EngineConfig
    from crawl_ray.spiders import flagship_spider

    dummy = tmp_path / "pages.parquet"
    pq.write_table(
        pa.table({"url": pa.array(["http://unused/"], pa.string()),
                  "html": pa.array([b"<html></html>"], pa.binary())}),
        dummy,
    )

    def run_with(tag: str, wd: str) -> list[str]:
        body = f"<html><title>{tag}</title><body>{tag}</body></html>"

        def transport(url, headers, proxy, timeout, method, body_in):
            return 200, body.encode(), "", url, "", ""

        seeds = pa.table(
            {"url": pa.array(["http://t.example/"], pa.string()),
             "callbacks": pa.array([["page"]], pa.list_(pa.string()))}
        )
        cfg = EngineConfig(max_rounds=2, max_depth=0,
                           page_store="broadcast", prewarm_workers=False)
        # both factories are '<lambda>' — the collision the content
        # token exists to prevent
        engine = CrawlEngine(
            [flagship_spider], cfg,
            fetch_stage_factory=lambda _s: HttpFetchStage(
                transport=transport),
        )
        engine.run(str(dummy), seeds, None, wd)
        engine.shutdown_shards()
        rec = pads.dataset(
            [str(p) for p in
             (tmp_path / wd.split("/")[-1]).glob("round=*/records/*.parquet")]
        ).to_table()
        return [
            _json.loads(f)["title"] for f in rec.column("fields").to_pylist()
        ]

    t1 = run_with("alpha", str(tmp_path / "w1"))
    t2 = run_with("beta", str(tmp_path / "w2"))
    assert t1 == ["alpha"]
    assert t2 == ["beta"], "stale cached worker served run 1's transport"


def test_cross_host_redirect_cookie_attributed_to_final_host(
    ray_session, tmp_path
):
    """A cross-host redirect's Set-Cookie belongs to the FINAL hop's
    host (Go's cookiejar keys each hop's URL), not the request host:
    the harvest row must carry final_url so the jar fold keys b.com."""
    from crawl_ray.stages.extract import ExtractActor

    def spider(reg):
        reg.register("page", lambda resp, result: None)

    actor = ExtractActor([spider], max_depth=2)
    batch = pa.table(
        {
            "url": pa.array(["http://a.example/moved"], pa.string()),
            "req_url": pa.array(["http://a.example/moved"], pa.string()),
            "method": pa.array([""], pa.string()),
            "referer": pa.array([""], pa.string()),
            "form": pa.array([""], pa.string()),
            "query": pa.array([""], pa.string()),
            "cookies": pa.array([""], pa.string()),
            "headers": pa.array([""], pa.string()),
            "raw": pa.array([False], pa.bool_()),
            "callbacks": pa.array([["page"]], pa.list_(pa.string())),
            "depth": pa.array([0], pa.int32()),
            "seq_path": pa.array([b"\x00"], pa.binary()),
            "priority": pa.array([0.0], pa.float32()),
            "metadata": pa.array([""], pa.string()),
            "status": pa.array([200], pa.int32()),
            "html": pa.array([b"<html></html>"], pa.binary()),
            "set_cookie": pa.array(['{"sid": "x"}'], pa.string()),
            "final_url": pa.array(["http://b.example/landed"], pa.string()),
        }
    )
    out = actor(batch)
    kinds = out.column("kind").to_pylist()
    urls = out.column("url").to_pylist()
    cookie_rows = [u for k, u in zip(kinds, urls) if k == "cookie"]
    assert cookie_rows == ["http://b.example/landed"]
