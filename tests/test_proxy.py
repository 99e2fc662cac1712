"""M5 proxy-selection semantics (proxy.go:11-27, crawler.go:167-178):
metadata round-trip (the reference's one untested-here unit test,
proxy_test.go:10-22), deterministic seeded pick, jar-less proxied
fetch, and the pluggable HttpFetchStage batch contract."""

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawl_ray.stages.fetch import (
    HttpFetchStage,
    pick_proxy,
    pick_proxy_batch,
    proxy_from_metadata,
    with_proxy,
)
from crawl_ray.urlnorm import fnv1a64


def test_proxy_metadata_roundtrip():
    """Mirror of TestProxyFromContext (proxy_test.go:10-22)."""
    md = with_proxy(None, "a", "b")
    addrs, ok = proxy_from_metadata(md)
    assert ok
    assert len(addrs) == 2
    assert addrs[0] == "a" and addrs[1] == "b"
    # WithProxy appends to an existing list (proxy.go:12-15)
    md2 = with_proxy(md, "c")
    addrs2, ok2 = proxy_from_metadata(md2)
    assert ok2 and addrs2 == ["a", "b", "c"]
    # absent key -> not ok
    _, ok3 = proxy_from_metadata({"other": "x"})
    assert not ok3


def test_pick_proxy_deterministic_and_covers_list():
    addrs = ["p1", "p2", "p3"]
    picks = {
        pick_proxy(fnv1a64(f"http://h{i}.example/"), addrs) for i in range(200)
    }
    assert picks == set(addrs)  # all members reachable
    h = fnv1a64("http://h0.example/")
    assert pick_proxy(h, addrs) == pick_proxy(h, addrs)  # stable
    assert pick_proxy(h, []) == ""


def test_pick_proxy_batch_only_decodes_proxied_rows():
    hashes = np.array([fnv1a64("u1"), fnv1a64("u2")], dtype=np.uint64)
    md = ["", json.dumps(with_proxy(None, "px"))]
    assert pick_proxy_batch(hashes, md) == ["", "px"]


def _frontier_batch(urls, metadata):
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "url_hash": pa.array(
                [fnv1a64(u) for u in urls], pa.uint64()
            ),
            "headers": pa.array([""] * len(urls), pa.string()),
            "metadata": pa.array(metadata, pa.string()),
        }
    )


def test_http_fetch_stage_contract_with_fake_transport():
    """The live-HTTP stage honors the fetch batch contract offline:
    injectable transport, per-row proxy pick, set_cookie blanked for
    proxied rows (jar-less client, crawler.go:174-177)."""
    calls = []

    def transport(url, headers, proxy, timeout):
        calls.append((url, proxy))
        return 200, f"<html>{url}</html>".encode(), json.dumps({"sid": "s"})

    stage = HttpFetchStage(transport=transport)
    md = ["", json.dumps(with_proxy(None, "p1", "p2"))]
    out = stage(_frontier_batch(["http://a.example/", "http://b.example/"], md))
    assert out.column("status").to_pylist() == [200, 200]
    assert out.column("html").to_pylist()[0] == b"<html>http://a.example/</html>"
    proxies = out.column("proxy").to_pylist()
    assert proxies[0] == "" and proxies[1] in ("p1", "p2")
    # direct row keeps its Set-Cookie; proxied row is jar-less
    assert out.column("set_cookie").to_pylist()[0] == json.dumps({"sid": "s"})
    assert out.column("set_cookie").to_pylist()[1] == ""
    assert calls[1][1] == proxies[1]  # transport saw the picked proxy


@pytest.fixture(scope="module")
def proxy_cookie_run(ray_session, tmp_path_factory):
    """Cookie web with proxy metadata on EVEN hosts' seeds: proxied
    round-0 fetches must not harvest Set-Cookie, so /next on those
    hosts sees an empty jar; odd hosts behave as before."""
    import pyarrow.parquet as pq_

    from crawl_ray.engine import CrawlEngine, EngineConfig
    from crawl_ray.fixtures import cookie_web_dir
    from crawl_ray.oracle_data import cookies_core_cfg
    from crawl_ray.request import HandlerRegistry
    from crawl_ray.simulator import CrawlConfig, simulate
    from crawl_ray.spiders import cookie_spider

    d = cookie_web_dir(8)
    pages = pq_.read_table(f"{d}/pages.parquet")
    seeds = pq_.read_table(f"{d}/seeds.parquet")
    md = []
    for u in seeds.column("url").to_pylist():
        k = u.rsplit("/", 1)[1]
        if k.isdigit() and int(k) % 2 == 0 and "cookiehost" in u:
            md.append(json.dumps(with_proxy(None, "http://px1:3128",
                                            "http://px2:3128"),
                                 sort_keys=True))
        else:
            md.append("")
    seeds = seeds.set_column(
        seeds.schema.get_field_index("metadata"), "metadata",
        pa.array(md, pa.string()),
    )

    reg = HandlerRegistry()
    cookie_spider(reg)
    sim = simulate(pages, seeds, None, reg, CrawlConfig(**cookies_core_cfg()))

    cfg = EngineConfig(**cookies_core_cfg(), n_admission_shards=2,
                       extract_concurrency=2)
    engine = CrawlEngine([cookie_spider], cfg)
    wd = str(tmp_path_factory.mktemp("proxycookies"))
    result = engine.run(f"{d}/pages.parquet", seeds, None, wd)
    engine.shutdown_shards()
    return sim, result


def test_proxied_fetch_skips_jar_engine_equals_simulator(proxy_cookie_run):
    sim, result = proxy_cookie_run
    records = result.records_table()
    eng = sorted(
        (u, json.loads(f))
        for u, f in zip(records.column("url").to_pylist(),
                        records.column("fields").to_pylist())
    )
    sim_records = sorted((r["url"], r["fields"]) for r in sim.records)
    assert eng == sim_records  # parity under proxy routing
    by_url = dict(eng)
    # even host: round-0 /start was proxied -> its Set-Cookie never
    # reached the jar -> /next sends only the explicit request cookie
    assert by_url["http://cookiehost2.example/next/2"]["cookie"] == "u=x2"
    # odd host: unproxied, jar cookie present as ever
    assert by_url["http://cookiehost3.example/next/3"]["cookie"] == "u=x3; sid=s3"
    # /next itself is unproxied on both, so /final sees its harvest
    assert by_url["http://cookiehost2.example/final/2"]["cookie"] == "sid=o2; tok=t2"


def test_trace_records_picked_proxy(proxy_cookie_run):
    _, result = proxy_cookie_run
    trace = result.trace_table()
    assert "proxy" in trace.column_names
    got = dict(zip(trace.column("url").to_pylist(),
                   trace.column("proxy").to_pylist()))
    assert got["http://cookiehost2.example/start/2"] in (
        "http://px1:3128", "http://px2:3128"
    )
    assert got["http://cookiehost3.example/start/3"] == ""
    assert got["http://cookiehost2.example/next/2"] == ""  # children direct
