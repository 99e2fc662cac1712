"""Page-store strategies (SURVEY.md §2.5 J1): the broadcast index and
the bucketed partition-local layout must be observationally identical —
the bucketed store is the 100 TB scale path, the broadcast store the
small-corpus shortcut, and the engine must produce the same crawl over
either."""

import json

import pyarrow.parquet as pq
import pytest

from crawl_ray.engine import CrawlEngine, EngineConfig
from crawl_ray.fixtures import EPOCH_US, generate_pages, generate_robots, generate_seeds
from crawl_ray.sources.pages import (
    BroadcastPageStore,
    BucketedPageStore,
    bucket_pages,
    build_broadcast_index,
)
from crawl_ray.spiders import flagship_spider

N = 150


@pytest.fixture(scope="module")
def web(tmp_path_factory):
    pages = generate_pages(N)
    d = tmp_path_factory.mktemp("bweb")
    pq.write_table(pages, d / "pages.parquet")
    return pages, str(d / "pages.parquet"), d


def test_lookup_equivalence(web, tmp_path_factory):
    pages, pages_path, _ = web
    root = bucket_pages(
        pages_path, str(tmp_path_factory.mktemp("buckets")), n_buckets=7
    )
    broadcast = BroadcastPageStore(build_broadcast_index(pq.read_table(pages_path)))
    bucketed = BucketedPageStore(root)
    urls = pages.column("url").to_pylist()
    probe = urls[:40] + ["http://nowhere.example/missing", urls[-1]]
    s_b, h_b, c_b = broadcast.lookup(probe)
    s_k, h_k, c_k = bucketed.lookup(probe)
    assert s_b.tolist() == s_k.tolist()
    assert h_b == h_k
    assert c_b == c_k
    # the flagship web has no set_cookie column -> all ""
    assert set(c_b) == {""}
    assert s_b[len(probe) - 2] == 404 and h_b[len(probe) - 2] == b""
    assert s_b[0] == 200


def test_engine_bucketed_equals_broadcast(web, ray_session, tmp_path_factory):
    pages, pages_path, _ = web
    seeds = generate_seeds(pages)
    robots = generate_robots(pages)
    root = bucket_pages(
        pages_path, str(tmp_path_factory.mktemp("buckets2")), n_buckets=5
    )
    base = dict(
        round_budget=100,
        max_rounds=10,
        max_depth=4,
        virtual_t0=EPOCH_US,
        n_admission_shards=2,
        extract_concurrency=2,
    )

    def crawl(store_mode: str, path: str, wd: str):
        cfg = EngineConfig(**base, page_store=store_mode)
        engine = CrawlEngine([flagship_spider], cfg)
        try:
            result = engine.run(path, seeds, robots, wd)
            trace = result.trace_table()
            records = result.records_table()
        finally:
            engine.shutdown_shards()
        t = sorted(
            zip(trace.column("round").to_pylist(), trace.column("url").to_pylist())
        )
        r = sorted(
            zip(
                records.column("url").to_pylist(),
                records.column("fields").to_pylist(),
            )
        )
        return t, r

    t_b, r_b = crawl("broadcast", pages_path, str(tmp_path_factory.mktemp("wb")))
    t_k, r_k = crawl("bucketed", root, str(tmp_path_factory.mktemp("wk")))
    assert t_b == t_k
    assert r_b == r_k
    # texts really flowed through the bucketed read path
    page_text = dict(
        zip(pages.column("url").to_pylist(), pages.column("text").to_pylist())
    )
    assert r_k, "bucketed crawl extracted no records"
    for url, fields in r_k:
        assert json.loads(fields)["text"] == page_text[url]


def test_bucket_pages_rebuilds_on_bucket_count_change(tmp_path):
    """A finished layout built with a different n_buckets must be
    rebuilt to honor the caller's repartitioning request, not silently
    returned."""
    import pathlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawl_ray.sources.pages import BucketedPageStore, bucket_pages

    src = tmp_path / "pages.parquet"
    pq.write_table(
        pa.table({
            "url": pa.array([f"http://h.example/p/{i}" for i in range(20)],
                            pa.string()),
            "html": pa.array([b"<html></html>"] * 20, pa.binary()),
        }),
        src,
    )
    dst = str(tmp_path / "buckets")
    bucket_pages(str(src), dst, n_buckets=4)
    assert BucketedPageStore(dst).n_buckets == 4
    bucket_pages(str(src), dst, n_buckets=8)  # scale-up request
    assert BucketedPageStore(dst).n_buckets == 8
    assert len(list(pathlib.Path(dst).glob("bucket=*"))) == 8
    # unchanged request is a cache hit (marker still present)
    bucket_pages(str(src), dst, n_buckets=8)
    assert (pathlib.Path(dst) / "_SUCCESS").exists()
