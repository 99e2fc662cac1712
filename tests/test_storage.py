"""Shared-storage root contract (crawl_ray.storage): every task-side
store honors CRAWL_RAY_STORE_ROOT / set_store_root, and the multi-node
assertion replaces the old blanket single-node guards."""

import numpy as np
import pytest

import crawl_ray.storage as ST


@pytest.fixture(autouse=True)
def _restore_root():
    yield
    ST.set_store_root(None)


def test_store_root_resolution(monkeypatch, tmp_path):
    monkeypatch.delenv("CRAWL_RAY_STORE_ROOT", raising=False)
    assert str(ST.store_root()) == ST.DEFAULT_STORE_ROOT
    monkeypatch.setenv("CRAWL_RAY_STORE_ROOT", str(tmp_path / "envroot"))
    assert ST.store_root() == tmp_path / "envroot"
    ST.set_store_root(str(tmp_path / "override"))  # programmatic wins
    assert ST.store_root() == tmp_path / "override"


def test_multinode_refuses_unconfigured_root(monkeypatch, ray_session):
    """>1 alive node + default node-local root → loud failure at
    store-creation time, naming the knob."""
    import ray as ray_mod

    monkeypatch.delenv("CRAWL_RAY_STORE_ROOT", raising=False)
    two_nodes = [{"Alive": True}, {"Alive": True}]
    monkeypatch.setattr(ray_mod, "nodes", lambda: two_nodes)
    with pytest.raises(RuntimeError, match="CRAWL_RAY_STORE_ROOT"):
        ST.check_multinode_storage("the test store", "/tmp/x")
    # a configured root is the operator's shared-storage attestation —
    # but it covers exactly the tree under the root, nothing else
    ST.set_store_root("/mnt/shared/crawl")
    ST.check_multinode_storage("the test store", "/mnt/shared/crawl/x")
    with pytest.raises(RuntimeError, match="not under any attested"):
        ST.check_multinode_storage("the test store", "/tmp/unrelated_wd")


def test_engine_workdir_outside_attested_root_refused(
    monkeypatch, ray_session, tmp_path
):
    """Setting CRAWL_RAY_STORE_ROOT for the dedup stores must NOT
    silently bless an engine workdir on node-local /tmp: on a
    multi-node cluster a workdir outside the attested root still
    fails loudly (the exact silent-URL-drop the guard prevents)."""
    import ray as ray_mod

    ST.set_store_root(str(tmp_path / "nfs"))
    monkeypatch.setattr(
        ray_mod, "nodes", lambda: [{"Alive": True}, {"Alive": True}]
    )
    with pytest.raises(RuntimeError, match="not under any attested"):
        ST.check_multinode_storage(
            "CrawlEngine.run workdir", "/tmp/some_local_wd"
        )
    # under the attested root: fine
    ST.check_multinode_storage(
        "CrawlEngine.run workdir", str(tmp_path / "nfs" / "run1")
    )
    # a second shared mount (workdir on a different NFS than the store
    # root) is attestable via CRAWL_RAY_ATTESTED_ROOTS
    monkeypatch.setenv(
        "CRAWL_RAY_ATTESTED_ROOTS",
        f"{tmp_path / 'other-nfs'}:{tmp_path / 'third'}",
    )
    ST.check_multinode_storage(
        "CrawlEngine.run workdir", str(tmp_path / "other-nfs" / "run2")
    )
    ST.check_multinode_storage(
        "CrawlEngine.run workdir", str(tmp_path / "third" / "x")
    )
    with pytest.raises(RuntimeError, match="not under any attested"):
        ST.check_multinode_storage(
            "CrawlEngine.run workdir", "/tmp/still_unattested"
        )


def test_minhash_store_lands_under_configured_root(
    ray_session, tmp_path, monkeypatch
):
    """The minhash shingle store (a task-side bucketed store written
    AND read by Ray tasks) follows the configured root, and the
    verified pairs are identical to a default-root run."""
    import crawl_ray.pipelines.dedup as DD

    sf = "/root/testdata/sf0.001"
    base = DD.minhash_lsh_pairs(sf)

    ST.set_store_root(str(tmp_path / "shared"))
    got = DD.minhash_lsh_pairs(sf)
    stores = list((tmp_path / "shared").glob("shingles_*/bucket=*/*.parquet"))
    assert stores, "shingle store not created under the configured root"
    assert got.equals(base)


def test_export_sink_honors_configured_root(ray_session, tmp_path):
    from crawl_ray.sources.export import export_corpus_parquet

    ST.set_store_root(str(tmp_path / "exp"))
    root = export_corpus_parquet("/root/testdata/sf0.001")
    assert str(root).startswith(str(tmp_path / "exp"))
    parts = list((tmp_path / "exp").glob("parquet_*/shard=*/*.parquet"))
    assert parts


def test_engine_workdir_multinode_assertion(monkeypatch, ray_session, tmp_path):
    """CrawlEngine.run refuses a multi-node run on an unconfigured
    root before doing any work."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray as ray_mod
    from crawl_ray.engine import CrawlEngine, EngineConfig
    from crawl_ray.spiders import flagship_spider

    monkeypatch.delenv("CRAWL_RAY_STORE_ROOT", raising=False)
    dummy = tmp_path / "pages.parquet"
    pq.write_table(
        pa.table({"url": pa.array(["http://h/"], pa.string()),
                  "html": pa.array([b""], pa.binary())}),
        dummy,
    )
    seeds = pa.table(
        {"url": pa.array(["http://h/"], pa.string()),
         "callbacks": pa.array([["page"]], pa.list_(pa.string()))}
    )
    engine = CrawlEngine([flagship_spider], EngineConfig(max_rounds=1))
    monkeypatch.setattr(
        ray_mod, "nodes", lambda: [{"Alive": True}, {"Alive": True}]
    )
    try:
        with pytest.raises(RuntimeError, match="CRAWL_RAY_STORE_ROOT"):
            engine.run(str(dummy), seeds, None, str(tmp_path / "wd"))
    finally:
        monkeypatch.undo()
        engine.shutdown_shards()
