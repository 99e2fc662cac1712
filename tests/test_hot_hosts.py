"""Two-level admission sharding for enormous hosts (SURVEY §2.4 ST4/ST5
trade-off, VERDICT r3 item 6).

A host promoted via ``EngineConfig.hot_hosts`` routes its frontier rows
by (host, url_hash-bucket) so the O(rows) screening spreads across all
admission shards, while token/jar state stays on the home shard and is
drawn once per round.  These tests pin (a) exact semantic equivalence
of the two-phase protocol to the one-shot path under 95% single-host
skew, (b) engine ≡ simulator parity with promotion enabled, (c) the
actual work spread across shards, and (d) checkpoint/resume (seen
entries live on bucket shards)."""

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from crawl_ray.engine import (
    CrawlEngine,
    EngineConfig,
    _finalize_hot,
    _shard_partition,
)
from crawl_ray.fixtures import (
    EPOCH_US,
    generate_pages,
    generate_robots,
    generate_seeds,
)
from crawl_ray.request import HandlerRegistry
from crawl_ray.simulator import CrawlConfig, simulate
from crawl_ray.spiders import flagship_spider
from crawl_ray.stages.canonicalize import encode_order_key
from crawl_ray.state.admission import ADMIT, AdmissionShard
from crawl_ray.urlnorm import fnv1a64_batch

BIG = "big.example"


def _frontier_table(rows):
    """Minimal canonicalized-frontier slice the admission path needs:
    rows = [(host, path, seq)] with seq unique per row (order_key
    uniqueness mirrors seq_path's by-construction uniqueness)."""
    hosts = [r[0] for r in rows]
    paths = [r[1] for r in rows]
    urls = [f"http://{h}{p}" for h, p, _ in rows]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "host": pa.array(hosts, pa.string()),
            "path": pa.array(paths, pa.string()),
            "url_hash": pa.array(fnv1a64_batch(urls), pa.uint64()),
            "order_key": pa.array(
                [encode_order_key(0.0, 0, int(s).to_bytes(4, "big"))
                 for _, _, s in rows],
                pa.binary(),
            ),
            "disposition": pa.array(["ok"] * len(rows), pa.string()),
        }
    )


def _skewed_rounds():
    """Two rounds of frontier rows, 95% on BIG: dups within round,
    robots-blocked paths, and a repeat of round-1 urls in round 2 (must
    come back SEEN off the bucket shards)."""
    r1 = [(BIG, f"/p/{i}", i) for i in range(190)]
    r1 += [(BIG, "/p/3", 500), (BIG, "/p/7", 501)]      # within-round dups
    r1 += [(BIG, "/blocked/x", 502), (BIG, "/blocked/y", 503)]
    r1 += [(f"cold{i % 4}.example", f"/c/{i}", 600 + i) for i in range(10)]
    r2 = [(BIG, f"/p/{i}", 1000 + i) for i in range(5)]  # re-offered: SEEN*
    r2 += [(BIG, f"/q/{i}", 1100 + i) for i in range(40)]
    r2 += [("cold0.example", "/c/0", 1200)]              # cold re-offer
    return r1, r2


def _shard_args():
    return dict(
        robots_disallow={BIG: ["/blocked"]},
        robots_rates={BIG: (1.0, 5)},
        default_rate=2.0,
        default_burst=4,
    )


def _one_shot_codes(rounds):
    """Reference dispositions: a single shard holding everything (the
    classic path, semantically ≡ per-host simulator admission)."""
    shard = AdmissionShard(**_shard_args())
    out = []
    for rnd, rows in enumerate(rounds):
        t, _ = shard.admit_table(rnd, _frontier_table(rows))
        out.append({(u, k): c for u, k, c in zip(
            t.column("url").to_pylist(),
            t.column("order_key").to_pylist(),
            t.column("admit").to_pylist())})
    return out


def _two_phase_codes(rounds, n_shards, ray_session_marker):
    """Run the REAL distributed protocol: _shard_partition routing →
    admit_table phase 1 → _finalize_hot → finalize tables.  Returns
    per-round {url: admit} plus spread diagnostics."""
    ShardActor = ray.remote(AdmissionShard)
    shards = [ShardActor.remote(**_shard_args(), hot_hosts=(BIG,))
              for _ in range(n_shards)]
    per_round = []
    big_rows_per_shard = np.zeros(n_shards, dtype=np.int64)
    try:
        for rnd, rows in enumerate(rounds):
            t = _frontier_table(rows)
            parts = ray.get(list(_shard_partition.options(
                num_returns=n_shards + 1).remote(t, n_shards, (BIG,))))
            for s in range(n_shards):
                big_rows_per_shard[s] += sum(
                    1 for h in parts[s].column("host").to_pylist() if h == BIG
                )
            pairs = [
                shards[s].admit_table.options(num_returns=2).remote(
                    rnd, parts[s]
                )
                for s in range(n_shards)
            ]
            metas = ray.get([p[1] for p in pairs])
            tables = ray.get([p[0] for p in pairs])
            tables += ray.get(_finalize_hot(shards, rnd, metas))
            codes = {}
            for tt in tables:
                codes.update({(u, k): c for u, k, c in zip(
                    tt.column("url").to_pylist(),
                    tt.column("order_key").to_pylist(),
                    tt.column("admit").to_pylist())})
            per_round.append(codes)
        seen_counts = ray.get([s.seen_count.remote() for s in shards])
    finally:
        for s in shards:
            ray.kill(s)
    return per_round, big_rows_per_shard, np.asarray(seen_counts)


def test_two_phase_equals_one_shot_under_skew(ray_session):
    """95% of rows on one promoted host: the two-phase bucket-shard
    protocol must produce byte-identical per-url dispositions to the
    single-shard one-shot path, across rounds (token refill, SEEN
    membership on bucket shards, dups, robots)."""
    rounds = _skewed_rounds()
    expected = _one_shot_codes(rounds)
    got, big_spread, seen_counts = _two_phase_codes(rounds, 4, ray_session)

    for rnd in range(len(rounds)):
        assert got[rnd] == expected[rnd], f"round {rnd} dispositions differ"
    # the token bucket bound held globally: BIG has burst 5 and ~190
    # candidates, so exactly 5 of its rows were admitted in round 0 —
    # the phase-2 threshold merge, not any per-shard bucket, enforced it
    big_admits = sum(1 for (u, _), c in got[0].items()
                     if c == ADMIT and f"//{BIG}/" in u)
    assert big_admits == 5, big_admits

    # the skewed host's screening work actually spread: every shard that
    # the static routing covers received rows, and more than one did
    assert (big_spread > 0).sum() >= 2, big_spread
    # seen entries (admitted urls) landed on >=2 shards too
    assert (seen_counts > 0).sum() >= 2, seen_counts


def test_hot_routing_is_static(ray_session):
    """The same (host, url_hash) must route to the same shard in every
    round/block — seen probes depend on it."""
    rows = [(BIG, f"/p/{i}", i) for i in range(64)]
    t = _frontier_table(rows)
    a = ray.get(list(_shard_partition.options(num_returns=4).remote(t, 3, (BIG,))))
    b = ray.get(list(_shard_partition.options(num_returns=4).remote(t, 3, (BIG,))))
    for s in range(3):
        assert a[s].column("url").to_pylist() == b[s].column("url").to_pylist()


@pytest.fixture(scope="module")
def hot_web(tmp_path_factory):
    pages = generate_pages(200, n_hosts=4)
    seeds = generate_seeds(pages)
    robots = generate_robots(pages)
    d = tmp_path_factory.mktemp("hotweb")
    pq.write_table(pages, d / "pages.parquet")
    # the Zipf assignment concentrates pages on the low-index hosts;
    # promote the top-2 (host1.example is also rate-0.5 throttled in
    # generate_robots, so the phase-2 threshold merge is exercised hard)
    hosts = [u.split("/")[2] for u in pages.column("url").to_pylist()]
    top2 = [h for h, _ in sorted(
        ((h, hosts.count(h)) for h in set(hosts)),
        key=lambda kv: -kv[1])][:2]
    return pages, seeds, robots, str(d / "pages.parquet"), tuple(top2)


HOT_CFG = dict(round_budget=120, max_rounds=14, max_depth=5,
               virtual_t0=EPOCH_US)


def _trace_rows(result):
    trace = result.trace_table()
    rows = sorted(zip(trace.column("round").to_pylist(),
                      trace.column("order_key").to_pylist(),
                      trace.column("url").to_pylist()))
    return [(r, u) for r, _, u in rows]


def test_engine_hot_hosts_equals_simulator(hot_web, ray_session,
                                           tmp_path_factory):
    """Full-engine parity with promotion on: trace, texts, errors and
    the union seen set all match the host-serial simulator, and the
    promoted host's seen entries live on >=2 shards."""
    pages, seeds, robots, pages_path, hot = hot_web
    reg = HandlerRegistry()
    flagship_spider(reg)
    sim = simulate(pages, seeds, robots, reg, CrawlConfig(**HOT_CFG))

    cfg = EngineConfig(**HOT_CFG, n_admission_shards=3,
                       extract_concurrency=2, extract_batch_size=64,
                       hot_hosts=hot)
    engine = CrawlEngine([flagship_spider], cfg)
    wd = str(tmp_path_factory.mktemp("hotcrawl"))
    try:
        result = engine.run(pages_path, seeds, robots, wd)
        assert _trace_rows(result) == sim.trace
        records = result.records_table()
        texts = {u: json.loads(f)["text"]
                 for u, f in zip(records.column("url").to_pylist(),
                                 records.column("fields").to_pylist())}
        assert texts == sim.texts
        errors = result.errors_table()
        eng_errs = sorted(zip(errors.column("error_kind").to_pylist(),
                              errors.column("url").to_pylist()))
        assert eng_errs == sorted((e["error_kind"], e["url"])
                                  for e in sim.errors)
        assert set(engine.dump_seen().tolist()) == sim.seen

        # spread: the promoted hosts' crawled-url hashes sit on >=2
        # shards (classic routing would put each host's on exactly one)
        dumps = ray.get([s.dump_seen.remote() for s in engine._shards])
        crawled = [u for _, u in sim.trace if u.split("/")[2] == hot[0]]
        assert len(crawled) >= 8, "fixture too small to show spread"
        hot_hashes = set(fnv1a64_batch(crawled).tolist())
        on_shard = [len(hot_hashes & set(d.tolist())) for d in dumps]
        assert sum(1 for c in on_shard if c > 0) >= 2, on_shard
    finally:
        engine.shutdown_shards()


def test_engine_hot_hosts_resume(hot_web, ray_session, tmp_path_factory):
    """Kill after round 3 commits, resume with the SAME hot_hosts:
    bucket-shard seen snapshots restore and the finished crawl equals
    the uninterrupted one."""
    pages, seeds, robots, pages_path, hot = hot_web

    def make(max_rounds):
        return CrawlEngine(
            [flagship_spider],
            EngineConfig(**{**HOT_CFG, "max_rounds": max_rounds},
                         n_admission_shards=3, extract_concurrency=2,
                         extract_batch_size=64, hot_hosts=hot),
        )

    wd_full = str(tmp_path_factory.mktemp("hotfull"))
    e_full = make(HOT_CFG["max_rounds"])
    r_full = e_full.run(pages_path, seeds, robots, wd_full)
    e_full.shutdown_shards()

    wd_part = str(tmp_path_factory.mktemp("hotpart"))
    e_part = make(3)
    e_part.run(pages_path, seeds, robots, wd_part)
    e_part.shutdown_shards()

    e_res = make(HOT_CFG["max_rounds"])
    try:
        r_res = e_res.run(pages_path, None, robots, wd_part, resume=True)
        assert _trace_rows(r_res) == _trace_rows(r_full)
        # counters only cover the resumed rounds; the on-disk sink is
        # the cross-run artifact that must match
        full = sorted(r_full.records_table().column("url").to_pylist())
        res = sorted(r_res.records_table().column("url").to_pylist())
        assert res == full
    finally:
        e_res.shutdown_shards()


def test_engine_hot_hosts_distributed_path(hot_web, ray_session,
                                           tmp_path_factory):
    """Same full-engine parity with promotion on, but FORCING the
    distributed fast path (small_round_threshold=0) — exercises the
    fused read+canonicalize+partition task's hot routing and the
    task-branch phase-2 finalize, which the inline small-round tests
    never reach."""
    pages, seeds, robots, pages_path, hot = hot_web
    reg = HandlerRegistry()
    flagship_spider(reg)
    sim = simulate(pages, seeds, robots, reg, CrawlConfig(**HOT_CFG))

    cfg = EngineConfig(**HOT_CFG, n_admission_shards=3,
                       extract_concurrency=2, extract_batch_size=64,
                       hot_hosts=hot, small_round_threshold=0,
                       canon_chunk_rows=32, seed_part_rows=16)
    engine = CrawlEngine([flagship_spider], cfg)
    wd = str(tmp_path_factory.mktemp("hotdist"))
    try:
        result = engine.run(pages_path, seeds, robots, wd)
        assert _trace_rows(result) == sim.trace
        assert set(engine.dump_seen().tolist()) == sim.seen
    finally:
        engine.shutdown_shards()


AUTO_CFG = dict(n_admission_shards=3, extract_concurrency=2,
                extract_batch_size=64, hot_hosts=(),
                hot_promote_min_rows=24, hot_promote_factor=1.0)


def test_engine_auto_promotion_equals_simulator(hot_web, ray_session,
                                                tmp_path_factory):
    """hot_hosts=() with AUTO-promotion: the engine must detect the
    skewed host(s) from per-round admission stats mid-crawl, migrate
    their seen entries to the bucket shards, keep full simulator
    parity, and surface the promotion in metrics + manifest."""
    pages, seeds, robots, pages_path, hot = hot_web
    reg = HandlerRegistry()
    flagship_spider(reg)
    sim = simulate(pages, seeds, robots, reg, CrawlConfig(**HOT_CFG))

    cfg = EngineConfig(**HOT_CFG, **AUTO_CFG)
    engine = CrawlEngine([flagship_spider], cfg)
    wd = str(tmp_path_factory.mktemp("autohot"))
    try:
        result = engine.run(pages_path, seeds, robots, wd)
        assert _trace_rows(result) == sim.trace
        assert set(engine.dump_seen().tolist()) == sim.seen

        promoted_rounds = [m for m in result.metrics
                           if m.get("promoted_hosts")]
        assert promoted_rounds, (
            "auto-promotion never fired — threshold/fixture mismatch"
        )
        promoted = sorted({h for m in promoted_rounds
                           for h in m["promoted_hosts"]})
        # the detected hosts are the actually-skewed ones
        assert set(promoted) & set(hot), (promoted, hot)
        # the manifest of the last committed round carries the set
        import pathlib
        last = max(pathlib.Path(wd).glob("round=*/manifest.json"),
                   key=lambda p: int(p.parent.name.split("=")[1]))
        manifest = json.loads(last.read_text())
        assert manifest.get("promoted_hosts") == sorted(promoted)

        # seen spread: a promoted host's crawled hashes live on >=2
        # shards (pre-promotion home entries remain but the BUCKET
        # routing must own the post-promotion ones)
        dumps = ray.get([s.dump_seen.remote() for s in engine._shards])
        crawled = [u for _, u in sim.trace
                   if u.split("/")[2] == promoted[0]]
        hot_hashes = set(fnv1a64_batch(crawled).tolist())
        on_shard = [len(hot_hashes & set(d.tolist())) for d in dumps]
        assert sum(1 for c in on_shard if c > 0) >= 2, on_shard
    finally:
        engine.shutdown_shards()


def test_engine_auto_promotion_resume_spans_boundary(hot_web, ray_session,
                                                     tmp_path_factory):
    """Stop after the promotion round commits, resume WITHOUT any
    static hot_hosts: the manifest restores the promoted set, the
    restored bucket-shard snapshots already hold the migrated entries,
    and the finished crawl equals the uninterrupted one."""
    pages, seeds, robots, pages_path, _ = hot_web

    def make(max_rounds):
        return CrawlEngine(
            [flagship_spider],
            EngineConfig(**{**HOT_CFG, "max_rounds": max_rounds},
                         **AUTO_CFG),
        )

    wd_full = str(tmp_path_factory.mktemp("autofull"))
    e_full = make(HOT_CFG["max_rounds"])
    r_full = e_full.run(pages_path, seeds, robots, wd_full)
    e_full.shutdown_shards()
    promo_round = min(
        (m["round"] for m in r_full.metrics if m.get("promoted_hosts")),
        default=None,
    )
    assert promo_round is not None, "auto-promotion never fired"

    # stop exactly at the promotion round: the resumed part must
    # restore promoted routing purely from manifest + snapshots
    wd_part = str(tmp_path_factory.mktemp("autopart"))
    e_part = make(promo_round)
    e_part.run(pages_path, seeds, robots, wd_part)
    e_part.shutdown_shards()

    e_res = make(HOT_CFG["max_rounds"])
    try:
        r_res = e_res.run(pages_path, None, robots, wd_part, resume=True)
        assert _trace_rows(r_res) == _trace_rows(r_full)
        full = sorted(r_full.records_table().column("url").to_pylist())
        res = sorted(r_res.records_table().column("url").to_pylist())
        assert res == full
    finally:
        e_res.shutdown_shards()


def test_admit_table_reports_big_rows_meta():
    """Shards report non-hot host runs at/above promote_floor under the
    reserved "" meta key — and _collect_big_rows strips it so
    _finalize_hot only ever sees real parked hosts."""
    from crawl_ray.engine import _collect_big_rows

    shard = AdmissionShard(**_shard_args(), promote_floor=5)
    rows = [(BIG, f"/p/{i}", i) for i in range(7)]
    rows += [("tiny.example", "/t", 100)]
    t, meta = shard.admit_table(0, _frontier_table(rows))
    assert meta[""]["rows"] == {BIG: 7}
    big = _collect_big_rows([meta])
    assert big == {BIG: 7}
    assert "" not in meta  # stripped in place


def test_admit_table_no_detection_when_floor_unset():
    shard = AdmissionShard(**_shard_args())
    rows = [(BIG, f"/p/{i}", i) for i in range(50)]
    _, meta = shard.admit_table(0, _frontier_table(rows))
    assert meta == {}


def test_promote_hosts_idempotent_grow_only():
    shard = AdmissionShard(**_shard_args())
    shard.promote_hosts([BIG])
    shard.promote_hosts([BIG, "other.example"])
    assert shard.hot_hosts == frozenset({BIG, "other.example"})
    # promoted host rows now park instead of one-shot admitting
    t, meta = shard.admit_table(1, _frontier_table([(BIG, "/x", 1)]))
    assert meta[BIG]["n"] == 1
    assert t.num_rows == 0


def test_seen_ingest_routes_membership():
    """Hashes ingested at a promotion boundary must screen as SEEN."""
    import numpy as np

    shard = AdmissionShard(**_shard_args())
    urls = [f"http://{BIG}/p/{i}" for i in range(4)]
    hashes = fnv1a64_batch(urls)
    shard.seen_ingest(hashes[:2])
    codes, cand = shard._screen(
        BIG, np.ascontiguousarray(hashes, dtype=np.uint64),
        [f"/p/{i}" for i in range(4)],
    )
    from crawl_ray.state.admission import SEEN
    assert list(codes[:2]) == [SEEN, SEEN]
    assert set(cand.tolist()) == {2, 3}
