"""Engine vs reference-oracle simulator: the big equality test
(SURVEY.md §5.2.2) + checkpoint/resume (§5.2.3)."""

import json
import pathlib
import shutil

import pyarrow as pa
import pytest

from crawl_ray.engine import CrawlEngine, EngineConfig
from crawl_ray.fixtures import EPOCH_US, generate_pages, generate_robots, generate_seeds
from crawl_ray.request import HandlerRegistry
from crawl_ray.simulator import CrawlConfig, simulate
from crawl_ray.spiders import flagship_spider

N = 200
CFG = dict(
    round_budget=120,
    max_rounds=16,
    max_depth=5,
    virtual_t0=EPOCH_US,
)


@pytest.fixture(scope="module")
def fixture_tables(tmp_path_factory):
    pages = generate_pages(N)
    seeds = generate_seeds(pages)
    robots = generate_robots(pages)
    d = tmp_path_factory.mktemp("web")
    import pyarrow.parquet as pq

    pq.write_table(pages, d / "pages.parquet")
    return pages, seeds, robots, str(d / "pages.parquet")


@pytest.fixture(scope="module")
def sim_result(fixture_tables):
    pages, seeds, robots, _ = fixture_tables
    reg = HandlerRegistry()
    flagship_spider(reg)
    return simulate(pages, seeds, robots, reg, CrawlConfig(**CFG))


@pytest.fixture(scope="module")
def engine_run(fixture_tables, ray_session, tmp_path_factory):
    pages, seeds, robots, pages_path = fixture_tables
    cfg = EngineConfig(
        **CFG,
        n_admission_shards=3,
        extract_concurrency=2,
        extract_batch_size=64,
    )
    engine = CrawlEngine([flagship_spider], cfg)
    workdir = str(tmp_path_factory.mktemp("crawl"))
    result = engine.run(pages_path, seeds, robots, workdir)
    yield engine, result
    engine.shutdown_shards()


def test_trace_matches_simulator(engine_run, sim_result):
    _, result = engine_run
    trace = result.trace_table()
    assert trace is not None
    rows = sorted(
        zip(
            trace.column("round").to_pylist(),
            trace.column("order_key").to_pylist(),
            trace.column("url").to_pylist(),
        )
    )
    engine_trace = [(r, u) for r, _, u in rows]
    assert engine_trace == sim_result.trace


def test_seen_set_matches_simulator(engine_run, sim_result):
    engine, _ = engine_run
    assert set(engine.dump_seen().tolist()) == sim_result.seen


def test_texts_byte_identical(engine_run, sim_result, fixture_tables):
    pages = fixture_tables[0]
    page_text = dict(
        zip(pages.column("url").to_pylist(), pages.column("text").to_pylist())
    )
    _, result = engine_run
    records = result.records_table()
    assert records is not None
    texts = {}
    for url, fields in zip(
        records.column("url").to_pylist(), records.column("fields").to_pylist()
    ):
        texts[url] = json.loads(fields)["text"]
    assert texts == sim_result.texts
    for url, text in texts.items():
        assert text == page_text[url]


def test_errors_match_simulator(engine_run, sim_result):
    _, result = engine_run
    errors = result.errors_table()
    assert errors is not None
    engine_errs = sorted(
        zip(errors.column("error_kind").to_pylist(), errors.column("url").to_pylist())
    )
    sim_errs = sorted((e["error_kind"], e["url"]) for e in sim_result.errors)
    assert engine_errs == sim_errs


def test_no_url_crawled_twice(engine_run):
    _, result = engine_run
    trace = result.trace_table()
    urls = trace.column("url").to_pylist()
    assert len(urls) == len(set(urls))


@pytest.mark.parametrize(
    "variant",
    [
        {"round_budget": 37, "max_rounds": 24, "max_depth": 4},   # tight budget
        {"round_budget": 5000, "max_rounds": 10, "max_depth": 3}, # loose budget
    ],
    ids=["tight-budget", "loose-budget"],
)
def test_engine_equals_simulator_across_configs(
    fixture_tables, ray_session, tmp_path_factory, variant
):
    """SURVEY §5.2.5: engine ≡ simulator under varying round budgets
    (exercises overflow spill / priority split and shallow-depth cuts)."""
    pages, seeds, robots, pages_path = fixture_tables
    base = {**CFG, **variant}
    reg = HandlerRegistry()
    flagship_spider(reg)
    sim = simulate(pages, seeds, robots, reg, CrawlConfig(**base))

    cfg = EngineConfig(**base, n_admission_shards=2, extract_concurrency=2)
    engine = CrawlEngine([flagship_spider], cfg)
    wd = str(tmp_path_factory.mktemp("var"))
    result = engine.run(pages_path, seeds, robots, wd)
    seen = set(engine.dump_seen().tolist())
    engine.shutdown_shards()

    trace = result.trace_table()
    rows = sorted(
        zip(
            trace.column("round").to_pylist(),
            trace.column("order_key").to_pylist(),
            trace.column("url").to_pylist(),
        )
    )
    assert [(r, u) for r, _, u in rows] == sim.trace
    assert seen == sim.seen


def test_resume_after_mid_round_kill(fixture_tables, ray_session, tmp_path_factory):
    """A kill MID-round leaves partial task-side files: the dying
    round's own outputs (trace/records/errors) and partial next-round
    frontier parts — all uncommitted (no manifest).  Resume must discard
    them and reproduce the uninterrupted run exactly."""
    import pyarrow.parquet as pq_

    pages, seeds, robots, pages_path = fixture_tables

    def make_engine(max_rounds):
        cfg = EngineConfig(
            **{**CFG, "max_rounds": max_rounds},
            n_admission_shards=2,
            extract_concurrency=2,
        )
        return CrawlEngine([flagship_spider], cfg)

    wd_full = str(tmp_path_factory.mktemp("mfull"))
    e_full = make_engine(CFG["max_rounds"])
    r_full = e_full.run(pages_path, seeds, robots, wd_full)
    seen_full = set(e_full.dump_seen().tolist())
    e_full.shutdown_shards()

    # run 3 committed rounds, then fake a mid-round-4 kill: partial
    # outputs in round=4 and stale frontier parts in round=5
    wd = pathlib.Path(str(tmp_path_factory.mktemp("mpart")))
    e_part = make_engine(3)
    e_part.run(pages_path, seeds, robots, str(wd))
    e_part.shutdown_shards()

    garbage = pa.table({"url": pa.array(["http://stale.example/x"]),
                        "order_key": pa.array([b"\x00"], pa.binary()),
                        "depth": pa.array([0], pa.int32())})
    (wd / "round=4" / "trace").mkdir(parents=True, exist_ok=True)
    pq_.write_table(garbage, wd / "round=4" / "trace" / "part-0.parquet")
    (wd / "round=5" / "frontier").mkdir(parents=True, exist_ok=True)
    src = next((wd / "round=4" / "frontier").glob("*.parquet"))
    pq_.write_table(
        pq_.read_table(str(src)),
        wd / "round=5" / "frontier" / "links-99.parquet",
    )

    e_res = make_engine(CFG["max_rounds"])
    r_res = e_res.run(pages_path, None, robots, str(wd), resume=True)
    seen_res = set(e_res.dump_seen().tolist())
    e_res.shutdown_shards()

    for getter in ("trace_table", "records_table"):
        t_full = getattr(r_full, getter)()
        t_res = getattr(r_res, getter)()
        cols = ["url"] + (["order_key"] if getter == "trace_table" else ["fields"])
        full_rows = sorted(zip(*(t_full.column(c).to_pylist() for c in cols)))
        res_rows = sorted(zip(*(t_res.column(c).to_pylist() for c in cols)))
        assert full_rows == res_rows, getter
    assert seen_res == seen_full


def test_distributed_path_equals_simulator(
    fixture_tables, sim_result, ray_session, tmp_path_factory
):
    """Force the distributed canonicalize paths (small_round_threshold=0
    → fused read+canonicalize tasks every round; round_budget < pending
    in later rounds → the priority-sort slow path) and re-check trace
    equality — the small fixtures otherwise exercise only the
    driver-side small round shortcut."""
    pages, seeds, robots, pages_path = fixture_tables
    cfg = EngineConfig(
        **CFG,
        n_admission_shards=3,
        extract_concurrency=2,
        extract_batch_size=64,
        small_round_threshold=0,
    )
    engine = CrawlEngine([flagship_spider], cfg)
    workdir = str(tmp_path_factory.mktemp("dist"))
    result = engine.run(pages_path, seeds, robots, workdir)
    engine.shutdown_shards()
    trace = result.trace_table()
    rows = sorted(
        zip(
            trace.column("round").to_pylist(),
            trace.column("order_key").to_pylist(),
            trace.column("url").to_pylist(),
        )
    )
    assert [(r, u) for r, _, u in rows] == sim_result.trace
    # error streams are written task-side on this path (per-part files,
    # never a driver concat) and must still equal the simulator's
    errors = result.errors_table()
    assert errors is not None
    engine_errs = sorted(
        zip(errors.column("error_kind").to_pylist(),
            errors.column("url").to_pylist())
    )
    sim_errs = sorted((e["error_kind"], e["url"]) for e in sim_result.errors)
    assert engine_errs == sim_errs
    assert result.errors == len(sim_errs)  # the count-only accounting


def test_resume_equals_uninterrupted(fixture_tables, ray_session, tmp_path_factory):
    """Kill after round 3 commit; resume; outputs must equal a straight
    run byte-for-byte (manifest idempotency, SURVEY §5.2.3)."""
    pages, seeds, robots, pages_path = fixture_tables
    base = dict(CFG)

    def make_engine(max_rounds):
        cfg = EngineConfig(
            **{**base, "max_rounds": max_rounds},
            n_admission_shards=2,
            extract_concurrency=2,
        )
        return CrawlEngine([flagship_spider], cfg)

    wd_full = str(tmp_path_factory.mktemp("full"))
    e_full = make_engine(base["max_rounds"])
    r_full = e_full.run(pages_path, seeds, robots, wd_full)
    e_full.shutdown_shards()

    wd_part = str(tmp_path_factory.mktemp("part"))
    e_part = make_engine(3)  # "killed" after round 3 commits
    e_part.run(pages_path, seeds, robots, wd_part)
    e_part.shutdown_shards()

    e_resume = make_engine(base["max_rounds"])
    r_resume = e_resume.run(pages_path, None, robots, wd_part, resume=True)
    e_resume.shutdown_shards()

    t_full = r_full.trace_table()
    t_res = r_resume.trace_table()
    full_rows = sorted(
        zip(t_full.column("round").to_pylist(), t_full.column("url").to_pylist())
    )
    res_rows = sorted(
        zip(t_res.column("round").to_pylist(), t_res.column("url").to_pylist())
    )
    assert full_rows == res_rows

    rec_full = r_full.records_table()
    rec_res = r_resume.records_table()
    pair_full = sorted(
        zip(rec_full.column("url").to_pylist(), rec_full.column("fields").to_pylist())
    )
    pair_res = sorted(
        zip(rec_res.column("url").to_pylist(), rec_res.column("fields").to_pylist())
    )
    assert pair_full == pair_res


# -- M1 roundtrip + middleware parity (round 2) ----------------------------


def _reject_submit3_mw(req, effective):
    """Middleware rejecting one effective POST url (pre-fetch abort)."""
    if "/submit/3" in effective["url"]:
        raise ValueError("blocked by middleware")


def _mw_forms_spider(registry):
    from crawl_ray.spiders import forms_spider

    forms_spider(registry)
    registry.middleware(_reject_submit3_mw)


@pytest.mark.parametrize("with_middleware", [False, True],
                         ids=["plain", "middleware"])
def test_forms_roundtrip_equals_simulator(
    ray_session, tmp_path_factory, with_middleware
):
    """M1 wired into the crawl path: Form ⇒ POST on the scraped action,
    query re-encode keys the fetch, middleware aborts pre-fetch — engine
    at full parallelism ≡ single-threaded simulator."""
    import json as _json

    import pyarrow.parquet as pq_

    from crawl_ray.fixtures import form_web_dir
    from crawl_ray.oracle_data import forms_core_cfg
    from crawl_ray.simulator import simulate
    from crawl_ray.spiders import forms_spider

    spider = _mw_forms_spider if with_middleware else forms_spider
    d = form_web_dir(40)
    pages = pq_.read_table(f"{d}/pages.parquet")
    seeds = pq_.read_table(f"{d}/seeds.parquet")
    reg = HandlerRegistry()
    spider(reg)
    sim = simulate(pages, seeds, None, reg, CrawlConfig(**forms_core_cfg()))

    cfg = EngineConfig(**forms_core_cfg(), n_admission_shards=2,
                       extract_concurrency=2)
    engine = CrawlEngine([spider], cfg)
    wd = str(tmp_path_factory.mktemp("forms"))
    result = engine.run(f"{d}/pages.parquet", seeds, None, wd)
    seen = set(engine.dump_seen().tolist())
    engine.shutdown_shards()

    records = result.records_table()
    eng_records = sorted(
        (u, _json.loads(f))
        for u, f in zip(records.column("url").to_pylist(),
                        records.column("fields").to_pylist())
    )
    sim_records = sorted((r["url"], r["fields"]) for r in sim.records)
    assert eng_records == sim_records
    assert seen == sim.seen

    # the POST leg really is POST, the query leg really carries ?page=2&q=
    methods = {u: f["method"] for u, f in eng_records if "method" in f}
    posts = [u for u in methods if "/submit/" in u]
    gets = [u for u in methods if "/search?" in u]
    assert posts and all(methods[u] == "POST" for u in posts)
    assert gets and all(methods[u] == "GET" for u in gets)
    assert all("page=2&q=v" in u for u in gets)

    errors = result.errors_table()
    eng_errs = sorted(
        zip(errors.column("error_kind").to_pylist(),
            errors.column("url").to_pylist())
    ) if errors is not None else []
    sim_errs = sorted((e["error_kind"], e["url"]) for e in sim.errors)
    assert eng_errs == sim_errs
    if with_middleware:
        assert ("middleware", "/submit/3") in {
            (k, u.rsplit(".example", 1)[-1] if ".example" in u else u)
            for k, u in eng_errs
        } or any(k == "middleware" for k, _ in eng_errs)
        # a middleware-rejected url is never fetched (pre-fetch abort)
        trace_urls = set(result.trace_table().column("url").to_pylist())
        assert not any("/submit/3" in u for u in trace_urls)


def test_metrics_match_simulator(engine_run, sim_result):
    """Per-round lineage metrics (A1) ≡ simulator tally."""
    _, result = engine_run
    cols = ["round", "pending", "admitted", "dup_dropped", "seen_dropped",
            "deferred", "records", "links"]
    eng = [
        tuple(int(m.get(c, 0)) for c in cols)
        for m in result.metrics if m.get("round", -1) >= 0
    ]
    sim = [tuple(int(m.get(c, 0)) for c in cols) for m in sim_result.metrics]
    assert eng == sim


# -- ST1 cookie jar parity (round 2) ----------------------------------------


def _cookie_records(result):
    records = result.records_table()
    return sorted(
        (u, json.loads(f))
        for u, f in zip(records.column("url").to_pylist(),
                        records.column("fields").to_pylist())
    )


@pytest.mark.parametrize("store", ["broadcast", "bucketed"])
def test_cookie_jar_equals_simulator(ray_session, tmp_path_factory, store):
    """ST1 (crawler.go:87): Set-Cookie payloads accumulate in the
    host-sharded jar with round-boundary visibility; the effective
    Cookie header (explicit request cookies first, jar sorted after)
    is what handlers observe — engine at full parallelism ≡
    single-threaded simulator, over both page-store strategies."""
    import pyarrow.parquet as pq_

    from crawl_ray.fixtures import cookie_web_dir
    from crawl_ray.oracle_data import cookies_core_cfg
    from crawl_ray.simulator import simulate
    from crawl_ray.sources.pages import bucket_pages
    from crawl_ray.spiders import cookie_spider

    d = cookie_web_dir(24)
    pages = pq_.read_table(f"{d}/pages.parquet")
    seeds = pq_.read_table(f"{d}/seeds.parquet")
    reg = HandlerRegistry()
    cookie_spider(reg)
    sim = simulate(pages, seeds, None, reg, CrawlConfig(**cookies_core_cfg()))

    pages_path = f"{d}/pages.parquet"
    if store == "bucketed":
        pages_path = bucket_pages(
            pages_path, str(tmp_path_factory.mktemp("ckbuckets")), n_buckets=5
        )
    cfg = EngineConfig(**cookies_core_cfg(), n_admission_shards=2,
                       extract_concurrency=2, page_store=store)
    engine = CrawlEngine([cookie_spider], cfg)
    wd = str(tmp_path_factory.mktemp("cookies"))
    result = engine.run(pages_path, seeds, None, wd)
    engine.shutdown_shards()

    eng_records = _cookie_records(result)
    sim_records = sorted((r["url"], r["fields"]) for r in sim.records)
    assert eng_records == sim_records

    by_url = dict(eng_records)
    # explicit request cookie first, then the jar cookie, name-sorted
    assert by_url["http://cookiehost7.example/next/7"]["cookie"] == "u=x7; sid=s7"
    # accumulation + same-name override across rounds
    assert by_url["http://cookiehost7.example/final/7"]["cookie"] == "sid=o7; tok=t7"
    # same-host same-round writes: canonically-last seed wins, and both
    # observers see the same folded value
    assert by_url["http://cookieshared.example/check/0"]["cookie"] == "shared=v1"
    assert by_url["http://cookieshared.example/check/1"]["cookie"] == "shared=v1"


def test_cookie_jar_survives_resume(ray_session, tmp_path_factory):
    """The jar is part of the checkpoint state: kill after round 1
    commits (sid/tok harvested but /final not yet fetched), resume, and
    the /final records must still carry the restored jar cookies."""
    import pyarrow.parquet as pq_

    from crawl_ray.fixtures import cookie_web_dir
    from crawl_ray.oracle_data import cookies_core_cfg
    from crawl_ray.spiders import cookie_spider

    d = cookie_web_dir(24)
    seeds = pq_.read_table(f"{d}/seeds.parquet")

    def make_engine(max_rounds):
        cfg = EngineConfig(
            **{**cookies_core_cfg(), "max_rounds": max_rounds},
            n_admission_shards=2, extract_concurrency=2,
        )
        return CrawlEngine([cookie_spider], cfg)

    wd_full = str(tmp_path_factory.mktemp("ckfull"))
    e_full = make_engine(cookies_core_cfg()["max_rounds"])
    r_full = e_full.run(f"{d}/pages.parquet", seeds, None, wd_full)
    e_full.shutdown_shards()

    wd_part = str(tmp_path_factory.mktemp("ckpart"))
    e_part = make_engine(1)  # "killed" after round 1 commits
    e_part.run(f"{d}/pages.parquet", seeds, None, wd_part)
    e_part.shutdown_shards()

    e_res = make_engine(cookies_core_cfg()["max_rounds"])
    r_res = e_res.run(f"{d}/pages.parquet", None, None, wd_part, resume=True)
    e_res.shutdown_shards()

    assert _cookie_records(r_res) == _cookie_records(r_full)
    finals = [f for _, f in _cookie_records(r_res) if f["stage"] == "final"]
    assert finals and all("tok=" in f["cookie"] or "shared=" in f["cookie"]
                          for f in finals)


@pytest.mark.parametrize("salt", ["webA", "webB", "webC"])
def test_engine_equals_simulator_on_random_webs(
    ray_session, tmp_path_factory, salt
):
    """SURVEY §5.2.5 property test: engine ≡ simulator over seeded
    random link graphs (salted fixture webs with different host
    assignments, degrees, link targets, seeds and robots rules)."""
    import pyarrow.parquet as pq

    pages = generate_pages(120, salt=salt)
    seeds = generate_seeds(pages, salt=salt)
    robots = generate_robots(pages, salt=salt)
    d = tmp_path_factory.mktemp(f"web_{salt}")
    pq.write_table(pages, d / "pages.parquet")

    cfg = dict(round_budget=60, max_rounds=12, max_depth=4,
               virtual_t0=EPOCH_US)
    reg = HandlerRegistry()
    flagship_spider(reg)
    sim = simulate(pages, seeds, robots, reg, CrawlConfig(**cfg))

    engine = CrawlEngine(
        [flagship_spider],
        EngineConfig(**cfg, n_admission_shards=2, extract_concurrency=2,
                     extract_batch_size=64),
    )
    wd = str(tmp_path_factory.mktemp(f"crawl_{salt}"))
    try:
        result = engine.run(str(d / "pages.parquet"), seeds, robots, wd)
        trace = result.trace_table()
        rows = sorted(zip(trace.column("round").to_pylist(),
                          trace.column("order_key").to_pylist(),
                          trace.column("url").to_pylist()))
        assert [(r, u) for r, _, u in rows] == sim.trace
        records = result.records_table()
        texts = {
            u: json.loads(f)["text"]
            for u, f in zip(records.column("url").to_pylist(),
                            records.column("fields").to_pylist())
        }
        assert texts == sim.texts
        errors = result.errors_table()
        engine_errs = sorted(zip(errors.column("error_kind").to_pylist(),
                                 errors.column("url").to_pylist()))
        assert engine_errs == sorted(
            (e["error_kind"], e["url"]) for e in sim.errors
        )
    finally:
        engine.shutdown_shards()


def test_run_rejects_mistyped_callbacks(ray_session, tmp_path):
    """A callbacks column Arrow inferred as string (the silent
    zero-records trap) must raise, not no-op."""
    import pyarrow as pa
    import pytest as _pytest

    from crawl_ray.engine import CrawlEngine, EngineConfig
    from crawl_ray.fixtures import fixture_dir
    from crawl_ray.spiders import flagship_spider

    import pyarrow.parquet as pq

    d = fixture_dir(500)
    seeds = pq.read_table(f"{d}/seeds.parquet")
    bad = seeds.set_column(
        seeds.column_names.index("callbacks"),
        "callbacks",
        [["page"] for _ in range(seeds.num_rows)],  # inferred as string!
    )
    assert str(bad.column("callbacks").type) == "string"
    engine = CrawlEngine([flagship_spider], EngineConfig(max_rounds=1))
    try:
        with _pytest.raises(ValueError, match="callbacks"):
            engine.run(f"{d}/pages.parquet", bad, None, str(tmp_path / "wd"))
    finally:
        engine.shutdown_shards()


def test_cuckoo_backend_parity(fixture_tables, sim_result, ray_session, tmp_path):
    """ST4 memory-envelope backend: the engine with cuckoo-fingerprint
    seen shards reproduces the simulator's trace exactly on this
    fixture (deterministic hashing; at 16-bit fingerprints the FP
    probability over a few hundred URLs is ~1e-5, and any outcome is
    stable run-to-run)."""
    pages, seeds, robots, pages_path = fixture_tables
    cfg = EngineConfig(
        **CFG,
        n_admission_shards=3,
        extract_concurrency=2,
        extract_batch_size=64,
        seen_backend="cuckoo",
        seen_capacity=1 << 14,
    )
    engine = CrawlEngine([flagship_spider], cfg)
    try:
        result = engine.run(pages_path, seeds, robots, str(tmp_path / "crawl"))
        trace = result.trace_table()
        rows = sorted(
            zip(
                trace.column("round").to_pylist(),
                trace.column("order_key").to_pylist(),
                trace.column("url").to_pylist(),
            )
        )
        assert [(r, u) for r, _, u in rows] == sim_result.trace
    finally:
        engine.shutdown_shards()


def test_overflow_spill_written_task_side(ray_session, tmp_path):
    """The O2 over-budget tail on the SLOW path (pending >
    small_round_threshold and > round_budget) must be spilled task-side
    in multiple parquet parts — never _collect-ed into one driver table
    (the tail can be frontier-sized at scale).  Asserts engine ≡
    simulator parity under the forced slow path AND that at least one
    round's spill dir holds >1 overflow-* part with every part smaller
    than that round's total (no driver-side concat)."""
    import pyarrow.parquet as pq

    pages = generate_pages(600, salt="overflow")
    seeds = generate_seeds(pages)
    robots = generate_robots(pages)
    d = tmp_path / "web"
    d.mkdir()
    pq.write_table(pages, d / "pages.parquet")

    base = dict(
        round_budget=60, max_rounds=20, max_depth=5, virtual_t0=EPOCH_US
    )
    reg = HandlerRegistry()
    flagship_spider(reg)
    sim = simulate(pages, seeds, robots, reg, CrawlConfig(**base))

    cfg = EngineConfig(
        **base,
        n_admission_shards=3,
        extract_concurrency=2,
        extract_batch_size=64,
        small_round_threshold=0,  # force the distributed slow path
        spill_max_part_rows=64,   # bound spill part files (multi-part)
    )
    engine = CrawlEngine([flagship_spider], cfg)
    wd = tmp_path / "crawl"
    try:
        result = engine.run(str(d / "pages.parquet"), seeds, robots, str(wd))
        trace = result.trace_table()
        rows = sorted(
            zip(
                trace.column("round").to_pylist(),
                trace.column("order_key").to_pylist(),
                trace.column("url").to_pylist(),
            )
        )
        assert [(r, u) for r, _, u in rows] == sim.trace
    finally:
        engine.shutdown_shards()

    multi_part_rounds = 0
    saw_overflow = False
    for spill_dir in wd.glob("round=*/spill"):
        parts = sorted(spill_dir.glob("overflow-*.parquet"))
        if not parts:
            continue
        saw_overflow = True
        sizes = [pq.read_metadata(p).num_rows for p in parts]
        if len(parts) > 1:
            multi_part_rounds += 1
            assert max(sizes) < sum(sizes)  # no single driver-side concat
    assert saw_overflow, "slow path never spilled — fixture too small"
    assert multi_part_rounds >= 1, (
        "every overflow spill was a single part — tail concatenated?"
    )


def test_plan_canon_chunks_split_and_coalesce(tmp_path):
    """_plan_canon_chunks: one metadata pass returns the exact pending
    row count; large multi-row-group files SPLIT into several chunks
    and many small files COALESCE into one (task count bounded by
    rows/target, never file count); empty files contribute nothing."""
    import pyarrow.parquet as pq

    from crawl_ray.engine import _plan_canon_chunks

    big = pa.table({"x": list(range(1000))})
    small = pa.table({"x": [1, 2, 3]})
    empty = big.slice(0, 0)
    f_big = tmp_path / "big.parquet"
    smalls = [tmp_path / f"small-{i}.parquet" for i in range(40)]
    f_empty = tmp_path / "empty.parquet"
    pq.write_table(big, f_big, row_group_size=100)  # 10 row groups
    for f in smalls:
        pq.write_table(small, f)
    pq.write_table(empty, f_empty)

    files = [str(f_big)] + [str(f) for f in smalls] + [str(f_empty)]
    total, chunks = _plan_canon_chunks(files, target_rows=250)
    assert total == 1000 + 40 * 3
    # the big file splits: chunks of 3,3,3 row groups, then its last
    # row group coalesces with the first small files
    big_rgs = [rgs for c in chunks for p, rgs in c if p == str(f_big)]
    assert [i for rgs in big_rgs for i in rgs] == list(range(10))
    # 40 small files (120 rows) coalesce into ~1 chunk, not 40
    small_chunks = {
        id(c) for c in chunks for p, _ in c if p in {str(f) for f in smalls}
    }
    assert len(small_chunks) <= 2
    assert not [rgs for c in chunks for p, rgs in c if p == str(f_empty)]
    # every chunk except possibly the last holds >= target rows
    sizes = []
    md_rows = {str(f_big): [100] * 10, **{str(f): [3] for f in smalls}}
    for c in chunks:
        sizes.append(sum(md_rows[p][i] for p, rgs in c for i in rgs))
    assert all(s >= 250 for s in sizes[:-1])
    assert sum(sizes) == total


def test_plan_canon_chunks_parallel_meta_matches_serial(
    ray_session, tmp_path, monkeypatch
):
    """Above _META_BATCH files the footer scan fans out as Ray tasks
    (a big round's frontier is millions of one-part files at the
    design point); the fanned-out plan must be IDENTICAL to the
    serial one."""
    import pyarrow.parquet as pq

    import crawl_ray.engine as E

    files = []
    for i in range(30):
        f = tmp_path / f"part-{i}.parquet"
        pq.write_table(pa.table({"x": list(range(5 + i % 7))}), f)
        files.append(str(f))

    serial = E._plan_canon_chunks(files, target_rows=40)
    monkeypatch.setattr(E, "_META_BATCH", 8)  # force the task fan-out
    parallel = E._plan_canon_chunks(files, target_rows=40)
    assert parallel == serial


def test_multipart_seeds_equal_simulator(ray_session, tmp_path):
    """Seeds written in many round-0 frontier parts (seed_part_rows
    forced tiny) must crawl identically to the simulator — the fused
    read+canonicalize fan-out over multiple parts is a physical layout
    choice, not a semantic one."""
    import pyarrow.parquet as pq

    pages = generate_pages(120, salt="multipart")
    seeds = generate_seeds(pages)
    robots = generate_robots(pages)
    d = tmp_path / "web"
    d.mkdir()
    pq.write_table(pages, d / "pages.parquet")

    base = dict(
        round_budget=40, max_rounds=12, max_depth=4, virtual_t0=EPOCH_US
    )
    reg = HandlerRegistry()
    flagship_spider(reg)
    sim = simulate(pages, seeds, robots, reg, CrawlConfig(**base))

    cfg = EngineConfig(
        **base,
        n_admission_shards=3,
        seed_part_rows=4,          # force many round-0 parts
        small_round_threshold=0,   # force the distributed fused path
        canon_chunk_rows=8,        # force multi-chunk plans too
    )
    engine = CrawlEngine([flagship_spider], cfg)
    wd = tmp_path / "crawl"
    try:
        parts = None
        result = engine.run(str(d / "pages.parquet"), seeds, robots, str(wd))
        parts = sorted((wd / "round=0" / "frontier").glob("part-*.parquet"))
        trace = result.trace_table()
        rows = sorted(
            zip(
                trace.column("round").to_pylist(),
                trace.column("order_key").to_pylist(),
                trace.column("url").to_pylist(),
            )
        )
        assert [(r, u) for r, _, u in rows] == sim.trace
    finally:
        engine.shutdown_shards()
    assert parts is not None and len(parts) > 1, "seeds stayed one part"


def test_bloom_backend_parity(fixture_tables, sim_result, ray_session, tmp_path):
    """The bloom-bit-array seen backend (the north rule's other
    "bloom/cuckoo" half) reproduces the simulator's trace exactly on
    this fixture — at ≈4.6e-4 FPR over a few hundred URLs a false
    "seen" is ~1e-1 unlikely per run and deterministic hashing makes
    any outcome stable run-to-run; this fixture is verified clean."""
    pages, seeds, robots, pages_path = fixture_tables
    cfg = EngineConfig(
        **CFG,
        n_admission_shards=3,
        extract_concurrency=2,
        extract_batch_size=64,
        seen_backend="bloom",
        seen_capacity=1 << 14,
    )
    engine = CrawlEngine([flagship_spider], cfg)
    try:
        result = engine.run(pages_path, seeds, robots, str(tmp_path / "crawl"))
        trace = result.trace_table()
        rows = sorted(
            zip(
                trace.column("round").to_pylist(),
                trace.column("order_key").to_pylist(),
                trace.column("url").to_pylist(),
            )
        )
        assert [(r, u) for r, _, u in rows] == sim_result.trace
    finally:
        engine.shutdown_shards()


def test_bloom_backend_survives_resume(fixture_tables, ray_session, tmp_path):
    """Snapshot/restore of the bloom words through the checkpoint
    protocol: run 3 rounds, resume, and match the uninterrupted run."""
    pages, seeds, robots, pages_path = fixture_tables

    def make_engine(max_rounds):
        cfg = EngineConfig(
            **{**CFG, "max_rounds": max_rounds},
            n_admission_shards=2,
            seen_backend="bloom",
            seen_capacity=1 << 14,
        )
        return CrawlEngine([flagship_spider], cfg)

    e_full = make_engine(CFG["max_rounds"])
    r_full = e_full.run(pages_path, seeds, robots, str(tmp_path / "full"))
    e_full.shutdown_shards()

    e_part = make_engine(3)
    e_part.run(pages_path, seeds, robots, str(tmp_path / "part"))
    e_part.shutdown_shards()
    e_res = make_engine(CFG["max_rounds"])
    r_res = e_res.run(pages_path, None, robots, str(tmp_path / "part"),
                      resume=True)
    e_res.shutdown_shards()

    full = sorted(zip(r_full.trace_table().column("url").to_pylist(),
                      r_full.trace_table().column("order_key").to_pylist()))
    res = sorted(zip(r_res.trace_table().column("url").to_pylist(),
                     r_res.trace_table().column("order_key").to_pylist()))
    assert full == res


def test_resume_after_shard_actor_death(fixture_tables, ray_session,
                                        tmp_path_factory):
    """A LIVE actor failure (ray.kill on an admission shard mid-crawl)
    surfaces as an error from run(); a fresh engine resuming the same
    workdir from the last committed manifest must reproduce the
    uninterrupted run exactly — actor state is checkpointed per round,
    never the source of truth."""
    import ray as _ray

    pages, seeds, robots, pages_path = fixture_tables

    def make_engine(max_rounds):
        cfg = EngineConfig(
            **{**CFG, "max_rounds": max_rounds},
            n_admission_shards=2,
        )
        return CrawlEngine([flagship_spider], cfg)

    wd_full = str(tmp_path_factory.mktemp("afull"))
    e_full = make_engine(CFG["max_rounds"])
    r_full = e_full.run(pages_path, seeds, robots, wd_full)
    seen_full = set(e_full.dump_seen().tolist())
    e_full.shutdown_shards()

    # kill one shard actor from inside the round loop via the stop
    # callback (fires between rounds — the actor dies while the next
    # round's admission RPCs are in flight)
    wd = str(tmp_path_factory.mktemp("adeath"))
    e_die = make_engine(CFG["max_rounds"])
    state = {"rounds": 0}

    def killer():
        state["rounds"] += 1
        if state["rounds"] == 4:
            _ray.kill(e_die._shards[0])
        return False

    with pytest.raises(Exception):  # RayActorError or wrapped
        e_die.run(pages_path, seeds, robots, wd, stop=killer)
    e_die.shutdown_shards()

    e_res = make_engine(CFG["max_rounds"])
    r_res = e_res.run(pages_path, None, robots, wd, resume=True)
    seen_res = set(e_res.dump_seen().tolist())
    e_res.shutdown_shards()

    t_full = r_full.trace_table()
    t_res = r_res.trace_table()
    full_rows = sorted(zip(t_full.column("url").to_pylist(),
                           t_full.column("order_key").to_pylist()))
    res_rows = sorted(zip(t_res.column("url").to_pylist(),
                          t_res.column("order_key").to_pylist()))
    assert full_rows == res_rows
    assert seen_res == seen_full


def test_resume_with_sparse_checkpoints(
    fixture_tables, ray_session, tmp_path_factory
):
    """checkpoint_interval > 1: a kill after a manifest-only commit (no
    state snapshot for that round) must resume from the older
    snapshot-complete round, deterministically re-run the gap, and
    match the uninterrupted run — not restore a seen-set missing the
    gap rounds' additions (or crash on the absent npz)."""
    pages, seeds, robots, pages_path = fixture_tables

    def make_engine(max_rounds, interval=1):
        cfg = EngineConfig(
            **{**CFG, "max_rounds": max_rounds},
            n_admission_shards=2,
            extract_concurrency=2,
            checkpoint_interval=interval,
        )
        return CrawlEngine([flagship_spider], cfg)

    wd_full = str(tmp_path_factory.mktemp("ckfull"))
    e_full = make_engine(CFG["max_rounds"])
    r_full = e_full.run(pages_path, seeds, robots, wd_full)
    seen_full = set(e_full.dump_seen().tolist())
    e_full.shutdown_shards()

    # interval=3 → snapshots at rounds 0 and 3 only; "kill" after
    # round 4 commits its manifest without a state snapshot
    wd = pathlib.Path(str(tmp_path_factory.mktemp("ckpart")))
    e_part = make_engine(4, interval=3)
    e_part.run(pages_path, seeds, robots, str(wd))
    e_part.shutdown_shards()
    assert (wd / "round=4" / "manifest.json").exists()
    assert not (wd / "round=4" / "state").exists()

    e_res = make_engine(CFG["max_rounds"], interval=3)
    r_res = e_res.run(pages_path, None, robots, str(wd), resume=True)
    seen_res = set(e_res.dump_seen().tolist())
    e_res.shutdown_shards()

    for getter in ("trace_table", "records_table"):
        t_full = getattr(r_full, getter)()
        t_res = getattr(r_res, getter)()
        cols = ["url"] + (
            ["order_key"] if getter == "trace_table" else ["fields"]
        )
        full_rows = sorted(zip(*(t_full.column(c).to_pylist() for c in cols)))
        res_rows = sorted(zip(*(t_res.column(c).to_pylist() for c in cols)))
        assert full_rows == res_rows, getter
    assert seen_res == seen_full


def test_resume_shard_count_change_raises(
    fixture_tables, ray_session, tmp_path_factory
):
    """The admission shard count is static across a crawl: seen entries
    are sharded by fnv1a64(host) % n_shards, so resuming with a
    different count would silently re-crawl.  Must fail loudly."""
    pages, seeds, robots, pages_path = fixture_tables

    def make_engine(n_shards):
        cfg = EngineConfig(
            **{**CFG, "max_rounds": 3},
            n_admission_shards=n_shards,
            extract_concurrency=2,
        )
        return CrawlEngine([flagship_spider], cfg)

    wd = str(tmp_path_factory.mktemp("shardchg"))
    e_part = make_engine(2)
    e_part.run(pages_path, seeds, robots, wd)
    e_part.shutdown_shards()

    e_res = make_engine(3)
    with pytest.raises(ValueError, match="n_admission_shards"):
        e_res.run(pages_path, None, robots, wd, resume=True)
    e_res.shutdown_shards()


def test_robots_query_prefix_parity(fixture_tables, ray_session, tmp_path_factory):
    """Robots match key includes the query string (RFC 9309): a
    disallow prefix extending into '?' must block the same URLs in the
    engine and the simulator — the engine's vectorized path column and
    the simulator's per-row rule are one spec."""
    pages, seeds, robots, pages_path = fixture_tables
    # a seed whose URL carries a query string that the prefix blocks —
    # the old path-only rule let it through
    extra = pa.table({
        "url": pa.array(["http://host0.example/p/2?track=1"], pa.string()),
        "method": pa.array([""], pa.string()),
        "referer": pa.array([""], pa.string()),
        "callbacks": pa.array([["page"]], pa.list_(pa.string())),
        "metadata": pa.array([""], pa.string()),
        "deadline": pa.nulls(1, seeds.column("deadline").type),
    })
    seeds = pa.concat_tables([seeds, extra], promote_options="default")
    # disallow every query-carrying fetch of /p/2 on every host, plus a
    # plain-path prefix as control
    hosts = robots.column("host").to_pylist()
    robots_q = pa.table({
        "host": robots.column("host"),
        "disallow_prefixes": pa.array(
            [["/p/2?", "/p/13"] for _ in hosts], pa.list_(pa.string())
        ),
        "rate_per_sec": robots.column("rate_per_sec"),
        "burst": robots.column("burst"),
    })
    reg = HandlerRegistry()
    flagship_spider(reg)
    sim = simulate(pages, seeds, robots_q, reg, CrawlConfig(**CFG))

    cfg = EngineConfig(**CFG, n_admission_shards=2, extract_concurrency=2)
    engine = CrawlEngine([flagship_spider], cfg)
    wd = str(tmp_path_factory.mktemp("robq"))
    result = engine.run(pages_path, seeds, robots_q, wd)
    seen = set(engine.dump_seen().tolist())
    engine.shutdown_shards()

    err = result.errors_table()
    got_robots = sorted(
        (u, e) for u, k, e in zip(err.column("url").to_pylist(),
                                  err.column("error_kind").to_pylist(),
                                  err.column("error").to_pylist())
        if k == "robots"
    )
    sim_robots = sorted(
        (e["url"], e["error"]) for e in sim.errors
        if e["error_kind"] == "robots"
    )
    assert got_robots == sim_robots
    assert seen == sim.seen
    # the query-carrying seed must actually be robots-blocked, with the
    # query in the match key — otherwise this test proves nothing
    assert any(e == "disallowed: /p/2?track=1" for _, e in got_robots)


def test_engine_equals_simulator_with_seed_priorities(
    fixture_tables, ray_session, tmp_path_factory
):
    """O2 with a NON-uniform priority column: a seeds table carrying
    distinct priorities (the link_pagerank feedback shape) must crawl
    high-priority URLs first on BOTH sides — engine trace ≡ simulator
    trace under a budget that forces the priority split every round."""
    import numpy as np

    pages, seeds, robots, pages_path = fixture_tables
    n = seeds.num_rows
    # distinct float32-exact priorities, deliberately NOT aligned with
    # seed order (reversal + stripe): exercises the sort, not the seq
    # tie-break
    prio = np.array([(i * 7) % 5 for i in range(n)], dtype=np.float32)
    seeds_p = seeds.append_column("priority", pa.array(prio, pa.float32()))

    base = {**CFG, "round_budget": 3, "max_rounds": 6, "max_depth": 1}
    reg = HandlerRegistry()
    flagship_spider(reg)
    sim = simulate(pages, seeds_p, robots, reg, CrawlConfig(**base))

    cfg = EngineConfig(**base, n_admission_shards=2, extract_concurrency=2)
    engine = CrawlEngine([flagship_spider], cfg)
    wd = str(tmp_path_factory.mktemp("prio"))
    result = engine.run(pages_path, seeds_p, robots, wd)
    engine.shutdown_shards()

    trace = result.trace_table()
    rows = sorted(
        zip(
            trace.column("round").to_pylist(),
            trace.column("order_key").to_pylist(),
            trace.column("url").to_pylist(),
        )
    )
    assert [(r, u) for r, _, u in rows] == sim.trace
    # the explicit O2 property: round-0 holds the max-priority seeds
    url_prio = dict(zip(seeds_p.column("url").to_pylist(), prio.tolist()))
    by_round: dict[int, list[float]] = {}
    for r, _, u in rows:
        if u in url_prio:
            by_round.setdefault(r, []).append(url_prio[u])
    if len(by_round) > 1:
        assert min(by_round[0]) >= max(
            p for r, ps in by_round.items() if r > 0 for p in ps
        )


def test_resume_with_seeds_table_raises(
    fixture_tables, ray_session, tmp_path_factory
):
    """resume=True + a committed round + a seeds table used to VALIDATE
    the seeds then silently drop them — must refuse loudly instead."""
    pages, seeds, robots, pages_path = fixture_tables
    cfg = EngineConfig(**CFG, n_admission_shards=2)
    e = CrawlEngine([flagship_spider], cfg)
    wd = str(tmp_path_factory.mktemp("rs"))
    e.run(pages_path, seeds, robots, wd)
    e.shutdown_shards()
    e2 = CrawlEngine([flagship_spider], cfg)
    try:
        with pytest.raises(ValueError, match="seeds table cannot"):
            e2.run(pages_path, seeds, robots, wd, resume=True)
    finally:
        e2.shutdown_shards()


def test_token_refill_closed_form_not_iterated():
    """The ONE refill definition is the closed form
    ``min(burst, tokens + rate * elapsed)`` (AdmissionShard._bucket,
    mirrored bit-for-bit by the simulator): an iterated per-round
    ``tokens += rate`` accumulates float error for non-binary-exact
    rates — 0.1 added 10 times is 0.9999999999999999, deferring a row
    the closed form admits."""
    import numpy as np

    from crawl_ray.state.admission import ADMIT, AdmissionShard

    shard = AdmissionShard({}, {"h": (0.1, 1)})
    out = shard.admit("h", np.array([1], np.uint64), ["/"], 0)
    assert out[0] == ADMIT  # burst spent
    out = shard.admit("h", np.array([2], np.uint64), ["/"], 10)
    assert out[0] == ADMIT, "0.1 * 10 must reach exactly 1.0 token"


def _sideeffect_spider(reg):
    """Handler that schedules+emits and THEN raises: the reference's
    Schedule is an immediate side effect (crawler.go:265-267), so the
    pre-raise outputs must persist on both engine and simulator."""
    from crawl_ray.request import Request
    from crawl_ray.spiders import HandlerError

    def h(resp, result):
        result.emit(mark=f"visited:{resp.url}")
        if resp.url.endswith("/p/0"):
            result.schedule(Request(url="/p/1", referer=resp.url,
                                    callbacks=["se"]))
            # expired child: honored ONLY if the deadline column rides
            # through the link emit (it used to be dropped)
            result.schedule(Request(url="/p/2", referer=resp.url,
                                    callbacks=["se"], deadline=1))
            raise HandlerError("after scheduling")

    reg.register("se", h)


def test_failing_handler_side_effects_and_child_deadline(
    fixture_tables, ray_session, tmp_path_factory
):
    pages, _, robots, pages_path = fixture_tables
    url0 = next(u for u in pages.column("url").to_pylist()
                if u.endswith("/p/0"))
    seeds = pa.table(
        {"url": pa.array([url0], pa.string()),
         "callbacks": pa.array([["se"]], pa.list_(pa.string())),
         "deadline": pa.nulls(1, pa.timestamp("us"))}
    )
    base = {**CFG, "max_rounds": 6, "max_depth": 3}
    reg = HandlerRegistry()
    _sideeffect_spider(reg)
    sim = simulate(pages, seeds, robots, reg, CrawlConfig(**base))

    cfg = EngineConfig(**base, n_admission_shards=2, extract_concurrency=2)
    engine = CrawlEngine([_sideeffect_spider], cfg)
    wd = str(tmp_path_factory.mktemp("sidefx"))
    result = engine.run(pages_path, seeds, robots, wd)
    engine.shutdown_shards()

    # parity: trace, records, errors
    trace = result.trace_table()
    rows = sorted(zip(trace.column("round").to_pylist(),
                      trace.column("order_key").to_pylist(),
                      trace.column("url").to_pylist()))
    assert [(r, u) for r, _, u in rows] == sim.trace
    # the pre-raise schedule persisted: /p/1 was crawled
    assert any(u.endswith("/p/1") for _, _, u in rows)
    # the pre-raise emit persisted alongside the handler error row
    recs = result.records_table()
    fields = [f for f in recs.column("fields").to_pylist()]
    assert any(url0 in f for f in fields)
    errors = result.errors_table()
    kinds = sorted(errors.column("error_kind").to_pylist())
    assert "handler" in kinds
    # the expired child produced an 'expired' error row on BOTH sides
    assert "expired" in kinds
    sim_kinds = sorted(e["error_kind"] for e in sim.errors)
    assert kinds == sim_kinds
