"""Crawl-engine pipelines exposed as driver queries (rows-only checks:
the synthetic web is not one of the DuckDB-registered views).

All fixture inputs are generated deterministically under /tmp (cached);
sf_dir maps to a fixture size so results stay comparable across runs.
"""

from __future__ import annotations

import pathlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from crawl_ray.dom import parse_html
from crawl_ray.engine import CrawlEngine, EngineConfig
from crawl_ray.fixtures import cookie_web_dir, fixture_dir, form_web_dir
from crawl_ray.functions import html as H
from crawl_ray.oracle_data import (
    cookies_core_cfg,
    flagship_core_cfg,
    forms_core_cfg,
)
from crawl_ray.spiders import cookie_spider, flagship_spider, forms_spider

__all__ = [
    "extract_text_pipeline",
    "crawl_flagship",
    "crawl_errors",
    "crawl_metrics",
    "crawl_host_stats",
    "crawl_politeness_audit",
    "crawl_forms_roundtrip",
    "crawl_cookies",
    "forms_extract",
    "recrawl_schedule",
    "web_corpus_prep",
    "anchor_text_index",
    "link_pagerank",
    "crawl_depth_histogram",
    "fixture_size_for",
]

# one flagship run per fixture size per process: the flagship/errors/
# metrics/host-stats queries are different views of the same crawl
_RUN_CACHE: dict[object, object] = {}


def _run_flagship_cached(sf_dir: str):
    n = fixture_size_for(sf_dir)
    cached = _RUN_CACHE.get(n)
    if cached is not None:
        return cached
    d = fixture_dir(n)
    cfg = EngineConfig(
        **flagship_core_cfg(n),
        n_admission_shards=4,
        extract_concurrency=0,  # uncapped
    )
    engine = CrawlEngine([flagship_spider], cfg)
    workdir = f"/tmp/crawl_ray_runs/flagship_n{n}"
    seeds = pq.read_table(f"{d}/seeds.parquet")
    robots = pq.read_table(f"{d}/robots.parquet")
    try:
        result = engine.run(f"{d}/pages.parquet", seeds, robots, workdir)
    finally:
        engine.shutdown_shards()
    _RUN_CACHE[n] = result
    return result


def forms_fixture_path() -> str:
    """Write (once) the F10 form corpus; shared by the ``forms_extract``
    query and its DuckDB oracle (which reads the expected columns)."""
    from crawl_ray.fixtures import generate_form_pages

    base = pathlib.Path("/tmp/crawl_ray_fixtures/forms")
    f = base / "forms.parquet"
    if not f.exists():
        base.mkdir(parents=True, exist_ok=True)
        pq.write_table(generate_form_pages(), f)
    return str(f)


def fixture_size_for(sf_dir: str) -> int:
    """Map the driver's sf dir to a fixture scale."""
    if "0.1" in sf_dir and "0.01" not in sf_dir and "0.001" not in sf_dir:
        return 20_000
    if "0.01" in sf_dir:
        return 2_000
    return 500


def extract_text_pipeline(sf_dir: str):
    """The minimum end-to-end slice (SURVEY.md §7.2): read pages →
    map_batches(extract F1 text) → rows (url, text, text_ok) where
    text_ok verifies byte-identity against the oracle column."""
    d = fixture_dir(fixture_size_for(sf_dir))

    def extract(batch: pa.Table) -> pa.Table:
        htmls = batch.column("html").to_pylist()
        texts = [H.text(parse_html(h), "html") for h in htmls]
        oracle = batch.column("text").to_pylist()
        return pa.table(
            {
                "url": batch.column("url"),
                "text": pa.array(texts, pa.string()),
                "text_ok": pa.array(
                    [t == o for t, o in zip(texts, oracle)], pa.bool_()
                ),
            }
        )

    return ray.data.read_parquet(
        f"{d}/pages.parquet", columns=["url", "html", "text"]
    ).map_batches(extract, batch_format="pyarrow", batch_size=256,
                  zero_copy_batch=True).sort("url")


def _records_view(result) -> pa.Table:
    """(url, depth:int64, fields) sorted (url, fields) — the layout the
    simulator-expected oracle parquet uses."""
    records = result.records_table()
    if records is None:
        return pa.table(
            {"url": pa.array([], pa.string()), "depth": pa.array([], pa.int64()),
             "fields": pa.array([], pa.string())}
        )
    records = records.select(["url", "depth", "fields"])
    records = records.set_column(
        1, "depth", records.column("depth").cast(pa.int64())
    )
    return records.sort_by([("url", "ascending"), ("fields", "ascending")])


def crawl_flagship(sf_dir: str):
    """Full frontier crawl over the fixture web; returns the records
    table (url, depth, fields-json).  Oracle: the single-threaded
    simulator's records (read_parquet in ``oracle_sql()``)."""
    return _records_view(_run_flagship_cached(sf_dir))


def crawl_forms_roundtrip(sf_dir: str):
    """M1 roundtrip (``request.go:40-99`` wired into the crawl path):
    form pages → F10 scrape → Form ⇒ POST submit + query re-encoded GET
    → records of the effective requests.  Oracle: simulator records on
    the same web."""
    key = ("forms", 40)
    result = _RUN_CACHE.get(key)
    if result is None:
        d = form_web_dir(40)
        cfg = EngineConfig(**forms_core_cfg(), n_admission_shards=2)
        engine = CrawlEngine([forms_spider], cfg)
        seeds = pq.read_table(f"{d}/seeds.parquet")
        try:
            result = engine.run(
                f"{d}/pages.parquet", seeds, None,
                "/tmp/crawl_ray_runs/forms_n40",
            )
        finally:
            engine.shutdown_shards()
        _RUN_CACHE[key] = result
    return _records_view(result)


def crawl_cookies(sf_dir: str):
    """ST1 cookie jar (``crawler.go:87``) wired through the crawl path:
    Set-Cookie payloads harvested from fetched pages accumulate in the
    host-sharded jar and are sent (merged with explicit request
    cookies) on subsequent rounds' requests; records capture the
    observed Cookie header per stage.  Oracle: simulator records on the
    same web."""
    key = ("cookies", 24)
    result = _RUN_CACHE.get(key)
    if result is None:
        d = cookie_web_dir(24)
        cfg = EngineConfig(**cookies_core_cfg(), n_admission_shards=2)
        engine = CrawlEngine([cookie_spider], cfg)
        seeds = pq.read_table(f"{d}/seeds.parquet")
        try:
            result = engine.run(
                f"{d}/pages.parquet", seeds, None,
                "/tmp/crawl_ray_runs/cookies_n24",
            )
        finally:
            engine.shutdown_shards()
        _RUN_CACHE[key] = result
    return _records_view(result)


def crawl_errors(sf_dir: str):
    """The errors side-output (the reference's errors channel,
    ``crawler.go:55-58``): badurl / expired / robots / handler rows from
    the flagship crawl, sorted (error_kind, url)."""
    errors = _run_flagship_cached(sf_dir).errors_table()
    if errors is None:
        return pa.table(
            {"error_kind": pa.array([], pa.string()),
             "url": pa.array([], pa.string())}
        )
    return errors.select(["error_kind", "url"]).sort_by(
        [("error_kind", "ascending"), ("url", "ascending")]
    )


def crawl_metrics(sf_dir: str):
    """Per-round lineage metrics (A1): one row per committed round —
    pending/admitted/dedup/deferred/records/links counts, read from the
    round manifests the checkpoint protocol writes."""
    result = _run_flagship_cached(sf_dir)
    rows = [m for m in result.metrics if m.get("round", -1) >= 0]
    cols = ["round", "pending", "admitted", "dup_dropped", "seen_dropped",
            "deferred", "records", "links"]
    return pa.table(
        {c: pa.array([int(m.get(c, 0)) for m in rows], pa.int64())
         for c in cols}
    )


_HOST_RENAMES = {"n_fetched_sum": "n_fetched", "first_round_min": "first_round"}


def crawl_host_stats(sf_dir: str):
    """Per-host crawl stats (A2 — the skew/salting-decision input):
    fetched count + first round per host, aggregated from the trace
    with the partial-combine pattern (per-block Arrow group_by in
    parallel tasks, tiny final combine on the driver)."""
    from urllib.parse import urlsplit

    result = _run_flagship_cached(sf_dir)
    files = sorted(
        str(f)
        for f in pathlib.Path(result.workdir).glob("round=*/trace/*.parquet")
    )
    if not files:
        return pa.table(
            {"host": pa.array([], pa.string()),
             "n_fetched": pa.array([], pa.int64()),
             "first_round": pa.array([], pa.int64())}
        )

    def partial(batch: pa.Table) -> pa.Table:
        hosts = [urlsplit(u).netloc for u in batch.column("url").to_pylist()]
        t = pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "n_fetched": pa.array([1] * len(hosts), pa.int64()),
                "first_round": batch.column("round").cast(pa.int64()),
            }
        )
        g = t.group_by(["host"]).aggregate(
            [("n_fetched", "sum"), ("first_round", "min")]
        )
        return g.rename_columns([_HOST_RENAMES.get(c, c) for c in g.column_names])

    parts = ray.data.read_parquet(files).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    from crawl_ray.util import collect_table

    t = collect_table(parts)
    out = t.group_by(["host"]).aggregate(
        [("n_fetched", "sum"), ("first_round", "min")]
    )
    out = out.rename_columns([_HOST_RENAMES.get(c, c) for c in out.column_names])
    return out.select(["host", "n_fetched", "first_round"]).sort_by("host")


def forms_extract(sf_dir: str):
    """F10 form scraping as a distributed stage: parse each form page,
    extract action + default values (``forms/forms.go`` semantics),
    verify per row against the fixture's expected columns."""
    from crawl_ray.functions.forms import new_selector

    f = pathlib.Path(forms_fixture_path())

    def extract(batch: pa.Table) -> pa.Table:
        htmls = batch.column("html").to_pylist()
        expect_action = batch.column("expect_action").to_pylist()
        expect_values = batch.column("expect_values").to_pylist()
        actions, values_enc, ok = [], [], []
        for html, ea, ev in zip(htmls, expect_action, expect_values):
            form = new_selector(parse_html(html), "#f")
            actions.append(form.action)
            vals = sorted((k, tuple(v)) for k, v in form.values.items())
            # "k=v1,v2;k2=..." — the SQL-reconstructable encoding the
            # DuckDB oracle builds from the fixture's expect_values
            values_enc.append(
                ";".join(f"{k}={','.join(v)}" for k, v in vals)
            )
            want = sorted((e["key"], tuple(e["vals"])) for e in ev)
            ok.append(form.action == ea and vals == want)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "action": pa.array(actions, pa.string()),
                "values": pa.array(values_enc, pa.string()),
                "forms_ok": pa.array(ok, pa.bool_()),
            }
        )

    return ray.data.read_parquet(str(f)).map_batches(
        extract, batch_format="pyarrow", zero_copy_batch=True
    )


RECRAWL_DRIVER_THRESHOLD = 200_000  # partial rows; above ⇒ distributed


def recrawl_schedule(
    sf_dir: str, k: int = 5, force_distributed: bool = False
):
    """Recrawl selection over the page store (the `warc_ts` column of
    the Common-Crawl-style input): the k stalest URLs per host, i.e.
    the next politeness-respecting refetch wave.  Per-batch local
    top-k per host (vectorized rank-in-run after an Arrow sort)
    shrinks every block to ≤ hosts-in-block × k rows; the final merge
    is driver-side when the partials are small, and a
    ``groupby(host).map_groups`` re-rank when the host count itself is
    frontier-scale (10^8 hosts × k doesn't fit one table) — same
    dual-path shape as ``dedup_clusters``."""
    d = fixture_dir(fixture_size_for(sf_dir))

    def _stalest_k(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("host", "ascending"),
                ("warc_ts_us", "ascending"),
                ("url", "ascending"),
            ],
        )
        t = t.take(idx)
        h = t.column("host").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
        runlens = np.diff(np.append(starts, len(h)))
        rnk = (
            np.arange(len(h), dtype=np.int64)
            - np.repeat(starts, runlens)
            + 1
        )
        t = t.append_column("rnk", pa.array(rnk, pa.int64()))
        return t.filter(pa.array(rnk <= k))

    def partial(batch: pa.Table) -> pa.Table:
        urls = batch.column("url")
        hosts = pc.list_element(pc.split_pattern(urls, "/"), 2)
        t = pa.table(
            {
                "host": hosts,
                "url": urls,
                "warc_ts_us": batch.column("warc_ts").cast(pa.int64()),
            }
        )
        return _stalest_k(t).drop_columns(["rnk"])

    parts = ray.data.read_parquet(
        f"{d}/pages.parquet", columns=["url", "warc_ts"]
    ).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # count() below is then metadata-only — without
    # this, the gate's count() would execute the lazy read+top-k plan
    # once and the consumer below would re-execute it from scratch

    if force_distributed or parts.count() > RECRAWL_DRIVER_THRESHOLD:
        # frontier-scale host count: re-rank inside each host group
        def rerank(group: pa.Table) -> pa.Table:
            return _stalest_k(group).select(
                ["host", "url", "warc_ts_us", "rnk"]
            )

        return parts.groupby("host").map_groups(
            rerank, batch_format="pyarrow"
        )

    from crawl_ray.util import collect_table

    t = collect_table(parts)
    out = _stalest_k(t)
    return out.select(["host", "url", "warc_ts_us", "rnk"])


def web_corpus_prep(sf_dir: str, min_tokens: int = 20):
    """Web pages → training-corpus slice, end to end: real DOM
    extraction (the F1 text kernel — byte-identical to the fixture's
    template-built ``text`` column, which is what makes the text-keyed
    oracle exact), a FUSED token-count quality filter in the same batch
    map (rejected rows never leave the task), then exact content dedup
    keeping the lexicographically-first URL.  One shuffle total (the
    content-hash groupby); the extract+filter pass streams.

    Dedup merges are confirmed on the full 128-bit digest (lo word
    groups, hi word verifies — see ``exact_dedup``), so two distinct
    texts colliding on the 64-bit group key stay distinct corpus rows
    instead of silently merging (~3 expected at 10^10 docs otherwise).

    The product story of the engine in one query: crawl output in,
    deduplicated training corpus out."""
    from crawl_ray.urlnorm import content_hash128_batch

    d = fixture_dir(fixture_size_for(sf_dir))

    from crawl_ray.pipelines.dedup import _default_band_partitions
    from crawl_ray.pipelines.stats import _splitmix64

    P = _default_band_partitions()

    def extract_filter(batch: pa.Table) -> pa.Table:
        htmls = batch.column("html").to_pylist()
        texts = pa.array(
            [H.text(parse_html(h), "html") for h in htmls], pa.string()
        )
        n_tokens = pc.list_value_length(
            pc.split_pattern_regex(pc.utf8_trim_whitespace(texts), r"\s+")
        ).cast(pa.int64())
        h, check = content_hash128_batch(texts)
        t = pa.table(
            {
                "url": batch.column("url"),
                "n_tokens": n_tokens,
                "text_hash": pa.array(h, pa.uint64()),
                "check": pa.array(check, pa.uint64()),
                "part": pa.array(
                    (_splitmix64(h) % np.uint64(P)).astype(np.int64),
                    pa.int64(),
                ),
            }
        )
        return t.filter(pc.greater_equal(n_tokens, min_tokens))

    # hash-partitioned keep-first: per-group Python bounded by the
    # PARTITION count — one sort + segment reduce covers every content
    # hash of a partition (not one Python call per distinct text)
    def keep_first_part(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[("text_hash", "ascending"), ("check", "ascending"),
                       ("url", "ascending")],
        )
        g = group.take(idx)
        hs = g.column("text_hash").to_numpy(zero_copy_only=False)
        cs = g.column("check").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(
            np.r_[True, (hs[1:] != hs[:-1]) | (cs[1:] != cs[:-1])]
        )
        lens = np.diff(np.r_[starts, len(hs)])
        kept = g.take(pa.array(starts, pa.int64())).select(
            ["url", "n_tokens"]
        )
        return kept.append_column("n_dups", pa.array(lens, pa.int64()))

    return (
        ray.data.read_parquet(f"{d}/pages.parquet", columns=["url", "html"])
        .map_batches(
            extract_filter, batch_format="pyarrow", batch_size=256,
            zero_copy_batch=True,
        )
        .repartition(P)
        .groupby("part")
        .map_groups(keep_first_part, batch_format="pyarrow")
    )


def _resolved_links(url: str, html: bytes):
    """Per-page F9 link walk shared by :func:`anchor_text_index` and
    :func:`link_pagerank` (ONE definition of "what counts as a link"):
    yields ``(target, node)`` for every ``<a>`` whose ``href``
    resolves against the page url (``html_utils.go:93-106``)."""
    from crawl_ray.dom import find

    resolve = H.node_resolve_url(url)
    for node in find(parse_html(html), "a"):
        t = resolve(node)
        if t:
            yield t, node


def anchor_text_index(sf_dir: str, n_parts: int = 64):
    """Anchor-text index over the synthetic web — the webtext op that
    turns a link graph into training signal (anchor-based query
    generation, inlink-weighted quality priors): for every link TARGET,
    the inlink count, the number of distinct source hosts, and the most
    common anchor text (ties broken anchor-asc).

    Scale shape: the extract pass emits per-batch PRE-AGGREGATED
    (target, anchor, src_host) partial counts (one row per distinct
    triple per batch, not one per link); the per-target combine is ONE
    hash-partitioned shuffle keyed by ``hash(target) % n_parts`` whose
    partition kernel is fully vectorized (composite-key ``np.unique`` +
    ``bincount`` + segmented lexsort — no per-target Python), so hot
    targets (every site's home page) cost the same as cold ones and
    group-call overhead is ``n_parts``, not ``n_targets``.  Dangling
    targets are indexed too — an anchor index describes what the web
    SAYS about a URL, fetched or not.
    """
    from crawl_ray.dom import find
    from crawl_ray.urlnorm import fnv1a64_batch

    d = fixture_dir(fixture_size_for(sf_dir))

    empty = pa.table(
        {"target": pa.array([], pa.string()),
         "anchor": pa.array([], pa.string()),
         "src_host": pa.array([], pa.string()),
         "cnt": pa.array([], pa.int64()),
         "part": pa.array([], pa.int64())}
    )

    def extract_links(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        hosts, targets, anchors = [], [], []
        for url, h in zip(urls, htmls):
            host = url.split("/", 3)[2]
            for t, node in _resolved_links(url, h):
                hosts.append(host)
                targets.append(t)
                anchors.append(H.node_text(node))
        if not targets:
            return empty
        t = pa.table(
            {"target": pa.array(targets, pa.string()),
             "anchor": pa.array(anchors, pa.string()),
             "src_host": pa.array(hosts, pa.string()),
             "cnt": pa.array(np.ones(len(targets), np.int64))}
        ).group_by(["target", "anchor", "src_host"]).aggregate([("cnt", "sum")])
        t = t.rename_columns(
            [c if c != "cnt_sum" else "cnt" for c in t.column_names]
        )
        part = fnv1a64_batch(t.column("target").to_pylist()) % np.uint64(n_parts)
        return t.append_column("part", pa.array(part.astype(np.int64), pa.int64()))

    def combine(group: pa.Table) -> pa.Table:
        tg = group.column("target").to_numpy(zero_copy_only=False)
        an = group.column("anchor").to_numpy(zero_copy_only=False)
        sh = group.column("src_host").to_numpy(zero_copy_only=False)
        cnt = group.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        tgs, ti = np.unique(tg, return_inverse=True)
        ans, ai = np.unique(an, return_inverse=True)
        shs, si = np.unique(sh, return_inverse=True)
        n_in = np.bincount(ti, weights=cnt, minlength=len(tgs)).astype(np.int64)
        n_hosts = np.bincount(
            np.unique(ti * len(shs) + si) // len(shs), minlength=len(tgs)
        ).astype(np.int64)
        uk, inv2 = np.unique(ti * len(ans) + ai, return_inverse=True)
        acnt = np.bincount(inv2, weights=cnt).astype(np.int64)
        t_of, a_of = uk // len(ans), uk % len(ans)
        o = np.lexsort((a_of, -acnt, t_of))  # per target: cnt desc, anchor asc
        t_s = t_of[o]
        first = np.flatnonzero(np.r_[True, t_s[1:] != t_s[:-1]])
        top_t = t_s[first]
        return pa.table(
            {"target": pa.array(tgs[top_t], pa.string()),
             "n_inlinks": pa.array(n_in[top_t], pa.int64()),
             "n_src_hosts": pa.array(n_hosts[top_t], pa.int64()),
             "top_anchor": pa.array(ans[a_of[o][first]], pa.string()),
             "top_anchor_cnt": pa.array(acnt[o][first], pa.int64())}
        )

    return (
        ray.data.read_parquet(f"{d}/pages.parquet", columns=["url", "html"])
        .map_batches(
            extract_links, batch_format="pyarrow", batch_size=256,
            zero_copy_batch=True,
        )
        .repartition(n_parts)
        .groupby("part")
        .map_groups(combine, batch_format="pyarrow")
    )


def crawl_depth_histogram(sf_dir: str):
    """BFS-depth histogram over the record sink (A1 companion view —
    the convergence profile of the frontier: how much of the crawl each
    hop contributes, and how many distinct pages it reached).  Same
    partial-combine shape as :func:`crawl_host_stats`: per-block Arrow
    group_by over the records parquet shards, tiny driver combine (the
    depth domain is the round count)."""
    result = _run_flagship_cached(sf_dir)
    files = sorted(
        str(f)
        for f in pathlib.Path(result.workdir).glob("round=*/records/*.parquet")
    )
    if not files:
        return pa.table(
            {"depth": pa.array([], pa.int64()),
             "n_records": pa.array([], pa.int64())}
        )

    from crawl_ray.pipelines.relational import partial_then_final_sum

    ds = ray.data.read_parquet(files, columns=["depth"]).map_batches(
        lambda b: pa.table({"depth": b.column("depth").cast(pa.int64())}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return partial_then_final_sum(
        ds, ["depth"], {}, count_name="n_records"
    ).sort_by("depth")


def crawl_politeness_audit(sf_dir: str):
    """Per-host politeness audit (ST5 observability): total fetches,
    PEAK per-round fetches, and rounds active — the table an operator
    reads to confirm the token buckets held (peak ≤ per-host budget)
    and to spot hosts that dominate rounds (salting candidates).
    Same trace source and partial-combine shape as
    :func:`crawl_host_stats`; the (host × round) key space is bounded
    by the crawl config, not the URL count."""
    from urllib.parse import urlsplit

    from crawl_ray.util import collect_table

    result = _run_flagship_cached(sf_dir)
    files = sorted(
        str(f)
        for f in pathlib.Path(result.workdir).glob("round=*/trace/*.parquet")
    )
    empty = pa.table(
        {"host": pa.array([], pa.string()),
         "n_fetched": pa.array([], pa.int64()),
         "peak_round_fetches": pa.array([], pa.int64()),
         "n_rounds_active": pa.array([], pa.int64())}
    )
    if not files:
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        hosts = [urlsplit(u).netloc for u in batch.column("url").to_pylist()]
        t = pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "round": batch.column("round").cast(pa.int64()),
                "c": pa.array([1] * len(hosts), pa.int64()),
            }
        )
        g = t.group_by(["host", "round"]).aggregate([("c", "sum")])
        return g.rename_columns(
            [{"c_sum": "c"}.get(c, c) for c in g.column_names]
        )

    parts = collect_table(
        ray.data.read_parquet(files).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    per_round = parts.group_by(["host", "round"]).aggregate([("c", "sum")])
    per_round = per_round.rename_columns(
        [{"c_sum": "c"}.get(c, c) for c in per_round.column_names]
    )
    out = per_round.group_by(["host"]).aggregate(
        [("c", "sum"), ("c", "max"), ("round", "count")]
    )
    renames = {
        "c_sum": "n_fetched",
        "c_max": "peak_round_fetches",
        "round_count": "n_rounds_active",
    }
    out = out.rename_columns([renames.get(c, c) for c in out.column_names])
    return out.select(
        ["host", "n_fetched", "peak_round_fetches", "n_rounds_active"]
    ).sort_by("host")


def link_pagerank(
    sf_dir: str,
    iterations: int = 3,
    k: int = 20,
    num_partitions: int | None = None,
    small_graph_threshold: int = 2_000_000,
) -> pa.Table:
    """Directed integer PageRank over the crawled LINK graph — the
    frontier-prioritization signal a production crawler feeds back into
    its priority column (O2): pages the web points at crawl first.

    Exact semantics (oracle-matched, same integer-micro-unit family as
    ``graph.supplier_pagerank``):

    - nodes = distinct link SOURCES ∪ distinct resolved link TARGETS
      (a page with neither in- nor out-links is not a graph node);
    - edges = distinct ``(src_url, target_url)`` pairs, targets
      resolved per F9 (``html_utils.go:93-106``) against the page url;
    - outdeg = distinct out-targets per source; dangling nodes
      (targets never fetched / pages without links) contribute no
      mass — their rank is not redistributed;
    - rank_0 = 1_000_000; rank_{t+1} =
      150_000 + (850 * Σ_src rank_t[src] // outdeg[src]) // 1_000
      (truncating integer division, bit-reproducible);
    - output: top-``k`` ``(url, rank_micro)``, rank desc then url asc.

    Scale shape: edge extraction is a batch-deduped ``map_batches``
    pass over the page store (pre-aggregated before any shuffle); the
    driver fast path collects only a ≤``small_graph_threshold``-edge
    list, while the distributed loop mirrors ``supplier_pagerank`` —
    string-keyed hash joins, per-batch contrib partials, and a bounded
    nodes ⟕ contribs rebase per iteration; nothing driver-sized ever
    materializes on the big path (forced-distributed parity test).
    """
    from crawl_ray.pipelines.graph import pagerank_loop
    from crawl_ray.pipelines.joins import _default_partitions
    from crawl_ray.util import collect_table, normalize_schema

    num_partitions = num_partitions or _default_partitions()
    d = fixture_dir(fixture_size_for(sf_dir))

    empty = pa.table(
        {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())}
    )

    def extract_edges(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        srcs: list[str] = []
        dsts: list[str] = []
        for url, h in zip(urls, htmls):
            seen: set[str] = set()
            for t, _node in _resolved_links(url, h):
                if t not in seen:
                    seen.add(t)
                    srcs.append(url)
                    dsts.append(t)
        if not srcs:
            return empty
        return pa.table(
            {"src": pa.array(srcs, pa.string()),
             "dst": pa.array(dsts, pa.string())}
        )

    raw = ray.data.read_parquet(
        f"{d}/pages.parquet", columns=["url", "html"]
    ).map_batches(
        extract_edges, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    # (src, dst) pairs are distinct WITHIN a page (per-page dedup
    # above); duplicate url rows in the store could still repeat a
    # pair, so BOTH paths below run a global dedup — the count gate is
    # an upper bound, which only ever routes to the (also-deduped)
    # distributed path early.
    if raw.count() <= small_graph_threshold:
        return _link_pagerank_local(collect_table(raw), iterations, k)

    s = pa.string()
    # global (src, dst) dedup before the iteration loop: per-page dedup
    # is complete only if page urls are unique in the store; the
    # groupby shuffle makes the distributed path match the oracle's
    # DISTINCT unconditionally (same guard supplier_pagerank carries)
    edges = normalize_schema(
        raw.groupby(["src", "dst"]).count().drop_columns(["count()"]),
        {"src": s, "dst": s},
        coalesce=num_partitions,
    ).materialize()
    del raw  # drop the pre-normalize stream: holding the ref would pin
    # a full duplicate of the edge list in the object store for every
    # PageRank iteration (it only existed to serve the count gate)

    def node_partial(batch: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            batch.column("src").to_numpy(zero_copy_only=False),
            batch.column("dst").to_numpy(zero_copy_only=False),
        ]))
        return pa.table({"node": pa.array(u, pa.string()),
                         "one": pa.array(np.ones(len(u), dtype=np.int64))})

    # directed graph: the node universe is src UNION dst (dangling link
    # targets rebase to TELEPORT each round inside the shared loop)
    nodes = normalize_schema(
        edges.map_batches(
            node_partial, batch_format="pyarrow", zero_copy_batch=True
        ).groupby("node").sum("one"),
        {"node": s},
        coalesce=num_partitions,
    ).materialize()

    ranks = pagerank_loop(edges, s, num_partitions, iterations, nodes=nodes)

    top = collect_table(
        ranks.sort(["rank_micro", "node"], descending=[True, False]).limit(k)
    )
    return pa.table(
        {"url": top.column("node").cast(pa.string()),
         "rank_micro": top.column("rank_micro").cast(pa.int64())}
    )


def _link_pagerank_local(edges_t: pa.Table, iterations: int, k: int) -> pa.Table:
    """Driver fast path over a collected ≤threshold edge list: the
    identical integer arithmetic on numpy arrays (directed — dangling
    nodes receive teleport mass only and redistribute nothing)."""
    from crawl_ray.pipelines.graph import BASE_RANK, DAMP_MILLI, TELEPORT

    if edges_t.num_rows == 0 or "src" not in edges_t.column_names:
        # empty page store: Ray short-circuits empty blocks past the
        # extract UDF, so the collected table keeps the READ schema
        # (url, html) — the same guard graph._unique_edges carries
        return pa.table(
            {"url": pa.array([], pa.string()),
             "rank_micro": pa.array([], pa.int64())}
        )
    src = edges_t.column("src").to_numpy(zero_copy_only=False)
    dst = edges_t.column("dst").to_numpy(zero_copy_only=False)
    nodes = np.unique(np.concatenate([src, dst]))
    src_i = np.searchsorted(nodes, src)
    dst_i = np.searchsorted(nodes, dst)
    # global (src, dst) dedup: per-page dedup leaves duplicates if the
    # page store carries duplicate url rows — match the oracle's
    # DISTINCT instead of double-counting outdeg
    pair = np.unique(src_i.astype(np.int64) * np.int64(len(nodes)) + dst_i)
    src_i = (pair // len(nodes)).astype(src_i.dtype)
    dst_i = (pair % len(nodes)).astype(dst_i.dtype)
    outdeg = np.bincount(src_i, minlength=len(nodes)).astype(np.int64)
    rank = np.full(len(nodes), BASE_RANK, dtype=np.int64)
    safe_deg = np.maximum(outdeg, 1)  # dangling rows never indexed via src_i
    for _ in range(iterations):
        contrib = rank[src_i] // safe_deg[src_i]
        sums = np.bincount(
            dst_i, weights=contrib.astype(np.float64), minlength=len(nodes)
        ).astype(np.int64)
        rank = TELEPORT + (DAMP_MILLI * sums) // 1_000
    order = np.lexsort((nodes, -rank))[:k]
    return pa.table(
        {"url": pa.array(nodes[order], pa.string()),
         "rank_micro": pa.array(rank[order], pa.int64())}
    )
