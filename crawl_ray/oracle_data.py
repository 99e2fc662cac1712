"""Expected-output tables for the driver's oracle gate.

The crawl-engine queries run over the synthetic web, which is not one of
the DuckDB-registered sf views — so their oracle is the single-threaded
reference SIMULATOR (:mod:`crawl_ray.simulator`, the independent
implementation of the reference loop semantics, SURVEY.md §5.2.2).  Its
outputs are materialized once (deterministic, marker-cached) to parquet
under ``/tmp/crawl_ray_expected``, and ``oracle_sql()`` reads them via
DuckDB ``read_parquet`` — giving these queries the same hard
rows+schema+value-hash gate as the SQL-expressible ones.

This oracle covers the ORCHESTRATION (frontier rounds, admission,
politeness, ordering, dispatch): the engine runs at full parallelism,
the simulator at concurrency 1.  The extraction KERNEL is oracled
separately and non-circularly: ``extract_text`` compares the engine's
DOM extraction against the fixture's template-built ``text`` column
(FIXTURES.md — the text is constructed, never extracted).
"""

from __future__ import annotations

import json
import pathlib

import pyarrow as pa
import pyarrow.parquet as pq

from crawl_ray.fixtures import (
    EPOCH_US,
    cookie_web_dir,
    fixture_dir,
    form_web_dir,
)
from crawl_ray.request import HandlerRegistry
from crawl_ray.simulator import CrawlConfig, SimResult, simulate
from crawl_ray.spiders import cookie_spider, flagship_spider, forms_spider

__all__ = [
    "EXPECTED_BASE",
    "flagship_core_cfg",
    "forms_core_cfg",
    "cookies_core_cfg",
    "expected_flagship_dir",
    "expected_forms_dir",
    "expected_cookies_dir",
]

EXPECTED_BASE = "/tmp/crawl_ray_expected"

METRIC_COLS = [
    "round", "pending", "admitted", "dup_dropped", "seen_dropped",
    "deferred", "records", "links",
]


def flagship_core_cfg(n: int) -> dict:
    """The semantic config shared by the engine's flagship run
    (``crawl_queries._run_flagship_cached``) and its simulator oracle —
    one definition so they cannot drift."""
    return dict(
        round_budget=max(200, n // 4),
        max_rounds=12,
        max_depth=5,
        virtual_t0=EPOCH_US,
    )


def forms_core_cfg() -> dict:
    """Semantic config for the M1 form-roundtrip web (engine + sim)."""
    return dict(
        round_budget=500,
        max_rounds=24,
        max_depth=3,
        virtual_t0=EPOCH_US,
    )


def cookies_core_cfg() -> dict:
    """Semantic config for the ST1 cookie-jar web (engine + sim)."""
    return dict(
        round_budget=500,
        max_rounds=8,
        max_depth=4,
        virtual_t0=EPOCH_US,
    )


def _write_sim_outputs(sim: SimResult, d: pathlib.Path) -> None:
    records = sorted(
        (r["url"], int(r["depth"]), json.dumps(r["fields"], sort_keys=True))
        for r in sim.records
    )
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r[0] for r in records], pa.string()),
                "depth": pa.array([r[1] for r in records], pa.int64()),
                "fields": pa.array([r[2] for r in records], pa.string()),
            }
        ),
        d / "records.parquet",
    )
    errors = sorted((e["error_kind"], e["url"]) for e in sim.errors)
    pq.write_table(
        pa.table(
            {
                "error_kind": pa.array([e[0] for e in errors], pa.string()),
                "url": pa.array([e[1] for e in errors], pa.string()),
            }
        ),
        d / "errors.parquet",
    )
    pq.write_table(
        pa.table(
            {
                c: pa.array([int(m.get(c, 0)) for m in sim.metrics], pa.int64())
                for c in METRIC_COLS
            }
        ),
        d / "metrics.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "round": pa.array([int(r) for r, _ in sim.trace], pa.int64()),
                "url": pa.array([u for _, u in sim.trace], pa.string()),
            }
        ),
        d / "trace.parquet",
    )


def expected_flagship_dir(n: int) -> str:
    """Materialize (once) the simulator-expected outputs of the
    flagship crawl at fixture size ``n``; returns the directory."""
    d = pathlib.Path(EXPECTED_BASE) / f"web_n{n}"
    marker = d / "_SUCCESS"
    if marker.exists():
        return str(d)
    d.mkdir(parents=True, exist_ok=True)
    fd = fixture_dir(n)
    pages = pq.read_table(f"{fd}/pages.parquet")
    seeds = pq.read_table(f"{fd}/seeds.parquet")
    robots = pq.read_table(f"{fd}/robots.parquet")
    reg = HandlerRegistry()
    flagship_spider(reg)
    sim = simulate(pages, seeds, robots, reg, CrawlConfig(**flagship_core_cfg(n)))
    _write_sim_outputs(sim, d)
    marker.touch()
    return str(d)


def expected_cookies_dir(n: int = 24) -> str:
    """Materialize (once) the simulator-expected outputs of the ST1
    cookie-jar crawl; returns the directory."""
    d = pathlib.Path(EXPECTED_BASE) / f"cookieweb_n{n}"
    marker = d / "_SUCCESS"
    if marker.exists():
        return str(d)
    d.mkdir(parents=True, exist_ok=True)
    fd = cookie_web_dir(n)
    pages = pq.read_table(f"{fd}/pages.parquet")
    seeds = pq.read_table(f"{fd}/seeds.parquet")
    reg = HandlerRegistry()
    cookie_spider(reg)
    sim = simulate(pages, seeds, None, reg, CrawlConfig(**cookies_core_cfg()))
    _write_sim_outputs(sim, d)
    marker.touch()
    return str(d)


def expected_forms_dir(n: int = 40) -> str:
    """Materialize (once) the simulator-expected outputs of the M1
    form-roundtrip crawl; returns the directory."""
    d = pathlib.Path(EXPECTED_BASE) / f"formweb_n{n}"
    marker = d / "_SUCCESS"
    if marker.exists():
        return str(d)
    d.mkdir(parents=True, exist_ok=True)
    fd = form_web_dir(n)
    pages = pq.read_table(f"{fd}/pages.parquet")
    seeds = pq.read_table(f"{fd}/seeds.parquet")
    reg = HandlerRegistry()
    forms_spider(reg)
    sim = simulate(pages, seeds, None, reg, CrawlConfig(**forms_core_cfg()))
    _write_sim_outputs(sim, d)
    marker.touch()
    return str(d)
