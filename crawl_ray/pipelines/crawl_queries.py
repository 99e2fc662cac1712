"""Crawl-engine pipelines exposed as driver queries (rows-only checks:
the synthetic web is not one of the DuckDB-registered views).

All fixture inputs are generated deterministically under /tmp (cached);
sf_dir maps to a fixture size so results stay comparable across runs.
"""

from __future__ import annotations

import pathlib

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from crawl_ray.dom import parse_html
from crawl_ray.engine import CrawlEngine, EngineConfig
from crawl_ray.fixtures import EPOCH_US, fixture_dir
from crawl_ray.functions import html as H
from crawl_ray.spiders import flagship_spider

__all__ = ["extract_text_pipeline", "crawl_flagship", "fixture_size_for"]


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
                  zero_copy_batch=True)


def crawl_flagship(sf_dir: str):
    """Full frontier crawl over the fixture web; returns the records
    table (url, depth, fields-json) sorted by url."""
    n = fixture_size_for(sf_dir)
    d = fixture_dir(n)
    cfg = EngineConfig(
        round_budget=max(200, n // 4),
        max_rounds=12,
        max_depth=5,
        virtual_t0=EPOCH_US,
        n_admission_shards=4,
        extract_concurrency=4,
    )
    engine = CrawlEngine([flagship_spider], cfg)
    workdir = f"/tmp/crawl_ray_runs/flagship_n{n}"
    seeds = pq.read_table(f"{d}/seeds.parquet")
    robots = pq.read_table(f"{d}/robots.parquet")
    try:
        result = engine.run(f"{d}/pages.parquet", seeds, robots, workdir)
        records = result.records_table()
    finally:
        engine.shutdown_shards()
    if records is None:
        records = pa.table(
            {"url": pa.array([], pa.string()), "depth": pa.array([], pa.int32()),
             "fields": pa.array([], pa.string())}
        )
    else:
        records = records.select(["url", "depth", "fields"]).sort_by("url")
    return records
