"""Fixture integrity + reference-oracle simulator tests (no Ray)."""

import pyarrow as pa

from crawl_ray.dom import parse_html
from crawl_ray.fixtures import generate_pages, generate_robots, generate_seeds
from crawl_ray.functions import html as H
from crawl_ray.functions.forms import new_selector
from crawl_ray.fixtures import generate_form_pages
from crawl_ray.request import HandlerRegistry
from crawl_ray.simulator import CrawlConfig, simulate
from crawl_ray.spiders import flagship_spider
from crawl_ray.fixtures import EPOCH_US

N = 200


def _registry() -> HandlerRegistry:
    reg = HandlerRegistry()
    flagship_spider(reg)
    return reg


def test_pages_deterministic():
    a = generate_pages(N)
    b = generate_pages(N)
    assert a.equals(b)
    assert a.num_rows == N
    assert len(set(a.column("url").to_pylist())) == N


def test_byte_identical_text_invariant():
    """THE flagship contract: extracting with our F1 kernel over the
    generated html must equal the template-constructed text column,
    byte for byte, for every page."""
    pages = generate_pages(N)
    htmls = pages.column("html").to_pylist()
    texts = pages.column("text").to_pylist()
    for html, expected in zip(htmls, texts):
        assert H.text(parse_html(html), "html") == expected


def test_host_skew_is_zipf():
    pages = generate_pages(1000)
    hosts = [u.split("/")[2] for u in pages.column("url").to_pylist()]
    counts = sorted((hosts.count(h) for h in set(hosts)), reverse=True)
    assert counts[0] > 3 * counts[len(counts) // 2]  # hot head exists


def test_seeds_shape():
    pages = generate_pages(N)
    seeds = generate_seeds(pages)
    assert seeds.num_rows == 10
    d = seeds.to_pydict()
    assert "" in d["method"]  # empty-method default test row
    assert any("page_extra" in c for c in d["callbacks"])  # glob row
    assert any(m for m in d["metadata"])  # proxy metadata row
    assert sum(1 for x in d["deadline"] if x is not None) == 1  # expired row
    assert any(r for r in d["referer"])  # relative row


def test_form_pages_golden():
    table = generate_form_pages()
    d = table.to_pydict()
    for i in range(table.num_rows):
        form = new_selector(parse_html(d["html"][i]), "form")
        assert form.action == d["expect_action"][i]
        expect = {e["key"]: list(e["vals"]) for e in d["expect_values"][i]}
        assert form.values == expect


def test_simulator_crawls_and_texts_match_oracle_column():
    pages = generate_pages(N)
    seeds = generate_seeds(pages)
    robots = generate_robots(pages)
    cfg = CrawlConfig(round_budget=500, max_rounds=30, max_depth=6,
                      virtual_t0=EPOCH_US)
    res = simulate(pages, seeds, robots, _registry(), cfg)

    page_text = dict(
        zip(pages.column("url").to_pylist(), pages.column("text").to_pylist())
    )
    assert len(res.texts) > 20  # crawl actually fanned out
    for url, text in res.texts.items():
        assert text == page_text[url], url

    # expired seed produced an error, never crawled
    assert any(e["error_kind"] == "expired" for e in res.errors)
    # dangling links produced handler (404) errors
    assert any(e["error_kind"] == "handler" for e in res.errors)
    # no URL crawled twice
    urls = [u for _, u in res.trace]
    assert len(urls) == len(set(urls))


def test_simulator_politeness_throttles_hot_host():
    pages = generate_pages(N)
    seeds = generate_seeds(pages)
    robots = generate_robots(pages)
    cfg = CrawlConfig(round_budget=500, max_rounds=3, max_depth=6,
                      virtual_t0=EPOCH_US)
    res = simulate(pages, seeds, robots, _registry(), cfg)
    # within the first rounds a throttled host must not exceed
    # burst + rounds * rate fetches
    per_host: dict[str, int] = {}
    for _, url in res.trace:
        host = url.split("/")[2]
        per_host[host] = per_host.get(host, 0) + 1
    rd = robots.to_pydict()
    limits = {
        h: int(b + 3 * r)
        for h, r, b in zip(rd["host"], rd["rate_per_sec"], rd["burst"])
    }
    for host, count in per_host.items():
        assert count <= limits.get(host, 99), host


def test_simulator_deterministic():
    pages = generate_pages(100)
    seeds = generate_seeds(pages)
    robots = generate_robots(pages)
    cfg = CrawlConfig(round_budget=50, max_rounds=10, virtual_t0=EPOCH_US)
    r1 = simulate(pages, seeds, robots, _registry(), cfg)
    r2 = simulate(pages, seeds, robots, _registry(), cfg)
    assert r1.trace == r2.trace
    assert r1.seen == r2.seen
    assert r1.errors == r2.errors
