"""Deterministic synthetic-web fixtures (FIXTURES.md).

Everything is derived from FNV-1a hashes of stable strings — no RNG
library, so tables are bit-identical across runs, processes and
platforms.  The ``text`` column is built **by template construction**
(not by running the engine's extractor), so the byte-identical-text
invariant test (extract(html) == text) is non-circular.

Sizes (FIXTURES.md): sf_tiny ~200 pages, sf_small ~5_000, sf_bench
~200_000.
"""

from __future__ import annotations

import json
import os
import pathlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawl_ray.schemas import PAGES_SCHEMA
from crawl_ray.urlnorm import fnv1a64

__all__ = [
    "generate_pages",
    "generate_seeds",
    "generate_robots",
    "generate_form_pages",
    "generate_form_web",
    "generate_cookie_web",
    "form_web_dir",
    "cookie_web_dir",
    "fixture_dir",
    "page_url",
    "EPOCH_US",
]

EPOCH_US = 1735689600000000  # 2025-01-01T00:00:00Z in epoch micros
_LANGS = ("en", "de", "fr", "es")


def _salted(salt: str, key: str) -> str:
    """Prefix a fixture hash key with a web-variant salt; the empty
    salt (default) reproduces the canonical fixture web byte-for-byte
    (property tests generate alternative webs via non-empty salts)."""
    return key if not salt else f"{salt}|{key}"


def _host_of(i: int, n_hosts: int, cdf: np.ndarray, salt: str = "") -> int:
    r = fnv1a64(_salted(salt, f"host:{i}")) / float(1 << 64)
    return int(np.searchsorted(cdf, r, side="right"))


def _zipf_cdf(n_hosts: int, s: float = 1.2) -> np.ndarray:
    w = 1.0 / np.arange(1, n_hosts + 1, dtype=np.float64) ** s
    c = np.cumsum(w)
    return c / c[-1]


def page_url(host: int, k: int) -> str:
    return f"http://host{host}.example/p/{k}"


def _page_links(url: str, host: int, host_pages: list[int],
                n_pages: int, hosts: np.ndarray, salt: str = "") -> list[str]:
    """Deterministic out-links as they appear in the href attributes
    (relative for even j, absolute for odd; ~2% dangling)."""
    d = fnv1a64(_salted(salt, f"deg:{url}")) % 9
    hrefs: list[str] = []
    for j in range(d):
        if fnv1a64(_salted(salt, f"dang:{url}:{j}")) % 50 == 0:
            t = fnv1a64(_salted(salt, f"dlink:{url}:{j}")) % n_pages
            hrefs.append(f"http://host{host}.example/missing/{t}")
        elif j % 2 == 0:
            # relative link to a page on the same host (resolves vs referer)
            t = host_pages[fnv1a64(_salted(salt, f"rlink:{url}:{j}")) % len(host_pages)]
            hrefs.append(f"/p/{t}")
        else:
            t = fnv1a64(_salted(salt, f"alink:{url}:{j}")) % n_pages
            hrefs.append(page_url(int(hosts[t]), t))
    return hrefs


def _filler_paras(k: int, weight: int) -> list[str]:
    """Deterministic filler paragraphs scaling page size (~170 B each);
    ``weight`` approximates realistic page fatness (Common-Crawl pages
    are tens of KB, not the 1 KB of the minimal template)."""
    out = []
    for w in range(weight - 1):
        base = (k * 7919 + w * 104729) % 999983
        words = " ".join(f"w{(base + i * 31) % 9973}" for i in range(24))
        out.append(f"para {w} {words}")
    return out


def _page_html(host: int, k: int, hrefs: list[str], weight: int = 1) -> str:
    lis = "".join(
        f'<li><a href="{href}">anchor {j}</a></li>' for j, href in enumerate(hrefs)
    )
    filler = "".join(
        f'<p class="fill"><em>{p}</em></p>\n' for p in _filler_paras(k, weight)
    )
    return (
        f"<html><head><title>T{host}-{k}</title></head><body>\n"
        f"<h1>Page {k} on host{host}</h1>\n"
        f'<p class="c{k % 5}">  lorem{k}   ipsum\t{k * 7}\n dolor </p>\n'
        f'<span data-price="x"> {k % 100},{k % 10} </span>\n'
        f"<ul>{lis}</ul>\n"
        f"{filler}"
        f'<form action="/submit{k}" id="f"><input name="q" value="v{k}">\n'
        f'<input type="checkbox" name="c" value="1" checked="checked">\n'
        f'<select name="s"><option value="a">A</option>'
        f'<option value="b" selected="selected">B</option></select></form>\n'
        f"<script>var x = {k};</script>\n"
        f"</body></html>"
    )


def _page_text(host: int, k: int, n_links: int, weight: int = 1) -> str:
    """Expected whole-document extracted text, by template construction
    (goquery Text of <html>, whitespace-collapsed — html_utils.go:37-45)."""
    # adjacent <li>/<option> text nodes concatenate with NO separator in
    # goquery Text() — "anchor 0anchor 1", "AB" — before collapse
    anchors = "".join(f"anchor {j}" for j in range(n_links))
    parts = [
        f"T{host}-{k}",
        f"Page {k} on host{host}",
        f"lorem{k} ipsum {k * 7} dolor",
        f"{k % 100},{k % 10}",
    ]
    if anchors:
        parts.append(anchors)
    parts.extend(_filler_paras(k, weight))
    parts.append("AB")
    parts.append(f"var x = {k};")
    return " ".join(parts)


def generate_pages(
    n_pages: int, n_hosts: int | None = None, weight: int = 1, salt: str = ""
) -> pa.Table:
    """The synthetic web: deterministic pages table (FIXTURES.md §1)."""
    if n_hosts is None:
        n_hosts = max(4, n_pages // 40)
    cdf = _zipf_cdf(n_hosts)
    hosts = np.fromiter(
        (_host_of(i, n_hosts, cdf, salt) for i in range(n_pages)),
        dtype=np.int64, count=n_pages,
    )
    pages_by_host: dict[int, list[int]] = {}
    for i in range(n_pages):
        pages_by_host.setdefault(int(hosts[i]), []).append(i)

    urls, htmls, texts, langs = [], [], [], []
    for i in range(n_pages):
        h = int(hosts[i])
        url = page_url(h, i)
        hrefs = _page_links(url, h, pages_by_host[h], n_pages, hosts, salt)
        urls.append(url)
        htmls.append(_page_html(h, i, hrefs, weight).encode("utf-8"))
        texts.append(_page_text(h, i, len(hrefs), weight))
        langs.append(_LANGS[fnv1a64(url) % 4])

    warc_ts = pa.array(
        (EPOCH_US + np.arange(n_pages, dtype=np.int64) * 1_000_000),
        type=pa.timestamp("us"),
    )
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": warc_ts,
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def generate_seeds(
    pages: pa.Table, n_hosts: int | None = None, salt: str = ""
) -> pa.Table:
    """Round-0 seed table (FIXTURES.md §2): 8 valid roots (hot + cold
    hosts), 1 relative URL with referer, 1 dangling; one empty method,
    one glob-callback row, one proxy-metadata row, one expired deadline."""
    urls = pages.column("url").to_pylist()
    n = len(urls)
    # pick 8 distinct valid seed targets spread over the table (hot hosts
    # dominate early indices thanks to the Zipf host assignment)
    picks = sorted({(fnv1a64(_salted(salt, f"seed:{i}")) % n) for i in range(16)})[:8]
    rows: list[dict] = []
    for idx, page_i in enumerate(picks):
        rows.append(
            {
                "url": urls[page_i],
                "method": "" if idx == 0 else "GET",
                "referer": "",
                "callbacks": ["list", "page_extra"] if idx == 1 else ["page"],
                "metadata": '{"crawl_proxy": "socks5://proxy.example:1080"}'
                if idx == 2
                else "",
                "deadline": None,
            }
        )
    # relative URL resolved against a referer (request.go:104-117)
    ref_i = fnv1a64(_salted(salt, "seed:rel")) % n
    ref_url = urls[ref_i]
    rows.append(
        {
            "url": "/p/" + ref_url.rsplit("/", 1)[1],
            "method": "GET",
            "referer": ref_url,
            "callbacks": ["page"],
            "metadata": "",
            "deadline": None,
        }
    )
    # dangling URL (error path) with an already-expired deadline (drop
    # test, nsq/nsqcrawl/queue.go:89-94)
    rows.append(
        {
            "url": "http://host0.example/missing/seed",
            "method": "GET",
            "referer": "",
            "callbacks": ["page"],
            "metadata": "",
            "deadline": EPOCH_US - 1,
        }
    )
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "method": pa.array([r["method"] for r in rows], pa.string()),
            "referer": pa.array([r["referer"] for r in rows], pa.string()),
            "callbacks": pa.array([r["callbacks"] for r in rows], pa.list_(pa.string())),
            "metadata": pa.array([r["metadata"] for r in rows], pa.string()),
            "deadline": pa.array([r["deadline"] for r in rows], pa.timestamp("us")),
        }
    )


def generate_robots(pages: pa.Table, salt: str = "") -> pa.Table:
    """Politeness side table (FIXTURES.md §3): every host present in
    pages; ~10% get a disallow prefix; hot hosts throttled harder."""
    hosts = sorted({u.split("/")[2] for u in pages.column("url").to_pylist()})
    disallow, rate, burst = [], [], []
    for host in hosts:
        h = fnv1a64(_salted(salt, f"robots:{host}"))
        disallow.append(["/p/13"] if h % 10 == 0 else [])
        hot = host in ("host1.example", "host2.example")
        rate.append(0.5 if hot else 2.0)
        burst.append(4)
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "disallow_prefixes": pa.array(disallow, pa.list_(pa.string())),
            "rate_per_sec": pa.array(rate, pa.float64()),
            "burst": pa.array(burst, pa.int32()),
        }
    )


def generate_form_pages() -> pa.Table:
    """F10 corpus (FIXTURES.md §4): 20 docs exercising forms.go rules."""
    docs, expect_action, expect_values = [], [], []
    for i in range(20):
        checked = 'checked="checked"' if i % 2 == 0 else ""
        selected = 'selected="selected"' if i % 3 == 0 else ""
        action = f'action="/go{i}"' if i % 5 != 0 else ""
        html = (
            f"<html><body><form {action} id=\"f\">"
            f'<input name="q" value="v{i}">'
            f'<input type="submit" name="s" value="Go">'
            f'<input type="checkbox" name="c" value="{i}" {checked}>'
            f'<input type="radio" name="r" value="a">'
            f'<input type="radio" name="r" value="b" {checked}>'
            f'<select name="sel"><option value="x">X{i}</option>'
            f'<option value="y" {selected}>Y{i}</option></select>'
            f"</form></body></html>"
        )
        values: dict[str, list[str]] = {"q": [f"v{i}"]}
        if checked:
            values["c"] = [str(i)]
            values["r"] = ["b"]
        values["sel"] = ["y"] if selected else [""]
        docs.append(html.encode())
        expect_action.append(f"/go{i}" if i % 5 != 0 else "")
        expect_values.append(values)
    return pa.table(
        {
            "doc_id": pa.array(range(20), pa.int64()),
            "html": pa.array(docs, pa.binary()),
            "expect_action": pa.array(expect_action, pa.string()),
            "expect_values": pa.array(
                [sorted((k, tuple(v)) for k, v in ev.items()) for ev in expect_values],
                pa.list_(pa.struct([("key", pa.string()), ("vals", pa.list_(pa.string()))])),
            ),
        }
    )


def _form_web_text(kind: str, k: int) -> str:
    if kind == "form":
        return f"Form {k} q v{k}"
    if kind == "submit":
        return f"submitted {k} ok"
    return f"search result {k} page 2"


def generate_form_web(n: int = 40) -> tuple[pa.Table, pa.Table]:
    """M1 roundtrip web (form submission + query re-encode): ``n`` form
    pages, each with a POST target (reached only via Form ⇒ POST on the
    scraped ``action``) and a GET query target (reached only via the
    ``query`` re-encode, ``request.go:57-59``).  Returns (pages, seeds).

    The form exercises forms.go default-value rules: checked-only
    checkbox (k even), first-selected option (k % 3 == 0 → "a", else
    the select contributes the empty value).
    """
    urls, htmls, texts = [], [], []
    for k in range(n):
        h = k % 4
        host = f"http://formhost{h}.example"
        checked = ' checked="checked"' if k % 2 == 0 else ""
        selected = ' selected="selected"' if k % 3 == 0 else ""
        form_html = (
            f"<html><body><h1>Form {k}</h1>"
            f'<form action="/submit/{k}" id="f">'
            f'<input name="q" value="v{k}">'
            f'<input type="submit" name="go" value="Go">'
            f'<input type="checkbox" name="c" value="on"{checked}>'
            f'<select name="s"><option value="a"{selected}>A</option>'
            f'<option value="b">B</option></select>'
            f"</form>"
            f"<p>q v{k}</p></body></html>"
        )
        urls.append(f"{host}/form/{k}")
        htmls.append(form_html.encode())
        texts.append(_form_web_text("form", k))
        # POST target: only reachable through the scraped form action
        urls.append(f"{host}/submit/{k}")
        htmls.append(f"<html><body>submitted {k} ok</body></html>".encode())
        texts.append(_form_web_text("submit", k))
        # GET query target: url must carry the re-encoded query string
        urls.append(f"{host}/search?page=2&q=v{k}")
        htmls.append(
            f"<html><body>search result {k} page 2</body></html>".encode()
        )
        texts.append(_form_web_text("search", k))

    n_rows = len(urls)
    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                EPOCH_US + np.arange(n_rows, dtype=np.int64) * 1_000_000,
                type=pa.timestamp("us"),
            ),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n_rows, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )
    seed_urls = [f"http://formhost{k % 4}.example/form/{k}" for k in range(n)]
    seeds = pa.table(
        {
            "url": pa.array(seed_urls, pa.string()),
            "method": pa.array([""] * n, pa.string()),
            "referer": pa.array([""] * n, pa.string()),
            "callbacks": pa.array([["form_page"]] * n, pa.list_(pa.string())),
            "metadata": pa.array([""] * n, pa.string()),
            "deadline": pa.nulls(n, pa.timestamp("us")),
        }
    )
    return pages, seeds


def form_web_dir(n: int = 40, base: str = "/tmp/crawl_ray_fixtures") -> str:
    """Write (once, cached) the form-roundtrip web for a size."""
    d = pathlib.Path(base) / f"formweb_n{n}"
    marker = d / "_SUCCESS"
    if marker.exists():
        return str(d)
    d.mkdir(parents=True, exist_ok=True)
    pages, seeds = generate_form_web(n)
    pq.write_table(pages, d / "pages.parquet")
    pq.write_table(seeds, d / "seeds.parquet")
    marker.touch()
    return str(d)


def generate_cookie_web(n: int = 24) -> tuple[pa.Table, pa.Table]:
    """ST1 cookie-jar web: per k a 3-page chain on its own host —

    * ``/start/k`` sets ``sid=s{k}``; its handler schedules ``/next/k``
      with an explicit request cookie ``u=x{k}`` → at ``/next/k`` the
      observed Cookie header is "u=x{k}; sid=s{k}" (explicit first,
      jar sorted after — ``request.cookie_header``).
    * ``/next/k`` OVERRIDES ``sid=o{k}`` and adds ``tok=t{k}``; links
      to ``/final/k`` → observed header "sid=o{k}; tok=t{k}" proves
      round-boundary accumulation + same-name override.
    * two extra pages share ``cookieshared.example`` and both set
      ``shared`` in round 0 — the canonically-last seed wins, proving
      the deterministic last-write-wins fold.

    Returns (pages, seeds); pages carry the optional ``set_cookie``
    column (JSON name→value) the page store surfaces to the jar.
    """
    urls, htmls, texts, cookies = [], [], [], []

    def page(url: str, body: str, text: str, set_cookie: dict | None) -> None:
        urls.append(url)
        htmls.append(f"<html><body>{body}</body></html>".encode())
        texts.append(text)
        cookies.append(
            json.dumps(set_cookie, sort_keys=True) if set_cookie else ""
        )

    for k in range(n):
        host = f"http://cookiehost{k}.example"
        page(f"{host}/start/{k}", f"<h1>start {k}</h1>",
             f"start {k}", {"sid": f"s{k}"})
        page(f"{host}/next/{k}", f"<p>next {k}</p>",
             f"next {k}", {"sid": f"o{k}", "tok": f"t{k}"})
        page(f"{host}/final/{k}", f"<p>final {k}</p>", f"final {k}", None)
    shared = "http://cookieshared.example"
    for i in range(2):
        page(f"{shared}/a/{i}", f"<p>a {i}</p>", f"a {i}",
             {"shared": f"v{i}"})
        page(f"{shared}/check/{i}", f"<p>check {i}</p>", f"check {i}", None)

    n_rows = len(urls)
    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                EPOCH_US + np.arange(n_rows, dtype=np.int64) * 1_000_000,
                type=pa.timestamp("us"),
            ),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n_rows, pa.string()),
            "set_cookie": pa.array(cookies, pa.string()),
        }
    )
    seed_urls = [f"http://cookiehost{k}.example/start/{k}" for k in range(n)]
    seed_cbs = [["cookie_start"]] * n
    seed_urls += [f"{shared}/a/{i}" for i in range(2)]
    seed_cbs += [["cookie_shared"]] * 2
    m = len(seed_urls)
    seeds = pa.table(
        {
            "url": pa.array(seed_urls, pa.string()),
            "method": pa.array([""] * m, pa.string()),
            "referer": pa.array([""] * m, pa.string()),
            "callbacks": pa.array(seed_cbs, pa.list_(pa.string())),
            "metadata": pa.array([""] * m, pa.string()),
            "deadline": pa.nulls(m, pa.timestamp("us")),
        }
    )
    return pages, seeds


def cookie_web_dir(n: int = 24, base: str = "/tmp/crawl_ray_fixtures") -> str:
    """Write (once, cached) the cookie-jar web for a size."""
    d = pathlib.Path(base) / f"cookieweb_n{n}"
    marker = d / "_SUCCESS"
    if marker.exists():
        return str(d)
    d.mkdir(parents=True, exist_ok=True)
    pages, seeds = generate_cookie_web(n)
    pq.write_table(pages, d / "pages.parquet")
    pq.write_table(seeds, d / "seeds.parquet")
    marker.touch()
    return str(d)


def fixture_dir(
    n_pages: int, base: str = "/tmp/crawl_ray_fixtures", weight: int = 1
) -> str:
    """Write (once, cached) the pages/seeds/robots parquet for a size;
    returns the directory.  Used by tests, bench and ``queries()``.
    ``weight`` scales page body size (bench uses a heavier web so
    per-URL parse work is realistic; tests keep the minimal pages)."""
    suffix = f"web_n{n_pages}" if weight == 1 else f"web_n{n_pages}_w{weight}"
    d = pathlib.Path(base) / suffix
    marker = d / "_SUCCESS"
    if marker.exists():
        return str(d)
    d.mkdir(parents=True, exist_ok=True)
    pages = generate_pages(n_pages, weight=weight)
    pq.write_table(pages, d / "pages.parquet")
    pq.write_table(generate_seeds(pages), d / "seeds.parquet")
    pq.write_table(generate_robots(pages), d / "robots.parquet")
    marker.touch()
    return str(d)
