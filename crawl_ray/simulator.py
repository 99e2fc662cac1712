"""Pure-Python single-threaded reference oracle (SURVEY.md §5.2.2).

Simulates the reference crawler loop semantics (``crawler.go:119-144``
+ ``Execute``) at concurrency=1 over the synthetic pages table, plus
the north-rule additions (dedup, politeness, robots, priority, round
budget) under the **exact spec the engine implements** — so engine
output at full parallelism must equal this byte-for-byte:

round K (virtual time = t0 + K seconds):
  1. pending = this round's frontier + politeness-deferred rows
  2. canonicalize (M1 effective fetch key: referer resolution, query
     re-encode, Form ⇒ POST — request.go:40-99; bad URL → error row),
     drop expired deadlines (error kind "expired",
     nsq/nsqcrawl/queue.go:89-94), then run the middleware chain
     pre-fetch (first error → "middleware" error row,
     crawler.go:153-158)
  3. canonical order = sort by (-priority, depth, seq_path)
  4. global round budget: rows past it are deferred untouched
  5. per-host admission in canonical order: within-round duplicate
     url_hash dropped (keep first); robots disallow → error; seen →
     drop; token bucket (refill rate/s, cap burst) → admit or defer
  6. fetch = pages lookup (missing → status 404, empty body); the
     request's effective Cookie header (ST1: explicit request cookies
     + the host's jar as of the END of the previous round,
     crawler.go:87 + request.go:69-73) is set on req.headers before
     dispatch; the page's Set-Cookie payload (optional ``set_cookie``
     pages column, JSON name→value) is harvested regardless of handler
     outcome and folded into the jar at the round boundary in
     canonical order (last write per (host, name) wins)
  7. M7 dispatch in canonical order; handler raise → error row
     (outputs the handler issued BEFORE failing persist — Schedule is
     an immediate side effect in the reference, crawler.go:265-267)
  8. children: depth+1 (dropped past max_depth), seq_path = parent
     path + 4-byte emission index
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from urllib.parse import urlsplit

import pyarrow as pa

from crawl_ray.request import (
    HandlerRegistry,
    Request,
    apply_cookie_header,
    construct_request,
    effective_fetch_key,
    merge_default_headers,
)
from crawl_ray.response import HandlerResult, ResponseView
from crawl_ray.schemas import seq_child, seq_root
from crawl_ray.urlnorm import fnv1a64, url_host

__all__ = ["CrawlConfig", "SimResult", "simulate"]


@dataclass
class CrawlConfig:
    round_budget: int = 10_000
    max_rounds: int = 50
    max_depth: int = 8
    default_rate: float = 2.0
    default_burst: int = 4
    virtual_t0: int = 0  # epoch micros of round 0


@dataclass
class SimResult:
    trace: list[tuple[int, str]] = field(default_factory=list)  # (round, url)
    seen: set[int] = field(default_factory=set)
    records: list[dict] = field(default_factory=list)
    errors: list[dict] = field(default_factory=list)
    texts: dict[str, str] = field(default_factory=dict)
    rounds: int = 0
    # per-round lineage metrics, same keys/definitions as the engine's
    # round manifests (A1): the hard oracle for `crawl_metrics`
    metrics: list[dict] = field(default_factory=list)


@dataclass
class _Row:
    req: Request
    url: str = ""  # canonical
    host: str = ""
    url_hash: int = 0

    def order_key(self):
        return (-self.req.priority, self.req.depth, self.req.seq_path)


def _seed_rows(seeds: pa.Table) -> list[_Row]:
    rows = []
    cols = seeds.to_pydict()
    n = seeds.num_rows
    for i in range(n):
        deadline = cols.get("deadline", [None] * n)[i]
        if deadline is not None and not isinstance(deadline, int):
            deadline = int(deadline.timestamp() * 1_000_000)
        req = Request(
            url=cols["url"][i],
            method=cols.get("method", [""] * n)[i] or "",
            referer=cols.get("referer", [""] * n)[i] or "",
            callbacks=list(cols["callbacks"][i]),
            metadata=json.loads(cols["metadata"][i]) if cols.get("metadata", [""] * n)[i] else {},
            deadline=deadline,
            depth=0,
            seq_path=seq_root(i),
            # a seeds-table priority column is honored by the engine
            # (write_seeds passes it through; order_key encodes it), so
            # the oracle must read it too — dropping it silently broke
            # parity for prioritized seed lists
            priority=float(cols.get("priority", [0.0] * n)[i] or 0.0),
        )
        rows.append(_Row(req=req))
    return rows


def _robots_maps(robots: pa.Table | None, cfg: CrawlConfig):
    disallow: dict[str, list[str]] = {}
    rates: dict[str, tuple[float, int]] = {}
    if robots is not None:
        d = robots.to_pydict()
        for i, host in enumerate(d["host"]):
            disallow[host] = list(d["disallow_prefixes"][i])
            rates[host] = (float(d["rate_per_sec"][i]), int(d["burst"][i]))
    return disallow, rates


def simulate(
    pages: pa.Table,
    seeds: pa.Table,
    robots: pa.Table | None,
    registry: HandlerRegistry,
    cfg: CrawlConfig | None = None,
) -> SimResult:
    cfg = cfg or CrawlConfig()
    page_index: dict[str, int] = {
        u: i for i, u in enumerate(pages.column("url").to_pylist())
    }
    htmls = pages.column("html").to_pylist()
    set_cookies = (
        pages.column("set_cookie").to_pylist()
        if "set_cookie" in pages.column_names
        else [""] * pages.num_rows
    )
    disallow, rates = _robots_maps(robots, cfg)

    res = SimResult()
    tokens: dict[str, list[float]] = {}  # host -> [tokens, last_refill_round]
    jar: dict[str, dict[str, str]] = {}  # ST1: host -> {name: value}
    pending: list[_Row] = _seed_rows(seeds)
    deferred: list[_Row] = []

    for rnd in range(cfg.max_rounds + 1):
        if not pending and not deferred:
            break
        res.rounds = rnd + 1
        now_us = cfg.virtual_t0 + rnd * 1_000_000

        # 2. canonicalize (M1 effective fetch key) + deadline filter
        #    + pre-fetch middleware chain — same order as the engine's
        #    canonicalize stage.  Deferred rows go through step 2 again,
        #    exactly like the engine's spill parquet does (idempotent:
        #    their url is already canonical; deadlines are re-checked).
        live: list[_Row] = []
        carried, deferred = deferred, []
        for row in pending + carried:
            try:
                row.url, eff_method = effective_fetch_key(
                    row.req.url, row.req.referer, row.req.method,
                    row.req.form, row.req.query,
                )
                row.req.method = eff_method
                row.host = url_host(row.url)
                if not row.host:
                    raise ValueError(f"no host in {row.url!r}")
                row.url_hash = fnv1a64(row.url)
            except ValueError as exc:
                res.errors.append(_err(row, "badurl", str(exc)))
                continue
            if row.req.deadline is not None and row.req.deadline < now_us:
                res.errors.append(_err(row, "expired", "deadline expired"))
                continue
            if registry.middlewares:
                effective = construct_request(row.req, default_headers={})
                try:
                    for mw in registry.middlewares:
                        mw(row.req, effective)
                    merge_default_headers(effective["headers"])
                except Exception as exc:  # noqa: BLE001 - middleware abort
                    res.errors.append(_err(row, "middleware", str(exc)))
                    continue
            live.append(row)

        # 3-4. canonical order + global budget
        live.sort(key=_Row.order_key)
        overflow = live[cfg.round_budget:]
        live = live[: cfg.round_budget]
        metrics = {"round": rnd, "pending": len(live)}

        # lazy closed-form refill, the IDENTICAL float expression to
        # AdmissionShard._bucket (min(burst, tokens + rate * elapsed)):
        # a per-round iterated `tokens += rate` diverges from the
        # engine's rate*elapsed in floating point for rates that are
        # not binary-exact (e.g. 0.1 added 10 times < 1.0), silently
        # breaking engine/oracle admission parity
        def _refill(host: str) -> float:
            rate, burst = rates.get(host, (cfg.default_rate, cfg.default_burst))
            state = tokens.get(host)
            if state is None:
                state = [float(burst), float(rnd)]
                tokens[host] = state
            else:
                elapsed = rnd - state[1]
                if elapsed > 0:
                    state[0] = min(float(burst), state[0] + rate * elapsed)
                    state[1] = float(rnd)
            return state[0]

        # 5. admission
        admitted: list[_Row] = []
        n_deferred_before = len(deferred)
        dup_dropped = seen_dropped = 0
        round_seen: set[int] = set()
        for row in live:
            if row.url_hash in round_seen:
                dup_dropped += 1
                continue  # within-round duplicate (silent drop)
            round_seen.add(row.url_hash)
            if row.url_hash in res.seen:
                seen_dropped += 1
                continue  # already crawled (silent drop)
            # robots match key = path INCLUDING query (RFC 9309) — the
            # identical rule canonicalize_batch computes for the engine
            _parts = urlsplit(row.url)
            path = (_parts.path or "/") + (
                f"?{_parts.query}" if _parts.query else ""
            )
            if any(path.startswith(p) for p in disallow.get(row.host, [])):
                res.errors.append(_err(row, "robots", f"disallowed: {path}"))
                continue
            if _refill(row.host) >= 1.0:
                tokens[row.host][0] -= 1.0
                res.seen.add(row.url_hash)
                admitted.append(row)
            else:
                deferred.append(row)
        metrics["admitted"] = len(admitted)
        metrics["dup_dropped"] = dup_dropped
        metrics["seen_dropped"] = seen_dropped
        metrics["deferred"] = len(deferred) - n_deferred_before
        deferred.extend(overflow)

        # 6-8. fetch + dispatch + fan-out
        n_records_before = len(res.records)
        children: list[_Row] = []
        new_cookies: dict[str, dict[str, str]] = {}
        for row in admitted:
            res.trace.append((rnd, row.url))
            idx = page_index.get(row.url)
            status = 200 if idx is not None else 404
            body = htmls[idx] if idx is not None else b""
            # M5: proxied request → fresh jar-less client
            # (crawler.go:174-177): no jar cookies out, no Set-Cookie in
            from crawl_ray.stages.fetch import pick_proxy, proxy_from_metadata

            addrs, _ok = proxy_from_metadata(row.req.metadata)
            proxied = bool(addrs and pick_proxy(fnv1a64(row.url), addrs))
            row.req.headers = apply_cookie_header(
                row.req.headers,
                row.req.cookies,
                None if proxied else jar.get(row.host),
            )
            if idx is not None and set_cookies[idx] and not proxied:
                # harvested in admitted (canonical) order; applied to
                # the jar at the round boundary — later rows this round
                # still see the round-start jar, like the engine
                new_cookies.setdefault(row.host, {}).update(
                    {k: str(v) for k, v in json.loads(set_cookies[idx]).items()}
                )
            resp = ResponseView(row.req, row.url, status, body)
            merged = HandlerResult()
            for handler in registry.get_handlers(row.req.callbacks):
                one = HandlerResult()
                try:
                    handler(resp, one)
                except Exception as exc:  # noqa: BLE001 - handler error path
                    # Schedule is an immediate side effect in the
                    # reference (crawler.go:265-267): outputs the
                    # failing handler issued BEFORE the raise persist
                    merged.records.extend(one.records)
                    merged.requests.extend(one.requests)
                    res.errors.append(_err(row, "handler", str(exc)))
                    break
                merged.records.extend(one.records)
                merged.requests.extend(one.requests)
            for record in merged.records:
                res.records.append(
                    {"url": row.url, "depth": row.req.depth, "fields": record}
                )
                if "text" in record:
                    res.texts[row.url] = record["text"]
            if row.req.depth + 1 > cfg.max_depth:
                continue
            for j, child in enumerate(merged.requests):
                child.depth = row.req.depth + 1
                child.seq_path = seq_child(row.req.seq_path, j)
                children.append(_Row(req=child))

        if admitted:
            metrics["records"] = len(res.records) - n_records_before
            metrics["links"] = len(children)
        for host, cookies in new_cookies.items():
            jar.setdefault(host, {}).update(cookies)
        res.metrics.append(metrics)
        pending = children

    return res


def _err(row: _Row, kind: str, message: str) -> dict:
    return {
        "url": row.req.url,
        "method": row.req.get_method(),
        "depth": row.req.depth,
        "seq_path": row.req.seq_path,
        "error_kind": kind,
        "error": message,
    }
