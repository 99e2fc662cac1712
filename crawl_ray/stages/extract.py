"""Fetch + parse/extract stages (M6/M7 + F1-F9 as Ray Data transforms).

``make_fetch_fn`` returns a stateless ``map_batches`` function doing the
frontier ⋈ pages lookup (J1).  :class:`ExtractActor` is the stateful
actor-pool stage (ST6): the handler registry is built **once per actor**
in ``__init__`` and reused across batches; per row it parses the HTML
(lazily — skipped entirely when ``raw`` is set, M6 gating
``crawler.go:191-197``), routes callbacks through the glob dispatch
table (M7, ``crawler.go:226-263``) and collects a tagged union batch:

``kind``: "record" (handler emit), "link" (scheduled child request),
"error" (handler raised).  The engine splits the union afterwards —
one parse pass feeds all three outputs.
"""

from __future__ import annotations

import json

import pyarrow as pa

from crawl_ray.request import HandlerRegistry, Request, apply_cookie_header
from crawl_ray.response import HandlerResult, ResponseView
from crawl_ray.schemas import seq_child

__all__ = ["make_fetch_fn", "ExtractActor", "UNION_SCHEMA", "links_to_frontier"]

UNION_SCHEMA = pa.schema(
    [
        pa.field("kind", pa.string()),
        pa.field("url", pa.string()),
        pa.field("method", pa.string()),
        pa.field("referer", pa.string()),
        pa.field("form", pa.string()),
        pa.field("query", pa.string()),
        pa.field("cookies", pa.string()),
        pa.field("headers", pa.string()),
        pa.field("raw", pa.bool_()),
        pa.field("callbacks", pa.list_(pa.string())),
        pa.field("depth", pa.int32()),
        pa.field("seq_path", pa.binary()),
        pa.field("priority", pa.float32()),
        pa.field("deadline", pa.timestamp("us")),
        pa.field("metadata", pa.string()),
        pa.field("handler", pa.string()),
        pa.field("fields", pa.string()),
        pa.field("error_kind", pa.string()),
        pa.field("error", pa.string()),
    ]
)


# emit() defaults, hoisted: rebuilding this dict literal per emitted
# row was pure allocation overhead in the hot extract loop
_EMIT_DEFAULTS = {
    "method": "", "referer": "", "form": "", "query": "",
    "cookies": "", "headers": "", "raw": False, "callbacks": (),
    "depth": 0, "seq_path": b"", "priority": 0.0, "deadline": None,
    "metadata": "", "handler": "", "fields": "", "error_kind": "",
    "error": "", "url": "",
}


def make_fetch_fn(store):
    """Default fetch stage: page-store lookup (the live-HTTP analog of
    ``crawler.go:180-189``).  The batch contract and the pluggable
    live-HTTP implementation live in :mod:`crawl_ray.stages.fetch`."""
    from crawl_ray.stages.fetch import make_fetch_stage

    return make_fetch_stage(store)


def _row_request(cols: dict, i: int) -> Request:
    def jload(name: str):
        v = cols[name][i]
        return json.loads(v) if v else {}

    # middlewares may inspect req.deadline (the simulator passes the
    # real value, simulator.py) — convert the Arrow timestamp cell to
    # epoch micros like _seed_rows does
    deadline = cols.get("deadline", (None,) * (i + 1))[i]
    if deadline is not None and not isinstance(deadline, int):
        deadline = int(deadline.timestamp() * 1_000_000)

    return Request(
        url=cols["url"][i],
        method=cols["method"][i] or "",
        referer=cols["referer"][i] or "",
        form=jload("form"),
        query=jload("query"),
        cookies=jload("cookies"),
        headers=jload("headers"),
        raw=bool(cols["raw"][i]),
        callbacks=list(cols["callbacks"][i]),
        depth=int(cols["depth"][i]),
        seq_path=cols["seq_path"][i],
        priority=float(cols["priority"][i]),
        deadline=deadline,
        metadata=jload("metadata"),
    )


class ExtractActor:
    """Callable class for ``map_batches(..., concurrency=N)``.

    ``spiders``: list of registrator callables (module-level, so the
    actor constructor args stay picklable); the registry and middleware
    chain are built once per actor."""

    def __init__(self, spiders: list, max_depth: int = 8) -> None:
        self.registry = HandlerRegistry()
        for spider in spiders:
            spider(self.registry)
        self.max_depth = max_depth

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {name: batch.column(name).to_pylist() for name in batch.column_names}
        n = batch.num_rows
        out: dict[str, list] = {name: [] for name in UNION_SCHEMA.names}

        def emit(kind: str, **kw) -> None:
            defaults = dict(_EMIT_DEFAULTS, **kw)
            out["kind"].append(kind)
            for name, value in defaults.items():
                out[name].append(value)

        # middlewares (M3) do NOT run here: they run pre-fetch in the
        # canonicalize stage (crawler.go:153-158 — a rejected request
        # never consumes a politeness token or a fetch)
        jar_col = cols.get("jar_cookies")
        set_cookie_col = cols.get("set_cookie")
        proxy_col = cols.get("proxy")
        final_url_col = cols.get("final_url")
        fetch_err_kind_col = cols.get("fetch_error_kind")
        fetch_err_col = cols.get("fetch_error")
        for i in range(n):
            req = _row_request(cols, i)
            # typed transport failure (request_error.go:6-14 +
            # crawler.go:134-135): the RequestError goes to the errors
            # channel and NO handlers run — no response ever existed
            # error rows carry the RAW request URL (req_url), matching
            # the simulator's _err(row.req.url) and the canonicalize
            # stage's own error rows — the canonical url and the raw
            # url differ for relative/re-encoded child requests
            err_url = cols.get("req_url", cols["url"])[i] or cols["url"][i]
            if fetch_err_kind_col and fetch_err_kind_col[i]:
                emit("error", url=err_url, method=req.get_method(),
                     depth=req.depth, seq_path=req.seq_path,
                     error_kind=fetch_err_kind_col[i],
                     error=fetch_err_col[i] if fetch_err_col else "")
                continue
            # M5: a proxied request runs on a fresh jar-less client
            # (crawler.go:174-177) — no jar cookies sent, no Set-Cookie
            # harvested (the fetch stage already blanks set_cookie)
            proxied = bool(proxy_col[i]) if proxy_col else False
            # ST1: effective Cookie header = explicit request cookies +
            # admission-stamped jar cookies for the host, observable to
            # handlers via resp.request.headers (crawler.go:87 jar +
            # request.go:69-73 AddCookie)
            req.headers = apply_cookie_header(
                req.headers,
                req.cookies,
                json.loads(jar_col[i])
                if jar_col and jar_col[i] and not proxied
                else None,
            )
            # F9 resolves links against the POST-redirect response URL
            # (response.go:46-48) — the fetch stage's final_url column;
            # absent (simulator-shaped batches) it equals the request URL
            resp_url = (
                final_url_col[i] if final_url_col and final_url_col[i]
                else cols["url"][i]
            )
            # jar harvest: the response's Set-Cookie payload, recorded
            # regardless of handler outcome (the reference's jar updates
            # inside the HTTP client, before handlers run); applied by
            # the engine at the round boundary in canonical order.
            # Attributed to the FINAL-hop URL: on a cross-host redirect
            # the cookie belongs to the host that actually set it
            # (Go's cookiejar keys by each hop's URL), not the request
            # host — the page-store path has final == requested.
            if set_cookie_col and set_cookie_col[i]:
                emit("cookie", url=resp_url,
                     fields=set_cookie_col[i],
                     depth=req.depth, seq_path=req.seq_path,
                     priority=req.priority)
            resp = ResponseView(
                req, resp_url, int(cols["status"][i]), cols["html"][i]
            )
            merged = HandlerResult()
            record_handlers: list[str] = []
            for hname, handler in self.registry.get_named_handlers(
                req.callbacks
            ):
                one = HandlerResult()
                try:
                    handler(resp, one)
                except Exception as exc:  # noqa: BLE001 - handler error path
                    # Schedule is an immediate side effect in the
                    # reference (crawler.go:265-267): outputs the
                    # failing handler issued BEFORE the raise persist
                    merged.records.extend(one.records)
                    record_handlers.extend([hname] * len(one.records))
                    merged.requests.extend(one.requests)
                    emit("error", url=err_url, method=req.get_method(),
                         depth=req.depth, seq_path=req.seq_path,
                         error_kind="handler", error=str(exc))
                    break
                merged.records.extend(one.records)
                record_handlers.extend([hname] * len(one.records))
                merged.requests.extend(one.requests)
            for record, hname in zip(merged.records, record_handlers):
                emit("record", url=cols["url"][i], handler=hname,
                     depth=req.depth, seq_path=req.seq_path,
                     fields=json.dumps(record, sort_keys=True))
            # earlier handlers' outputs survive a later handler's failure
            if req.depth + 1 > self.max_depth:
                continue
            for j, child in enumerate(merged.requests):
                emit(
                    "link",
                    url=child.url,
                    method=child.method,
                    referer=child.referer,
                    form=json.dumps(child.form, sort_keys=True) if child.form else "",
                    query=json.dumps(child.query, sort_keys=True) if child.query else "",
                    cookies=json.dumps(child.cookies, sort_keys=True) if child.cookies else "",
                    headers=json.dumps(child.headers, sort_keys=True) if child.headers else "",
                    raw=child.raw,
                    callbacks=list(child.callbacks),
                    depth=req.depth + 1,
                    seq_path=seq_child(req.seq_path, j),
                    priority=child.priority,
                    # the simulator honors child deadlines (expired →
                    # error row); dropping it here broke parity for
                    # handlers that schedule deadline-bearing children
                    deadline=child.deadline,
                    metadata=json.dumps(child.metadata, sort_keys=True) if child.metadata else "",
                )

        arrays = [
            pa.array(out[f.name], f.type) for f in UNION_SCHEMA
        ]
        return pa.Table.from_arrays(arrays, schema=UNION_SCHEMA)


def links_to_frontier(links: pa.Table) -> pa.Table:
    """Project union link rows onto the frontier schema (url_hash/host
    are recomputed by next round's canonicalize; the child deadline —
    when the scheduling handler set one — rides through so the round
    loop's deadline filter can expire it like the simulator does)."""
    import numpy as np

    from crawl_ray.schemas import FRONTIER_SCHEMA

    n = links.num_rows
    cols = []
    for fld in FRONTIER_SCHEMA:
        if fld.name == "url_hash":
            cols.append(pa.array(np.zeros(n, dtype=np.uint64), fld.type))
        elif fld.name in ("host", "req_url"):
            cols.append(pa.array([""] * n, fld.type))
        else:
            cols.append(links.column(fld.name).cast(fld.type))
    return pa.Table.from_arrays(cols, schema=FRONTIER_SCHEMA)
