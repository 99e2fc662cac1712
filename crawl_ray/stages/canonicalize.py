"""Canonicalize stage (M1/M2 kernels as a Ray Data batch transform).

Input: any batch carrying at least ``url``; missing frontier columns
are filled with defaults (so the seeds table flows in unchanged —
the ``crawl-schedule`` analog, ``nsq/crawl-schedule/main.go:98-104``).

Output: full frontier schema + ``order_key`` (binary, lexicographic =
canonical order) + ``path`` (url path, for robots) + ``disposition``
("ok" / "badurl" / "expired" / "middleware").

M1 is applied here — on EVERY request, like ``crawler.go:150-165``:
rows carrying ``form``/``query`` get the effective fetch key
(query re-encode, Form ⇒ POST) via :func:`effective_fetch_key`, so the
page-store lookup, the seen set and the politeness admission all key on
the request that would actually be sent.  Middlewares (M3,
``crawler.go:153-158``) also run here — PRE-fetch, so a rejected row
never consumes a politeness token or a fetch.

Vectorization: url hash is numpy FNV over the whole column; referer
resolution is per-row ``urljoin`` (pure-Python kernel, same cost class
as Go's ``url.Parse`` per request); the form/query M1 path and the
middleware chain run per row only for rows/registries that need them —
the flagship hot path (no form, no query, no middlewares) never pays.
"""

from __future__ import annotations

import json
import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from crawl_ray.request import HandlerRegistry, construct_request, effective_fetch_key
from crawl_ray.schemas import FRONTIER_SCHEMA
from crawl_ray.urlnorm import fnv1a64_batch

__all__ = ["canonicalize_batch", "encode_order_key", "order_key_batch"]

_DEFAULTS = {
    "req_url": "",
    "method": "",
    "referer": "",
    "form": "",
    "query": "",
    "cookies": "",
    "headers": "",
    "raw": False,
    "depth": 0,
    "priority": 0.0,
    "metadata": "",
}


def encode_order_key(priority: float, depth: int, seq_path: bytes) -> bytes:
    """Binary key whose ascending lexicographic order equals the
    canonical order (-priority, depth, seq_path) — scalar reference."""
    bits = struct.unpack(">I", struct.pack(">f", -float(priority)))[0]
    bits = (~bits) & 0xFFFFFFFF if bits & 0x80000000 else bits | 0x80000000
    return struct.pack(">I", bits) + struct.pack(">i", depth) + seq_path


def order_key_batch(priority: np.ndarray, depth: np.ndarray, seq_paths: list[bytes]) -> list[bytes]:
    neg = (-np.asarray(priority, dtype=np.float32)).view(np.uint32)
    signed = (neg & 0x80000000) != 0
    bits = np.where(signed, ~neg & 0xFFFFFFFF, neg | 0x80000000).astype(np.uint32)
    depth = np.asarray(depth, dtype=np.int32)
    pfx = bits.astype(">u4").tobytes()
    dfx = depth.astype(">i4").tobytes()
    return [
        pfx[4 * i : 4 * i + 4] + dfx[4 * i : 4 * i + 4] + seq_paths[i]
        for i in range(len(seq_paths))
    ]


def _ensure_columns(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    names = set(batch.column_names)
    for fld in FRONTIER_SCHEMA:
        if fld.name in names:
            continue
        if fld.name == "callbacks":
            col = pa.array([[]] * n, fld.type)
        elif fld.name == "seq_path":
            col = pa.array([b""] * n, fld.type)
        elif fld.name in ("url_hash",):
            col = pa.array(np.zeros(n, dtype=np.uint64), fld.type)
        elif fld.name == "deadline":
            col = pa.nulls(n, fld.type)
        elif fld.name in _DEFAULTS:
            col = pa.array([_DEFAULTS[fld.name]] * n).cast(fld.type)
        else:
            col = pa.array([""] * n, fld.type)
        batch = batch.append_column(fld.name, col)
    return batch


def _registry_for(spiders: list | None) -> HandlerRegistry | None:
    if not spiders:
        return None
    registry = HandlerRegistry()
    for spider in spiders:
        spider(registry)
    return registry if registry.middlewares else None


def canonicalize_batch(
    batch: pa.Table, *, now_us: int, spiders: list | None = None
) -> pa.Table:
    """Resolve + hash + order-key one frontier batch (M1/M2/M3)."""
    from urllib.parse import urljoin, urlsplit

    batch = _ensure_columns(batch)
    n = batch.num_rows
    urls = batch.column("url").to_pylist()
    # as-scheduled URL: preserved across spill/re-canonicalization so
    # error rows always report the raw request URL (simulator parity)
    prev_req = batch.column("req_url").to_pylist()
    req_urls = [prev_req[i] or (urls[i] or "") for i in range(n)]
    referers = batch.column("referer").to_pylist()
    forms = batch.column("form").to_pylist()
    queries = batch.column("query").to_pylist()
    methods = batch.column("method").to_pylist()
    registry = _registry_for(spiders)

    canon = [""] * n
    hosts = [""] * n
    paths = [""] * n
    disposition = ["ok"] * n
    eff_methods = list(methods)
    for i in range(n):
        u = urls[i] or ""
        ref = referers[i] or ""
        try:
            if forms[i] or queries[i]:
                # M1: effective fetch key (query re-encode, Form⇒POST)
                u, m = effective_fetch_key(
                    u, ref,
                    methods[i] or "",
                    json.loads(forms[i]) if forms[i] else None,
                    json.loads(queries[i]) if queries[i] else None,
                )
                eff_methods[i] = m
            else:
                if ref:
                    u = urljoin(ref, u)
                frag = u.find("#")
                if frag >= 0:
                    u = u[:frag]
            parts = urlsplit(u)
            if not parts.netloc:
                raise ValueError(f"no host in {u!r}")
            canon[i] = u
            hosts[i] = parts.netloc
            paths[i] = parts.path or "/"
        except ValueError as exc:
            disposition[i] = "badurl"
            canon[i] = u
            paths[i] = str(exc)

    hashes = fnv1a64_batch(canon)

    # deadline filter (nsq/nsqcrawl/queue.go:89-94: expired jobs dropped
    # at consume time; we surface them as error rows).  Runs BEFORE the
    # middleware chain: the reference drops expired jobs at consume
    # time, before Execute (where middlewares live).
    deadline = batch.column("deadline")
    if deadline.null_count < n:
        expired = pc.and_(
            pc.is_valid(deadline), pc.less(deadline.cast(pa.int64()), now_us)
        ).to_pylist()
        for i in range(n):
            if expired[i] and disposition[i] == "ok":
                disposition[i] = "expired"

    if registry is not None:
        # M3 pre-fetch middleware chain (crawler.go:153-158): first
        # error aborts the request before any politeness/fetch cost;
        # defaults merge after middlewares (crawler.go:160-165)
        from crawl_ray.request import merge_default_headers
        from crawl_ray.stages.extract import _row_request

        cols = {
            name: batch.column(name).to_pylist()
            for name in FRONTIER_SCHEMA.names
        }
        for i in range(n):
            if disposition[i] != "ok":
                continue
            req = _row_request(cols, i)
            req.method = eff_methods[i]  # Form⇒POST already applied
            effective = construct_request(req, default_headers={})
            try:
                for mw in registry.middlewares:
                    mw(req, effective)
                merge_default_headers(effective["headers"])
            except Exception as exc:  # noqa: BLE001 - middleware abort path
                disposition[i] = "middleware"
                paths[i] = str(exc)

    # error rows keep the ORIGINAL request url (matches the simulator,
    # which reports req.url in error records)
    for i in range(n):
        if disposition[i] != "ok":
            canon[i] = req_urls[i]

    order_keys = order_key_batch(
        batch.column("priority").to_numpy(zero_copy_only=False),
        batch.column("depth").to_numpy(zero_copy_only=False),
        batch.column("seq_path").to_pylist(),
    )

    batch = batch.set_column(
        batch.schema.get_field_index("url"), "url", pa.array(canon, pa.string())
    )
    batch = batch.set_column(
        batch.schema.get_field_index("req_url"), "req_url",
        pa.array(req_urls, pa.string()),
    )
    if eff_methods != methods:
        batch = batch.set_column(
            batch.schema.get_field_index("method"), "method",
            pa.array(eff_methods, pa.string()),
        )
    batch = batch.set_column(
        batch.schema.get_field_index("url_hash"), "url_hash", pa.array(hashes, pa.uint64())
    )
    batch = batch.set_column(
        batch.schema.get_field_index("host"), "host", pa.array(hosts, pa.string())
    )
    batch = batch.append_column("path", pa.array(paths, pa.string()))
    batch = batch.append_column("order_key", pa.array(order_keys, pa.binary()))
    batch = batch.append_column("disposition", pa.array(disposition, pa.string()))
    return batch
