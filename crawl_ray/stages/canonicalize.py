"""Canonicalize stage (M1/M2 kernels as a Ray Data batch transform).

Input: any batch carrying at least ``url``; missing frontier columns
are filled with defaults (so the seeds table flows in unchanged —
the ``crawl-schedule`` analog, ``nsq/crawl-schedule/main.go:98-104``).

Output: full frontier schema + ``order_key`` (binary, lexicographic =
canonical order) + ``path`` (url path+query, the RFC 9309 robots
match key) + ``disposition``
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
            # schema-promoted NULLS (a frontier dir mixing parts written
            # before/after a column existed — e.g. legacy seed parts
            # without `priority` next to new ones — unifies with nulls,
            # not defaults): coalesce EVERY column to its default —
            # a null seq_path would TypeError in order_key_batch and a
            # null callbacks would crash _row_request; `deadline` is
            # the one column where null is MEANINGFUL (no deadline)
            if fld.name != "deadline":
                col = batch.column(fld.name)
                if col.null_count:
                    if fld.name == "callbacks":
                        filled = pa.array(
                            [v if v is not None else []
                             for v in col.to_pylist()],
                            fld.type,
                        )
                    elif fld.name == "seq_path":
                        filled = col.fill_null(b"")
                    elif fld.name == "url_hash":
                        filled = col.fill_null(0)
                    elif fld.name in _DEFAULTS:
                        filled = col.fill_null(_DEFAULTS[fld.name])
                    else:
                        filled = col.fill_null("")
                    batch = batch.set_column(
                        batch.column_names.index(fld.name),
                        fld.name,
                        filled,
                    )
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
    from urllib.parse import urlsplit

    batch = _ensure_columns(batch)
    n = batch.num_rows
    registry = _registry_for(spiders)

    # Vectorized fast paths — per-row urllib calls were ~70% of this
    # kernel's time (21 µs/row).  Two exact-equivalence cases cover
    # essentially every link row:
    #   (a) absolute lowercase-scheme http(s) URL: ``urljoin(ref, u)
    #       == u`` for every parseable ref, and ``urlsplit`` reduces
    #       to one regex;
    #   (b) absolute-path reference ("/p/1") against a safe absolute
    #       referer: Python's urljoin is exactly prefix-concatenation
    #       when the path has no "."/".."  segments (empty segments
    #       are preserved, dots are the only rewriting).
    # Guards that keep dispositions bit-identical to the per-row path:
    # no fragment, no tab/CR/LF/"[" (urlsplit's strip/IPv6 cases), no
    # trailing bare "?" (urlunsplit drops it), no ";" (urljoin goes
    # through urlunparse, which drops a bare empty-params ";" from the
    # last path segment), no form/query (M1), and the referer — which
    # the old path parsed, ValueError → badurl — must itself be absent
    # or safely parseable.
    _SAFE_URL = r"^https?://(?P<netloc>[^/?#]+)(?P<path>[^?#]*)"
    _UNSAFE_CH = r"[\t\n\r\[#;]"
    u_col = batch.column("url")
    ref_col = batch.column("referer")

    def _absent(col):
        return pc.or_kleene(pc.is_null(col), pc.equal(col, ""))

    def _no(col, pattern):
        return pc.fill_null(
            pc.invert(pc.match_substring_regex(col, pattern)), False
        )

    extracted = pc.extract_regex(u_col, pattern=_SAFE_URL)
    u_clean = pc.and_(
        pc.and_(
            _no(u_col, _UNSAFE_CH),
            # userinfo URLs ("http://u:p@h/") take the slow path, where
            # the host strips the userinfo (url_host contract)
            _no(u_col, r"^https?://[^/?#]*@"),
        ),
        pc.fill_null(pc.invert(pc.ends_with(u_col, "?")), False),
    )
    no_req_mods = pc.and_(
        pc.fill_null(_absent(batch.column("form")), True),
        pc.fill_null(_absent(batch.column("query")), True),
    )
    # ONE regex pass over the referer column yields prefix, netloc and
    # the parseable mask (three separate kernels before — this is the
    # hot path); the prefix group matching ⟺ _SAFE_URL matching, since
    # _SAFE_URL's path group is [^?#]* (can match empty)
    ref_ex = pc.extract_regex(
        ref_col, pattern=r"^(?P<prefix>https?://(?P<netloc>[^/?#]+))"
    )
    ref_parseable = pc.and_(
        pc.and_(
            pc.fill_null(pc.is_valid(ref_ex), False),
            _no(ref_col, r"^https?://[^/?#]*@"),  # userinfo → slow path
        ),
        _no(ref_col, _UNSAFE_CH),
    )
    ref_safe = pc.or_(pc.fill_null(_absent(ref_col), True), ref_parseable)

    abs_mask = pc.and_(
        pc.and_(pc.is_valid(extracted), u_clean),
        pc.and_(ref_safe, no_req_mods),
    )
    # (b): "/..." but not "//...", no dot segments, referer parseable
    rel_shape = pc.and_(
        pc.fill_null(pc.starts_with(u_col, "/"), False),
        pc.fill_null(pc.invert(pc.starts_with(u_col, "//")), False),
    )
    no_dotseg = _no(u_col, r"(^|/)\.\.?(/|$)")
    rel_mask = pc.and_(
        pc.and_(rel_shape, pc.and_(u_clean, no_dotseg)),
        pc.and_(ref_parseable, no_req_mods),
    )
    ref_prefix = pc.struct_field(ref_ex, "prefix")
    ref_netloc = pc.struct_field(ref_ex, "netloc")
    u_pathpart = pc.struct_field(
        pc.extract_regex(u_col, pattern=r"^(?P<path>[^#]*)"), "path"
    )

    # as-scheduled URL: preserved across spill/re-canonicalization so
    # error rows always report the raw request URL (simulator parity)
    prev_req = batch.column("req_url")
    u_filled = pc.fill_null(u_col, "")
    req_col = pc.if_else(_absent(prev_req), u_filled, prev_req)

    # Columnar assembly: fast-path values are computed for the whole
    # batch, then the (rare) slow rows are patched in via
    # replace_with_mask — Python touches only the slow rows.
    abs_np = pc.fill_null(abs_mask, False).to_numpy(zero_copy_only=False)
    rel_np = pc.fill_null(rel_mask, False).to_numpy(zero_copy_only=False)
    canon_col = pc.if_else(
        abs_mask,
        u_filled,
        pc.binary_join_element_wise(
            pc.fill_null(ref_prefix, ""), u_filled, ""
        ),
    )
    host_col = pc.if_else(abs_mask, pc.struct_field(extracted, "netloc"), ref_netloc)
    # robots key = path INCLUDING the query string (RFC 9309 matches
    # the path-and-query; the simulator computes the same rule): after
    # the netloc, "" → "/", "?…" → "/?…", else the remainder up to the
    # fragment.  Fragments/";" rows are slow-path by the u_clean guard.
    abs_pq = pc.struct_field(
        pc.extract_regex(
            u_col, pattern=r"^https?://[^/?#]+(?P<pq>[^#]*)"
        ),
        "pq",
    )
    pq_fixed = pc.replace_substring_regex(
        pc.fill_null(abs_pq, ""), pattern=r"^\?", replacement="/?"
    )
    path_col = pc.if_else(
        abs_mask,
        pc.if_else(pc.equal(pq_fixed, ""), pa.scalar("/"), pq_fixed),
        u_pathpart,  # rel rows: starts with "/", never empty
    )
    disposition_col = pa.array(["ok"] * n, pa.string())
    method_col = batch.column("method")
    method_changed = False

    slow_idx = np.flatnonzero(~(abs_np | rel_np))
    if len(slow_idx):
        idx = pa.array(slow_idx, pa.int64())
        s_urls = u_col.take(idx).to_pylist()
        s_refs = ref_col.take(idx).to_pylist()
        s_forms = batch.column("form").take(idx).to_pylist()
        s_queries = batch.column("query").take(idx).to_pylist()
        s_methods = method_col.take(idx).to_pylist()
        s_canon = [""] * len(slow_idx)
        s_hosts = [""] * len(slow_idx)
        s_paths = [""] * len(slow_idx)
        s_disp = ["ok"] * len(slow_idx)
        s_eff = list(s_methods)
        for i in range(len(slow_idx)):
            u = s_urls[i] or ""
            ref = s_refs[i] or ""
            try:
                if s_forms[i] or s_queries[i]:
                    # M1: effective fetch key (query re-encode, Form⇒POST)
                    u, m = effective_fetch_key(
                        u, ref,
                        s_methods[i] or "",
                        json.loads(s_forms[i]) if s_forms[i] else None,
                        json.loads(s_queries[i]) if s_queries[i] else None,
                    )
                    s_eff[i] = m
                else:
                    from crawl_ray.urlnorm import canonicalize

                    u = canonicalize(u, ref)
                parts = urlsplit(u)
                host = parts.netloc.rpartition("@")[2]  # no userinfo
                if not host:  # covers netloc == "" AND bare-userinfo "@"
                    raise ValueError(f"no host in {u!r}")
                s_canon[i] = u
                s_hosts[i] = host
                s_paths[i] = (parts.path or "/") + (
                    f"?{parts.query}" if parts.query else ""
                )
            except ValueError as exc:
                s_disp[i] = "badurl"
                s_canon[i] = u
                s_paths[i] = str(exc)
        slow_mask = pa.array(~(abs_np | rel_np))
        canon_col = pc.replace_with_mask(
            canon_col, slow_mask, pa.array(s_canon, pa.string())
        )
        host_col = pc.replace_with_mask(
            host_col, slow_mask, pa.array(s_hosts, pa.string())
        )
        path_col = pc.replace_with_mask(
            path_col, slow_mask, pa.array(s_paths, pa.string())
        )
        disposition_col = pc.replace_with_mask(
            disposition_col, slow_mask, pa.array(s_disp, pa.string())
        )
        if s_eff != s_methods:
            method_changed = True
            method_col = pc.replace_with_mask(
                pc.fill_null(method_col, ""), slow_mask,
                pa.array(s_eff, pa.string()),
            )

    hashes = fnv1a64_batch(canon_col.to_pylist())

    # deadline filter (nsq/nsqcrawl/queue.go:89-94: expired jobs dropped
    # at consume time; we surface them as error rows).  Runs BEFORE the
    # middleware chain: the reference drops expired jobs at consume
    # time, before Execute (where middlewares live).
    deadline = batch.column("deadline")
    if deadline.null_count < n:
        expired = pc.and_(
            pc.is_valid(deadline), pc.less(deadline.cast(pa.int64()), now_us)
        )
        hit = pc.and_(
            pc.fill_null(expired, False), pc.equal(disposition_col, "ok")
        )
        disposition_col = pc.if_else(hit, "expired", disposition_col)
        # the path column doubles as the error MESSAGE downstream
        # (engine copies it into ERRORS_SCHEMA.error): expired rows
        # must read "deadline expired" like the simulator, not the
        # URL path
        path_col = pc.if_else(hit, "deadline expired", path_col)

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
        disposition = disposition_col.to_pylist()
        paths = path_col.to_pylist()
        eff_methods = pc.fill_null(method_col, "").to_pylist()
        for i in range(n):
            if disposition[i] != "ok":
                continue
            try:
                req = _row_request(cols, i)
                req.method = eff_methods[i]  # Form⇒POST already applied
                effective = construct_request(req, default_headers={})
            except ValueError as exc:
                # malformed JSON in cookies/headers/metadata: a per-row
                # input error, not a batch-killing crash (form/query
                # JSON errors already route per-row in the slow path)
                disposition[i] = "badurl"
                paths[i] = str(exc)
                continue
            try:
                for mw in registry.middlewares:
                    mw(req, effective)
                merge_default_headers(effective["headers"])
            except Exception as exc:  # noqa: BLE001 - middleware abort path
                disposition[i] = "middleware"
                paths[i] = str(exc)
        disposition_col = pa.array(disposition, pa.string())
        path_col = pa.array(paths, pa.string())

    # error rows keep the ORIGINAL request url (matches the simulator,
    # which reports req.url in error records)
    err = pc.invert(pc.equal(disposition_col, "ok"))
    canon_col = pc.if_else(err, req_col, canon_col)

    order_keys = order_key_batch(
        batch.column("priority").to_numpy(zero_copy_only=False),
        batch.column("depth").to_numpy(zero_copy_only=False),
        batch.column("seq_path").to_pylist(),
    )

    batch = batch.set_column(
        batch.schema.get_field_index("url"), "url", canon_col
    )
    batch = batch.set_column(
        batch.schema.get_field_index("req_url"), "req_url", req_col
    )
    if method_changed:
        batch = batch.set_column(
            batch.schema.get_field_index("method"), "method", method_col
        )
    batch = batch.set_column(
        batch.schema.get_field_index("url_hash"), "url_hash", pa.array(hashes, pa.uint64())
    )
    batch = batch.set_column(
        batch.schema.get_field_index("host"), "host",
        pc.fill_null(host_col, ""),
    )
    batch = batch.append_column("path", pc.fill_null(path_col, ""))
    batch = batch.append_column("order_key", pa.array(order_keys, pa.binary()))
    batch = batch.append_column("disposition", disposition_col)
    return batch
