"""Canonicalize stage (M1/M2 kernels as a Ray Data batch transform).

Input: any batch carrying at least ``url``; missing frontier columns
are filled with defaults (so the seeds table flows in unchanged —
the ``crawl-schedule`` analog, ``nsq/crawl-schedule/main.go:98-104``).

Output: full frontier schema + ``order_key`` (binary, lexicographic =
canonical order) + ``path`` (url path, for robots) + ``disposition``
("ok" / "badurl" / "expired").

Vectorization: url hash is numpy FNV over the whole column; referer
resolution is per-row ``urljoin`` (pure-Python kernel, same cost class
as Go's ``url.Parse`` per request — and only runs on rows that carry a
referer).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from crawl_ray.schemas import FRONTIER_SCHEMA
from crawl_ray.urlnorm import fnv1a64_batch

__all__ = ["canonicalize_batch", "encode_order_key", "order_key_batch"]

_DEFAULTS = {
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


def canonicalize_batch(batch: pa.Table, *, now_us: int) -> pa.Table:
    """Resolve + hash + order-key one frontier batch."""
    from urllib.parse import urljoin, urlsplit

    batch = _ensure_columns(batch)
    n = batch.num_rows
    urls = batch.column("url").to_pylist()
    referers = batch.column("referer").to_pylist()

    canon = [""] * n
    hosts = [""] * n
    paths = [""] * n
    disposition = ["ok"] * n
    for i in range(n):
        u = urls[i] or ""
        ref = referers[i] or ""
        try:
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
    # at consume time; we surface them as error rows)
    deadline = batch.column("deadline")
    if deadline.null_count < n:
        expired = pc.and_(
            pc.is_valid(deadline), pc.less(deadline.cast(pa.int64()), now_us)
        ).to_pylist()
        for i in range(n):
            if expired[i] and disposition[i] == "ok":
                disposition[i] = "expired"

    # error rows keep the ORIGINAL request url (matches the simulator,
    # which reports req.url in error records)
    for i in range(n):
        if disposition[i] != "ok":
            canon[i] = urls[i] or ""

    order_keys = order_key_batch(
        batch.column("priority").to_numpy(zero_copy_only=False),
        batch.column("depth").to_numpy(zero_copy_only=False),
        batch.column("seq_path").to_pylist(),
    )

    batch = batch.set_column(
        batch.schema.get_field_index("url"), "url", pa.array(canon, pa.string())
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
