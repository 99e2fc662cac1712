"""URL resolution, canonicalization and hashing.

* :func:`resolve_url` replicates ``Request.ParseURL``
  (``/root/reference/request.go:104-117``): a request URL is resolved
  against its ``Referer`` via RFC 3986 reference resolution (Go
  ``net/url.ResolveReference`` ≈ Python ``urllib.parse.urljoin`` for the
  fixture corpus; divergent corner cases are excluded from fixtures and
  locked by tests).
* :func:`url_host` extracts the politeness / partition key.
* :func:`fnv1a64` / :func:`fnv1a64_batch` is the deterministic 64-bit
  URL hash (``url_hash``) used for dedup and partitioning — FNV-1a,
  implemented both scalar (reference/tests) and numpy-vectorized
  (hot path; processes a whole Arrow string column without a Python
  per-row loop).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from urllib.parse import urljoin, urlsplit

__all__ = [
    "resolve_url", "url_host", "fnv1a64", "fnv1a64_batch",
    "content_hash64_batch", "content_hash128_batch", "canonicalize",
]

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = (1 << 64) - 1


def resolve_url(url: str, referer: str = "") -> str:
    """``Request.ParseURL`` semantics (``request.go:104-117``): when a
    referer is set, resolve ``url`` against it; otherwise return ``url``
    as-is.  Unparsable input raises ``ValueError``."""
    if referer:
        return urljoin(referer, url)
    return url


def url_host(url: str) -> str:
    """host[:port] — the politeness / partition key.  Userinfo is
    STRIPPED (Go's ``u.Host`` excludes it): ``http://a@h/`` and
    ``http://b@h/`` hit the same server, so they must share one token
    bucket / robots entry / admission shard."""
    try:
        return urlsplit(url).netloc.rpartition("@")[2]
    except ValueError:
        return ""


def canonicalize(url: str, referer: str = "") -> str:
    """Canonical absolute URL: referer-resolved, fragment dropped.

    Fragments never reach the server, so two URLs differing only in
    fragment are the same fetch — the seen-set must treat them equal.
    """
    u = resolve_url(url, referer)
    frag = u.find("#")
    if frag >= 0:
        u = u[:frag]
    return u


def fnv1a64(data: str | bytes) -> int:
    """Scalar FNV-1a 64-bit (reference implementation for tests)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    h = _FNV_OFFSET
    for byte in data:
        h = ((h ^ byte) * _FNV_PRIME) & _MASK64
    return h


def content_hash64_batch(strings) -> np.ndarray:
    """64-bit content hash for LONG text (document bodies).

    One C-speed ``blake2b`` digest per row — ``hashlib`` does the whole
    string in one C call, so cost is O(total bytes), unlike the padded
    byte-matrix FNV below whose work is rows × longest-string (a single
    100 KB document in a batch would force 100k vector passes over
    every row).  Keep :func:`fnv1a64_batch` for short keys (URLs,
    tokens), use this for document-scale payloads.
    """
    import hashlib

    if isinstance(strings, (pa.Array, pa.ChunkedArray)):
        strings = strings.to_pylist()
    out = np.empty(len(strings), dtype=np.uint64)
    b2b = hashlib.blake2b
    for i, s in enumerate(strings):
        data = s.encode("utf-8") if isinstance(s, str) else (s or b"")
        out[i] = int.from_bytes(
            b2b(data, digest_size=8).digest(), "little"
        )
    return out


def content_hash128_batch(strings) -> tuple[np.ndarray, np.ndarray]:
    """128-bit content hash as two uint64 words (lo, hi) — one
    ``blake2b(digest_size=16)`` C call per row, same O(total bytes)
    cost as :func:`content_hash64_batch`.  The lo word serves as the
    shuffle/group key; the hi word confirms merges, dropping the
    collision probability from the 64-bit birthday regime (~3 expected
    silent merges at 10^10 docs) to a blake2b-128 collision —
    cryptographically negligible."""
    import hashlib

    if isinstance(strings, (pa.Array, pa.ChunkedArray)):
        strings = strings.to_pylist()
    lo = np.empty(len(strings), dtype=np.uint64)
    hi = np.empty(len(strings), dtype=np.uint64)
    b2b = hashlib.blake2b
    for i, s in enumerate(strings):
        data = s.encode("utf-8") if isinstance(s, str) else (s or b"")
        d = b2b(data, digest_size=16).digest()
        lo[i] = int.from_bytes(d[:8], "little")
        hi[i] = int.from_bytes(d[8:], "little")
    return lo, hi


def fnv1a64_batch(strings) -> np.ndarray:
    """Vectorized FNV-1a 64 over a sequence / Arrow array of strings.

    Works column-wise over a padded byte matrix: iteration count equals
    the longest string in the batch, each step a fused numpy op over all
    rows — no Python per-row loop.  Returns ``uint64`` array; null/empty
    inputs hash as the empty string.  For long strings (documents) use
    :func:`content_hash64_batch` instead.
    """
    if isinstance(strings, (pa.Array, pa.ChunkedArray)):
        strings = strings.to_pylist()
    n = len(strings)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    encoded = [(s or "").encode("utf-8") for s in strings]
    lengths = np.fromiter((len(b) for b in encoded), dtype=np.int64, count=n)
    max_len = int(lengths.max()) if n else 0
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if max_len == 0:
        return h
    # padded byte matrix (n x max_len)
    buf = np.zeros((n, max_len), dtype=np.uint8)
    for i, b in enumerate(encoded):
        if b:
            buf[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    prime = np.uint64(_FNV_PRIME)
    with np.errstate(over="ignore"):
        for j in range(max_len):
            active = lengths > j
            col = buf[:, j].astype(np.uint64)
            nh = (h ^ col) * prime
            h = np.where(active, nh, h)
    return h
