"""Page store — the fetch side of the engine (SURVEY.md §2.5 J1).

The reference fetches over live HTTP (``crawler.go:180``); per
BASELINE.json ``input_hint`` our web is a Parquet table of
Common-Crawl-style pages, so fetch = join frontier against pages on
``url``.  Two physical strategies:

* :class:`BroadcastPageStore` — the whole (url_hash-sorted) page table
  is ``ray.put`` once and shared zero-copy by every fetch task.  Right
  when the page corpus fits the object store (tests, small scale).
* :class:`BucketedPageStore` — pages pre-partitioned on disk into
  ``bucket=fnv1a64(url) % B`` directories (:func:`bucket_pages` writes
  the layout).  A fetch task sorts its batch by bucket and reads only
  the matching bucket files (column-pruned, lazily cached per worker) —
  the partition-local hash join that scales to 100 TB: no shuffle of
  the big side, frontier repartitioned by the same bucket key.

Both expose ``lookup(urls) -> (status: int32 ndarray, html: list[bytes],
set_cookie: list[str])`` with missing URLs → (404, b"", "") — the error
path rows.  ``set_cookie`` is the page's response-cookie payload (JSON
dict name→value, "" = none) feeding the client cookie jar (ST1,
``crawler.go:87``); corpora without the column behave as all-"".
"""

from __future__ import annotations

import pathlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from crawl_ray.urlnorm import fnv1a64_batch

__all__ = ["BroadcastPageStore", "BucketedPageStore", "bucket_pages", "build_broadcast_index"]


def _with_set_cookie(pages: pa.Table) -> pa.Table:
    """Normalize the optional ``set_cookie`` column ("" when absent)."""
    if "set_cookie" not in pages.column_names:
        pages = pages.append_column(
            "set_cookie", pa.array([""] * pages.num_rows, pa.string())
        )
    return pages


def fetch_read_columns(schema_names) -> list[str]:
    """The read-time column prune matching :func:`prepare_fetch_columns`
    (pass ``pq.read_schema(path).names``): only fetch-side columns
    leave storage."""
    return ["url", "html"] + (
        ["set_cookie"] if "set_cookie" in schema_names else []
    )


def prepare_fetch_columns(pages: pa.Table) -> tuple[pa.Table, np.ndarray]:
    """The ONE store-prep sequence every page-store flavor shares:
    prune to the fetch-side columns (url, html, optional set_cookie —
    SURVEY 'prune at the read'), normalize set_cookie, attach
    ``url_hash``.  Returns ``(table, hashes)``.  Adding a fetch-side
    column (e.g. a status payload) is a one-place change instead of a
    silent per-flavor drift."""
    names = ["url", "html"] + (
        ["set_cookie"] if "set_cookie" in pages.column_names else []
    )
    pages = _with_set_cookie(pages.select(names))
    hashes = fnv1a64_batch(pages.column("url"))
    pages = pages.append_column("url_hash", pa.array(hashes, pa.uint64()))
    return pages, hashes


def build_broadcast_index(pages: pa.Table) -> pa.Table:
    """Sort pages by url_hash for binary-search lookup; keeps only the
    columns fetch needs (prune at the source — SURVEY guidance)."""
    pages, _ = prepare_fetch_columns(pages)
    return pages.sort_by("url_hash").combine_chunks()


def _resolve_sorted(
    bhashes: np.ndarray,
    burls,
    bhtml,
    bcookies,
    urls: list[str],
    hashes: np.ndarray,
    rows: np.ndarray,
    status: np.ndarray,
    htmls: list,
    set_cookies: list,
) -> None:
    """Resolve query rows against one url_hash-sorted store slice.

    Vectorized hot path: one ``searchsorted``, one bulk ``take`` of the
    candidate urls, one vectorized equality, one bulk ``take`` of the
    matched html payloads.  The per-row probe walk survives only for
    hash-collision runs (equal hash, different url) — essentially never.
    """
    n_store = len(bhashes)
    if n_store == 0 or len(rows) == 0:
        return
    qh = hashes[rows]
    pos = np.searchsorted(bhashes, qh)
    cand = np.flatnonzero((pos < n_store) & (bhashes[np.minimum(pos, n_store - 1)] == qh))
    if not len(cand):
        return
    cand_pos = pos[cand]
    cand_rows = rows[cand]
    sel_urls = burls.take(pa.array(cand_pos, pa.int64()))
    q_urls = pa.array([urls[i] for i in cand_rows.tolist()], pa.string())
    eq = pc.equal(sel_urls, q_urls).to_numpy(zero_copy_only=False)
    hit_rows = cand_rows[eq]
    if len(hit_rows):
        hit_pos = pa.array(cand_pos[eq], pa.int64())
        payloads = bhtml.take(hit_pos).to_pylist()
        cookies = bcookies.take(hit_pos).to_pylist()
        status[hit_rows] = 200
        for i, payload, ck in zip(hit_rows.tolist(), payloads, cookies):
            htmls[i] = payload
            set_cookies[i] = ck or ""
    # collision fallback: walk the equal-hash run row by row
    for k in np.flatnonzero(~eq).tolist():
        i = int(cand_rows[k])
        p = int(cand_pos[k]) + 1
        h = hashes[i]
        while p < n_store and bhashes[p] == h:
            if burls[p].as_py() == urls[i]:
                status[i] = 200
                htmls[i] = bhtml[p].as_py()
                set_cookies[i] = bcookies[p].as_py() or ""
                break
            p += 1


class BroadcastPageStore:
    """Zero-copy shared page index (small/mid corpora)."""

    def __init__(self, index: pa.Table) -> None:
        index = _with_set_cookie(index)
        self._index = index
        self._hashes = index.column("url_hash").to_numpy(zero_copy_only=False)
        self._urls = index.column("url")
        self._html = index.column("html")
        self._cookies = index.column("set_cookie")

    def lookup(
        self, urls: list[str]
    ) -> tuple[np.ndarray, list[bytes], list[str]]:
        n = len(urls)
        hashes = fnv1a64_batch(urls)
        status = np.full(n, 404, dtype=np.int32)
        htmls: list[bytes] = [b""] * n
        set_cookies: list[str] = [""] * n
        _resolve_sorted(
            self._hashes, self._urls, self._html, self._cookies,
            urls, hashes, np.arange(n), status, htmls, set_cookies,
        )
        return status, htmls, set_cookies


def bucket_pages(pages_parquet: str, dst_dir: str, n_buckets: int = 64) -> str:
    """Write the bucketed page-store layout:
    ``dst/bucket=K/part.parquet`` with rows where
    ``fnv1a64(url) % n_buckets == K``, each bucket sorted by url_hash.

    At 100 TB this runs once as its own Ray Data job (read → add bucket
    column → write with partition_cols); here a direct pyarrow pass is
    enough for the fixture corpora."""
    import os
    import shutil

    dst = pathlib.Path(dst_dir)
    done = dst / "_SUCCESS"
    if done.exists() and int((dst / "_META").read_text()) == n_buckets:
        return str(dst)
    # honor the REQUESTED bucket count: a finished layout built with a
    # different n_buckets must be rebuilt — but into a temp sibling,
    # swapped in only when complete, so a crash mid-rebuild leaves the
    # old layout intact and live BucketedPageStore readers keep serving
    # the old files (their caches hold open tables) until the swap
    tmp = dst.parent / f".{dst.name}.rebuild-{os.getpid()}"
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    cols = fetch_read_columns(pq.read_schema(pages_parquet).names)
    table, hashes = prepare_fetch_columns(
        pq.read_table(pages_parquet, columns=cols)
    )
    buckets = hashes % np.uint64(n_buckets)
    for b in range(n_buckets):
        part = table.filter(pa.array(buckets == b)).sort_by("url_hash")
        bdir = tmp / f"bucket={b}"
        bdir.mkdir(exist_ok=True)
        pq.write_table(part, bdir / "part.parquet")
    (tmp / "_META").write_text(str(n_buckets))
    (tmp / "_SUCCESS").touch()
    if dst.exists():
        old = dst.parent / f".{dst.name}.old-{os.getpid()}"
        os.rename(dst, old)
        os.rename(tmp, dst)  # sub-ms non-atomic window; build is done
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.rename(tmp, dst)
    return str(dst)


class BucketedPageStore:
    """Partition-local lookup against the bucketed layout.

    Per-worker LRU of open bucket tables; a batch is grouped by bucket
    so each needed bucket file is read (column-pruned) once."""

    def __init__(self, root: str, cache_buckets: int = 8) -> None:
        self.root = pathlib.Path(root)
        self.n_buckets = int((self.root / "_META").read_text())
        self._cache: dict[int, tuple[np.ndarray, pa.Table]] = {}
        self._cache_cap = max(1, int(cache_buckets))  # 0 would crash eviction

    def _bucket_table(self, b: int) -> tuple[np.ndarray, pa.Table]:
        hit = self._cache.pop(b, None)
        if hit is not None:
            self._cache[b] = hit  # re-insert = move to MRU end (dicts
            # preserve insertion order, so eviction pops true LRU)
            return hit
        table = _with_set_cookie(
            pq.read_table(self.root / f"bucket={b}" / "part.parquet")
        )
        entry = (table.column("url_hash").to_numpy(zero_copy_only=False), table)
        if len(self._cache) >= self._cache_cap:
            self._cache.pop(next(iter(self._cache)))
        self._cache[b] = entry
        return entry

    def lookup(
        self, urls: list[str]
    ) -> tuple[np.ndarray, list[bytes], list[str]]:
        n = len(urls)
        hashes = fnv1a64_batch(urls)
        buckets = (hashes % np.uint64(self.n_buckets)).astype(np.int64)
        status = np.full(n, 404, dtype=np.int32)
        htmls: list[bytes] = [b""] * n
        set_cookies: list[str] = [""] * n
        for b in np.unique(buckets).tolist():
            bhashes, btable = self._bucket_table(int(b))
            rows = np.flatnonzero(buckets == b)
            _resolve_sorted(
                bhashes, btable.column("url"), btable.column("html"),
                btable.column("set_cookie"),
                urls, hashes, rows, status, htmls, set_cookies,
            )
        return status, htmls, set_cookies
