"""Pluggable fetch stage (J1/S3) + proxy selection semantics (M5).

The fetch stage is a callable with ONE batch contract:

    frontier columns in  →  same columns +
        status int32, html binary, set_cookie string, proxy string

Two implementations:

* :class:`PageStoreFetchStage` — the default: frontier ⋈ page-store
  lookup (the live-HTTP analog over the BASELINE.json ``input_hint``
  Parquet web; ``crawler.go:180-189``).
* :class:`HttpFetchStage` — live HTTP over the same contract
  (``crawler.go:284-296`` connection pooling becomes a per-worker
  opener).  The transport is injectable so the stage is fully testable
  offline; this sandbox has no network, so the default transport is
  only constructed on first use.

Proxy semantics (``proxy.go:11-27`` + ``crawler.go:167-178``): a
request whose metadata carries the ``crawl_proxy`` key fetches through
ONE proxy picked from the list — the reference picks uniformly at
random (``crawler.go:208``); here the pick is a seeded deterministic
hash of the url so reruns and the simulator agree.  A proxied request
uses a FRESH client with NO cookie jar (``crawler.go:174-177`` builds
an ``http.Client`` without the jar): the jar's cookies are not sent
and its Set-Cookie payload is not harvested.  The picked proxy is
recorded in the ``proxy`` output column (and from there in the trace).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from crawl_ray.state.seen import _splitmix64
from crawl_ray.urlnorm import fnv1a64

__all__ = [
    "PROXY_METADATA_KEY",
    "with_proxy",
    "proxy_from_metadata",
    "pick_proxy",
    "pick_proxy_batch",
    "make_fetch_stage",
    "PageStoreFetchStage",
    "HttpFetchStage",
]

PROXY_METADATA_KEY = "crawl_proxy"  # proxy.go:8
_PROXY_SALT = np.uint64(fnv1a64(PROXY_METADATA_KEY))


def with_proxy(metadata: dict[str, str] | None, *addrs: str) -> dict[str, str]:
    """Request-metadata analog of ``WithProxy`` (proxy.go:11-18):
    appends proxy addresses to the ``crawl_proxy`` key (comma-joined —
    metadata is a string map here)."""
    md = dict(metadata or {})
    existing = [a for a in md.get(PROXY_METADATA_KEY, "").split(",") if a]
    md[PROXY_METADATA_KEY] = ",".join(existing + list(addrs))
    return md


def proxy_from_metadata(
    metadata: dict[str, str] | None,
) -> tuple[list[str], bool]:
    """``ProxyFromContext`` analog (proxy.go:20-27): the proxy list and
    whether the key is present."""
    if not metadata or PROXY_METADATA_KEY not in metadata:
        return [], False
    return [a for a in metadata[PROXY_METADATA_KEY].split(",") if a], True


def pick_proxy(url_hash: int, addrs: list[str]) -> str:
    """Deterministic stand-in for the reference's uniform pick
    (``crawler.go:208`` ``rand.Intn``): seeded by the url hash so the
    engine, the simulator and any rerun agree on the choice."""
    if not addrs:
        return ""
    h = _splitmix64(np.uint64(url_hash) ^ _PROXY_SALT)
    return addrs[int(h % np.uint64(len(addrs)))]


def pick_proxy_batch(url_hashes: np.ndarray, metadata_col) -> list[str]:
    """Vectorized-ish batch pick: rows without the metadata key cost a
    dict lookup only; JSON decode + hash happen per proxied row (rare
    in practice — proxy routing is opt-in per request)."""
    out = [""] * len(url_hashes)
    for i, md_json in enumerate(metadata_col):
        if not md_json or PROXY_METADATA_KEY not in md_json:
            continue
        addrs, ok = proxy_from_metadata(json.loads(md_json))
        if ok and addrs:
            out[i] = pick_proxy(int(url_hashes[i]), addrs)
    return out


def _append_fetch_columns(
    batch: pa.Table,
    status: np.ndarray,
    htmls: list[bytes],
    set_cookies: list[str],
    proxies: list[str],
    final_urls: list[str] | None = None,
    error_kinds: list[str] | None = None,
    errors: list[str] | None = None,
) -> pa.Table:
    """Fetch-column contract: status int32, html binary, set_cookie
    string, proxy string, final_url string (the POST-redirect response
    URL — ``response.go:46-48``: link resolution runs against it),
    fetch_error_kind / fetch_error strings (typed transport failures,
    the ``RequestError`` channel analog — ``request_error.go:6-14``;
    empty = the fetch produced a response)."""
    n = batch.num_rows
    # proxied requests use a jar-less client (crawler.go:174-177): the
    # response's Set-Cookie is not stored
    set_cookies = [
        "" if p else sc for sc, p in zip(set_cookies, proxies)
    ]
    if final_urls is None:  # no-redirect transports: final == requested
        final_urls = batch.column("url").to_pylist()
    batch = batch.append_column("status", pa.array(status, pa.int32()))
    batch = batch.append_column("html", pa.array(htmls, pa.binary()))
    batch = batch.append_column("set_cookie", pa.array(set_cookies, pa.string()))
    batch = batch.append_column("proxy", pa.array(proxies, pa.string()))
    batch = batch.append_column("final_url", pa.array(final_urls, pa.string()))
    batch = batch.append_column(
        "fetch_error_kind",
        pa.array(error_kinds if error_kinds is not None else [""] * n,
                 pa.string()),
    )
    return batch.append_column(
        "fetch_error",
        pa.array(errors if errors is not None else [""] * n, pa.string()),
    )


class PageStoreFetchStage:
    """Fetch = page-store lookup per batch; missing URL → 404 + empty
    body.  ``store`` may be a plain handle or a ``ray.ObjectRef``
    (broadcast join) — deref'd lazily inside the worker."""

    def __init__(self, store) -> None:
        self._store = store

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if isinstance(self._store, ray.ObjectRef):
            self._store = ray.get(self._store)
        urls = batch.column("url").to_pylist()
        status, htmls, set_cookies = self._store.lookup(urls)
        proxies = pick_proxy_batch(
            batch.column("url_hash").to_numpy(zero_copy_only=False),
            batch.column("metadata").to_pylist(),
        )
        return _append_fetch_columns(batch, status, htmls, set_cookies, proxies)


class HttpFetchStage:
    """Live-HTTP fetch over the same batch contract.

    * per-worker opener reused across batches (the reference's pooled
      ``http.Client``, crawler.go:284-296; stdlib urllib keeps
      keep-alive per opener) — state in ``__init__``, work per batch;
    * proxied rows go through a FRESH jar-less opener for the picked
      proxy (crawler.go:167-178);
    * ``transport`` is injectable.  Full signature:
      ``fn(url, headers, proxy, timeout, method, body) -> (status:int,
      body:bytes, set_cookie_json:str, final_url:str, error_kind:str,
      error:str)`` — tests run a deterministic fake; the default
      urllib transport is built lazily (this sandbox has no network).
      A legacy 4-param transport ``fn(url, headers, proxy, timeout)``
      returning the 3-tuple ``(status, body, set_cookie_json)`` is
      still accepted for GET-only crawls; a Form⇒POST row routed to
      one yields a typed ``"transport"`` error row (the body cannot
      be delivered), never a silent body-less GET.
    * transport failures are TYPED, not collapsed to a fake 404
      (``request_error.go:6-14``): ``fetch_error_kind`` ∈ {"timeout",
      "dns", "connection", "transport"} with the message in
      ``fetch_error``; an HTTP error STATUS (4xx/5xx) is a real
      response, not an error — exactly the reference's ``http.Client``
      contract (crawler.go:180-182 only errors on transport failure).
    * ``final_url`` records the post-redirect response URL
      (``response.go:46-48``) so F9 link resolution matches a live
      redirecting web.
    """

    def __init__(self, timeout_s: float = 30.0, transport=None) -> None:
        # 30 s: the reference consumer's default request timeout
        # (nsq/consumer/app.go:58-63)
        self.timeout_s = timeout_s
        self._transport = transport

    # -- default transport (lazy; real network path) ------------------
    def _default_transport(self, url, headers, proxy, timeout,
                           method="GET", body=b""):
        import socket
        import urllib.error
        import urllib.request

        if proxy:
            opener = urllib.request.build_opener(
                urllib.request.ProxyHandler({"http": proxy, "https": proxy})
            )  # fresh, jar-less (crawler.go:174-177)
        else:
            opener = getattr(self, "_opener", None)
            if opener is None:
                opener = self._opener = urllib.request.build_opener()
        # method + form body come from the M1-constructed request —
        # Form ⇒ POST must reach the live server as a POST with the
        # urlencoded body, not a bare GET
        req = urllib.request.Request(
            url, data=body or None, headers=dict(headers or {}),
            method=method or "GET",
        )
        try:
            with opener.open(req, timeout=timeout) as resp:
                body_out = resp.read()
                # get_all: EVERY Set-Cookie header, each first
                # name=value pair — a single .get() dropped all but the
                # first cookie of multi-cookie responses
                pairs: dict[str, str] = {}
                for sc in resp.headers.get_all("Set-Cookie") or []:
                    first = sc.split(";", 1)[0]
                    if "=" in first:
                        k, v = first.split("=", 1)
                        pairs[k.strip()] = v
                set_cookie = json.dumps(pairs) if pairs else ""
                # geturl() is the POST-redirect URL (response.go:46-48)
                return (int(resp.status), body_out, set_cookie,
                        resp.geturl(), "", "")
        except urllib.error.HTTPError as e:
            # a status-coded response IS a response (crawler.go:180-182
            # errors only on transport failure) — body may carry an
            # error page; redirects to it are still reflected
            try:
                body = e.read()
            except Exception:
                body = b""
            return int(e.code), body, "", e.geturl() or url, "", ""
        except (socket.timeout, TimeoutError) as e:
            return 0, b"", "", url, "timeout", str(e) or "timed out"
        except urllib.error.URLError as e:
            reason = getattr(e, "reason", e)
            if isinstance(reason, (socket.timeout, TimeoutError)):
                kind = "timeout"
            elif isinstance(reason, socket.gaierror):
                kind = "dns"
            else:
                kind = "connection"
            return 0, b"", "", url, kind, str(reason)
        except OSError as e:
            return 0, b"", "", url, "connection", str(e)
        except Exception as e:  # noqa: BLE001 - typed error channel
            return 0, b"", "", url, "transport", str(e)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import inspect

        from crawl_ray.request import apply_cookie_header, encode_values

        transport = self._transport or self._default_transport
        try:
            # the default transport has 6 params, so arity alone
            # classifies it correctly; injected 4-param transports
            # take the legacy GET-only path below
            legacy4 = len(inspect.signature(transport).parameters) <= 4
        except (TypeError, ValueError):
            legacy4 = False
        names = set(batch.column_names)

        def _col(name):
            return (
                batch.column(name).to_pylist() if name in names else None
            )

        urls = batch.column("url").to_pylist()
        headers_col = _col("headers")
        methods = _col("method")
        forms = _col("form")
        cookies_col = _col("cookies")
        jar_col = _col("jar_cookies")
        proxies = pick_proxy_batch(
            batch.column("url_hash").to_numpy(zero_copy_only=False),
            batch.column("metadata").to_pylist(),
        )
        status = np.full(len(urls), 404, dtype=np.int32)
        htmls: list[bytes] = [b""] * len(urls)
        set_cookies: list[str] = [""] * len(urls)
        final_urls: list[str] = list(urls)
        err_kinds: list[str] = [""] * len(urls)
        errs: list[str] = [""] * len(urls)
        for i, url in enumerate(urls):
            hdrs = (
                json.loads(headers_col[i])
                if headers_col and headers_col[i] else {}
            )
            # ST1 on the wire: explicit request cookies + admission-
            # stamped jar cookies (jar-less when proxied) — the same
            # merge ExtractActor surfaces to handlers afterwards
            req_cookies = (
                json.loads(cookies_col[i])
                if cookies_col and cookies_col[i] else {}
            )
            jar = (
                json.loads(jar_col[i])
                if jar_col and jar_col[i] and not proxies[i] else None
            )
            hdrs = apply_cookie_header(hdrs, req_cookies, jar)
            # M1 on the wire: effective method + urlencoded form body
            # (canonicalize already folded the query re-encode and the
            # Form⇒POST default into the url/method columns)
            method = (methods[i] or "GET") if methods else "GET"
            body = b""
            if forms and forms[i]:
                body = encode_values(json.loads(forms[i])).encode()
                hdrs.setdefault(
                    "Content-Type", "application/x-www-form-urlencoded"
                )
            if legacy4:
                if method != "GET" or body:
                    # a 4-param transport cannot carry method/body —
                    # surface a typed error row instead of silently
                    # degrading the POST to a body-less GET
                    status[i] = 0
                    err_kinds[i] = "transport"
                    errs[i] = (
                        f"legacy 4-param transport cannot send "
                        f"{method} with a body: {url}"
                    )
                    continue
                res = transport(url, hdrs, proxies[i], self.timeout_s)
            else:
                res = transport(
                    url, hdrs, proxies[i], self.timeout_s, method, body
                )
            if len(res) == 3:  # legacy injected transports
                st, body_out, sc = res
                fu, kind, msg = url, "", ""
            else:
                st, body_out, sc, fu, kind, msg = res
            status[i] = st
            htmls[i] = body_out
            set_cookies[i] = sc
            final_urls[i] = fu
            err_kinds[i] = kind
            errs[i] = msg
        return _append_fetch_columns(
            batch, status, htmls, set_cookies, proxies,
            final_urls, err_kinds, errs,
        )


def make_fetch_stage(store) -> PageStoreFetchStage:
    """Default stage for an engine run: page-store lookup."""
    return PageStoreFetchStage(store)
