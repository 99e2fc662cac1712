"""Request model, construction kernel (M1/M2) and handler routing (M7).

Faithful re-implementations of ``/root/reference/request.go`` and the
dispatch logic in ``/root/reference/crawler.go:226-263``, as plain
Python used inside Ray Data batch kernels.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from urllib.parse import quote_plus

from crawl_ray.urlnorm import canonicalize, resolve_url

__all__ = [
    "Request",
    "go_glob",
    "encode_values",
    "canonical_header_key",
    "construct_request",
    "effective_fetch_key",
    "merge_default_headers",
    "cookie_header",
    "HandlerRegistry",
    "DEFAULT_HEADERS",
]

# crawler.go:96-100 — default crawler headers
DEFAULT_HEADERS: dict[str, str] = {
    "Accept": "text/html,application/xhtml+xml,application/xml;q=0.9,image/webp,*/*;q=0.8",
    "Accept-Language": "en-US,en;q=0.8",
    "User-Agent": (
        "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) "
        "Chrome/46.0.2490.86 Safari/537.36"
    ),
}


@dataclass
class Request:
    """The job row (``request.go:13-32``)."""

    url: str = ""
    method: str = ""
    referer: str = ""
    form: dict[str, list[str]] = field(default_factory=dict)
    query: dict[str, list[str]] = field(default_factory=dict)
    cookies: dict[str, list[str]] = field(default_factory=dict)
    headers: dict[str, str] = field(default_factory=dict)
    raw: bool = False
    callbacks: list[str] = field(default_factory=list)
    # scheduling state added by the north rule (SURVEY.md §1.2)
    depth: int = 0
    seq_path: bytes = b""
    priority: float = 0.0
    deadline: int | None = None  # epoch micros
    metadata: dict[str, str] = field(default_factory=dict)

    def get_method(self) -> str:
        """``Request.GetMethod`` (``request.go:120-125``): "" → GET."""
        return self.method or "GET"

    def __str__(self) -> str:
        """``Request.String`` (``request.go:128-130``)."""
        return f"{self.get_method()} {self.url}"


def go_glob(pattern: str, subj: str) -> bool:
    """ryanuber/go-glob semantics as used by handler dispatch
    (``crawler.go:243``): only ``*`` is special; no ``?`` or classes."""
    if pattern == "":
        return subj == ""
    if pattern == "*":
        return True
    parts = pattern.split("*")
    if len(parts) == 1:
        return subj == pattern
    leading = pattern.startswith("*")
    trailing = pattern.endswith("*")
    end = len(parts) - 1
    for i in range(end):
        idx = subj.find(parts[i])
        if i == 0:
            if not leading and idx != 0:
                return False
        elif idx < 0:
            return False
        subj = subj[idx + len(parts[i]):]
    return trailing or subj.endswith(parts[end])


def encode_values(values: dict[str, list[str]]) -> str:
    """Go ``url.Values.Encode`` (sorted keys, values in order,
    query-escaped with space → '+') — used for both the query string and
    the urlencoded form body (``request.go:57-59``, ``:95``)."""
    pairs = []
    for key in sorted(values):
        for value in values[key]:
            pairs.append(f"{quote_plus(key)}={quote_plus(value)}")
    return "&".join(pairs)


def canonical_header_key(key: str) -> str:
    """Go ``textproto.CanonicalMIMEHeaderKey``: capitalize the first
    letter of each '-'-separated token, lowercase the rest."""
    return "-".join(
        part[:1].upper() + part[1:].lower() if part else part
        for part in key.split("-")
    )


def construct_request(req: Request, default_headers: dict[str, str] | None = None) -> dict:
    """M1 ``ConstructHTTPRequest`` (``request.go:40-99``) + the default
    header merge from ``crawler.go:160-165``.

    Returns the *effective request*: resolved URL (M2, referer
    resolution ``request.go:104-117``), method (Form ⇒ POST default),
    encoded query/body, merged headers, cookie header.  Raises
    ``ValueError`` on an unparsable URL.
    """
    url = resolve_url(req.url, req.referer)
    method = req.method
    headers: dict[str, str] = {}
    body = ""

    if req.form:
        headers[canonical_header_key("Content-Type")] = "application/x-www-form-urlencoded"
        if not method:
            method = "POST"
        body = encode_values(req.form)

    if req.query:
        # drop the fragment BEFORE appending the query (same rule as
        # effective_fetch_key): '/p#f' + query must yield '/p?...',
        # not '/p#f?...' where the query hides inside the fragment
        frag = url.find("#")
        if frag >= 0:
            url = url[:frag]
        base, _, _ = url.partition("?")
        url = base + "?" + encode_values(req.query)

    if not method:
        method = "GET"

    for key, value in req.headers.items():
        headers[canonical_header_key(key)] = value

    if req.cookies:
        cookie_pairs = []
        for name, vals in req.cookies.items():
            for value in vals:
                cookie_pairs.append(f"{name}={value}")
        ck = canonical_header_key("Cookie")
        # APPEND to an explicit Cookie header, never clobber it —
        # net/http AddCookie appends (request.go:69-73): an existing
        # "a=1" plus cookies {b: [2]} sends "a=1; b=2"
        prior = headers.get(ck, "")
        headers[ck] = (
            f"{prior}; " + "; ".join(cookie_pairs) if prior
            else "; ".join(cookie_pairs)
        )

    if req.referer:
        headers[canonical_header_key("Referer")] = req.referer

    merge_default_headers(headers, default_headers)

    return {"url": url, "method": method, "headers": headers, "body": body}


def effective_fetch_key(
    url: str,
    referer: str,
    method: str,
    form: dict[str, list[str]] | None,
    query: dict[str, list[str]] | None,
) -> tuple[str, str]:
    """The fetch-key half of M1 (``request.go:40-99``), shared by the
    engine's canonicalize stage and the simulator: resolved URL with
    the query re-encoded (Go ``url.Values.Encode`` — sorted keys) and
    the effective method (Form ⇒ POST when method is empty).

    The fragment is dropped (it never reaches the server) BEFORE the
    query is appended, so ``/p#f`` + query yields ``/p?…`` not
    ``/p#f?…``.  Method "" still means GET downstream; it is rewritten
    only for the Form⇒POST default so the frontier row records the
    method that was actually used.
    """
    u = canonicalize(url, referer)
    if query:
        base, _, _ = u.partition("?")
        u = base + "?" + encode_values(query)
    if not method and form:
        method = "POST"
    return u, method


def cookie_header(
    explicit: dict[str, list[str]] | None, jar: dict[str, str] | None,
    prior: str = "",
) -> str:
    """ST1 — the effective ``Cookie`` header for one request.

    The reference sends the request's explicit cookies
    (``request.go:69-73``, ``AddCookie`` order = map iteration over
    ``url.Values``) and the client jar's cookies for the host
    (``crawler.go:87``, ``http.Client`` appends jar cookies after the
    header is built).  Deterministic spec here: a pre-existing Cookie
    HEADER value first verbatim (``AddCookie`` APPENDS to it, never
    clobbers), then explicit pairs in request order, then jar pairs
    sorted by name, skipping names the request already set explicitly
    (the reference does not dedup against the raw header string, and
    neither do we).
    """
    pairs: list[str] = [prior] if prior else []
    seen_names: set[str] = set()
    for name, vals in (explicit or {}).items():
        seen_names.add(name)
        for value in vals:
            pairs.append(f"{name}={value}")
    for name in sorted(jar or {}):
        if name not in seen_names:
            pairs.append(f"{name}={jar[name]}")
    return "; ".join(pairs)


def apply_cookie_header(
    headers: dict[str, str],
    explicit: dict[str, list[str]] | None,
    jar: dict[str, str] | None,
) -> dict[str, str]:
    """Merge the effective Cookie header INTO a headers dict without
    clobbering an explicit ``Cookie`` entry (any key case).  Returns a
    new dict when something was added, the original otherwise — the
    shared helper for the extract / live-fetch / simulator stamping
    sites."""
    prior = ""
    for k, v in headers.items():
        if canonical_header_key(k) == "Cookie":
            prior = v
            break
    merged = cookie_header(explicit, jar, prior)
    if not merged or merged == prior:
        return headers
    out = {
        k: v for k, v in headers.items()
        if canonical_header_key(k) != "Cookie"
    }
    out["Cookie"] = merged
    return out


def merge_default_headers(
    headers: dict[str, str], default_headers: dict[str, str] | None = None
) -> dict[str, str]:
    """Default-header merge (``crawler.go:160-165``): defaults apply
    only when the key is not already set.  Runs AFTER middlewares, like
    the reference.  An explicitly EMPTY dict means "no defaults" (the
    construct-before-middlewares call passes {} for exactly that);
    only None selects DEFAULT_HEADERS."""
    defaults = default_headers if default_headers is not None else DEFAULT_HEADERS
    for key, value in defaults.items():
        ckey = canonical_header_key(key)
        if ckey not in headers:
            headers[ckey] = value
    return headers


class HandlerRegistry:
    """Named handler registry + glob routing (``crawler.go:102-117,
    :226-263``, U1-U3 in SURVEY.md §2.10).

    * ``register`` adds the name to the pattern list only when it
      contains ``*`` and was not previously registered
      (``crawler.go:258-263``).
    * ``get_handlers`` returns pattern-matched handlers first (pattern
      registration order; one hit per pattern — the inner loop breaks on
      the first matching callback), then exact-name handlers in callback
      order.  A callback equal to a literal pattern string collects that
      handler **twice** — the reference quirk is intentional
      (``crawler.go:239-252``).
    """

    def __init__(self) -> None:
        self.handlers: dict[str, list] = {}
        self.patterns: list[str] = []
        self.middlewares: list = []

    def register(self, name: str, handler) -> None:
        if name not in self.handlers and "*" in name:
            self.patterns.append(name)
        self.handlers.setdefault(name, []).append(handler)

    def middleware(self, fn) -> None:
        """U2 (``crawler.go:254-256``): ordered pre-fetch hooks; an
        error return routes the row to the errors output."""
        self.middlewares.append(fn)

    def get_handlers(self, callbacks: list[str]) -> list:
        return [h for _, h in self.get_named_handlers(callbacks)]

    def get_named_handlers(self, callbacks: list[str]) -> list:
        """``get_handlers`` with the registered name attached to each
        handler (record-attribution); identical order and the same
        duplicate-dispatch quirk."""
        out: list = []
        for pattern in self.patterns:
            for name in callbacks:
                if go_glob(pattern, name):
                    out.extend((pattern, h) for h in self.handlers[pattern])
                    break
        for name in callbacks:
            out.extend((name, h) for h in self.handlers.get(name, []))
        return out

    def handler_names(self, callbacks: list[str]) -> list[str]:
        """Like ``get_handlers`` but returns registered names (for
        routing masks); preserves the duplicate-dispatch quirk."""
        out: list[str] = []
        for pattern in self.patterns:
            for name in callbacks:
                if go_glob(pattern, name):
                    out.append(pattern)
                    break
        for name in callbacks:
            if name in self.handlers:
                out.append(name)
        return out
