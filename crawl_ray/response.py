"""Response view + handler output — the per-row UDF surface.

The reference hands each handler a ``*Response`` (request + parsed
goquery doc + helpers, ``response.go:15-60``) and handlers side-effect
``Crawler.Schedule`` to fan out (``examples/imdb/spider/spider.go:37-41``).
In the Ray-Data-native engine handlers are **pure**: they receive a
:class:`ResponseView` and *return* a :class:`HandlerResult` whose
``requests`` become next-round frontier rows and whose ``records``
become rows of the records table (SURVEY.md §2.10 U6 — the central
idiom shift from side-effecting Schedule to dataflow output).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from crawl_ray.dom import Node, find, parse_html
from crawl_ray.functions import html as H
from crawl_ray.request import Request

__all__ = ["ResponseView", "HandlerResult"]


@dataclass
class HandlerResult:
    """What a handler produced for one response."""

    records: list[dict[str, str]] = field(default_factory=list)
    requests: list[Request] = field(default_factory=list)

    def emit(self, **fields: str) -> None:
        self.records.append({k: str(v) for k, v in fields.items()})

    def schedule(self, request: Request) -> None:
        """The pure analog of ``Crawler.Schedule`` (``crawler.go:265-267``)."""
        self.requests.append(request)


class ResponseView:
    """Read-only view of one fetched page, mirroring ``Response``
    helpers (``response.go:42-60``) over :mod:`crawl_ray.dom`."""

    __slots__ = ("request", "url", "status", "body", "_doc")

    def __init__(self, request: Request, url: str, status: int, body: bytes,
                 doc: Node | None = None) -> None:
        self.request = request
        self.url = url  # final response URL (response.go:46-48)
        self.status = status
        self.body = body
        self._doc = doc

    @property
    def doc(self) -> Node:
        """Parsed document (``Response.Query``); parse is lazy and
        cached like ``Response.ParseHTML`` (``response.go:23-30``)."""
        if self._doc is None:
            self._doc = parse_html(self.body)
        return self._doc

    # -- goquery-style helpers ---------------------------------------
    def find(self, selector: str) -> list[Node]:
        return find(self.doc, selector)

    def text(self, selector: str) -> str:
        return H.text(self.doc, selector)

    def attr(self, attr_name: str, selector: str) -> str:
        return H.attr(self.doc, attr_name, selector)

    def parse_float(self, selector: str) -> tuple[float, str | None]:
        return H.parse_float(self.doc, selector)

    def parse_uint(self, selector: str) -> tuple[int, str | None]:
        return H.parse_uint(self.doc, selector)

    def links(self, selector: str = "a") -> list[str]:
        """Resolved hrefs of matching nodes (F9 NodeResolveURL,
        ``html_utils.go:93-106``); missing hrefs are skipped."""
        resolver = H.node_resolve_url(self.url)
        out = []
        for node in self.find(selector):
            resolved = resolver(node)
            if resolved:
                out.append(resolved)
        return out
