"""Flagship spider + spider protocol (SURVEY.md §2.10 U1-U3, U6).

A *spider* is a callable taking a :class:`HandlerRegistry` and
registering named handlers — mirroring ``WithSpiders``
(``crawler_options.go:72-78``) and the imdb example
(``examples/imdb/spider/spider.go:20-24``).

Handlers are pure: ``fn(resp: ResponseView, result: HandlerResult) ->
None``; raising aborts the row to the errors output (the reference's
first-error-aborts dispatch, ``crawler.go:246-250``; an aborting
handler contributes none of its outputs — atomic per handler).
"""

from __future__ import annotations

from crawl_ray.request import HandlerRegistry, Request
from crawl_ray.response import HandlerResult, ResponseView

__all__ = [
    "flagship_spider", "forms_spider", "HandlerError",
    "PAGE", "LIST", "PAGE_GLOB",
]

PAGE = "page"
LIST = "list"
PAGE_GLOB = "page_*"


class HandlerError(Exception):
    """Handler-signalled error — becomes an errors-table row (the
    analog of returning error from a Handler, ``crawler.go:134-138``)."""


def _check_status(resp: ResponseView) -> None:
    """The content-error idiom from the imdb example
    (``examples/imdb/spider/spider.go:59-64``), on the status column."""
    if resp.status != 200:
        raise HandlerError(f"http status {resp.status}")


def page_handler(resp: ResponseView, result: HandlerResult) -> None:
    """Flagship extractor: the byte-identical-text record (F1 at
    document scope) + link fan-out with raw hrefs and referer, exactly
    like the imdb List handler schedules (``spider.go:30-45``)."""
    _check_status(resp)
    price, price_err = resp.parse_float("span[data-price]")
    result.emit(
        title=resp.text("title"),
        text=resp.text("html"),
        price=repr(price),
        price_err=price_err or "",
    )
    for node in resp.find("a"):
        href = node.attrs.get("href")
        if href is None:
            continue
        result.schedule(
            Request(
                url=href,
                referer=resp.url,
                callbacks=[PAGE],
                priority=resp.request.priority,
            )
        )


def list_handler(resp: ResponseView, result: HandlerResult) -> None:
    """Link-only handler (imdb List analog): schedules children, emits
    no record."""
    _check_status(resp)
    for node in resp.find("a"):
        href = node.attrs.get("href")
        if href is None:
            continue
        result.schedule(
            Request(
                url=href,
                referer=resp.url,
                callbacks=[PAGE],
                priority=resp.request.priority,
            )
        )


def flagship_spider(registry: HandlerRegistry) -> None:
    """Register the flagship handlers: exact names + a glob pattern
    (exercises crawler.go:239-263 routing incl. the pattern path)."""
    registry.register(PAGE, page_handler)
    registry.register(PAGE_GLOB, page_handler)
    registry.register(LIST, list_handler)


def form_page_handler(resp: ResponseView, result: HandlerResult) -> None:
    """M1 roundtrip driver: scrape the form (F10, ``forms/forms.go``)
    and submit it — Form ⇒ POST on the resolved action (the imdb-style
    child schedule, but through ``construct_request`` semantics) — plus
    a query-carrying GET child exercising ``request.go:57-59``."""
    from crawl_ray.functions.forms import new_selector

    _check_status(resp)
    form = new_selector(resp.doc, "#f")
    result.emit(kind="form", action=form.action)
    result.schedule(
        Request(
            url=form.action,
            referer=resp.url,
            form=form.values,
            callbacks=["submitted"],
        )
    )
    result.schedule(
        Request(
            url="/search",
            referer=resp.url,
            query={"q": form.values.get("q", [""]), "page": ["2"]},
            callbacks=["submitted"],
        )
    )


def submitted_handler(resp: ResponseView, result: HandlerResult) -> None:
    """Records the effective request: method proves Form ⇒ POST, url
    proves the query re-encode keyed the fetch."""
    _check_status(resp)
    result.emit(
        kind="result",
        method=resp.request.get_method(),
        text=resp.text("html"),
    )


def forms_spider(registry: HandlerRegistry) -> None:
    registry.register("form_page", form_page_handler)
    registry.register("submitted", submitted_handler)
