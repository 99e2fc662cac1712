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
    "flagship_spider", "forms_spider", "cookie_spider", "HandlerError",
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


def _emit_cookie_record(resp: ResponseView, result: HandlerResult,
                        stage: str) -> None:
    """Record the Cookie header the crawler actually sent (ST1 — the
    jar-merged effective header, observable via resp.request.headers
    exactly as a live server would observe it)."""
    result.emit(
        stage=stage,
        cookie=resp.request.headers.get("Cookie", ""),
        text=resp.text("html"),
    )


def cookie_start_handler(resp: ResponseView, result: HandlerResult) -> None:
    """Chain driver: schedules /next with an EXPLICIT request cookie
    (request.go:69-73) on top of whatever the jar accumulated."""
    _check_status(resp)
    _emit_cookie_record(resp, result, "start")
    k = resp.url.rsplit("/", 1)[1]
    result.schedule(
        Request(
            url=f"/next/{k}",
            referer=resp.url,
            cookies={"u": [f"x{k}"]},
            callbacks=["cookie_next"],
        )
    )


def cookie_next_handler(resp: ResponseView, result: HandlerResult) -> None:
    _check_status(resp)
    _emit_cookie_record(resp, result, "next")
    k = resp.url.rsplit("/", 1)[1]
    result.schedule(
        Request(url=f"/final/{k}", referer=resp.url,
                callbacks=["cookie_final"])
    )


def cookie_final_handler(resp: ResponseView, result: HandlerResult) -> None:
    _check_status(resp)
    _emit_cookie_record(resp, result, "final")


def cookie_shared_handler(resp: ResponseView, result: HandlerResult) -> None:
    """Same-host concurrent Set-Cookie: both /a pages write ``shared``
    in round 0; /check observes the canonical last-write-wins value."""
    _check_status(resp)
    _emit_cookie_record(resp, result, "shared")
    i = resp.url.rsplit("/", 1)[1]
    result.schedule(
        Request(url=f"/check/{i}", referer=resp.url,
                callbacks=["cookie_final"])
    )


def cookie_spider(registry: HandlerRegistry) -> None:
    """ST1 jar coverage spider (see ``fixtures.generate_cookie_web``)."""
    registry.register("cookie_start", cookie_start_handler)
    registry.register("cookie_next", cookie_next_handler)
    registry.register("cookie_final", cookie_final_handler)
    registry.register("cookie_shared", cookie_shared_handler)
