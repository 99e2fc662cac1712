"""Form scraping — faithful port of ``/root/reference/forms/forms.go``
semantics (F10 in SURVEY.md §2.3) over :mod:`crawl_ray.dom`.

``Values`` is a ``dict[str, list[str]]`` mirroring Go ``url.Values``;
``set`` replaces (``url.Values.Set``).
"""

from __future__ import annotations

from crawl_ray.dom import Node, find
from crawl_ray.functions.html import collapse_ws

__all__ = ["Form"]


class Form:
    """Scraped HTML form: action + default values.

    Semantics locked to ``forms/forms.go``:

    * ``selector()``: action = first matched form's ``action`` attr
      (``forms.go:72-76``);
    * default input values: every ``<input>`` except ``submit``/
      ``reset``; ``radio``/``checkbox`` only when ``checked="checked"``
      literally (``forms.go:84-99``);
    * ``<select>``: value of the first ``selected="selected"`` option,
      else "" (``forms.go:104-127``); selects with empty name skipped;
    * ``select(name, text)`` picks an option by trimmed display text
      (``forms.go:48-68``); later matches overwrite earlier ones.
    """

    def __init__(self, page: Node | None = None) -> None:
        self.action: str = ""
        self.values: dict[str, list[str]] = {}
        self._page = page
        self._form_nodes: list[Node] = []

    # -- url.Values helpers -----------------------------------------
    def set(self, name: str, value: str) -> None:
        self.values[name] = [value]

    def add(self, name: str, value: str) -> None:
        self.values.setdefault(name, []).append(value)

    # -- forms.go API ------------------------------------------------
    def page(self, page: Node) -> None:
        self._page = page

    def selector(self, selector: str) -> None:
        """Find the form and parse default values (``forms.go:70-77``)."""
        assert self._page is not None, "call page() first"
        self._form_nodes = find(self._page, selector)
        if self._form_nodes:
            self.action = self._form_nodes[0].attrs.get("action", "")
        self._defaults()

    def select(self, name: str, text: str) -> None:
        """Set a select value by option display text (``forms.go:48-68``)."""
        for sel in find(self._form_nodes, "select"):
            if sel.attrs.get("name", "") != name:
                continue
            for option in find(sel, "option"):
                if collapse_ws_trim(option.text()) == text:
                    self.set(name, option.attrs.get("value", ""))

    # -- internals ---------------------------------------------------
    def _defaults(self) -> None:
        for inp in find(self._form_nodes, "input"):
            ftype = inp.attrs.get("type", "")
            if ftype in ("submit", "reset"):
                continue
            if ftype in ("radio", "checkbox") and inp.attrs.get("checked", "") != "checked":
                continue
            self.set(inp.attrs.get("name", ""), inp.attrs.get("value", ""))

        for sel in find(self._form_nodes, "select"):
            name = sel.attrs.get("name", "")
            if not name:
                continue
            value = ""
            for option in find(sel, "option"):
                if value:
                    continue  # first selected option wins (forms.go:113-116)
                if option.attrs.get("selected", "") == "selected":
                    value = option.attrs.get("value", "")
            self.set(name, value)


def collapse_ws_trim(s: str) -> str:
    """Go ``strings.TrimSpace`` as used in Select (``forms.go:60``)."""
    return s.strip()


def new_selector(page: Node, selector: str) -> Form:
    """``forms.NewSelector`` (``forms.go:31-36``)."""
    form = Form(page)
    form.selector(selector)
    return form
