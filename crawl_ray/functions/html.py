"""Scalar HTML extraction functions — the reference's "query language".

Faithful re-implementations of ``/root/reference/html_utils.go`` (F1-F9
in SURVEY.md §2.3) over :mod:`crawl_ray.dom`.  These define the
byte-identical-extracted-text contract of BASELINE.json `input_hint`.

All functions accept a *finder*: either a DOM node (document root or an
element) or a list of nodes — mirroring the Go ``Finder`` interface
(``html_utils.go:21-24``).
"""

from __future__ import annotations

from urllib.parse import urljoin

from crawl_ray.dom import Node, find

__all__ = [
    "text",
    "get_text",
    "attr",
    "find_any",
    "parse_float",
    "parse_uint",
    "node_text",
    "node_attr",
    "node_href",
    "node_src",
    "node_data_photo",
    "node_resolve_url",
    "collapse_ws",
]

Finder = Node | list[Node]


def collapse_ws(s: str) -> str:
    """``strings.Join(strings.Fields(s), " ")`` — collapse every Unicode
    whitespace run to one ASCII space and trim (``html_utils.go:38``).
    Python ``str.split()`` and Go ``strings.Fields`` agree on the
    whitespace class for the fixture corpus."""
    return " ".join(s.split())


def get_text(nodes: list[Node]) -> str:
    """Join each matched node's ``.Text()`` with a single space —
    pre-collapse inner helper (``html_utils.go:41-45``)."""
    return " ".join(node.text() for node in nodes)


def text(finder: Finder, selector: str) -> str:
    """F1 ``Text(n, selector)`` (``html_utils.go:37-39``): find all
    matching nodes, join their document-order descendant text with " ",
    then whitespace-collapse.  Script/style text IS included."""
    return collapse_ws(get_text(find(finder, selector)))


def attr(finder: Finder, attr_name: str, selector: str) -> str:
    """F3 ``Attr`` (``html_utils.go:77-80``): first match's attribute
    value, stripped; "" when no match / no attribute."""
    nodes = find(finder, selector)
    if not nodes:
        return ""
    return (nodes[0].attrs.get(attr_name) or "").strip()


def find_any(finder: Finder, *selectors: str) -> list[Node]:
    """F4 ``FindAny`` (``html_utils.go:26-34``): first selector (in
    argument order) with at least one match wins."""
    nodes: list[Node] = []
    for selector in selectors:
        nodes = find(finder, selector)
        if nodes:
            break
    return nodes


def parse_float(finder: Finder, selector: str) -> tuple[float, str | None]:
    """F5 ``ParseFloat`` (``html_utils.go:50-56``): empty text → (0.0,
    None); else replace **all** ``,`` with ``.`` then parse.  The comma
    quirk is faithful: ``"1,234.5"`` → ``"1.234.5"`` → error.
    Returns (value, error-string-or-None)."""
    t = text(finder, selector)
    if t == "":
        return 0.0, None
    t = t.replace(",", ".")
    try:
        return float(t), None
    except ValueError:
        return 0.0, f"parse_float: invalid syntax: {t!r}"


def parse_uint(finder: Finder, selector: str) -> tuple[int, str | None]:
    """F6 ``ParseUint`` (``html_utils.go:61-68``): empty text → (0,
    None); else strip all ``,`` and spaces, parse base-10 uint64
    (negative or overflow → error)."""
    t = text(finder, selector)
    if t == "":
        return 0, None
    t = t.replace(",", "").replace(" ", "")
    if not t.isdigit():  # rejects sign, like strconv.ParseUint
        return 0, f"parse_uint: invalid syntax: {t!r}"
    value = int(t)
    if value >= 1 << 64:
        return 0, f"parse_uint: value out of range: {t!r}"
    return value, None


def node_text(node: Node) -> str:
    """F7 ``NodeText`` (``html_utils.go:72-74``): whitespace-collapsed
    text of one node — for per-match mapping."""
    return collapse_ws(node.text())


def node_attr(attr_name: str):
    """F8 ``NodeAttr`` (``html_utils.go:84-89``): returns a per-node
    attribute getter; "" when absent."""

    def getter(node: Node) -> str:
        return node.attrs.get(attr_name, "")

    return getter


node_href = node_attr("href")
node_src = node_attr("src")
node_data_photo = node_attr("data-photo")


def node_resolve_url(response_url: str):
    """F9 ``NodeResolveURL`` (``html_utils.go:93-106``): per-node getter
    that takes ``href`` and resolves it against the final response URL
    (post-redirect, ``response.go:46-48``); missing href → ""."""

    def getter(node: Node) -> str:
        href = node.attrs.get("href")
        if href is None:
            return ""
        try:
            return urljoin(response_url, href)
        except ValueError:
            return ""

    return getter
