"""Minimal HTML DOM + CSS selector engine (stdlib-only).

This replaces goquery / net/html in the reference (crackcomm/crawl):
the extraction library there operates on ``goquery.Selection`` values
produced by ``goquery.NewDocumentFromReader`` (reference
``response.go:23-30``).  No third-party HTML parser is available in this
environment, so we implement the well-formed HTML5 subset the fixture
corpus is restricted to (see FIXTURES.md §1):

* element / text tree built with :class:`html.parser.HTMLParser`
  (``convert_charrefs=True`` → entities decoded, script/style kept raw,
  matching net/html's raw-text elements),
* void elements and a small auto-close table (``li``, ``p``, ``option``,
  table rows/cells) so common real-world HTML still parses sensibly,
* a CSS selector subset covering everything the reference and its
  examples use: tag, ``*``, ``.class``, ``#id``, ``[attr]``,
  ``[attr=value]`` (quoted or bare), ``:nth-of-type(n)``,
  ``:first-child``, descendant and ``>`` combinators, comma groups
  (cf. ``examples/imdb/spider/spider.go:36,52-53``).

Semantics locked by tests in ``tests/test_dom.py``:

* ``Node.text()`` is the goquery ``Selection.Text()`` equivalent: the
  in-document-order concatenation of **all** descendant text nodes,
  including ``<script>``/``<style>`` contents (reference
  ``html_utils.go:41-45`` relies on this).
* duplicate attributes keep the **first** occurrence (net/html rule).
* ``find`` matches **descendants** of the anchor nodes only (goquery
  ``Find``), returns document order, deduplicated.
"""

from __future__ import annotations

import re
import weakref
from html import unescape
from html.parser import HTMLParser

__all__ = ["Node", "parse_html", "find", "compile_selector"]

# HTML5 void elements: no end tag, never pushed on the open stack.
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# tag being opened -> set of open tags it implicitly closes (HTML5-lite).
_AUTOCLOSE: dict[str, frozenset[str]] = {
    "li": frozenset({"li"}),
    "option": frozenset({"option"}),
    "optgroup": frozenset({"option", "optgroup"}),
    "tr": frozenset({"tr", "td", "th"}),
    "td": frozenset({"td", "th"}),
    "th": frozenset({"td", "th"}),
    "thead": frozenset({"tr", "td", "th"}),
    "tbody": frozenset({"tr", "td", "th", "thead"}),
    "tfoot": frozenset({"tr", "td", "th", "tbody"}),
    "dd": frozenset({"dd", "dt"}),
    "dt": frozenset({"dd", "dt"}),
    "p": frozenset({"p"}),
    # block-level elements implicitly close an open <p>
    "div": frozenset({"p"}),
    "ul": frozenset({"p"}),
    "ol": frozenset({"p"}),
    "table": frozenset({"p"}),
    "h1": frozenset({"p"}),
    "h2": frozenset({"p"}),
    "h3": frozenset({"p"}),
    "h4": frozenset({"p"}),
    "h5": frozenset({"p"}),
    "h6": frozenset({"p"}),
    "form": frozenset({"p"}),
    "blockquote": frozenset({"p"}),
    "pre": frozenset({"p"}),
}


class Node:
    """One DOM node. ``tag`` is ``"#text"`` for text nodes (data in
    ``data``), ``"#document"`` for the root.

    The parent link is a **weakref**: the tree owns strong refs only
    downward (``children``), so a dropped document is reclaimed by pure
    refcounting — no reference cycles, no cyclic-GC pressure.  That
    matters in the hot extract stage, where tasks parse thousands of
    documents per batch with the cyclic collector disabled.

    Lifetime contract: keep the document ROOT alive while using any
    node from it.  Holding only a subtree node lets its ancestors be
    collected, after which ``parent`` walks (ancestor combinators,
    ``:first-child``-style pseudos) see ``None``.  All in-repo callers
    hold the root (the response/form object owns the parsed doc)."""

    __slots__ = (
        "tag", "attrs", "children", "_parent", "data", "_order",
        "_tagindex",  # set lazily on #document roots only (see find())
        "__weakref__",
    )

    def __init__(
        self,
        tag: str,
        attrs: dict[str, str] | None = None,
        parent: "Node | None" = None,
        data: str = "",
    ) -> None:
        self.tag = tag
        self.attrs: dict[str, str] = attrs or {}
        self.children: list[Node] = []
        self._parent = weakref.ref(parent) if parent is not None else None
        self.data = data
        self._order = 0  # document-order index, assigned after parse

    @property
    def parent(self) -> "Node | None":
        ref = self._parent
        if ref is None:
            return None
        node = ref()
        if node is None:
            # the caller dropped the document root while keeping a
            # subtree node: ancestor-dependent matching would silently
            # return wrong results — fail loudly instead
            raise RuntimeError(
                "Node.parent is dead: hold the document root while "
                "matching selectors against a subtree"
            )
        return node

    @parent.setter
    def parent(self, node: "Node | None") -> None:
        self._parent = weakref.ref(node) if node is not None else None

    # -- tree walking ------------------------------------------------
    def iter_elements(self):
        """Yield descendant element nodes (not self) in document order."""
        for child in self.children:
            if child.tag == "#text":
                continue
            yield child
            yield from child.iter_elements()

    def text(self) -> str:
        """goquery ``Selection.Text()`` for a single node: concatenation
        of all descendant text-node data in document order — including
        script/style contents (reference ``html_utils.go:41-45``)."""
        parts: list[str] = []
        stack = [iter(self.children)]
        while stack:
            try:
                child = next(stack[-1])
            except StopIteration:
                stack.pop()
                continue
            if child.tag == "#text":
                parts.append(child.data)
            else:
                stack.append(iter(child.children))
        return "".join(parts)

    def attr(self, name: str) -> str | None:
        return self.attrs.get(name)

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        if self.tag == "#text":
            return f"Text({self.data!r})"
        return f"<{self.tag} {self.attrs}>"


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#document")
        self.stack: list[Node] = [self.root]

    # -- helpers -----------------------------------------------------
    def _make_attrs(self, attrs: list[tuple[str, str | None]]) -> dict[str, str]:
        out: dict[str, str] = {}
        for name, value in attrs:
            if name not in out:  # net/html keeps the FIRST duplicate
                out[name] = value if value is not None else ""
        return out

    def _autoclose(self, tag: str) -> None:
        closes = _AUTOCLOSE.get(tag)
        if not closes:
            return
        while len(self.stack) > 1 and self.stack[-1].tag in closes:
            self.stack.pop()

    # -- HTMLParser hooks --------------------------------------------
    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        self._autoclose(tag)
        node = Node(tag, self._make_attrs(attrs), parent=self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        self._autoclose(tag)
        node = Node(tag, self._make_attrs(attrs), parent=self.stack[-1])
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag: str) -> None:
        if tag in _VOID:
            return
        # pop to the nearest matching open tag; ignore stray end tags
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if not data:
            return
        parent = self.stack[-1]
        parent.children.append(Node("#text", parent=parent, data=data))


# -- fast tokenizer ---------------------------------------------------------
# A direct regex scan over the well-formed HTML5 subset, ~3x faster than
# html.parser's incremental feed machinery.  Any construct it does not
# recognize aborts to the html.parser-based _TreeBuilder, so semantics
# never silently diverge; equivalence is locked by tests/test_dom.py and
# the corpus-wide byte-identical-text checks.

_RAW_TEXT = frozenset({"script", "style"})  # html.parser CDATA elements

_STARTTAG_RE = re.compile(
    r"<([a-zA-Z][-\w:.]*)"
    r"((?:\s+[^\s/>=]+(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s>]*))?)*)"
    r"\s*(/?)>"
)
_ENDTAG_RE = re.compile(r"</\s*([a-zA-Z][-\w:.]*)\s*>")
_ATTR_RE = re.compile(
    r"([^\s/>=]+)(?:\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]*)))?"
)
_RAW_END_RE = {
    name: re.compile(rf"</\s*{name}\s*>", re.IGNORECASE) for name in _RAW_TEXT
}


def _fast_parse(html: str) -> Node | None:
    """One-pass tokenizer; returns the root, or None to request the
    html.parser fallback.

    Nodes are created in document pre-order, so ``_order`` is assigned
    at creation and the per-document tag index (see ``find``) is built
    inline — no post-parse tree walks."""
    root = Node("#document")
    stack = [root]
    order = [1]  # root keeps _order 0
    index: dict[str, list[Node]] = {"*": []}
    all_nodes = index["*"]
    # hot-loop locals: attribute/global lookups in CPython cost real
    # time at ~500 tags + ~250 text nodes per page (measured ~8% of
    # parse); node construction bypasses __init__ (same slot writes,
    # no call overhead, no `attrs or {}` re-test)
    _node_new = Node.__new__
    _wref = weakref.ref
    _autoclose_get = _AUTOCLOSE.get
    _index_get = index.get

    def add_text(data: str) -> None:
        parent = stack[-1]
        node = _node_new(Node)
        node.tag = "#text"
        node.attrs = {}
        node.children = []
        node._parent = _wref(parent)
        node.data = data
        node._order = order[0]
        order[0] += 1
        parent.children.append(node)

    def open_tag(name: str, attrs: dict, push: bool) -> None:
        closes = _autoclose_get(name)
        if closes:
            while len(stack) > 1 and stack[-1].tag in closes:
                stack.pop()
        parent = stack[-1]
        node = _node_new(Node)
        node.tag = name
        node.attrs = attrs
        node.children = []
        node._parent = _wref(parent)
        node.data = ""
        node._order = order[0]
        order[0] += 1
        parent.children.append(node)
        all_nodes.append(node)
        bucket = _index_get(name)
        if bucket is None:
            index[name] = [node]
        else:
            bucket.append(node)
        if push:
            stack.append(node)

    pos = 0
    n = len(html)
    while pos < n:
        lt = html.find("<", pos)
        if lt < 0:
            if pos < n:
                data = html[pos:]
                add_text(unescape(data) if "&" in data else data)
            break
        if lt > pos:
            data = html[pos:lt]
            add_text(unescape(data) if "&" in data else data)
        nxt = html[lt + 1] if lt + 1 < n else ""
        # ordinal-range test beats str.isalpha() at one call per '<'.
        # isalpha also matches non-ASCII letters, but html.parser only
        # opens tags on '<[a-zA-Z]' — a non-ASCII letter after '<' is
        # data there, exactly what the else branch below emits (the
        # old isalpha path reached the same outcome via regex-fail →
        # full html.parser fallback)
        if ("a" <= nxt <= "z") or ("A" <= nxt <= "Z"):
            m = _STARTTAG_RE.match(html, lt)
            if m is None:
                return None
            name, attrstr, slash = m.group(1, 2, 3)
            name = name.lower()
            attrs: dict[str, str] = {}
            if attrstr:
                for am in _ATTR_RE.finditer(attrstr):
                    k, v, v3, v4 = am.group(1, 2, 3, 4)
                    k = k.lower()
                    if k in attrs:  # net/html keeps the FIRST duplicate
                        continue
                    if v is None:
                        v = v3
                    if v is None:
                        v = v4
                        if v and v[0] in "\"'":
                            # the unquoted branch swallowed an orphan
                            # quote (unterminated quoted value):
                            # html.parser emits the whole construct as
                            # TEXT — abort to the fallback rather than
                            # silently diverge
                            return None
                    if v is None:
                        v = ""
                    attrs[k] = unescape(v) if "&" in v else v
            self_closing = bool(slash)
            pos = m.end()
            if name in _RAW_TEXT and not self_closing:
                open_tag(name, attrs, push=True)
                em = _RAW_END_RE[name].search(html, pos)
                if em is None:
                    return None  # unterminated raw text: punt
                if em.start() > pos:
                    add_text(html[pos : em.start()])  # raw: NO unescape
                stack.pop()
                pos = em.end()
            else:
                open_tag(name, attrs, push=not self_closing and name not in _VOID)
        elif nxt == "/":
            m = _ENDTAG_RE.match(html, lt)
            if m is None:
                return None
            name = m.group(1).lower()
            if name not in _VOID:
                for i in range(len(stack) - 1, 0, -1):
                    if stack[i].tag == name:
                        del stack[i:]
                        break
            pos = m.end()
        elif nxt == "!":
            if html.startswith("<!--", lt):
                end = html.find("-->", lt + 4)
                if end < 0:
                    return None
                if "--" in html[lt + 4 : end]:
                    # html.parser also closes comments on '--\s*>' —
                    # a body containing '--' may terminate EARLIER
                    # there than our literal '-->' scan: abort to the
                    # fallback rather than swallow real markup
                    return None
                pos = end + 3
            elif html.startswith("<![", lt):
                # CDATA / marked sections end at ']]>' in html.parser,
                # not at the first '>' — never fast-parse them
                return None
            else:
                end = html.find(">", lt)
                if end < 0:
                    return None
                pos = end + 1
        elif nxt == "?":
            end = html.find(">", lt)
            if end < 0:
                return None
            pos = end + 1
        else:
            # bare '<' not opening a construct: html.parser emits it as data
            add_text("<")
            pos = lt + 1
    root._tagindex = index
    return root


def parse_html(html: bytes | str) -> Node:
    """Parse HTML into a DOM tree; returns the ``#document`` root.

    Bytes are decoded as UTF-8 (errors replaced) — the reference buffers
    raw body bytes and hands them to the parser the same way
    (``response.go:23-30``).  Uses the fast tokenizer; falls back to the
    html.parser-based builder on anything it does not recognize."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    root = _fast_parse(html)
    if root is not None:
        # fast tokenizer assigned _order at creation (pre-order) and
        # built the tag index inline — no post-parse walk needed
        return root
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    root = builder.root
    order = 0
    stack = [root]
    while stack:
        node = stack.pop()
        node._order = order
        order += 1
        stack.extend(reversed(node.children))
    return root


# ---------------------------------------------------------------------------
# CSS selector subset
# ---------------------------------------------------------------------------

_SIMPLE_RE = re.compile(
    r"""
    (?P<tag>[a-zA-Z][\w-]*|\*)?
    (?P<rest>(?:
        \#[\w-]+ |
        \.[\w-]+ |
        \[[^\]]+\] |
        :[\w-]+(?:\([^)]*\))?
    )*)
    """,
    re.VERBOSE,
)

_PART_RE = re.compile(
    r"""\#(?P<id>[\w-]+)
      | \.(?P<cls>[\w-]+)
      | \[(?P<attr>[^\]]+)\]
      | :(?P<pseudo>[\w-]+)(?:\((?P<arg>[^)]*)\))?
    """,
    re.VERBOSE,
)


class _Compound:
    """One compound selector: tag + id/class/attr/pseudo predicates."""

    __slots__ = ("tag", "preds")

    def __init__(self, tag: str | None, preds: list) -> None:
        self.tag = tag
        self.preds = preds

    def matches(self, node: Node) -> bool:
        if node.tag.startswith("#"):
            return False
        if self.tag and self.tag != "*" and node.tag != self.tag:
            return False
        return all(pred(node) for pred in self.preds)


def _pred_id(value: str):
    return lambda n: n.attrs.get("id") == value


def _pred_class(value: str):
    return lambda n: value in (n.attrs.get("class") or "").split()


def _pred_attr(spec: str):
    if "=" in spec:
        name, _, value = spec.partition("=")
        op = ""
        if name and name[-1] in "~^$*|":
            op, name = name[-1], name[:-1]
        name = name.strip()
        value = value.strip()
        if not re.fullmatch(r"[-\w:.]+", name):
            # e.g. [href!="x"]: '!' is not an operator we support —
            # fail LOUDLY like unsupported pseudo-classes do, instead
            # of silently testing a mangled attribute name
            raise ValueError(f"unsupported attribute selector: {spec!r}")
        if len(value) >= 2 and value[0] in "\"'" and value[-1] == value[0]:
            value = value[1:-1]
        if op == "":
            return lambda n: n.attrs.get(name) == value
        if op == "^":
            return lambda n: (n.attrs.get(name) or "").startswith(value)
        if op == "$":
            return lambda n: (n.attrs.get(name) or "").endswith(value)
        if op == "*":
            return lambda n: value in (n.attrs.get(name) or "")
        if op == "~":
            return lambda n: value in (n.attrs.get(name) or "").split()
        if op == "|":
            # CSS [a|=v]: the attribute must EXIST and equal v or start
            # with "v-" — a missing attribute never matches (the old
            # `"" in (value, "")` accepted every attribute-less node)
            return lambda n: (
                n.attrs.get(name) is not None
                and (n.attrs[name] == value
                     or n.attrs[name].startswith(value + "-"))
            )
    name = spec.strip()
    return lambda n: name in n.attrs


def _pred_pseudo(name: str, arg: str | None):
    if name == "nth-of-type":
        k = int(arg)  # type: ignore[arg-type]

        def nth(n: Node) -> bool:
            if n.parent is None:
                return False
            same = [c for c in n.parent.children if c.tag == n.tag]
            return same.index(n) + 1 == k

        return nth
    if name == "first-child":
        return lambda n: n.parent is not None and next(
            (c for c in n.parent.children if c.tag != "#text"), None
        ) is n
    if name == "last-child":
        return lambda n: n.parent is not None and next(
            (c for c in reversed(n.parent.children) if c.tag != "#text"), None
        ) is n
    if name == "first-of-type":
        return _pred_pseudo("nth-of-type", "1")
    raise ValueError(f"unsupported pseudo-class :{name}")


def _parse_compound(token: str) -> _Compound:
    m = _SIMPLE_RE.fullmatch(token)
    if not m or (m.group("tag") is None and not m.group("rest")):
        raise ValueError(f"bad selector token: {token!r}")
    preds = []
    for part in _PART_RE.finditer(m.group("rest") or ""):
        if part.group("id"):
            preds.append(_pred_id(part.group("id")))
        elif part.group("cls"):
            preds.append(_pred_class(part.group("cls")))
        elif part.group("attr"):
            preds.append(_pred_attr(part.group("attr")))
        elif part.group("pseudo"):
            preds.append(_pred_pseudo(part.group("pseudo"), part.group("arg")))
    tag = m.group("tag")
    # node tags are stored lowercased; CSS tag matching is
    # case-insensitive (cascadia/goquery semantics)
    return _Compound(tag.lower() if tag else tag, preds)


_TOKEN_RE = re.compile(r"\s*(>)\s*|\s+")


def _parse_group(group: str) -> list[tuple[str, _Compound]]:
    """Parse one comma-group into [(combinator, compound), ...] where
    combinator is '' for the leftmost, ' ' (descendant) or '>' (child)."""
    tokens: list[tuple[str, str]] = []
    pos = 0
    comb = ""
    group = group.strip()
    while pos < len(group):
        m = _TOKEN_RE.match(group, pos)
        if m and m.start() == pos and m.end() > pos:
            comb = ">" if m.group(1) else " "
            pos = m.end()
            continue
        # consume one compound token (up to next whitespace/'>' outside brackets)
        end = pos
        depth = 0
        while end < len(group):
            ch = group[end]
            if ch == "[" or ch == "(":
                depth += 1
            elif ch == "]" or ch == ")":
                depth -= 1
            elif depth == 0 and (ch.isspace() or ch == ">"):
                break
            end += 1
        tokens.append((comb, group[pos:end]))
        comb = ""
        pos = end
    return [(c, _parse_compound(t)) for c, t in tokens]


def _split_groups(source: str) -> list[str]:
    """Split on top-level commas only — a comma inside a quoted
    attribute value or brackets (``a[title="x,y"]``) is part of the
    group, not a separator."""
    groups: list[str] = []
    buf: list[str] = []
    depth = 0
    quote = ""
    for ch in source:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = ""
        elif ch in "\"'":
            quote = ch
            buf.append(ch)
        elif ch in "[(":
            depth += 1
            buf.append(ch)
        elif ch in "])":
            depth = max(0, depth - 1)
            buf.append(ch)
        elif ch == "," and depth == 0:
            groups.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    groups.append("".join(buf))
    return groups


class Selector:
    """A compiled selector (comma groups of combinator chains)."""

    __slots__ = ("groups", "source")

    def __init__(self, source: str) -> None:
        self.source = source
        self.groups = [
            _parse_group(g) for g in _split_groups(source) if g.strip()
        ]

    def matches(self, node: Node) -> bool:
        return any(self._match_chain(chain, node) for chain in self.groups)

    @staticmethod
    def _match_chain(chain: list[tuple[str, _Compound]], node: Node) -> bool:
        if not chain or not chain[-1][1].matches(node):
            return False
        return Selector._match_up(chain, len(chain) - 1, node)

    @staticmethod
    def _match_up(chain, idx: int, current: Node) -> bool:
        """chain[idx] matched at ``current``; match the rest upward.
        Descendant steps BACKTRACK across candidate ancestors — greedy
        nearest-ancestor binding falsely rejects ``X > Y Z`` when a
        nested Y matches Z's nearest Y-ancestor but only an outer Y is
        the child of X (CSS requires any consistent assignment)."""
        if idx == 0:
            return True
        comb = chain[idx][0]
        compound = chain[idx - 1][1]
        if comb == ">":
            p = current.parent
            return (
                p is not None
                and compound.matches(p)
                and Selector._match_up(chain, idx - 1, p)
            )
        anc = current.parent
        while anc is not None:
            if compound.matches(anc) and Selector._match_up(
                chain, idx - 1, anc
            ):
                return True
            anc = anc.parent
        return False


_SELECTOR_CACHE: dict[str, Selector] = {}


def compile_selector(selector: str) -> Selector:
    sel = _SELECTOR_CACHE.get(selector)
    if sel is None:
        sel = Selector(selector)
        if len(_SELECTOR_CACHE) < 4096:
            _SELECTOR_CACHE[selector] = sel
    return sel


def _build_tag_index(root: Node) -> dict[str, list[Node]]:
    """tag → descendant elements in document order, plus "*" → all
    elements.  Built lazily on the FIRST root-anchored find against a
    document and cached on the root: every handler typically runs
    several selectors per page (title, body text, price, links), and
    one indexed walk replaces a full-tree walk per selector.  Parsed
    trees are read-only by contract (nothing in-repo mutates a DOM
    after parse), so the cache cannot go stale."""
    index: dict[str, list[Node]] = {"*": []}
    all_nodes = index["*"]
    stack = [iter(root.children)]
    while stack:
        try:
            node = next(stack[-1])
        except StopIteration:
            stack.pop()
            continue
        tag = node.tag
        if tag[0] == "#":  # text node; no element children
            continue
        all_nodes.append(node)
        bucket = index.get(tag)
        if bucket is None:
            index[tag] = [node]
        else:
            bucket.append(node)
        if node.children:
            stack.append(iter(node.children))
    return index


def find(anchors: Node | list[Node], selector: str | Selector) -> list[Node]:
    """goquery ``Find``: matching **descendants** of the anchor node(s),
    in document order, deduplicated (``html_utils.go:22-24`` Finder)."""
    if isinstance(selector, str):
        selector = compile_selector(selector)
    if isinstance(anchors, Node):
        anchors = [anchors]

    # fast path for the overwhelmingly common single-compound selectors
    # (``a``, ``title``, ``span[data-price]``): match inline during one
    # explicit-stack walk, no generator recursion, no chain walk
    fast = None
    if len(selector.groups) == 1 and len(selector.groups[0]) == 1:
        compound = selector.groups[0][0][1]
        tag = compound.tag if compound.tag != "*" else None
        preds = compound.preds
        fast = (tag, preds)

    # fastest path: single-compound selector anchored at the document
    # root — serve from the lazy per-document tag index (O(matches),
    # not O(nodes); walk order == document order, so no sort needed)
    if (
        fast is not None
        and len(anchors) == 1
        and anchors[0].tag == "#document"
    ):
        root = anchors[0]
        try:
            index = root._tagindex
        except AttributeError:
            index = root._tagindex = _build_tag_index(root)
        tag, preds = fast
        nodes = index.get(tag if tag is not None else "*", [])
        if preds:
            return [n for n in nodes if all(p(n) for p in preds)]
        return list(nodes)

    seen: set[int] = set()
    out: list[Node] = []
    for anchor in anchors:
        stack = [iter(anchor.children)]
        while stack:
            try:
                node = next(stack[-1])
            except StopIteration:
                stack.pop()
                continue
            tag_ = node.tag
            if tag_[0] == "#":  # text node; no element children
                continue
            if fast is not None:
                ftag, preds = fast
                if (ftag is None or tag_ == ftag) and (
                    not preds or all(p(node) for p in preds)
                ):
                    if id(node) not in seen:
                        seen.add(id(node))
                        out.append(node)
            elif selector.matches(node):
                if id(node) not in seen:
                    seen.add(id(node))
                    out.append(node)
            if node.children:
                stack.append(iter(node.children))
    out.sort(key=lambda n: n._order)
    return out
