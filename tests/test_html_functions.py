"""F1-F9 scalar extraction function tests (html_utils.go parity)."""

from crawl_ray.dom import find, parse_html
from crawl_ray.functions import html as H

DOC = parse_html(
    """<html><head><title> My  Title </title></head><body>
<h1>  Hello \t World </h1><h1>Second</h1>
<p class="num"> 1,5 </p>
<p class="big"> 12,345 </p>
<p class="grouped"> 1,234.5 </p>
<p class="uint"> 12, 345 </p>
<p class="neg"> -7 </p>
<a href="/rel/path">rel</a>
<a href="http://other.example/abs">abs</a>
<a>nohref</a>
<span class="spaced">  a   b\xa0c  </span>
<script> var  x ; </script>
</body></html>"""
)


def test_text_whitespace_collapse():
    assert H.text(DOC, "h1") == "Hello World Second"
    assert H.text(DOC, "span.spaced") == "a b c"


def test_text_multi_node_join_single_space():
    # two h1 nodes joined with " " BEFORE collapse (html_utils.go:41-45)
    assert H.text(DOC, "h1") == "Hello World Second"


def test_text_empty_selector_no_match():
    assert H.text(DOC, "h6") == ""


def test_text_includes_script():
    assert H.text(DOC, "script") == "var x ;"


def test_attr():
    assert H.attr(DOC, "href", "a") == "/rel/path"
    assert H.attr(DOC, "href", "h1") == ""
    assert H.attr(DOC, "missing", "a") == ""


def test_find_any_order():
    nodes = H.find_any(DOC, "h6", "h1", "p")
    assert [n.tag for n in nodes] == ["h1", "h1"]
    assert H.find_any(DOC, "h6", "h7") == []


def test_parse_float_comma_to_dot():
    value, err = H.parse_float(DOC, "p.num")
    assert (value, err) == (1.5, None)


def test_parse_float_comma_quirk_is_error():
    # "1,234.5" -> "1.234.5" -> error (html_utils.go:52 replaces ALL commas)
    value, err = H.parse_float(DOC, "p.grouped")
    assert value == 0.0 and err is not None


def test_parse_float_empty_is_zero_no_error():
    assert H.parse_float(DOC, "h6") == (0.0, None)


def test_parse_float_comma_becomes_decimal_point():
    # "12,345" -> "12.345" which parses fine (the quirk's other face)
    value, err = H.parse_float(DOC, "p.big")
    assert (value, err) == (12.345, None)


def test_parse_uint_strips_commas_and_spaces():
    value, err = H.parse_uint(DOC, "p.uint")
    assert (value, err) == (12345, None)


def test_parse_uint_negative_is_error():
    value, err = H.parse_uint(DOC, "p.neg")
    assert value == 0 and err is not None


def test_parse_uint_empty_is_zero():
    assert H.parse_uint(DOC, "h6") == (0, None)


def test_node_text_and_attr():
    h1 = find(DOC, "h1")[0]
    assert H.node_text(h1) == "Hello World"
    a = find(DOC, "a")[0]
    assert H.node_href(a) == "/rel/path"
    assert H.node_href(find(DOC, "a")[2]) == ""


def test_node_resolve_url():
    resolver = H.node_resolve_url("http://host1.example/p/1")
    links = find(DOC, "a")
    assert resolver(links[0]) == "http://host1.example/rel/path"
    assert resolver(links[1]) == "http://other.example/abs"
    assert resolver(links[2]) == ""  # missing href -> ""
