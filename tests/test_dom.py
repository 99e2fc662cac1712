"""DOM parser + selector engine tests (goquery/net/html parity subset)."""

from crawl_ray.dom import find, parse_html

DOC = b"""<html><head><title>T1-2</title></head><body>
<h1 class="header big">Page 2 on host1</h1>
<p class="c2" id="para">  lorem2   ipsum\t14\n dolor </p>
<span data-price="x"> 2,4 </span>
<ul><li><a href="/p/3">anchor 0</a></li><li><a href="http://host9.example/p/7">anchor 1</a></li></ul>
<table class="chart"><tr><td class="titleColumn"><a href="/m/1">M1</a></td></tr></table>
<form action="/submit2" id="f"><input name="q" value="v2">
<input type="checkbox" name="c" value="1" checked="checked">
<select name="s"><option value="a">A</option><option value="b" selected="selected">B</option></select></form>
<script>var x = 2;</script>
</body></html>"""


def test_parse_basic_structure():
    root = parse_html(DOC)
    assert len(find(root, "html")) == 1
    assert len(find(root, "li")) == 2
    assert len(find(root, "ul li a")) == 2
    assert len(find(root, "table.chart td.titleColumn a")) == 1


def test_text_includes_script_and_title():
    root = parse_html(DOC)
    body_text = find(root, "html")[0].text()
    assert "T1-2" in body_text  # head/title text included
    assert "var x = 2;" in body_text  # script raw text included
    assert "lorem2" in body_text


def test_class_id_attr_selectors():
    root = parse_html(DOC)
    assert find(root, ".header")[0].tag == "h1"
    assert find(root, "h1.big")[0].tag == "h1"
    assert find(root, "#para")[0].tag == "p"
    assert find(root, "[data-price]")[0].tag == "span"
    assert find(root, "[data-price=x]")[0].tag == "span"
    assert find(root, "span[data-price='x']")[0].tag == "span"
    assert find(root, "input[type=checkbox]")[0].attrs["name"] == "c"


def test_child_combinator_and_groups():
    root = parse_html(DOC)
    assert len(find(root, "ul > li")) == 2
    assert len(find(root, "body > li")) == 0
    assert len(find(root, "h1, p")) == 2


def test_nth_of_type():
    root = parse_html(b"<div><span>a</span><b>x</b><span>b</span></div>")
    assert find(root, "span:nth-of-type(1)")[0].text() == "a"
    assert find(root, "span:nth-of-type(2)")[0].text() == "b"
    assert find(root, "span:first-child")[0].text() == "a"


def test_void_elements_do_not_nest():
    root = parse_html(b"<form><input name=a><input name=b></form>")
    inputs = find(root, "form input")
    assert [i.attrs["name"] for i in inputs] == ["a", "b"]
    assert all(i.parent.tag == "form" for i in inputs)


def test_autoclose_li_and_p():
    root = parse_html(b"<ul><li>one<li>two</ul><p>x<p>y")
    lis = find(root, "li")
    assert [li.text() for li in lis] == ["one", "two"]
    ps = find(root, "p")
    assert [p.text() for p in ps] == ["x", "y"]


def test_duplicate_attr_keeps_first():
    root = parse_html(b'<a href="/first" href="/second">x</a>')
    assert find(root, "a")[0].attrs["href"] == "/first"


def test_entities_decoded_outside_script():
    root = parse_html(b"<p>a &amp; b</p><script>c &amp; d</script>")
    assert find(root, "p")[0].text() == "a & b"
    assert find(root, "script")[0].text() == "c &amp; d"  # raw-text element


def test_find_descendants_only_dedup_doc_order():
    root = parse_html(b"<div id=a><div id=b><span>1</span></div><span>2</span></div>")
    divs = find(root, "div")
    spans = find(divs, "span")  # both anchors; inner span reachable twice
    assert [s.text() for s in spans] == ["1", "2"]


def test_find_does_not_match_self():
    root = parse_html(b"<div id=a><div id=b></div></div>")
    outer = find(root, "#a")[0]
    assert [n.attrs.get("id") for n in find(outer, "div")] == ["b"]


def test_stray_end_tag_ignored():
    root = parse_html(b"<div></span><p>x</p></div>")
    assert find(root, "div p")[0].text() == "x"


def test_descendant_combinator_backtracks():
    """'X > Y Z' must try every Y-ancestor of Z, not just the nearest:
    here only the OUTER <ul> is the child of <div>."""
    from crawl_ray.dom import find, parse_html

    root = parse_html("<div><ul><ul><a href=x>t</a></ul></ul></div>")
    assert [n.tag for n in find(root, "div > ul a")] == ["a"]
    # control: an impossible chain still rejects
    assert not find(root, "a > ul div")


def test_selector_tag_case_insensitive():
    from crawl_ray.dom import find, parse_html

    root = parse_html("<div><A href=x>t</A></div>")
    assert [n.tag for n in find(root, "DIV")] == ["div"]
    assert [n.tag for n in find(root, "A")] == ["a"]


def test_selector_comma_inside_quoted_attr():
    from crawl_ray.dom import find, parse_html

    root = parse_html('<a title="x,y">t</a><b title="z">u</b>')
    assert [n.tag for n in find(root, 'a[title="x,y"], b[title="z"]')] == [
        "a", "b"
    ]
