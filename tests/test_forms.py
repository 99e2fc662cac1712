"""F10 form-scraping tests (forms/forms.go parity)."""

from crawl_ray.dom import parse_html
from crawl_ray.functions.forms import new_selector

FORM_DOC = parse_html(
    b"""<html><body>
<form action="/submit" id="f1">
  <input name="q" value="hello">
  <input type="submit" name="go" value="Go">
  <input type="reset" name="r" value="Reset">
  <input type="checkbox" name="c1" value="1" checked="checked">
  <input type="checkbox" name="c2" value="2">
  <input type="radio" name="r1" value="a">
  <input type="radio" name="r1" value="b" checked="checked">
  <select name="s1">
    <option value="x">X</option>
    <option value="y" selected="selected">Y opt</option>
    <option value="z" selected="selected">Z</option>
  </select>
  <select name="s2"><option value="only">Only</option></select>
  <select><option value="noname" selected="selected">N</option></select>
</form>
<form action="/other" id="f2"><input name="o" value="1"></form>
</body></html>"""
)


def test_action_from_first_match():
    form = new_selector(FORM_DOC, "form")
    assert form.action == "/submit"


def test_action_by_id():
    form = new_selector(FORM_DOC, "#f2")
    assert form.action == "/other"
    assert form.values == {"o": ["1"]}


def test_default_values():
    form = new_selector(FORM_DOC, "#f1")
    assert form.values["q"] == ["hello"]
    assert "go" not in form.values  # submit excluded
    assert "r" not in form.values  # reset excluded
    assert form.values["c1"] == ["1"]  # checked checkbox
    assert "c2" not in form.values  # unchecked checkbox
    assert form.values["r1"] == ["b"]  # checked radio only
    assert form.values["s1"] == ["y"]  # first selected option
    assert form.values["s2"] == [""]  # no selected option -> ""
    # select without a name is skipped entirely (forms.go:106-109)
    assert "" not in form.values or form.values.get("") != ["noname"]


def test_select_by_option_text():
    form = new_selector(FORM_DOC, "#f1")
    form.select("s1", "Y opt")
    assert form.values["s1"] == ["y"]
    form.select("s1", "X")
    assert form.values["s1"] == ["x"]
    form.select("s1", "Nope")  # no match -> unchanged
    assert form.values["s1"] == ["x"]


def test_missing_action_is_empty():
    doc = parse_html(b"<form id='f'><input name='a' value='1'></form>")
    form = new_selector(doc, "#f")
    assert form.action == ""
    assert form.values == {"a": ["1"]}


def test_no_matching_form():
    form = new_selector(FORM_DOC, "#nope")
    assert form.action == ""
    assert form.values == {}
