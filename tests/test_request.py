"""M1/M2 request kernels + M7 routing + go-glob tests (request.go /
crawler.go parity)."""

import pytest

from crawl_ray.request import (
    DEFAULT_HEADERS,
    HandlerRegistry,
    Request,
    canonical_header_key,
    construct_request,
    encode_values,
    go_glob,
)
from crawl_ray.urlnorm import canonicalize, fnv1a64, fnv1a64_batch, resolve_url, url_host


# -- M2 URL resolution (request.go:104-117) -------------------------------
@pytest.mark.parametrize(
    "url,referer,expected",
    [
        ("http://a.example/x", "", "http://a.example/x"),
        ("/p/2", "http://a.example/p/1", "http://a.example/p/2"),
        ("p/2", "http://a.example/d/p/1", "http://a.example/d/p/p/2"),
        ("../up", "http://a.example/d/p/1", "http://a.example/d/up"),
        ("?q=1", "http://a.example/p/1", "http://a.example/p/1?q=1"),
        ("#frag", "http://a.example/p/1", "http://a.example/p/1#frag"),
        ("http://b.example/y", "http://a.example/", "http://b.example/y"),
        ("//b.example/y", "http://a.example/", "http://b.example/y"),
    ],
)
def test_resolve_url(url, referer, expected):
    assert resolve_url(url, referer) == expected


def test_canonicalize_drops_fragment():
    assert canonicalize("#frag", "http://a.example/p/1") == "http://a.example/p/1"
    assert canonicalize("http://a.example/p/1#z") == "http://a.example/p/1"


def test_url_host():
    assert url_host("http://host3.example:8080/p/1") == "host3.example:8080"
    assert url_host("http://host3.example/p/1") == "host3.example"


# -- url hash -------------------------------------------------------------
def test_fnv1a64_known_vectors():
    # standard FNV-1a 64 test vectors
    assert fnv1a64("") == 0xCBF29CE484222325
    assert fnv1a64("a") == 0xAF63DC4C8601EC8C
    assert fnv1a64("foobar") == 0x85944171F73967E8


def test_fnv1a64_batch_matches_scalar():
    urls = ["", "a", "foobar", "http://host1.example/p/123", "x" * 300]
    batch = fnv1a64_batch(urls)
    for i, u in enumerate(urls):
        assert int(batch[i]) == fnv1a64(u)


# -- url.Values.Encode ----------------------------------------------------
def test_encode_values_sorted_keys_escaped():
    assert encode_values({"b": ["2"], "a": ["1", "x y"]}) == "a=1&a=x+y&b=2"
    assert encode_values({}) == ""


def test_canonical_header_key():
    assert canonical_header_key("content-type") == "Content-Type"
    assert canonical_header_key("USER-AGENT") == "User-Agent"
    assert canonical_header_key("x") == "X"


# -- M1 construct (request.go:40-99) --------------------------------------
def test_construct_defaults_get():
    eff = construct_request(Request(url="http://a.example/x"))
    assert eff["method"] == "GET"
    assert eff["url"] == "http://a.example/x"
    assert eff["headers"]["User-Agent"] == DEFAULT_HEADERS["User-Agent"]
    assert eff["body"] == ""


def test_construct_form_implies_post_and_body():
    eff = construct_request(Request(url="http://a.example/x", form={"q": ["v 1"]}))
    assert eff["method"] == "POST"
    assert eff["body"] == "q=v+1"
    assert eff["headers"]["Content-Type"] == "application/x-www-form-urlencoded"


def test_construct_explicit_method_not_overridden_by_form():
    eff = construct_request(Request(url="http://a.example/x", method="PUT", form={"a": ["1"]}))
    assert eff["method"] == "PUT"


def test_construct_query_replaces_rawquery():
    eff = construct_request(Request(url="http://a.example/x?old=1", query={"b": ["2"], "a": ["1"]}))
    assert eff["url"] == "http://a.example/x?a=1&b=2"


def test_construct_referer_resolution_and_header():
    eff = construct_request(Request(url="/p/2", referer="http://a.example/p/1"))
    assert eff["url"] == "http://a.example/p/2"
    assert eff["headers"]["Referer"] == "http://a.example/p/1"


def test_construct_cookies_header():
    eff = construct_request(Request(url="http://a.example/", cookies={"s": ["1"], "t": ["2"]}))
    assert eff["headers"]["Cookie"] == "s=1; t=2"


def test_construct_user_header_beats_default():
    eff = construct_request(Request(url="http://a.example/", headers={"user-agent": "bot"}))
    assert eff["headers"]["User-Agent"] == "bot"


# -- go-glob (ryanuber/go-glob semantics) ---------------------------------
@pytest.mark.parametrize(
    "pattern,subj,expected",
    [
        ("*", "anything", True),
        ("", "", True),
        ("", "x", False),
        ("abc", "abc", True),
        ("abc", "abd", False),
        ("a*", "abc", True),
        ("a*", "bbc", False),
        ("*c", "abc", True),
        ("*c", "abd", False),
        ("a*c", "abc", True),
        ("a*c", "ac", True),
        ("a*c", "abd", False),
        ("*b*", "abc", True),
        ("*b*", "xyz", False),
        ("a**c", "abc", True),
        ("page_*", "page_movie", True),
        ("page_*", "xpage_movie", False),
    ],
)
def test_go_glob(pattern, subj, expected):
    assert go_glob(pattern, subj) is expected


# -- M7 dispatch (crawler.go:226-263) -------------------------------------
def test_registry_order_patterns_then_exact():
    reg = HandlerRegistry()
    reg.register("exact", "H_exact")
    reg.register("pat_*", "H_pat")
    assert reg.get_handlers(["pat_x", "exact"]) == ["H_pat", "H_exact"]


def test_registry_duplicate_dispatch_quirk():
    # a callback equal to the literal pattern string collects it twice
    reg = HandlerRegistry()
    reg.register("pat_*", "H_pat")
    assert reg.get_handlers(["pat_*"]) == ["H_pat", "H_pat"]


def test_registry_pattern_breaks_after_first_matching_callback():
    reg = HandlerRegistry()
    reg.register("p_*", "H")
    assert reg.get_handlers(["p_a", "p_b"]) == ["H"]  # pattern fires once


def test_registry_multiple_handlers_same_name_append():
    reg = HandlerRegistry()
    reg.register("n", "H1")
    reg.register("n", "H2")
    assert reg.get_handlers(["n"]) == ["H1", "H2"]


def test_registry_pattern_only_registered_once():
    reg = HandlerRegistry()
    reg.register("p_*", "H1")
    reg.register("p_*", "H2")  # name exists -> patterns list unchanged
    assert reg.patterns == ["p_*"]
    assert reg.get_handlers(["p_x"]) == ["H1", "H2"]


def test_registry_exact_handlers_in_callback_order():
    reg = HandlerRegistry()
    reg.register("a", "HA")
    reg.register("b", "HB")
    assert reg.get_handlers(["b", "a"]) == ["HB", "HA"]


def test_request_string():
    assert str(Request(url="http://x/")) == "GET http://x/"
    assert str(Request(url="http://x/", method="POST")) == "POST http://x/"


# -- ST1 cookie header (round 2) ---------------------------------------------


def test_cookie_header_explicit_then_jar_sorted():
    from crawl_ray.request import cookie_header

    # explicit request cookies keep request order; jar cookies follow,
    # sorted by name (the deterministic spec for crawler.go:87 +
    # request.go:69-73)
    h = cookie_header({"u": ["x1"], "b": ["2"]}, {"sid": "s", "aaa": "v"})
    assert h == "u=x1; b=2; aaa=v; sid=s"


def test_cookie_header_explicit_wins_name_conflict():
    from crawl_ray.request import cookie_header

    h = cookie_header({"sid": ["mine"]}, {"sid": "jar", "tok": "t"})
    assert h == "sid=mine; tok=t"


def test_cookie_header_multi_valued_explicit():
    from crawl_ray.request import cookie_header

    # url.Values carries multiple values per name; AddCookie sends each
    h = cookie_header({"a": ["1", "2"]}, None)
    assert h == "a=1; a=2"


def test_cookie_header_empty():
    from crawl_ray.request import cookie_header

    assert cookie_header(None, None) == ""
    assert cookie_header({}, {}) == ""


def test_construct_request_query_drops_fragment():
    """The fragment must be dropped BEFORE the query is appended —
    'p#f' + query yields 'p?a=1', never 'p#f?a=1' (where the query
    would hide inside the fragment).  Same rule as effective_fetch_key."""
    from crawl_ray.request import Request, construct_request, effective_fetch_key

    r = construct_request(
        Request(url="http://ex.com/p#frag", query={"a": ["1"]}, callbacks=[])
    )
    assert r["url"] == "http://ex.com/p?a=1"
    u, _ = effective_fetch_key("http://ex.com/p#frag", "", "", None,
                               {"a": ["1"]})
    assert u == r["url"]


def test_url_host_strips_userinfo():
    """http://a@h/ and http://b@h/ hit the same server: one token
    bucket, one robots entry, one admission shard."""
    from crawl_ray.urlnorm import url_host

    assert url_host("http://user:pw@example.com/p") == "example.com"
    assert url_host("http://user@example.com:8080/p") == "example.com:8080"


def test_construct_appends_to_explicit_cookie_header():
    """net/http AddCookie APPENDS (request.go:69-73): an explicit
    Cookie header plus the cookies map sends both."""
    r = Request(url="http://h.example/p", headers={"Cookie": "a=1"},
                cookies={"b": ["2"]})
    out = construct_request(r)
    assert out["headers"]["Cookie"] == "a=1; b=2"


def test_merge_default_headers_empty_dict_means_none():
    """default_headers={} must mean NO defaults (the pre-middleware
    construct call relies on it), not fall back to DEFAULT_HEADERS."""
    from crawl_ray.request import merge_default_headers

    h: dict = {}
    merge_default_headers(h, {})
    assert h == {}
    merge_default_headers(h)  # None → the real defaults
    assert "User-Agent" in h


def test_apply_cookie_header_preserves_prior():
    from crawl_ray.request import apply_cookie_header

    out = apply_cookie_header({"cookie": "a=1"}, {"b": ["2"]}, {"c": "3"})
    assert out == {"Cookie": "a=1; b=2; c=3"}
    # nothing to add → the ORIGINAL dict comes back untouched
    base = {"Cookie": "a=1"}
    assert apply_cookie_header(base, {}, None) is base
