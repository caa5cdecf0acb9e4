"""GetHTMLElement / ModifyHTMLElement / PutHTMLElement analogs
(stages/html.py) — selector subset, explode, rewrite, insert."""

import pyarrow as pa

from nifi_ray.stages.html import (
    get_html_element,
    modify_html_element,
    parse_html,
    put_html_element,
    select,
)

DOC = (
    '<div id="main" class="wrap outer">'
    '<p class="lead">hello <b>world</b></p>'
    '<p data-x="1">second</p>'
    '<a href="http://a">A</a><a href="http://b" class="lead">B</a>'
    "</div>"
)


def test_selector_kinds():
    root = parse_html(DOC)
    assert [n.tag for n in select(root, "p")] == ["p", "p"]
    assert [n.tag for n in select(root, "#main")] == ["div"]
    assert len(select(root, ".lead")) == 2
    assert [n.tag for n in select(root, "a.lead")] == ["a"]
    assert [n.attrs["data-x"] for n in select(root, "[data-x]")] == ["1"]
    assert [n.tag for n in select(root, '[href="http://b"]')] == ["a"]
    assert [n.tag for n in select(root, "div b")] == ["b"]
    assert select(root, "span") == []


def test_get_explodes_with_keep_cols():
    batch = pa.table({"doc_id": [10, 11], "html": [DOC, "<p>only</p>"]})
    fn = get_html_element("html", "p", out="txt", keep_cols=["doc_id"])
    out = fn(batch)
    assert out["doc_id"].to_pylist() == [10, 10, 11]
    assert out["txt"].to_pylist() == ["hello world", "second", "only"]


def test_get_attr_and_html_kinds():
    batch = pa.table({"html": [DOC]})
    hrefs = get_html_element("html", "a", kind="attr:href")(batch)
    assert hrefs["element"].to_pylist() == ["http://a", "http://b"]
    outer = get_html_element("html", "p.lead", kind="html")(batch)
    assert outer["element"].to_pylist() == ['<p class="lead">hello <b>world</b></p>']


def test_modify_text_and_attr():
    batch = pa.table({"html": [DOC]})
    out = modify_html_element("html", "p.lead", "text", "replaced")(batch)
    assert "replaced" in out["html"].to_pylist()[0]
    assert "<b>world</b>" not in out["html"].to_pylist()[0]
    out2 = modify_html_element("html", "a", "attr:href", "X")(batch)
    assert out2["html"].to_pylist()[0].count('href="X"') == 2


def test_put_appends_fragment():
    batch = pa.table({"html": ['<ul id="l"><li>a</li></ul>']})
    out = put_html_element("html", "#l", "<li>b</li>")(batch)
    assert "<li>a</li>" in out["html"].to_pylist()[0]
    assert out["html"].to_pylist()[0].index("<li>a</li>") < out["html"].to_pylist()[0].index("<li>b</li>")


def test_null_and_no_match_rows():
    batch = pa.table({"doc_id": [1, 2], "html": [None, "<p>x</p>"]})
    out = get_html_element("html", "div", keep_cols=["doc_id"])(batch)
    assert out.num_rows == 0  # REL_NOT_FOUND ≡ zero rows
    out2 = modify_html_element("html", "p", "text", "y")(batch)
    assert out2["html"].to_pylist()[0] is None
