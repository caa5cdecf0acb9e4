"""EvaluateXQuery subset (nifi_ray/stages/xquery.py; reference
STD/EvaluateXQuery.java, TestEvaluateXQuery.java)."""

import pyarrow as pa
import pytest

from nifi_ray.stages.xquery import XQuery, evaluate_xquery, xquery_explode

DOC = """<library loc="x">
  <book id="1"><title>Alpha</title><price>9.5</price><author>Ann</author></book>
  <book id="2"><title>Beta</title><price>12</price><author>Bob</author></book>
  <book id="3"><title>Gamma</title><price>3</price><author>Ann</author></book>
</library>"""


@pytest.mark.parametrize(
    "query,expected",
    [
        ("//book/title/text()", ["Alpha", "Beta", "Gamma"]),
        ("/library/book[@id='2']/title/text()", ["Beta"]),
        ("count(//book)", ["3"]),
        (
            "for $b in //book where $b/price > 5 "
            "order by $b/price descending return string($b/title)",
            ["Beta", "Alpha"],
        ),
        (
            "for $b in //book where $b/author = 'Ann' "
            "return concat($b/title, ':', $b/@id)",
            ["Alpha:1", "Gamma:3"],
        ),
        ("let $p := //book/price return sum($p)", ["24.5"]),
        ("for $b in //book let $t := $b/title return string-length($t)", ["5", "4", "5"]),
        ("string-join(//book/@id, ',')", ["1,2,3"]),
        ("//book[price='12']/author/text()", ["Bob"]),
        (
            "for $b in //book where contains($b/title, 'a') and $b/price < 10 "
            "return string($b/title)",
            ["Alpha", "Gamma"],
        ),
        ("normalize-space('  a   b ')", ["a b"]),
        ("for $b in //book return $b/price div 2", ["4.75", "6", "1.5"]),
        ("//library/@loc", ["x"]),
        ("substring('hello', 2, 3)", ["ell"]),
        ("for $b in //book where not($b/author = 'Ann') return name($b)", ["book"]),
        ("//book[1]/title/text()", ["Alpha"]),
        ("data(//book/@id)", ["1", "2", "3"]),
    ],
)
def test_xquery_cases(query, expected):
    assert XQuery(query)(DOC) == expected


def test_element_result_serializes():
    (item,) = XQuery("//book[@id='2']")(DOC)
    assert item.startswith('<book id="2">') and "<title>Beta</title>" in item


def test_invalid_and_empty_docs():
    xq = XQuery("//a/text()")
    assert xq("<not xml") is None
    assert xq(None) is None
    assert xq("<a/>") == []  # parses, no text nodes


def test_unbound_variable_and_bad_syntax():
    with pytest.raises(ValueError):
        XQuery("return $x")(DOC)
    with pytest.raises(ValueError):
        XQuery("for $b in //book")  # missing return


def test_evaluate_xquery_stage():
    batch = pa.table(
        {
            "xml": [DOC, "<library/>", None, "<broken"],
            "k": [1, 2, 3, 4],
        }
    )
    fn = evaluate_xquery(
        "xml",
        {
            "first_title": "//book/title/text()",
            "n_books": "count(//book)",
        },
    )
    out = fn(batch)
    assert out["first_title"].to_pylist() == ["Alpha", None, None, None]
    assert out["n_books"].to_pylist() == ["3", "0", None, None]
    # mode=all keeps every item
    out2 = evaluate_xquery("xml", {"titles": "//book/title/text()"}, mode="all")(batch)
    assert out2["titles"].to_pylist() == [["Alpha", "Beta", "Gamma"], None, None, None]


def test_xquery_explode_fragment_contract():
    batch = pa.table({"xml": [DOC, "<library/>"], "src": ["a", "b"]})
    out = xquery_explode(
        "xml",
        "for $b in //book return concat($b/@id, '-', $b/title)",
        out="item",
        keep_cols=["src"],
    )(batch)
    assert out["item"].to_pylist() == ["1-Alpha", "2-Beta", "3-Gamma"]
    assert out["src"].to_pylist() == ["a", "a", "a"]
    assert out["fragment_index"].to_pylist() == [0, 1, 2]
    assert out["fragment_count"].to_pylist() == [3, 3, 3]
