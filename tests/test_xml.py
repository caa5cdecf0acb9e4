"""XML family unit tests (EvaluateXPath / SplitXml / ValidateXml /
TransformXml analogs; reference STD/EvaluateXPath.java, SplitXml.java,
ValidateXml.java, TransformXml.java — semantics, not implementation)."""

import pyarrow as pa
import pytest

from nifi_ray.stages.xml import (
    evaluate_xpath,
    rows_to_xml,
    split_xml,
    transform_xml,
    validate_xml,
    xslt_transform,
)

DOC = "<r><name>ada</name><n>7</n><tags><t>x</t><t>y</t></tags></r>"


def test_evaluate_xpath_extract_and_types():
    t = pa.table({"xml": [DOC, "<r><name>bob</name></r>", "not xml", None]})
    out = evaluate_xpath(
        "xml", {"name": "name", "n": "n", "deep": ".//t"}, types={"n": pa.int64()}
    )(t)
    assert out["name"].to_pylist() == ["ada", "bob", None, None]
    assert out["n"].to_pylist() == [7, None, None, None]
    assert out["deep"].to_pylist() == ["x", None, None, None]


def test_split_xml_fragments():
    t = pa.table({"id": [1, 2], "xml": [DOC, "<r/>"]})
    out = split_xml("xml")(t)
    # 3 children of DOC's root, none for <r/>
    assert out["id"].to_pylist() == [1, 1, 1]
    assert out["fragment_index"].to_pylist() == [0, 1, 2]
    assert out["fragment_count"].to_pylist() == [3, 3, 3]
    assert out["element"].to_pylist()[0] == "<name>ada</name>"


def test_validate_xml():
    t = pa.table({"xml": [DOC, "<r><broken>", None, "<r/>"]})
    out = validate_xml("xml", required=["name"])(t)
    assert out["xml_valid"].to_pylist() == [True, False, False, False]
    out2 = validate_xml("xml")(t)
    assert out2["xml_valid"].to_pylist() == [True, False, False, True]


def test_transform_xml_rename_strip_and_xslt_stub():
    t = pa.table({"xml": [DOC]})
    out = transform_xml("xml", rename={"name": "who"}, strip=["tags"])(t)
    assert out["xml"].to_pylist() == ["<r><who>ada</who><n>7</n></r>"]
    with pytest.raises(NotImplementedError):
        xslt_transform("xml")


def test_rows_to_xml_roundtrip():
    t = pa.table({"a": ["x <&>", None], "b": [1.5, 2.0]})
    out = rows_to_xml(["a", "b"])(t)
    parsed = evaluate_xpath("xml", {"a2": "a", "b2": "b"}, types={"b2": pa.float64()})(out)
    assert parsed["a2"].to_pylist() == ["x <&>", ""]
    assert parsed["b2"].to_pylist() == [1.5, 2.0]
