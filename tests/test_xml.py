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


def test_transform_xml_rename_strip(  ):
    t = pa.table({"xml": [DOC]})
    out = transform_xml("xml", rename={"name": "who"}, strip=["tags"])(t)
    assert out["xml"].to_pylist() == ["<r><who>ada</who><n>7</n></r>"]


def test_rows_to_xml_roundtrip():
    t = pa.table({"a": ["x <&>", None], "b": [1.5, 2.0]})
    out = rows_to_xml(["a", "b"])(t)
    parsed = evaluate_xpath("xml", {"a2": "a", "b2": "b"}, types={"b2": pa.float64()})(out)
    assert parsed["a2"].to_pylist() == ["x <&>", ""]
    assert parsed["b2"].to_pylist() == [1.5, 2.0]


SHEET = """
<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
  <xsl:template match="/">
    <report id="{@gen}">
      <xsl:apply-templates select="order"/>
    </report>
  </xsl:template>
  <xsl:template match="order">
    <line sku="{item/sku}">
      <xsl:attribute name="status">
        <xsl:choose>
          <xsl:when test="@qty='0'">empty</xsl:when>
          <xsl:otherwise>ok</xsl:otherwise>
        </xsl:choose>
      </xsl:attribute>
      <xsl:value-of select="item/name"/>
      <xsl:if test="note"> (<xsl:value-of select="note"/>)</xsl:if>
    </line>
  </xsl:template>
</xsl:stylesheet>
"""

XSLT_DOC = (
    '<orders gen="g7">'
    '<order qty="2"><item><sku>A1</sku><name>widget</name></item><note>rush</note></order>'
    '<order qty="0"><item><sku>B2</sku><name>gadget</name></item></order>'
    "</orders>"
)


def test_xslt_subset_transform():
    import pyarrow as pa

    from nifi_ray.stages.xml import xslt_transform

    out = xslt_transform("doc", SHEET, out="res")(pa.table({"doc": [XSLT_DOC, None]}))
    got = out["res"].to_pylist()
    assert got[1] is None
    assert got[0] == (
        '<report id="g7">'
        '<line sku="A1" status="ok">widget (rush)</line>'
        '<line sku="B2" status="empty">gadget</line>'
        "</report>"
    )


def test_xslt_builtin_rules_and_foreach():
    import pyarrow as pa

    from nifi_ray.stages.xml import xslt_transform

    # no template matches the root → built-in rules copy text through
    sheet = """
    <xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:template match="b"><B><xsl:value-of select="."/></B></xsl:template>
    </xsl:stylesheet>"""
    out = xslt_transform("doc", sheet)(
        pa.table({"doc": ["<a>pre<b>one</b>mid<b>two</b></a>"]})
    )
    assert out["doc"].to_pylist() == ["pre<B>one</B>mid<B>two</B>"]

    sheet2 = """
    <xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:template match="/">
        <ul><xsl:for-each select="i"><li><xsl:value-of select="@v"/></li></xsl:for-each></ul>
      </xsl:template>
    </xsl:stylesheet>"""
    out2 = xslt_transform("doc", sheet2)(
        pa.table({"doc": ['<l><i v="1"/><i v="2"/><i v="3"/></l>']})
    )
    assert out2["doc"].to_pylist() == ["<ul><li>1</li><li>2</li><li>3</li></ul>"]
