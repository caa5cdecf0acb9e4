"""XML family — EvaluateXPath / SplitXml / ValidateXml / TransformXml
analogs (reference nifi-standard-processors/.../standard/EvaluateXPath.java,
SplitXml.java:355, ValidateXml.java:155, TransformXml.java:286).

Built on the stdlib ElementTree: its XPath subset (tag paths, ``.//``
descendants, ``[@attr]`` / ``[tag='text']`` predicates, indexing) covers
the common extract patterns; full XPath 1.0/XSLT would need lxml, which
this container lacks — ``transform_xml`` therefore implements the
declarative rename/strip subset and raises for stylesheet input
(documented stub, same policy as stages/multimodal.py).

XML parse is inherently per-document (no vectorized kernel exists);
these are actor-pool-friendly bodies where the per-batch Python loop IS
the operator — the 100 TB shape is many small parses fanned across
workers, not a vector op.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _parse(text: str | None):
    import xml.etree.ElementTree as ET

    if not text:
        return None
    try:
        return ET.fromstring(text)
    except ET.ParseError:
        return None


def evaluate_xpath(col: str, paths: dict[str, str], types: dict[str, pa.DataType] | None = None):
    """map_batches body: per output column, the TEXT of the first
    element matching its ElementTree-XPath (None on no match / parse
    error — NiFi routes those to 'unmatched'/'failure'; here downstream
    filters on null). types: optional Arrow cast per output."""
    types = types or {}

    def fn(batch: pa.Table) -> pa.Table:
        outs: dict[str, list] = {k: [] for k in paths}
        for text in batch[col].to_pylist():
            root = _parse(text)
            for out, xp in paths.items():
                if root is None:
                    outs[out].append(None)
                    continue
                el = root.find(xp) if xp not in (".", "") else root
                outs[out].append(None if el is None else (el.text or ""))
        for out in paths:
            arr = pa.array(outs[out], pa.string())
            t = types.get(out)
            if t is not None:
                arr = arr.cast(t)
            batch = batch.append_column(out, arr)
        return batch

    return fn


def split_xml(col: str, out: str = "element", keep_cols: list[str] | None = None):
    """map_batches body: SplitXml at depth 1 — one output row per child
    element of the root, re-serialized, with NiFi's fragment.* contract
    (fragment_index/fragment_count) for a later defragment."""
    import xml.etree.ElementTree as ET

    def fn(batch: pa.Table) -> pa.Table:
        cols = keep_cols or [c for c in batch.schema.names if c != col]
        parent_idx: list[int] = []
        pieces: list[str] = []
        frag_index: list[int] = []
        frag_count: list[int] = []
        for i, text in enumerate(batch[col].to_pylist()):
            root = _parse(text)
            children = list(root) if root is not None else []
            for j, child in enumerate(children):
                parent_idx.append(i)
                pieces.append(ET.tostring(child, encoding="unicode"))
                frag_index.append(j)
                frag_count.append(len(children))
        base = batch.select(cols).take(pa.array(parent_idx, pa.int64()))
        base = base.append_column(out, pa.array(pieces, pa.string()))
        base = base.append_column("fragment_index", pa.array(frag_index, pa.int32()))
        return base.append_column("fragment_count", pa.array(frag_count, pa.int32()))

    return fn


def validate_xml(col: str, out: str = "xml_valid", required: list[str] | None = None):
    """map_batches body: well-formedness check (+ optional required
    element paths), boolean column → route valid/invalid. NiFi's
    ValidateXml checks against an XSD; schema-library validation is out
    of scope here (no XSD engine in the stdlib), so this is the
    well-formed + required-paths subset."""

    def fn(batch: pa.Table) -> pa.Table:
        flags = []
        for text in batch[col].to_pylist():
            root = _parse(text)
            ok = root is not None
            if ok and required:
                ok = all(root.find(p) is not None for p in required)
            flags.append(ok)
        return batch.append_column(out, pa.array(flags, pa.bool_()))

    return fn


def transform_xml(
    col: str,
    rename: dict[str, str] | None = None,
    strip: list[str] | None = None,
    out: str | None = None,
):
    """map_batches body: declarative XML→XML transform — rename tags,
    strip (remove) tags. The XSLT-stylesheet form of NiFi's TransformXml
    needs lxml and raises NotImplementedError via ``xslt_transform``."""
    import xml.etree.ElementTree as ET

    rename = rename or {}
    strip_set = set(strip or [])
    out = out or col

    def walk(el):
        for child in list(el):
            if child.tag in strip_set:
                el.remove(child)
            else:
                walk(child)
        if el.tag in rename:
            el.tag = rename[el.tag]

    def fn(batch: pa.Table) -> pa.Table:
        res = []
        for text in batch[col].to_pylist():
            root = _parse(text)
            if root is None:
                res.append(None)
                continue
            walk(root)
            res.append(ET.tostring(root, encoding="unicode"))
        arr = pa.array(res, pa.string())
        if out in batch.schema.names:
            return batch.set_column(batch.schema.get_field_index(out), out, arr)
        return batch.append_column(out, arr)

    return fn


def xslt_transform(*_a, **_k):
    raise NotImplementedError(
        "XSLT requires lxml, which is not in this container; use "
        "transform_xml's rename/strip subset or swap in lxml.etree.XSLT "
        "in production"
    )


def rows_to_xml(cols: list[str], root_tag: str = "record", out: str = "xml"):
    """map_batches body: AttributesToXML analog — serialize the given
    columns of each row into a small XML document (the inverse of
    evaluate_xpath, used to round-trip-test the XML path)."""
    from xml.sax.saxutils import escape

    def fn(batch: pa.Table) -> pa.Table:
        parts_per_col = [
            [
                f"<{c}>{escape('' if v is None else str(v))}</{c}>"
                for v in batch[c].to_pylist()
            ]
            for c in cols
        ]
        docs = [
            f"<{root_tag}>" + "".join(p[i] for p in parts_per_col) + f"</{root_tag}>"
            for i in range(batch.num_rows)
        ]
        return batch.append_column(out, pa.array(docs, pa.string()))

    return fn
