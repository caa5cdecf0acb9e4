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
    strip (remove) tags. For the stylesheet form of NiFi's TransformXml
    use ``xslt_transform`` (XSLT 1.0 subset interpreter below)."""
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


_XSL = "{http://www.w3.org/1999/XSL/Transform}"


class _Xslt:
    """XSLT 1.0 subset interpreter (TransformXml's stylesheet form,
    reference STD/TransformXml.java — javax XSLT there; here the
    constructs real NiFi flows use): ``template match`` (``/``, tag,
    ``parent/child``, ``*``), ``apply-templates [select]``,
    ``value-of`` (path, ``@attr``, ``.``), ``for-each``, ``if test``
    (existence, ``path='v'``, ``@attr='v'``), ``choose/when/otherwise``,
    ``element/attribute``, ``text``, ``copy-of select='.'``, literal
    result elements with ``{path}`` attribute value templates, and the
    built-in rules (elements recurse, text copies). Full XSLT (keys,
    xpath axes, numbering) still wants lxml in production."""

    def __init__(self, stylesheet: str):
        import xml.etree.ElementTree as ET

        self.ET = ET
        sheet = ET.fromstring(stylesheet)
        self.templates = []  # (match, node)
        for t in sheet.findall(f"{_XSL}template"):
            self.templates.append((t.get("match", ""), t))

    # ---- node selection / tests
    def _select(self, ctx, path):
        if path in (".", ""):
            return [ctx]
        if path == "/":
            return [ctx]
        out = [ctx]
        for step in path.split("/"):
            nxt = []
            for n in out:
                if step == "*":
                    nxt.extend(list(n))
                else:
                    nxt.extend(n.findall(step))
            out = nxt
        return out

    def _string(self, ctx, sel):
        if sel.startswith("@"):
            return ctx.get(sel[1:], "")
        if sel in (".", "text()"):
            return "".join(ctx.itertext())
        nodes = self._select(ctx, sel)
        return "".join(nodes[0].itertext()) if nodes else ""

    def _test(self, ctx, expr):
        if "=" in expr:
            lhs, rhs = expr.split("=", 1)
            return self._string(ctx, lhs.strip()) == rhs.strip().strip("'\"")
        if expr.startswith("@"):
            return ctx.get(expr[1:]) is not None
        return bool(self._select(ctx, expr.strip())) if expr.strip() not in (".",) else True

    def _match(self, node, pattern, is_root):
        if pattern == "/":
            return is_root
        if pattern == "*":
            return True
        if "/" in pattern:
            return pattern.split("/")[-1] in (node.tag, "*")
        return node.tag == pattern

    def _best_template(self, node, is_root=False):
        exact, star = None, None
        for pat, t in self.templates:
            if self._match(node, pat, is_root):
                if pat in (node.tag,) or "/" in pat or pat == "/":
                    exact = exact or t
                elif pat == "*":
                    star = star or t
        return exact or star

    # ---- instantiation
    def _avt(self, ctx, value):
        import re

        return re.sub(r"\{([^}]+)\}", lambda m: self._string(ctx, m.group(1)), value)

    def _instantiate(self, body, ctx, parent):
        ET = self.ET
        if body.text and body.text.strip():
            self._append_text(parent, body.text)
        for child in body:
            tag = child.tag
            if tag == f"{_XSL}value-of":
                txt = self._string(ctx, child.get("select", "."))
                self._append_text(parent, txt)
            elif tag == f"{_XSL}text":
                self._append_text(parent, child.text or "")
            elif tag == f"{_XSL}apply-templates":
                sel = child.get("select")
                targets = self._select(ctx, sel) if sel else list(ctx)
                for t in targets:
                    self._apply(t, parent)
            elif tag == f"{_XSL}for-each":
                for t in self._select(ctx, child.get("select", ".")):
                    self._instantiate(child, t, parent)
            elif tag == f"{_XSL}if":
                if self._test(ctx, child.get("test", "")):
                    self._instantiate(child, ctx, parent)
            elif tag == f"{_XSL}choose":
                done = False
                for when in child.findall(f"{_XSL}when"):
                    if self._test(ctx, when.get("test", "")):
                        self._instantiate(when, ctx, parent)
                        done = True
                        break
                if not done:
                    oth = child.find(f"{_XSL}otherwise")
                    if oth is not None:
                        self._instantiate(oth, ctx, parent)
            elif tag == f"{_XSL}element":
                el = ET.SubElement(parent, self._avt(ctx, child.get("name")))
                self._instantiate(child, ctx, el)
            elif tag == f"{_XSL}attribute":
                tmp = ET.Element("t")
                self._instantiate(child, ctx, tmp)
                parent.set(self._avt(ctx, child.get("name")), "".join(tmp.itertext()))
            elif tag == f"{_XSL}copy-of":
                for t in self._select(ctx, child.get("select", ".")):
                    parent.append(self._deep_copy(t))
            elif tag.startswith(_XSL):
                continue  # unsupported instruction: skip, stay total
            else:  # literal result element
                el = ET.SubElement(
                    parent, tag, {k: self._avt(ctx, v) for k, v in child.attrib.items()}
                )
                self._instantiate(child, ctx, el)
            if child.tail and child.tail.strip():
                self._append_text(parent, child.tail)

    def _deep_copy(self, node):
        import copy

        return copy.deepcopy(node)

    def _append_text(self, parent, txt):
        kids = list(parent)
        if kids:
            kids[-1].tail = (kids[-1].tail or "") + txt
        else:
            parent.text = (parent.text or "") + txt

    def _apply(self, node, parent):
        t = self._best_template(node)
        if t is not None:
            self._instantiate(t, node, parent)
        else:  # built-in rule: recurse into children, copy text
            if node.text and node.text.strip():
                self._append_text(parent, node.text)
            for c in node:
                self._apply(c, parent)
                if c.tail and c.tail.strip():
                    self._append_text(parent, c.tail)

    def __call__(self, doc: str) -> str | None:
        ET = self.ET
        root = _parse(doc)
        if root is None:
            return None
        out = ET.Element("_result")
        t = self._best_template(root, is_root=True)
        if t is not None:
            self._instantiate(t, root, out)
        else:
            self._apply(root, out)
        inner = (out.text or "") + "".join(
            ET.tostring(c, encoding="unicode") for c in out
        )
        return inner


def xslt_transform(col: str, stylesheet: str, out: str | None = None):
    """map_batches body: apply the XSLT-subset stylesheet to each XML
    document (one compiled ``_Xslt`` per call — reuse across batches by
    passing this callable to map_batches once)."""
    xf = _Xslt(stylesheet)
    out_col = out or col

    def fn(batch: pa.Table) -> pa.Table:
        res = [xf(t) if t is not None else None for t in batch[col].to_pylist()]
        arr = pa.array(res, pa.string())
        if out_col in batch.schema.names:
            return batch.set_column(batch.schema.get_field_index(out_col), out_col, arr)
        return batch.append_column(out_col, arr)

    return fn


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
