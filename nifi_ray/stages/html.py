"""HTML element stages — GetHTMLElement / ModifyHTMLElement /
PutHTMLElement analogs (reference nifi-html-bundle/.../html/
GetHTMLElement.java, ModifyHTMLElement.java, PutHTMLElement.java —
jsoup-backed there; here a stdlib ``html.parser`` DOM with the CSS
subset those flows actually use: ``tag``, ``#id``, ``.class``,
``tag.class``, ``[attr]``, ``[attr=value]`` and the descendant
combinator ``a b``).

All three are plain ``map_batches`` bodies (stateless, vectorized
across the batch's rows; per-document parsing is inherent, exactly as
the reference parses per FlowFile). GetHTMLElement explodes one output
row per match with the source row's kept columns replicated —
REL_NOT_FOUND becomes "zero rows for that input", countable upstream
by comparing row ids.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pyarrow as pa

_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _Node:
    __slots__ = ("tag", "attrs", "children", "text", "parent")

    def __init__(self, tag: str, attrs: dict, parent):
        self.tag, self.attrs, self.parent = tag, attrs, parent
        self.children: list[_Node] = []
        self.text: list[str] = []

    def all_text(self) -> str:
        out = list(self.text)
        for c in self.children:
            out.append(c.all_text())
        return "".join(out)

    def outer_html(self) -> str:
        a = "".join(
            f' {k}="{v}"' if v is not None else f" {k}" for k, v in self.attrs.items()
        )
        if self.tag in _VOID:
            return f"<{self.tag}{a}/>"
        return f"<{self.tag}{a}>{self.inner_html()}</{self.tag}>"

    def inner_html(self) -> str:
        parts = list(self.text[:1])
        for i, c in enumerate(self.children):
            parts.append(c.outer_html())
            if i + 1 < len(self.text):
                parts.append(self.text[i + 1])
        parts.extend(self.text[len(self.children) + 1 :])
        return "".join(parts)

    def walk(self):
        yield self
        for c in self.children:
            yield from c.walk()


class _DomParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {}, None)
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, dict(attrs), self.cur)
        self.cur.children.append(node)
        node.parent = self.cur
        if tag not in _VOID:
            self.cur = node

    def handle_startendtag(self, tag, attrs):
        self.cur.children.append(_Node(tag, dict(attrs), self.cur))

    def handle_endtag(self, tag):
        n = self.cur
        while n is not self.root and n.tag != tag:
            n = n.parent
        if n is not self.root:
            self.cur = n.parent

    def handle_data(self, data):
        # interleave: text slot i precedes child i+1 (good enough for
        # inner_html round-trips of machine-built docs)
        while len(self.cur.text) <= len(self.cur.children):
            self.cur.text.append("")
        self.cur.text[-1] += data


def parse_html(doc: str) -> _Node:
    p = _DomParser()
    p.feed(doc or "")
    return p.root


def _match_simple(node: _Node, sel: str) -> bool:
    """tag / #id / .class / tag.class / [attr] / [attr=value] combos."""
    import re

    for part in re.findall(r"#[\w-]+|\.[\w-]+|\[[^\]]+\]|[\w-]+", sel):
        if part.startswith("#"):
            if node.attrs.get("id") != part[1:]:
                return False
        elif part.startswith("."):
            if part[1:] not in (node.attrs.get("class") or "").split():
                return False
        elif part.startswith("["):
            inner = part[1:-1]
            k, eq, v = inner.partition("=")
            if k not in node.attrs:
                return False
            if eq and (node.attrs.get(k) or "") != v.strip("'\""):
                return False
        else:
            if node.tag != part:
                return False
    return True


def select(root: _Node, selector: str) -> list[_Node]:
    """Descendant-combinator chain of simple selectors."""
    parts = selector.split()
    frontier = [root]
    for i, part in enumerate(parts):
        nxt = []
        for f in frontier:
            for n in f.walk():
                if n is f and i > 0:
                    continue
                if n.tag != "#root" and _match_simple(n, part):
                    nxt.append(n)
        # dedupe while keeping document order
        seen, frontier = set(), []
        for n in nxt:
            if id(n) not in seen:
                seen.add(id(n))
                frontier.append(n)
    return frontier


def get_html_element(
    col: str,
    selector: str,
    out: str = "element",
    kind: str = "text",  # text | html | attr:<name>
    keep_cols: list[str] | None = None,
):
    """Explode one row per match (GetHTMLElement; destination=content).
    ``kind`` mirrors the reference's OUTPUT_TYPE text/html/attribute."""
    keep = keep_cols or []
    attr = kind[5:] if kind.startswith("attr:") else None

    def fn(batch: pa.Table) -> pa.Table:
        idx, vals = [], []
        for i, doc in enumerate(batch[col].to_pylist()):
            if doc is None:
                continue
            for node in select(parse_html(doc), selector):
                idx.append(i)
                if attr is not None:
                    vals.append(node.attrs.get(attr))
                elif kind == "html":
                    vals.append(node.outer_html())
                else:
                    vals.append(node.all_text())
        base = (
            batch.select(keep).take(pa.array(idx, pa.int64()))
            if keep
            else pa.table({"_i": pa.array(idx, pa.int64())})
        )
        return base.append_column(out, pa.array(vals, pa.string()))

    return fn


def modify_html_element(col: str, selector: str, kind: str, value: str):
    """Rewrite matched elements' text or attribute, re-serialize the
    document (ModifyHTMLElement). ``kind``: text | attr:<name>."""
    attr = kind[5:] if kind.startswith("attr:") else None

    def fn(batch: pa.Table) -> pa.Table:
        docs = []
        for doc in batch[col].to_pylist():
            if doc is None:
                docs.append(None)
                continue
            root = parse_html(doc)
            for node in select(root, selector):
                if attr is not None:
                    node.attrs[attr] = value
                else:
                    node.text = [value]
                    node.children = []
            docs.append(root.inner_html())
        return batch.set_column(
            batch.schema.get_field_index(col), col, pa.array(docs, pa.string())
        )

    return fn


def put_html_element(col: str, selector: str, fragment: str, where: str = "append"):
    """Insert an HTML fragment inside each matched element
    (PutHTMLElement; prepend/append)."""

    def fn(batch: pa.Table) -> pa.Table:
        docs = []
        for doc in batch[col].to_pylist():
            if doc is None:
                docs.append(None)
                continue
            root = parse_html(doc)
            for node in select(root, selector):
                frag_children = parse_html(fragment).children
                while len(node.text) <= len(node.children) + len(frag_children):
                    node.text.append("")
                if where == "prepend":
                    node.children[:0] = frag_children
                else:
                    node.children.extend(frag_children)
            docs.append(root.inner_html())
        return batch.set_column(
            batch.schema.get_field_index(col), col, pa.array(docs, pa.string())
        )

    return fn
