"""EvaluateXQuery analog — an XQuery 1.0 subset evaluator
(reference nifi-standard-processors/.../standard/EvaluateXQuery.java:449,
tests TestEvaluateXQuery.java).

The reference runs an XQuery against FlowFile content and writes each
result item to an attribute (indexed when >1) or forks one FlowFile per
item (content destination). Here the same two shapes are
``evaluate_xquery`` (result → column) and ``xquery_explode`` (one row
per item with the fragment.* contract).

Supported subset (the extract patterns NiFi flows actually use):
  - FLWOR: any number of ``for $v in <expr>`` / ``let $w := <expr>``
    clauses, optional ``where``, optional ``order by <expr>
    [descending]``, ``return <expr>``
  - path expressions: ``/a/b``, ``//a``, ``$v/b/@id``, ``text()``,
    ``*``, and the ElementTree-native predicates ``[@a='v']``,
    ``[tag='v']``, ``[n]``
  - general comparisons (existential over sequences): = != < <= > >=,
    ``and`` / ``or``, arithmetic + - * div mod
  - functions: string, number, count, concat, string-join,
    string-length, normalize-space, contains, starts-with, substring,
    name, data, not, sum, boolean

Full XQuery (element constructors, modules, typeswitch) needs a real
engine (the reference embeds Saxon); out of scope by the same policy as
stages/xml.py's XSLT subset.

XML evaluation is per-document by nature — the 100 TB shape is a
compiled-once evaluator fanned over documents via map_batches (compile
in the stage closure, not per batch).
"""

from __future__ import annotations

import math
import re
import xml.etree.ElementTree as ET

import pyarrow as pa

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<num>\d+(?:\.\d+)?)
      | (?P<str>'[^']*'|"[^"]*")
      | (?P<var>\$[A-Za-z_][\w\-]*)
      | (?P<name>[A-Za-z_][\w\-]*)
      | (?P<pred>\[[^\]]*\])
      | (?P<op>:=|!=|<=|>=|//|[=<>(),/@*+\-])
    )""",
    re.X,
)

_KEYWORDS = {
    "for", "let", "in", "where", "order", "by", "return",
    "descending", "ascending", "and", "or", "div", "mod",
}


def _tokenize(q: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(q):
        m = _TOKEN.match(q, pos)
        if not m:
            if q[pos:].strip() == "":
                break
            raise ValueError(f"XQuery: cannot tokenize at {q[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        val = m.group(kind)
        if kind == "str":
            out.append(("str", val[1:-1]))
        elif kind == "name" and val in _KEYWORDS:
            out.append(("kw", val))
        else:
            out.append((kind, val))
    out.append(("eof", ""))
    return out


class _Parser:
    """Recursive-descent → tuple AST."""

    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self, k=0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind, val=None):
        k, v = self.next()
        if k != kind or (val is not None and v != val):
            raise ValueError(f"XQuery: expected {val or kind}, got {v!r}")
        return v

    def parse(self):
        node = self.flwor() if self.peek() == ("kw", "for") or self.peek() == ("kw", "let") else self.expr()
        if self.peek()[0] != "eof":
            raise ValueError(f"XQuery: trailing input at {self.peek()[1]!r}")
        return node

    def flwor(self):
        clauses = []
        while self.peek() in (("kw", "for"), ("kw", "let")):
            kw = self.next()[1]
            var = self.expect("var")[1:]
            if kw == "for":
                self.expect("kw", "in")
            else:
                self.expect("op", ":=")
            clauses.append((kw, var, self.expr()))
        where = None
        if self.peek() == ("kw", "where"):
            self.next()
            where = self.expr()
        order = None
        if self.peek() == ("kw", "order"):
            self.next()
            self.expect("kw", "by")
            key = self.expr()
            desc = False
            if self.peek() in (("kw", "descending"), ("kw", "ascending")):
                desc = self.next()[1] == "descending"
            order = (key, desc)
        self.expect("kw", "return")
        return ("flwor", clauses, where, order, self.expr())

    def expr(self):
        return self.or_expr()

    def or_expr(self):
        node = self.and_expr()
        while self.peek() == ("kw", "or"):
            self.next()
            node = ("or", node, self.and_expr())
        return node

    def and_expr(self):
        node = self.cmp_expr()
        while self.peek() == ("kw", "and"):
            self.next()
            node = ("and", node, self.cmp_expr())
        return node

    def cmp_expr(self):
        node = self.add_expr()
        if self.peek()[0] == "op" and self.peek()[1] in ("=", "!=", "<", "<=", ">", ">="):
            op = self.next()[1]
            node = ("cmp", op, node, self.add_expr())
        return node

    def add_expr(self):
        node = self.mul_expr()
        while self.peek()[0] == "op" and self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            node = ("arith", op, node, self.mul_expr())
        return node

    def mul_expr(self):
        node = self.unary()
        while (self.peek()[0] == "op" and self.peek()[1] == "*") or self.peek() in (
            ("kw", "div"),
            ("kw", "mod"),
        ):
            op = self.next()[1]
            node = ("arith", op, node, self.unary())
        return node

    def unary(self):
        if self.peek() == ("op", "-"):
            self.next()
            return ("arith", "-", ("lit", 0.0), self.unary())
        return self.postfix_path(self.primary())

    def primary(self):
        k, v = self.peek()
        if k == "num":
            self.next()
            return ("lit", float(v))
        if k == "str":
            self.next()
            return ("lit", v)
        if k == "var":
            self.next()
            return ("var", v[1:])
        if k == "op" and v in ("/", "//"):
            return ("root",)  # path steps consumed by postfix_path
        if k == "op" and v == "(":
            self.next()
            node = self.expr()
            self.expect("op", ")")
            return node
        if k == "name":
            if self.peek(1) == ("op", "("):  # function call
                self.next()
                self.next()
                args = []
                if self.peek() != ("op", ")"):
                    args.append(self.expr())
                    while self.peek() == ("op", ","):
                        self.next()
                        args.append(self.expr())
                self.expect("op", ")")
                return ("call", v, args)
            # bare name = relative path step (handled by postfix_path)
            return ("ctx",)
        raise ValueError(f"XQuery: unexpected token {v!r}")

    def postfix_path(self, base):
        """Consume /step, //step, @attr, text(), predicates after a
        primary that can start a path (root, var, ctx)."""
        steps = []
        if base == ("ctx",):
            steps.append(self._step(descend=False, first_relative=True))
        while True:
            k, v = self.peek()
            if k == "op" and v in ("/", "//"):
                self.next()
                steps.append(self._step(descend=(v == "//"), first_relative=False))
            else:
                break
        if not steps:
            return base
        return ("path", base, steps)

    def _step(self, descend: bool, first_relative: bool):
        k, v = self.next()
        if k == "op" and v == "@":
            return ("attr", self.expect("name"), descend)
        if k == "op" and v == "*":
            tag = "*"
        elif k == "name":
            if v == "text" and self.peek() == ("op", "("):
                self.next()
                self.expect("op", ")")
                return ("text", None, descend)
            tag = v
        else:
            raise ValueError(f"XQuery: bad path step {v!r}")
        pred = ""
        while self.peek()[0] == "pred":
            pred += self.next()[1]
        return ("el", tag + pred, descend)


# ------------------------------------------------------------- eval


def _atomize(item) -> str:
    if isinstance(item, ET.Element):
        return "".join(item.itertext())
    if isinstance(item, bool):
        return "true" if item else "false"
    if isinstance(item, float):
        return str(int(item)) if item.is_integer() and abs(item) < 1e15 else str(item)
    return str(item)


def _as_number(item) -> float:
    try:
        return float(_atomize(item))
    except (TypeError, ValueError):
        return math.nan


def _ebv(seq) -> bool:
    """Effective boolean value."""
    if not seq:
        return False
    x = seq[0]
    if isinstance(x, ET.Element):
        return True
    if isinstance(x, bool):
        return x
    if isinstance(x, float):
        return x != 0 and not math.isnan(x)
    return len(str(x)) > 0


def _seq(v) -> list:
    return v if isinstance(v, list) else [v]


class XQuery:
    """Compiled query: ``XQuery(q)(xml_string) -> list[str]``
    (items stringified the way the reference writes attributes:
    elements serialize, atomics stringify)."""

    def __init__(self, query: str):
        self.ast = _Parser(_tokenize(query)).parse()

    def __call__(self, doc: str | None) -> list[str] | None:
        if not doc:
            return None
        try:
            root = ET.fromstring(doc)
        except ET.ParseError:
            return None
        return self.eval_root(root)

    def eval_root(self, root: ET.Element) -> list[str]:
        """Run against an already-parsed document (lets a stage parse
        once and fan N queries over the same tree)."""
        items = self._eval(self.ast, root, {})
        out = []
        for x in _seq(items):
            if isinstance(x, ET.Element):
                out.append(ET.tostring(x, encoding="unicode"))
            else:
                out.append(_atomize(x))
        return out

    # ---- evaluation

    def _eval(self, node, root, env) -> list:
        op = node[0]
        if op == "lit":
            return [node[1]]
        if op == "var":
            try:
                return env[node[1]]
            except KeyError:
                raise ValueError(f"XQuery: unbound variable ${node[1]}")
        if op == "root":
            return [root]
        if op == "ctx":
            return [root]
        if op == "path":
            return self._path(node, root, env)
        if op == "flwor":
            return self._flwor(node, root, env)
        if op in ("and", "or"):
            l = _ebv(self._eval(node[1], root, env))
            if op == "and":
                return [l and _ebv(self._eval(node[2], root, env))]
            return [l or _ebv(self._eval(node[2], root, env))]
        if op == "cmp":
            return [self._compare(node[1], node[2], node[3], root, env)]
        if op == "arith":
            a = _as_number(_one(self._eval(node[2], root, env)))
            b = _as_number(_one(self._eval(node[3], root, env)))
            f = node[1]
            if f == "+":
                return [a + b]
            if f == "-":
                return [a - b]
            if f == "*":
                return [a * b]
            if f == "div":
                return [a / b if b else math.nan]
            return [math.fmod(a, b) if b else math.nan]
        if op == "call":
            return self._call(node[1], node[2], root, env)
        raise ValueError(f"XQuery: cannot evaluate {op}")

    def _path(self, node, root, env) -> list:
        _, base, steps = node
        if base[0] == "root":
            ctx = [root]
            # absolute /a[...] : the first element step names the
            # document element itself (or // descends from the root)
            first = steps[0]
            if first[0] == "el" and not first[2]:
                pat = first[1]
                tag = pat.split("[", 1)[0]
                matches = tag in ("*", root.tag)
                if matches and "[" in pat:
                    # apply predicate by wrapping: match iff findall on a
                    # synthetic parent returns the root
                    wrap = ET.Element("__w__")
                    wrap.append(root)
                    matches = root in wrap.findall(pat)
                ctx = [root] if matches else []
                steps = steps[1:]
        else:
            ctx = [x for x in self._eval(base, root, env) if isinstance(x, ET.Element)]
        for kind, arg, descend in steps:
            nxt: list = []
            if kind == "el":
                pat = (".//" if descend else "") + arg
                tag = arg.split("[", 1)[0]
                for el in ctx:
                    # XPath // includes the context node itself; ET's
                    # .// searches descendants only
                    if descend and "[" not in arg and (el.tag == tag or tag == "*"):
                        nxt.append(el)
                    nxt.extend(el.findall(pat))
            elif kind == "attr":
                for el in ctx:
                    if isinstance(el, ET.Element):
                        if descend:
                            for d in el.iter():
                                if arg in d.attrib:
                                    nxt.append(d.attrib[arg])
                        elif arg in el.attrib:
                            nxt.append(el.attrib[arg])
            elif kind == "text":
                for el in ctx:
                    if isinstance(el, ET.Element):
                        if descend:
                            nxt.extend(s for s in el.itertext() if s)
                        else:
                            nxt.extend(
                                s for s in ([el.text] + [c.tail for c in el]) if s
                            )
            ctx = nxt
        return ctx

    def _flwor(self, node, root, env) -> list:
        _, clauses, where, order, ret = node
        bindings = [dict(env)]
        for kw, var, expr in clauses:
            if kw == "let":
                for b in bindings:
                    b[var] = self._eval(expr, root, b)
            else:  # for: cartesian expansion
                nxt = []
                for b in bindings:
                    for item in self._eval(expr, root, b):
                        nb = dict(b)
                        nb[var] = [item]
                        nxt.append(nb)
                bindings = nxt
        if where is not None:
            bindings = [b for b in bindings if _ebv(self._eval(where, root, b))]
        if order is not None:
            key_expr, desc = order
            keys = [_one(self._eval(key_expr, root, b)) for b in bindings]
            nums = [_as_number(k) for k in keys]
            if all(not math.isnan(n) for n in nums):
                decorated = sorted(zip(nums, range(len(bindings))), reverse=desc)
            else:
                decorated = sorted(
                    zip([_atomize(k) if k is not None else "" for k in keys],
                        range(len(bindings))),
                    reverse=desc,
                )
            bindings = [bindings[i] for _, i in decorated]
        out: list = []
        for b in bindings:
            out.extend(self._eval(ret, root, b))
        return out

    def _compare(self, op, ln, rn, root, env) -> bool:
        ls = self._eval(ln, root, env)
        rs = self._eval(rn, root, env)
        for a in ls:
            for b in rs:
                na, nb = _as_number(a), _as_number(b)
                if not math.isnan(na) and not math.isnan(nb):
                    x, y = na, nb
                else:
                    x, y = _atomize(a), _atomize(b)
                ok = (
                    x == y if op == "=" else
                    x != y if op == "!=" else
                    x < y if op == "<" else
                    x <= y if op == "<=" else
                    x > y if op == ">" else
                    x >= y
                )
                if ok:
                    return True
        return False

    def _call(self, name, args, root, env) -> list:
        ev = [self._eval(a, root, env) for a in args]
        if name == "string":
            return [_atomize(_one(ev[0])) if ev and ev[0] else ""]
        if name == "number":
            return [_as_number(_one(ev[0])) if ev and ev[0] else math.nan]
        if name == "count":
            return [float(len(ev[0]))] if ev else [0.0]
        if name == "sum":
            return [float(sum(_as_number(x) for x in ev[0]))] if ev else [0.0]
        if name == "concat":
            return ["".join(_atomize(_one(s)) if s else "" for s in ev)]
        if name == "string-join":
            sep = _atomize(_one(ev[1])) if len(ev) > 1 and ev[1] else ""
            return [sep.join(_atomize(x) for x in ev[0])]
        if name == "string-length":
            return [float(len(_atomize(_one(ev[0])))) if ev and ev[0] else 0.0]
        if name == "normalize-space":
            s = _atomize(_one(ev[0])) if ev and ev[0] else ""
            return [" ".join(s.split())]
        if name == "contains":
            hay = _atomize(_one(ev[0])) if ev[0] else ""
            needle = _atomize(_one(ev[1])) if ev[1] else ""
            return [needle in hay]
        if name == "starts-with":
            a = _atomize(_one(ev[0])) if ev[0] else ""
            b = _atomize(_one(ev[1])) if ev[1] else ""
            return [a.startswith(b)]
        if name == "substring":
            s = _atomize(_one(ev[0])) if ev[0] else ""
            start = int(_as_number(_one(ev[1]))) - 1
            if len(ev) > 2:
                ln = int(_as_number(_one(ev[2])))
                return [s[max(start, 0) : max(start, 0) + ln]]
            return [s[max(start, 0) :]]
        if name == "name":
            x = _one(ev[0]) if ev and ev[0] else None
            return [x.tag if isinstance(x, ET.Element) else ""]
        if name == "data":
            return [_atomize(x) for x in (ev[0] if ev else [])]
        if name == "not":
            return [not _ebv(ev[0] if ev else [])]
        if name == "boolean":
            return [_ebv(ev[0] if ev else [])]
        raise ValueError(f"XQuery: unknown function {name}()")


def _one(seq):
    s = _seq(seq)
    return s[0] if s else None


# ------------------------------------------------------ stage bodies


def evaluate_xquery(col: str, queries: dict[str, str], mode: str = "first"):
    """map_batches body — attribute destination: per output column the
    query's first result item (``mode='first'``, NiFi's single-result
    attribute) or all items as list<string> (``mode='all'``, NiFi's
    indexed ``name.N`` attributes). Null on parse failure / no result
    (the reference routes those to 'failure'/'unmatched')."""
    compiled = {out: XQuery(q) for out, q in queries.items()}

    def fn(batch: pa.Table) -> pa.Table:
        outs: dict[str, list] = {k: [] for k in compiled}
        for text in batch[col].to_pylist():
            root = None
            if text:
                try:
                    root = ET.fromstring(text)
                except ET.ParseError:
                    root = None
            for out, xq in compiled.items():
                res = xq.eval_root(root) if root is not None else None
                if mode == "all":
                    outs[out].append(res if res else None)
                else:
                    outs[out].append(res[0] if res else None)
        t = pa.string() if mode == "first" else pa.list_(pa.string())
        for out in compiled:
            batch = batch.append_column(out, pa.array(outs[out], t))
        return batch

    return fn


def xquery_explode(
    col: str, query: str, out: str = "item", keep_cols: list[str] | None = None
):
    """map_batches body — content destination: one row per result item
    with the fragment.* contract (EvaluateXQuery forks one FlowFile per
    item when destination=content)."""
    xq = XQuery(query)
    keep = keep_cols or []

    def fn(batch: pa.Table) -> pa.Table:
        items, idxs, cnts, kept = [], [], [], {k: [] for k in keep}
        rows = batch[col].to_pylist()
        keep_vals = {k: batch[k].to_pylist() for k in keep}
        for i, text in enumerate(rows):
            res = xq(text) or []
            for j, item in enumerate(res):
                items.append(item)
                idxs.append(j)
                cnts.append(len(res))
                for k in keep:
                    kept[k].append(keep_vals[k][i])
        cols = {out: pa.array(items, pa.string())}
        for k in keep:
            cols[k] = pa.array(kept[k], batch.schema.field(k).type)
        cols["fragment_index"] = pa.array(idxs, pa.int32())
        cols["fragment_count"] = pa.array(cnts, pa.int32())
        return pa.table(cols)

    return fn
