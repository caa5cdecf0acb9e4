"""NiFi Expression Language → vectorized Arrow equivalents.

NiFi's EL (reference nifi-commons/nifi-expression-language — ANTLR
grammar + 62 function evaluators under
.../evaluation/functions/, SURVEY.md §2.9) gives string attributes
typed operations. Per the survey's design decision, NO interpreter is
built: the public API is Python functions over Arrow arrays. This
module is the parity map — every EL function with its vectorized
equivalent — so a NiFi user can translate an expression 1:1.

Each entry takes/returns ``pa.Array``-likes (pyarrow.compute kernels
underneath, pandas str ops where Arrow lacks the kernel). Usage inside
``map_batches``:

    from nifi_ray.functions import el
    batch = batch.append_column("u", el.to_upper(batch["name"]))
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# ---- string -------------------------------------------------- (EL name)


def append(col, suffix: str):  # append
    return pc.binary_join_element_wise(col, pa.scalar(suffix), "")


def prepend(col, prefix: str):  # prepend
    return pc.binary_join_element_wise(pa.scalar(prefix), col, "")


def substring(col, start: int, end: int | None = None):  # substring
    return pc.utf8_slice_codeunits(col, start, stop=end)


def substring_before(col, sep: str):  # substringBefore
    import pandas as pd

    s = pa.chunked_array([col]) if isinstance(col, pa.Array) else col
    ser = s.to_pandas()
    return pa.array(
        ser.str.split(sep, n=1).str[0].where(ser.str.contains(sep, regex=False), ser),
        pa.string(),  # pin: empty/all-null batches must not infer null type
    )


def substring_after(col, sep: str):  # substringAfter
    s = pa.chunked_array([col]) if isinstance(col, pa.Array) else col
    ser = s.to_pandas()
    out = ser.str.split(sep, n=1).str[1]
    return pa.array(out.where(ser.str.contains(sep, regex=False), ser), pa.string())


def substring_before_last(col, sep: str):  # substringBeforeLast
    s = pa.chunked_array([col]) if isinstance(col, pa.Array) else col
    ser = s.to_pandas()
    return pa.array(
        ser.str.rsplit(sep, n=1).str[0].where(ser.str.contains(sep, regex=False), ser),
        pa.string(),
    )


def substring_after_last(col, sep: str):  # substringAfterLast
    s = pa.chunked_array([col]) if isinstance(col, pa.Array) else col
    ser = s.to_pandas()
    out = ser.str.rsplit(sep, n=1).str[1]
    return pa.array(out.where(ser.str.contains(sep, regex=False), ser), pa.string())


def replace(col, find: str, repl: str):  # replace (literal)
    return pc.replace_substring(col, pattern=find, replacement=repl)


def replace_first(col, pattern: str, repl: str):  # replaceFirst (regex)
    return pc.replace_substring_regex(col, pattern=pattern, replacement=repl, max_replacements=1)


def replace_all(col, pattern: str, repl: str):  # replaceAll (regex)
    return pc.replace_substring_regex(col, pattern=pattern, replacement=repl)


def replace_null(col, value):  # replaceNull
    return pc.coalesce(col, pa.scalar(value))


def replace_empty(col, value):  # replaceEmpty
    return pc.if_else(pc.equal(pc.utf8_trim_whitespace(col), ""), pa.scalar(value), col)


def trim(col):  # trim
    return pc.utf8_trim_whitespace(col)


def to_upper(col):  # toUpper
    return pc.utf8_upper(col)


def to_lower(col):  # toLower
    return pc.utf8_lower(col)


def length(col):  # length
    return pc.utf8_length(col)


def starts_with(col, s: str):  # startsWith
    return pc.starts_with(col, pattern=s)


def ends_with(col, s: str):  # endsWith
    return pc.ends_with(col, pattern=s)


def contains(col, s: str):  # contains
    return pc.match_substring(col, pattern=s)


def find(col, pattern: str):  # find (regex partial match)
    return pc.match_substring_regex(col, pattern=pattern)


def matches(col, pattern: str):  # matches (regex full match)
    return pc.match_substring_regex(col, pattern=f"^(?:{pattern})$")


def index_of(col, s: str):  # indexOf
    return pc.find_substring(col, pattern=s)


def get_delimited_field(col, index: int, delim: str = ","):  # getDelimitedField
    parts = pc.split_pattern(col, pattern=delim)
    return pc.list_element(parts, index)


def url_encode(col):  # urlEncode
    import urllib.parse

    return pa.array(
        [None if v is None else urllib.parse.quote(v) for v in col.to_pylist()],
        pa.string(),
    )


def url_decode(col):  # urlDecode
    import urllib.parse

    return pa.array(
        [None if v is None else urllib.parse.unquote(v) for v in col.to_pylist()],
        pa.string(),
    )


def base64_encode(col):  # base64Encode
    import base64

    return pa.array(
        [None if v is None else base64.b64encode(v.encode()).decode() for v in col.to_pylist()],
        pa.string(),
    )


def base64_decode(col):  # base64Decode
    import base64

    return pa.array(
        [None if v is None else base64.b64decode(v).decode() for v in col.to_pylist()],
        pa.string(),
    )


# ---- numeric / math ------------------------------------------------


def plus(a, b):  # plus
    return pc.add(a, b)


def minus(a, b):  # minus
    return pc.subtract(a, b)


def multiply(a, b):  # multiply
    return pc.multiply(a, b)


def divide(a, b):  # divide
    return pc.divide(a, b)


def mod(a, b):  # mod
    # NiFi mod is Java %, which truncates toward zero — match that,
    # not Python's floor-mod
    q = pc.divide(a, b)  # integer division truncates for ints in Arrow
    return pc.subtract(a, pc.multiply(q, b))


def to_radix(col, base: int):  # toRadix
    import numpy as np

    return pa.array(
        [None if v is None else np.base_repr(v, base) for v in col.to_pylist()],
        pa.string(),
    )


def from_radix(col, base: int):  # fromRadix
    return pa.array([None if v is None else int(v, base) for v in col.to_pylist()], pa.int64())


def math_fn(col, name: str):  # math("...") — reflective java.lang.Math analog
    kernels = {
        "abs": pc.abs,
        "sqrt": pc.sqrt,
        "ln": pc.ln,
        "log10": pc.log10,
        "exp": pc.exp,
        "sin": pc.sin,
        "cos": pc.cos,
        "tan": pc.tan,
        "floor": pc.floor,
        "ceil": pc.ceil,
    }
    return kernels[name](col)


# ---- date / time ---------------------------------------------------


def format_date(col, fmt: str):  # format (Java SimpleDateFormat → strftime)
    return pc.strftime(col, format=fmt)


def to_date(col, fmt: str):  # toDate
    return pc.strptime(col, format=fmt, unit="us")


def to_number(col):  # toNumber (dates → epoch millis; strings → int)
    if pa.types.is_timestamp(col.type):
        # safe=False: sub-millisecond timestamps TRUNCATE to the epoch
        # millisecond (Date.getTime() precision) — the default safe
        # cast raises on any non-zero microsecond remainder
        return pc.cast(pc.cast(col, pa.timestamp("ms"), safe=False), pa.int64())
    return pc.cast(col, pa.int64())


def to_string(col):  # toString
    return pc.cast(col, pa.string())


def number_to_date(col):  # NumberToDateEvaluator: epoch millis → date
    return pc.cast(pc.cast(col, pa.int64()), pa.timestamp("ms"))


# ---- boolean / compare ---------------------------------------------

and_ = pc.and_
or_ = pc.or_
not_ = pc.invert
equals = pc.equal
gt, ge, lt, le = pc.greater, pc.greater_equal, pc.less, pc.less_equal


def equals_ignore_case(a, b):  # equalsIgnoreCase
    return pc.equal(pc.utf8_lower(a), pc.utf8_lower(b) if not isinstance(b, str) else b.lower())


def in_(col, values):  # in
    return pc.is_in(col, value_set=pa.array(list(values)))


def is_empty(col):  # isEmpty
    return pc.or_kleene(pc.is_null(col), pc.equal(pc.utf8_trim_whitespace(col), ""))


def is_null(col):  # isNull
    return pc.is_null(col)


def not_null(col):  # notNull
    return pc.is_valid(col)


# ---- structural ----------------------------------------------------


def uuid(n: int):  # uuid — deterministic ids come from (partition, offset)
    import uuid as _uuid

    return pa.array([str(_uuid.uuid4()) for _ in range(n)])


def json_path_el(col, key: str):  # jsonPath (top-level key)
    # EL is string-typed: non-string JSON scalars render as their JSON
    # text (87 → "87", true → "true"), strings unquoted — the same
    # contract as DuckDB's json_extract_string, so EL pipelines can be
    # oracle-checked 1:1. (stages.text.json_path keeps typed output for
    # schema-ed pipelines; this is the EL-surface variant.)
    import json as _json

    out = []
    for v in _aslist(col):
        if v is None:
            out.append(None)
            continue
        try:
            obj = _json.loads(v)
        except ValueError:
            out.append(None)
            continue
        if not isinstance(obj, dict):  # non-object JSON row → null key
            out.append(None)
            continue
        x = obj.get(key)
        # minified separators = DuckDB json_extract_string's rendering
        # of nested values ('{"a":1}', '[1,2]'), not Python's '{"a": 1}'
        out.append(
            x if x is None or isinstance(x, str)
            else _json.dumps(x, separators=(",", ":"))
        )
    return pa.array(out, pa.string())


def last_index_of(col, s: str):  # lastIndexOf
    # no Arrow kernel for rfind; per-value C-speed str.rfind
    return pa.array(
        [None if v is None else v.rfind(s) for v in _aslist(col)], pa.int64()
    )


def _aslist(col):
    return (col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col).to_pylist()


# ---- date/time -----------------------------------------------------


def now(n: int, at: float | None = None):  # now
    """Column of the current timestamp (ms epoch, NiFi's date unit).
    ``at`` pins the clock for deterministic tests/pipelines — in a
    distributed replay the DRIVER stamps the tick time once; tasks must
    never each call the wall clock (non-reproducible lineage)."""
    import time as _time

    t = int((_time.time() if at is None else at) * 1000)
    return pa.array([t] * n, pa.int64())


# ---- random / sequence ---------------------------------------------


def random_fn(n: int, seed: int, lo: int = 0, hi: int = 1 << 31):  # random
    """Seeded uniform ints — NiFi's random() is unseeded
    (RandomNumberGeneratorEvaluator.java); a replayable engine makes the
    seed explicit so retried tasks regenerate identical values."""
    import numpy as _np

    rng = _np.random.default_rng(seed)
    return pa.array(rng.integers(lo, hi, size=n), pa.int64())


def next_int(n: int, start: int = 0):  # nextInt (one-up sequence)
    """Per-batch monotone sequence. NiFi's nextInt is a process-global
    counter (OneUpSequenceEvaluator.java); the distributed analog is
    (partition, offset) — pass ``start`` = the batch's global offset."""
    import numpy as _np

    return pa.array(_np.arange(start, start + n), pa.int64())


# ---- host identity -------------------------------------------------


def hostname(n: int):  # hostname
    import socket

    return pa.array([socket.gethostname()] * n)


def ip(n: int):  # ip
    import socket

    try:
        addr = socket.gethostbyname(socket.gethostname())
    except OSError:
        addr = "127.0.0.1"
    return pa.array([addr] * n)


# ---- escape / unescape (CharSequenceTranslatorEvaluator family) ----

_CSV_NEEDS_QUOTE = (",", '"', "\n", "\r")


def _esc_xml(v: str) -> str:
    from xml.sax.saxutils import escape

    return escape(v, {'"': "&quot;", "'": "&apos;"})


def _unesc_xml(v: str) -> str:
    from xml.sax.saxutils import unescape

    return unescape(v, {"&quot;": '"', "&apos;": "'"})


def _esc_html(v: str) -> str:
    import html

    return html.escape(v)


def _unesc_html(v: str) -> str:
    import html

    return html.unescape(v)


def _esc_json(v: str) -> str:
    import json

    return json.dumps(v)[1:-1]


def _unesc_json(v: str) -> str:
    import json

    return json.loads(f'"{v}"')


def _esc_csv(v: str) -> str:
    if any(c in v for c in _CSV_NEEDS_QUOTE):
        return '"' + v.replace('"', '""') + '"'
    return v


def _unesc_csv(v: str) -> str:
    if len(v) >= 2 and v[0] == '"' and v[-1] == '"':
        return v[1:-1].replace('""', '"')
    return v


_ESCAPES = {
    ("xml", True): _esc_xml, ("xml", False): _unesc_xml,
    ("html", True): _esc_html, ("html", False): _unesc_html,
    ("json", True): _esc_json, ("json", False): _unesc_json,
    ("csv", True): _esc_csv, ("csv", False): _unesc_csv,
}


def escape(col, dialect: str = "xml"):  # escapeXml/escapeHtml4/escapeJson/escapeCsv
    f = _ESCAPES[(dialect, True)]
    return pa.array([None if v is None else f(v) for v in _aslist(col)], pa.string())


def unescape(col, dialect: str = "xml"):  # unescapeXml/... family
    f = _ESCAPES[(dialect, False)]
    return pa.array([None if v is None else f(v) for v in _aslist(col)], pa.string())


# ---- selection quantifiers (evaluation/selection/*.java) -----------


def any_attribute(batch: pa.Table, cols: list[str], pred):  # anyAttribute
    """True where ``pred(column)`` holds for ANY of the named columns
    (pred: pa.Array -> boolean Array; NiFi applies one EL predicate over
    a multi-attribute selection)."""
    acc = None
    for c in cols:
        m = pc.fill_null(pred(batch[c]), False)
        acc = m if acc is None else pc.or_(acc, m)
    return acc if acc is not None else pa.array([False] * batch.num_rows)


def all_attributes(batch: pa.Table, cols: list[str], pred):  # allAttributes
    acc = None
    for c in cols:
        m = pc.fill_null(pred(batch[c]), False)
        acc = m if acc is None else pc.and_(acc, m)
    return acc if acc is not None else pa.array([True] * batch.num_rows)


def any_matching_attribute(batch: pa.Table, pattern: str, pred):  # anyMatchingAttribute
    import re as _re

    cols = [c for c in batch.schema.names if _re.fullmatch(pattern, c)]
    return any_attribute(batch, cols, pred)


def any_delineated_value(col, sep: str, pred):  # anyDelineatedValue
    """True where ``pred`` holds for ANY ``sep``-delimited piece of the
    value (evaluation/selection/MultiAttributeEvaluator.java's
    delineated form). Vectorized: split → flatten → pred once over all
    pieces → segmented OR back to rows."""
    import numpy as np

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    parts = pc.split_pattern(pc.fill_null(arr, ""), pattern=sep)
    flat = pc.list_flatten(parts)
    hits = pc.fill_null(pred(flat), False).to_numpy(zero_copy_only=False)
    offs = parts.offsets.to_numpy(zero_copy_only=False)
    out = np.logical_or.reduceat(
        np.append(hits, False), np.clip(offs[:-1], 0, len(hits))
    ) & (offs[1:] > offs[:-1])
    return pa.array(out)


def all_delineated_values(col, sep: str, pred):  # allDelineatedValues
    import numpy as np

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    parts = pc.split_pattern(pc.fill_null(arr, ""), pattern=sep)
    flat = pc.list_flatten(parts)
    hits = pc.fill_null(pred(flat), False).to_numpy(zero_copy_only=False)
    offs = parts.offsets.to_numpy(zero_copy_only=False)
    nonempty = offs[1:] > offs[:-1]
    out = np.logical_and.reduceat(
        np.append(hits, True), np.clip(offs[:-1], 0, len(hits))
    ) & nonempty
    return pa.array(out)
