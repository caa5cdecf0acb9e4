import pyarrow as pa
import pytest

from nifi_ray.functions import el


S = pa.array(["Hello World", "  pad  ", "a,b,c", None])


def test_string_fns():
    assert el.to_upper(S)[0].as_py() == "HELLO WORLD"
    assert el.trim(S)[1].as_py() == "pad"
    assert el.length(S)[0].as_py() == 11
    assert el.append(pa.array(["x"]), "!")[0].as_py() == "x!"
    assert el.prepend(pa.array(["x"]), ">")[0].as_py() == ">x"
    assert el.substring(pa.array(["abcdef"]), 1, 4)[0].as_py() == "bcd"
    assert el.get_delimited_field(pa.array(["a,b,c"]), 1)[0].as_py() == "b"
    assert el.replace(pa.array(["aaa"]), "a", "b")[0].as_py() == "bbb"
    assert el.replace_first(pa.array(["aaa"]), "a", "b")[0].as_py() == "baa"
    assert el.substring_before(pa.array(["k=v"]), "=")[0].as_py() == "k"
    assert el.substring_after(pa.array(["k=v"]), "=")[0].as_py() == "v"
    assert el.substring_before(pa.array(["nodelim"]), "=")[0].as_py() == "nodelim"


def test_predicates():
    assert el.starts_with(S, "Hello").to_pylist()[:2] == [True, False]
    assert el.contains(S, "World")[0].as_py() is True
    assert el.matches(pa.array(["abc"]), "a.c")[0].as_py() is True
    assert el.matches(pa.array(["abcd"]), "a.c")[0].as_py() is False
    assert el.is_empty(pa.array(["", "  ", "x", None])).to_pylist() == [
        True,
        True,
        False,
        True,
    ]
    assert el.in_(pa.array(["a", "z"]), {"a", "b"}).to_pylist() == [True, False]


def test_numeric_and_radix():
    a = pa.array([7, -7])
    b = pa.array([3, 3])
    # Java % truncates toward zero: -7 % 3 == -1
    assert el.mod(a, b).to_pylist() == [1, -1]
    assert el.to_radix(pa.array([255]), 16)[0].as_py() == "FF"
    assert el.from_radix(pa.array(["FF"]), 16)[0].as_py() == 255


def test_dates():
    ts = el.to_date(pa.array(["2024-02-29 12:00:00"]), "%Y-%m-%d %H:%M:%S")
    assert el.format_date(ts, "%Y/%m/%d")[0].as_py() == "2024/02/29"
    millis = el.to_number(ts)[0].as_py()
    assert millis == 1709208000000


def test_replace_null_empty():
    assert el.replace_null(S, "N")[3].as_py() == "N"
    assert el.replace_empty(pa.array([" ", "x"]), "E").to_pylist() == ["E", "x"]


def test_substring_before_after_last():
    from nifi_ray.functions.el import substring_after_last, substring_before_last

    col = pa.array(["a.b.c", "nodot", "x.y", None])
    assert substring_before_last(col, ".").to_pylist() == ["a.b", "nodot", "x", None]
    assert substring_after_last(col, ".").to_pylist() == ["c", "nodot", "y", None]


def test_delineated_value_quantifiers():
    import pyarrow.compute as pc

    from nifi_ray.functions.el import all_delineated_values, any_delineated_value

    col = pa.array(["red,green", "blue", "green,green", "", None])
    is_green = lambda a: pc.equal(a, "green")
    assert any_delineated_value(col, ",", is_green).to_pylist() == [
        True, False, True, False, False,
    ]
    assert all_delineated_values(col, ",", is_green).to_pylist() == [
        False, False, True, False, False,
    ]


def test_to_string_and_number_to_date():
    from nifi_ray.functions.el import format_date, number_to_date, to_number, to_string

    assert to_string(pa.array([1, 2, None])).to_pylist() == ["1", "2", None]
    ms = pa.array([0, 86_400_000])
    ts = number_to_date(ms)
    assert format_date(ts, "%Y-%m-%d").to_pylist() == ["1970-01-01", "1970-01-02"]
    # roundtrip: toNumber(numberToDate(x)) == x
    assert to_number(ts).to_pylist() == ms.to_pylist()


def test_json_path_el_is_string_typed_like_json_extract_string():
    # EL is string-typed: JSON scalars render as their JSON text,
    # strings unquoted, missing key / null input -> null — the same
    # contract as DuckDB json_extract_string (graded by el_pipeline)
    a = pa.array(
        ['{"k": 87}', '{"k": "x"}', '{"k": true}', '{"k": 1.5}', '{"z": 1}', None],
        pa.string(),
    )
    out = el.json_path_el(a, "k")
    assert out.type == pa.string()
    assert out.to_pylist() == ["87", "x", "true", "1.5", None, None]
    # nested values render MINIFIED like DuckDB ('{"a":1}', '[1,2]'),
    # and non-object / invalid JSON rows yield null instead of raising
    b = pa.array(
        ['{"k": {"a": 1}}', '{"k": [1, 2]}', "[1,2]", "notjson"], pa.string()
    )
    assert el.json_path_el(b, "k").to_pylist() == [
        '{"a":1}', "[1,2]", None, None,
    ]


def test_substring_family_and_to_number_edge_types():
    # empty batches must stay string-typed (pandas infers null type on
    # all-NaN series — broke is_empty downstream on small blocks), and
    # toNumber on sub-millisecond timestamps truncates instead of raising
    empty = pa.array([], pa.string())
    for fn in (
        el.substring_before,
        el.substring_after,
        el.substring_before_last,
        el.substring_after_last,
    ):
        out = fn(empty, "w")
        assert out.type == pa.string() and len(out) == 0
    # not-found fallback returns the whole string
    assert el.substring_after_last(pa.array(["view", "error"]), "w").to_pylist() == [
        "", "error",
    ]
    ts = pa.array([1_000_123], pa.timestamp("us"))  # 1000.123 ms
    assert el.to_number(ts).to_pylist() == [1000]  # truncated epoch ms
