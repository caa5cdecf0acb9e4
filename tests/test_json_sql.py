"""ConvertJSONToSQL semantics vs the reference's documented behavior
(statement shape, arg ordering, fragment contract, failure routing)."""

import json

import pyarrow as pa

from nifi_ray.stages.json_sql import TableSchema, convert_json_to_sql

SCHEMA = TableSchema(
    columns={"id": "bigint", "name": "varchar", "score": "double"},
    required={"id"},
    primary_keys=("id",),
    col_sizes={"name": 8},
)


def run(fn, rows):
    return fn(pa.table({"doc": pa.array(rows, pa.string())}))


def test_insert_field_order_and_args():
    fn = convert_json_to_sql("doc", "t", SCHEMA, "INSERT")
    out = run(fn, ['{"name": "ann", "id": 7, "score": 1.5}'])
    assert out["sql"].to_pylist() == [
        "INSERT INTO t (name, id, score) VALUES (?, ?, ?)"
    ]
    assert out["sql_args_values"].to_pylist() == [["ann", "7", "1.5"]]
    assert out["sql_args_types"].to_pylist() == [[12, -5, 8]]
    assert out["error"].to_pylist() == [None]


def test_update_set_then_where():
    fn = convert_json_to_sql("doc", "t", SCHEMA, "UPDATE")
    out = run(fn, ['{"score": 2.0, "id": 3, "name": "bo"}'])
    assert out["sql"].to_pylist() == [
        "UPDATE t SET score = ?, name = ? WHERE id = ?"
    ]
    assert out["sql_args_values"].to_pylist() == [["2.0", "bo", "3"]]


def test_array_explodes_with_fragment_contract():
    fn = convert_json_to_sql("doc", "t", SCHEMA, "INSERT")
    doc = json.dumps([{"id": 1}, {"id": 2}, {"id": 3}])
    out = run(fn, [doc])
    assert out.num_rows == 3
    assert out["fragment_count"].to_pylist() == [3, 3, 3]
    assert out["fragment_index"].to_pylist() == [0, 1, 2]
    assert len(set(out["fragment_identifier"].to_pylist())) == 1
    # deterministic on replay
    again = run(fn, [doc])
    assert again["fragment_identifier"].to_pylist() == out["fragment_identifier"].to_pylist()


def test_failures_route_not_raise():
    fn = convert_json_to_sql("doc", "t", SCHEMA, "INSERT")
    out = run(
        fn,
        [
            '{"bogus": 1, "id": 2}',   # unmapped field
            '{"name": "x"}',           # missing required id
            "not json",                # malformed
            None,                      # null
        ],
    )
    errs = out["error"].to_pylist()
    assert all(e is not None for e in errs)
    assert "cannot map" in errs[0]
    assert "required" in errs[1]
    assert "malformed" in errs[2]
    assert out["sql"].to_pylist() == [None] * 4


def test_ignore_unmapped_and_normalization():
    # translate: JSON camel/underscore variants hit the same column
    fn = convert_json_to_sql("doc", "t", SCHEMA, "INSERT", ignore_unmapped=True)
    out = run(fn, ['{"ID": 5, "Na_Me": "zed", "junk": true}'])
    assert out["sql"].to_pylist() == ["INSERT INTO t (id, name) VALUES (?, ?)"]
    assert out["sql_args_values"].to_pylist() == [["5", "zed"]]


def test_column_size_truncation():
    fn = convert_json_to_sql("doc", "t", SCHEMA, "INSERT", ignore_unmapped=True)
    out = run(fn, ['{"id": 1, "name": "abcdefghijklmno"}'])
    assert out["sql_args_values"].to_pylist() == [["1", "abcdefgh"]]


def test_keep_cols_replicate_across_explode():
    fn = convert_json_to_sql(
        "doc", "t", SCHEMA, "INSERT", keep_cols=["src"], ignore_unmapped=True
    )
    t = pa.table(
        {
            "doc": pa.array([json.dumps([{"id": 1}, {"id": 2}])], pa.string()),
            "src": pa.array(["fileA"], pa.string()),
        }
    )
    out = fn(t)
    assert out["src"].to_pylist() == ["fileA", "fileA"]
