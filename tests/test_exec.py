"""ExecuteStreamCommand / ExecuteProcess / LogAttribute analogs."""

import logging

import pyarrow as pa

from nifi_ray.stages.exec import ExecuteStreamCommand, execute_process, log_attributes


def test_stream_command_stdout_becomes_content(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({"content": ["hello", "world", None]}))
    out = ds.map_batches(
        ExecuteStreamCommand,
        fn_constructor_kwargs={"argv": ["tr", "a-z", "A-Z"]},
        concurrency=1,
        batch_format="pyarrow",
    ).take_all()
    assert [r["cmd_output"] for r in out] == [b"HELLO", b"WORLD", None]
    assert [r["execution_status"] for r in out] == [0, 0, -1]
    assert out[2]["execution_error"] == "null content"


def test_stream_command_exit_status_and_stderr_routing():
    tbl = pa.table({"content": ["x"]})
    stage = ExecuteStreamCommand(argv=["sh", "-c", "echo oops >&2; exit 3"])
    out = stage(tbl)
    assert out["execution_status"].to_pylist() == [3]
    assert "oops" in out["execution_error"][0].as_py()
    # downstream routes on execution_status like the reference's
    # nonzero-status relationship — nothing raised


def test_stream_command_attribute_destination_truncates():
    tbl = pa.table({"content": ["abcdefghij"]})
    stage = ExecuteStreamCommand(
        argv=["cat"], output="attribute", max_attr_len=4
    )
    out = stage(tbl)
    assert out["cmd_output"].to_pylist() == ["abcd"]  # Max Attribute Length


def test_stream_command_arg_templating_ignore_stdin():
    tbl = pa.table({"content": [None, None], "name": ["alice", "bob"]})
    stage = ExecuteStreamCommand(
        argv=["sh", "-c", "printf %s {name}"], ignore_stdin=True
    )
    out = stage(tbl)
    assert out["cmd_output"].to_pylist() == [b"alice", b"bob"]
    assert out["execution_status"].to_pylist() == [0, 0]


def test_stream_command_spawn_failure_never_raises():
    tbl = pa.table({"content": ["x"]})
    out = ExecuteStreamCommand(argv=["/nonexistent/cmd"])(tbl)
    assert out["execution_status"].to_pylist() == [-1]
    assert "FileNotFoundError" in out["execution_error"][0].as_py()


def test_execute_process_source_lines(ray_session):
    import ray.data

    tbl = execute_process(["printf", "a\\nb\\nc\\n"])
    assert tbl["content"].to_pylist() == ["a", "b", "c"]
    assert tbl["execution_status"].to_pylist() == [0, 0, 0]
    # enters a pipeline like any source
    n = ray.data.from_arrow(tbl).filter(lambda r: r["content"] != "b").count()
    assert n == 2


def test_execute_process_whole_stream_and_stderr_redirect():
    tbl = execute_process(
        ["sh", "-c", "echo out; echo err >&2"],
        split_lines=False,
        redirect_stderr=True,
    )
    assert tbl.num_rows == 1
    blob = tbl["content"][0].as_py()
    assert b"out" in blob and b"err" in blob


def test_log_attributes_passthrough(caplog):
    tbl = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    fn = log_attributes(cols=["a"], prefix="T1")
    with caplog.at_level(logging.INFO, logger="nifi_ray.log_attribute"):
        out = fn(tbl)
    assert out is tbl  # unchanged pass-through
    assert any("T1" in r.message and "3 rows" in r.message for r in caplog.records)


def test_stream_command_template_attribute_and_type_errors_route():
    # str.format can raise beyond KeyError/IndexError/ValueError —
    # AttributeError ('{x.y}') and TypeError ('{x[0]}' on an int) must
    # route to execution_status = -1, never escape (never-raise contract)
    tbl = pa.table({"content": ["x"], "word": ["w"]})
    out = ExecuteStreamCommand(argv=["echo", "{word.x}"])(tbl)
    assert out["execution_status"].to_pylist() == [-1]
    assert "AttributeError" in out["execution_error"][0].as_py()
    out2 = ExecuteStreamCommand(argv=["echo", "{word[0]}"], ignore_stdin=True)(
        pa.table({"content": [None], "word": [7]})
    )
    assert out2["execution_status"].to_pylist() == [-1]
    assert "TypeError" in out2["execution_error"][0].as_py()
