"""Round-2 operator-gap tests: snappy/charset codecs, UnpackContent,
ParseSyslog/ParseCEF, IdentifyMimeType, new EL functions, SQL edge."""

import io
import tarfile
import zipfile

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from nifi_ray.stages.codec import compress, convert_charset, unpack_content
from nifi_ray.stages.parsers import ParseCEF, ParseSyslog, identify_mime


def test_snappy_roundtrip():
    t = pa.table({"p": [b"hello world" * 50, None, b""]})
    c = compress("p", codec="snappy")(t)
    d = compress("p", codec="snappy", mode="decompress")(c)
    assert d["p"].to_pylist() == [b"hello world" * 50, None, b""]
    assert len(c["p"][0].as_py()) < len(t["p"][0].as_py())


def test_convert_charset():
    t = pa.table({"p": ["héllo", None]})
    out = convert_charset("p", src="utf-8", dst="latin-1")(t)
    assert out["p"].to_pylist()[0] == "héllo".encode("latin-1")
    back = convert_charset("p", src="latin-1", dst="utf-8")(out)
    assert back["p"].to_pylist()[0] == "héllo".encode("utf-8")


def _zip_bytes(entries):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, data in entries:
            z.writestr(name, data)
    return buf.getvalue()


def _tar_bytes(entries):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as t:
        for name, data in entries:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            t.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def test_unpack_content_zip_and_tar():
    z = _zip_bytes([("a.txt", b"AA"), ("b/c.txt", b"BB")])
    t = pa.table({"id": [7], "archive": [z]})
    out = unpack_content("archive", fmt="zip")(t)
    assert out["entry_name"].to_pylist() == ["a.txt", "b/c.txt"]
    assert out["payload"].to_pylist() == [b"AA", b"BB"]
    assert out["fragment_count"].to_pylist() == [2, 2]
    assert out["id"].to_pylist() == [7, 7]

    tr = _tar_bytes([("x", b"XX")])
    out2 = unpack_content("archive", fmt="tar")(pa.table({"archive": [tr]}))
    assert out2["payload"].to_pylist() == [b"XX"]


def test_parse_syslog():
    lines = [
        "<34>Oct 11 22:14:15 host1 su[123]: failed for lonvick",
        "<165>1 2024-01-02T03:04:05Z web01 app 1234 MSGID - hello 5424",
        "garbage",
        None,
    ]
    out = ParseSyslog(col="line")(pa.table({"line": lines}))
    assert out["syslog_valid"].to_pylist() == [True, True, False, False]
    assert out["syslog_severity"].to_pylist()[:2] == [2, 5]  # 34%8, 165%8
    assert out["syslog_facility"].to_pylist()[:2] == [4, 20]
    assert out["syslog_hostname"].to_pylist()[:2] == ["host1", "web01"]
    assert out["syslog_body"].to_pylist()[0] == "failed for lonvick"


def test_parse_cef():
    line = (
        "CEF:0|Vendor|Product|1.0|100|Port scan|5|src=10.0.0.1 dst=10.0.0.2 msg=hi there"
    )
    out = ParseCEF(col="line")(pa.table({"line": [line, "nope", None]}))
    assert out["cef_valid"].to_pylist() == [True, False, False]
    assert out["cef_vendor"].to_pylist()[0] == "Vendor"
    assert out["cef_severity"].to_pylist()[0] == "5"
    ext = dict(out["cef_extensions"].to_pylist()[0])
    assert ext["src"] == "10.0.0.1" and ext["msg"] == "hi there"


def test_identify_mime():
    vals = [
        b"\x89PNG\r\n\x1a\nxxxx",
        b"\xff\xd8\xff\xe0yy",
        b"PK\x03\x04zz",
        b'{"a": 1}',
        b"<?xml version='1.0'?><r/>",
        b"plain words",
        b"\x00\x01\x02\xff\xfe",
        None,
    ]
    out = identify_mime("p")(pa.table({"p": pa.array(vals, pa.binary())}))
    assert out["mime_type"].to_pylist() == [
        "image/png", "image/jpeg", "application/zip", "application/json",
        "application/xml", "text/plain", "application/octet-stream", None,
    ]


def test_el_additions():
    from nifi_ray.functions import el

    col = pa.array(["a,b", 'he said "hi"', None])
    assert el.last_index_of(pa.array(["abcabc", "xyz", None]), "bc").to_pylist() == [4, -1, None]
    assert el.escape(col, "csv").to_pylist()[0] == '"a,b"'
    assert el.unescape(el.escape(col, "csv"), "csv").to_pylist()[:2] == ["a,b", 'he said "hi"']
    assert el.unescape(el.escape(col, "xml"), "xml").to_pylist()[1] == 'he said "hi"'
    assert el.unescape(el.escape(col, "json"), "json").to_pylist()[1] == 'he said "hi"'
    assert el.unescape(el.escape(col, "html"), "html").to_pylist()[0] == "a,b"
    assert el.now(2, at=1700000000.5).to_pylist() == [1700000000500] * 2
    assert el.random_fn(3, seed=1).to_pylist() == el.random_fn(3, seed=1).to_pylist()
    assert el.next_int(3, start=10).to_pylist() == [10, 11, 12]
    assert el.hostname(1).to_pylist()[0]
    assert el.ip(1).to_pylist()[0].count(".") == 3

    t = pa.table({"a": [1, 5], "b": [9, 2]})
    big = lambda c: pc.greater(c, 4)
    assert el.any_attribute(t, ["a", "b"], big).to_pylist() == [True, True]
    assert el.all_attributes(t, ["a", "b"], big).to_pylist() == [False, False]
    assert el.any_matching_attribute(t, "[ab]", big).to_pylist() == [True, True]


def test_sql_edge(ray_session):
    import os
    import tempfile

    import duckdb

    from nifi_ray.sources.sql import (
        generate_table_fetch,
        list_tables,
        read_sql,
        read_table_incremental,
    )

    db = os.path.join(tempfile.mkdtemp(), "t.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE ev (id BIGINT, v DOUBLE)")
    con.execute("INSERT INTO ev SELECT range, range * 1.5 FROM range(10)")
    con.close()

    ds = read_sql("SELECT * FROM ev WHERE id < 3", database=db)
    assert ds.count() == 3

    inc, wm = read_table_incremental("ev", "id", watermark=6, database=db)
    assert inc.count() == 3 and wm == 9
    inc2, wm2 = read_table_incremental("ev", "id", watermark=wm, database=db)
    assert inc2.count() == 0 and wm2 == 9  # idempotent re-poll

    stmts = generate_table_fetch("ev", "id", page_size=4, database=db)
    assert len(stmts) == 3
    total = sum(read_sql(s, database=db).count() for s in stmts)
    assert total == 10

    tabs = list_tables(database=db)
    assert "ev" in tabs["table_name"].to_pylist()

    # ExecuteSQL's output contract: ResultSet → Avro container
    from nifi_ray.sources.avro import avro_to_table
    from nifi_ray.sources.sql import execute_sql_to_avro

    out = os.path.join(os.path.dirname(db), "ev.avro")
    n = execute_sql_to_avro("SELECT * FROM ev ORDER BY id", out, database=db)
    back = avro_to_table(open(out, "rb").read())
    assert n == 10 and back.num_rows == 10
    assert back["v"].to_pylist() == [i * 1.5 for i in range(10)]


def test_encrypt_content_roundtrip_and_determinism():
    from nifi_ray.stages.codec import encrypt_content

    key = bytes(range(32))
    t = pa.table({"p": [b"secret payload", None, b""]})
    enc = encrypt_content("p", key)(t)
    enc2 = encrypt_content("p", key)(t)
    # deterministic (idempotent retries produce identical bytes)
    assert enc["p"].to_pylist() == enc2["p"].to_pylist()
    assert enc["p"].to_pylist()[0] != b"secret payload"
    dec = encrypt_content("p", key, mode="decrypt")(enc)
    assert dec["p"].to_pylist() == [b"secret payload", None, b""]


def test_parse_email_headers_and_attachments():
    from email.message import EmailMessage

    from nifi_ray.stages.parsers import ParseEmail

    msg = EmailMessage()
    msg["From"] = "a@example.com"
    msg["To"] = "b@example.com"
    msg["Subject"] = "hello"
    msg.set_content("the body\n")
    msg.add_attachment(b"DATA", maintype="application", subtype="octet-stream",
                       filename="f.bin")
    raw = msg.as_bytes()

    t = pa.table({"raw": [raw, None]})
    out = ParseEmail()(t)
    assert out["email_from"].to_pylist() == ["a@example.com", None]
    assert out["email_subject"].to_pylist() == ["hello", None]
    assert out["email_body"].to_pylist()[0].strip() == "the body"

    expl = ParseEmail(explode_attachments=True)(t)
    assert expl["attachment_name"].to_pylist() == ["f.bin"]
    assert expl["attachment"].to_pylist() == [b"DATA"]


def test_jolt_shift_default_remove():
    from nifi_ray.stages.jolt import JoltTransform, apply_spec

    doc = {"a": {"b": 1}, "x": 2, "drop": 3}
    chain = [
        {"operation": "shift", "spec": {"a.b": "c.d", "x": "x", "missing": "m"}},
        {"operation": "default", "spec": {"c.tag": "t", "x": 99}},
        {"operation": "remove", "spec": ["c.tag2"]},
    ]
    out = apply_spec(doc, chain)
    assert out == {"c": {"d": 1, "tag": "t"}, "x": 2}

    t = pa.table({"json": ['{"a":{"b":5}}', "not json", None]})
    res = JoltTransform([{"operation": "shift", "spec": {"a.b": "v"}}], col="json")(t)
    assert res["json"].to_pylist() == ['{"v":5}', None, None]

    with pytest.raises(ValueError):
        JoltTransform([{"operation": "sort"}])


def test_route_hl7():
    """RouteHL7 (reference nifi-hl7-bundle/.../hl7/RouteHL7.java) =
    ParseHL7 → stamp_route on the extracted hl7_* columns: per-query
    named predicates, unmatched relationship for non-matching/invalid."""
    import pyarrow.compute as pc

    from nifi_ray.stages.parsers import ParseHL7
    from nifi_ray.stages.route import stamp_route

    mk = lambda mtype: (
        f"MSH|^~\\&|LAB|FAC|EHR|DEST|202401020304||{mtype}|MSG001|P|2.5\r"
        "PID|1||12345^^^FAC||DOE^JANE"
    )
    t = pa.table({"m": [mk("ORU^R01"), mk("ADT^A01"), "junk"]})
    parsed = ParseHL7(col="m")(t)
    routed = stamp_route(
        {
            "results": lambda b: pc.match_substring(
                pc.coalesce(b["hl7_message_type"], pa.scalar("")), "ORU"
            ),
            "admits": lambda b: pc.match_substring(
                pc.coalesce(b["hl7_message_type"], pa.scalar("")), "ADT"
            ),
        }
    )(parsed)
    assert routed["route"].to_pylist() == ["results", "admits", "unmatched"]


def test_parse_hl7():
    from nifi_ray.stages.parsers import ParseHL7

    msg = (
        "MSH|^~\\&|LAB|FAC|EHR|DEST|202401020304||ORU^R01|MSG001|P|2.5\r"
        "PID|1||12345^^^FAC||DOE^JANE\r"
        "OBX|1|NM|GLU||98|mg/dL\r"
        "OBX|2|NM|HGB||13.2|g/dL"
    )
    out = ParseHL7(col="m")(pa.table({"m": [msg, "junk", None]}))
    assert out["hl7_valid"].to_pylist() == [True, False, False]
    assert out["hl7_sending_app"].to_pylist()[0] == "LAB"
    assert out["hl7_message_type"].to_pylist()[0] == "ORU^R01"
    assert out["hl7_version"].to_pylist()[0] == "2.5"
    fields = dict(out["hl7_fields"].to_pylist()[0])
    assert fields["PID.5"] == "DOE^JANE"
    assert fields["OBX.5"] == "98" and fields["OBX_2.5"] == "13.2"


def test_pack_content_inverse_of_unpack():
    """MergeContent tar/zip merge formats: pack → unpack is the
    identity on (name, payload), archives are byte-deterministic
    (idempotent retries)."""
    from nifi_ray.stages.codec import pack_content, unpack_content

    members = pa.table(
        {"entry_name": ["a.txt", "b/c.bin", "empty"], "payload": [b"hello", b"\x00\xff" * 9, b""]}
    )
    for fmt in ("zip", "tar"):
        arch = pack_content(fmt=fmt)(members)
        assert arch["entry_count"].to_pylist() == [3]
        assert (
            arch["archive"][0].as_py()
            == pack_content(fmt=fmt)(members)["archive"][0].as_py()
        )
        back = unpack_content("archive", fmt=fmt)(arch)
        assert back["entry_name"].to_pylist() == members["entry_name"].to_pylist()
        assert back["payload"].to_pylist() == members["payload"].to_pylist()
        assert back["fragment_index"].to_pylist() == [0, 1, 2]


def test_page_fetch_stage_and_column_pruning():
    """GenerateTableFetch with column pruning + the PageFetch actor
    stage (plain-callable form): pages must cover the filtered table
    exactly once and carry only the requested columns."""
    import duckdb
    import os
    import tempfile

    import pyarrow as pa

    from nifi_ray.sources.sql import PageFetch, generate_table_fetch

    db = os.path.join(tempfile.mkdtemp(), "p.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE ev (id BIGINT, v DOUBLE, junk VARCHAR)")
    con.execute(
        "INSERT INTO ev SELECT range, range * 1.5, 'x' FROM range(20)"
    )
    con.close()

    stmts = generate_table_fetch(
        "ev", "id", page_size=6, database=db,
        where="id >= 2", columns=["id", "v"],
    )
    assert len(stmts) == 3  # 18 filtered rows / 6
    out = PageFetch(database=db)(pa.table({"sql": pa.array(stmts)}))
    assert out.schema.names == ["id", "v"]  # junk pruned in the SQL
    assert sorted(out["id"].to_pylist()) == list(range(2, 20))


def test_generate_table_fetch_keyset_ranges_and_skew():
    import duckdb
    import os
    import tempfile

    from nifi_ray.sources.sql import PageFetch, generate_table_fetch

    db = os.path.join(tempfile.mkdtemp(), "k.duckdb")
    con = duckdb.connect(db)
    # heavy key skew: 30 rows share k=5; keyset pages must stay
    # DISJOINT (duplicate boundaries collapse) with an exact union
    con.execute("CREATE TABLE ev (k BIGINT, v BIGINT)")
    con.execute("INSERT INTO ev SELECT 5, range FROM range(30)")
    con.execute("INSERT INTO ev SELECT range, range FROM range(10)")
    con.close()

    stmts = generate_table_fetch("ev", "k", page_size=7, database=db)
    # keyset predicates, never OFFSET re-sorts
    assert all("OFFSET" not in s and "LIMIT" not in s for s in stmts)
    import pyarrow as pa

    out = PageFetch(database=db)(pa.table({"sql": pa.array(stmts)}))
    assert out.num_rows == 40  # union exact: no dup/drop despite skew
    assert sorted(out["v"].to_pylist()) == sorted(list(range(30)) + list(range(10)))
