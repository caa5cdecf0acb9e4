"""Avro object-container format — the avro/kite bundle processors.

NiFi 1.1.2's canonical record format is Avro: ExecuteSQL streams
ResultSets to Avro (STD/util/JdbcCommon.java:76-177), the avro bundle
converts/splits/inspects it (nifi-avro-bundle/.../ConvertAvroToJSON.java,
SplitAvro.java:60-132, ExtractAvroMetadata.java:53-104) and the kite
bundle infers schemas and converts CSV/JSON into it
(nifi-kite-bundle/.../InferAvroSchema.java, ConvertCSVToAvro.java,
ConvertJSONToAvro.java). No Avro library ships in this container, so
this module implements the object-container spec (magic ``Obj\\x01``,
header metadata map, zigzag-varint binary encoding, sync-marker-delimited
blocks; null/deflate/snappy codecs) in pure Python.

Scale notes: Avro is row-oriented — records decode sequentially by
construction, so the unit of parallelism is the FILE (one decode task
per container via ``read_binary_files``), exactly how NiFi parallelizes
(one FlowFile per container). The lake's hot path stays Parquet; Avro
is the interop edge. Sync markers are derived deterministically from
(schema, codec) so retried writes are byte-identical (idempotent
two-phase commit, same convention as the lake's part files).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

import pyarrow as pa

MAGIC = b"Obj\x01"

# ------------------------------------------------------------ varint


def _enc_long(n: int, out: bytearray) -> None:
    """zigzag + base-128 varint (Avro spec 'Binary Encoding')."""
    n = (n << 1) ^ (n >> 63) if n >= 0 else (((-n) << 1) - 1)
    while n & ~0x7F:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)


def _dec_long(buf, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


# ------------------------------------------------- schema conversion

_ARROW_TO_AVRO = {
    pa.types.is_boolean: "boolean",
    pa.types.is_int8: "int",
    pa.types.is_int16: "int",
    pa.types.is_int32: "int",
    pa.types.is_int64: "long",
    pa.types.is_float32: "float",
    pa.types.is_float64: "double",
    pa.types.is_binary: "bytes",
    pa.types.is_large_binary: "bytes",
    pa.types.is_string: "string",
    pa.types.is_large_string: "string",
}


def _arrow_type_to_avro(t: pa.DataType):
    for pred, avro in _ARROW_TO_AVRO.items():
        if pred(t):
            return avro
    if pa.types.is_timestamp(t):
        lt = "timestamp-micros" if t.unit == "us" else "timestamp-millis"
        return {"type": "long", "logicalType": lt}
    if pa.types.is_date32(t):
        return {"type": "int", "logicalType": "date"}
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return {"type": "array", "items": _arrow_type_to_avro(t.value_type)}
    if pa.types.is_struct(t):
        return {
            "type": "record",
            "name": "rec",
            "fields": [
                {"name": f.name, "type": _arrow_type_to_avro(f.type)} for f in t
            ],
        }
    if pa.types.is_dictionary(t):
        return _arrow_type_to_avro(t.value_type)
    raise TypeError(f"no Avro mapping for Arrow type {t}")


def arrow_to_avro_schema(schema: pa.Schema, name: str = "nifi_ray_record") -> dict:
    """InferAvroSchema analog over an Arrow schema (the kite bundle
    infers from CSV/JSON content; our read_csv/read_json already yield
    Arrow, so inference = this mapping). Nullable → union with null."""
    fields = []
    for f in schema:
        t = _arrow_type_to_avro(f.type)
        if f.nullable:
            t = ["null", t]
        fields.append({"name": f.name, "type": t})
    return {"type": "record", "name": name, "fields": fields}


def _avro_type_to_arrow(t) -> tuple[pa.DataType, bool]:
    """→ (arrow type, nullable)."""
    if isinstance(t, list):  # union
        branches = [b for b in t if b != "null"]
        if len(branches) != 1:
            raise TypeError(f"only unions of null+one type supported, got {t}")
        inner, _ = _avro_type_to_arrow(branches[0])
        return inner, True
    if isinstance(t, dict):
        lt = t.get("logicalType")
        if lt == "timestamp-micros":
            return pa.timestamp("us"), False
        if lt == "timestamp-millis":
            return pa.timestamp("ms"), False
        if lt == "date":
            return pa.date32(), False
        kind = t["type"]
        if kind == "array":
            inner, _ = _avro_type_to_arrow(t["items"])
            return pa.list_(inner), False
        if kind == "record":
            return (
                pa.struct(
                    [
                        pa.field(f["name"], _avro_type_to_arrow(f["type"])[0])
                        for f in t["fields"]
                    ]
                ),
                False,
            )
        if kind == "enum":
            return pa.string(), False
        if kind == "fixed":
            return pa.binary(t["size"]), False
        if kind == "map":
            inner, _ = _avro_type_to_arrow(t["values"])
            return pa.map_(pa.string(), inner), False
        return _avro_type_to_arrow(kind)
    prim = {
        "null": pa.null(),
        "boolean": pa.bool_(),
        "int": pa.int32(),
        "long": pa.int64(),
        "float": pa.float32(),
        "double": pa.float64(),
        "bytes": pa.binary(),
        "string": pa.string(),
    }
    return prim[t], t == "null"


def avro_to_arrow_schema(avro: dict) -> pa.Schema:
    if avro.get("type") != "record":
        raise TypeError("container schema must be a record")
    fields = []
    for f in avro["fields"]:
        t, nullable = _avro_type_to_arrow(f["type"])
        fields.append(pa.field(f["name"], t, nullable=nullable))
    return pa.schema(fields)


# ----------------------------------------------- value codecs (scalar)


def _encoder(t):
    """schema node → fn(value, out: bytearray). Values are plain Python
    (Arrow columns are pre-converted via to_pylist, with temporal types
    lowered to ints first — see _prep_column)."""
    if isinstance(t, list):  # union: null + one branch
        branches = [b for b in t]
        null_ix = branches.index("null") if "null" in branches else None
        other_ix = 1 - null_ix if null_ix is not None and len(branches) == 2 else None
        if other_ix is None:
            raise TypeError(f"only null+one unions supported, got {t}")
        enc = _encoder(branches[other_ix])

        def enc_union(v, out):
            if v is None:
                _enc_long(null_ix, out)
            else:
                _enc_long(other_ix, out)
                enc(v, out)

        return enc_union
    if isinstance(t, dict):
        kind = t["type"]
        if kind == "array":
            item = _encoder(t["items"])

            def enc_array(v, out):
                if v:
                    _enc_long(len(v), out)
                    for x in v:
                        item(x, out)
                _enc_long(0, out)

            return enc_array
        if kind == "map":
            val = _encoder(t["values"])

            def enc_map(v, out):
                if v:
                    _enc_long(len(v), out)
                    for k, x in v.items():
                        kb = k.encode("utf-8")
                        _enc_long(len(kb), out)
                        out += kb
                        val(x, out)
                _enc_long(0, out)

            return enc_map
        if kind == "record":
            encs = [(f["name"], _encoder(f["type"])) for f in t["fields"]]

            def enc_record(v, out):
                for name, e in encs:
                    e(v[name], out)

            return enc_record
        if kind == "enum":
            ix = {s: i for i, s in enumerate(t["symbols"])}
            return lambda v, out: _enc_long(ix[v], out)
        if kind == "fixed":
            size = t["size"]

            def enc_fixed(v, out):
                if len(v) != size:
                    raise ValueError(f"fixed size {size} != {len(v)}")
                out += v

            return enc_fixed
        return _encoder(kind)  # logical types encode as their base
    if t in ("int", "long"):
        return _enc_long
    if t == "string":

        def enc_str(v, out):
            b = v.encode("utf-8")
            _enc_long(len(b), out)
            out += b

        return enc_str
    if t == "bytes":

        def enc_bytes(v, out):
            _enc_long(len(v), out)
            out += v

        return enc_bytes
    if t == "boolean":
        return lambda v, out: out.append(1 if v else 0)
    if t == "double":
        return lambda v, out: out.extend(struct.pack("<d", v))
    if t == "float":
        return lambda v, out: out.extend(struct.pack("<f", v))
    if t == "null":
        return lambda v, out: None
    raise TypeError(f"no encoder for {t}")


def _decoder(t):
    """schema node → fn(buf, pos) -> (value, pos)."""
    if isinstance(t, list):
        decs = [_decoder(b) for b in t]

        def dec_union(buf, pos):
            ix, pos = _dec_long(buf, pos)
            return decs[ix](buf, pos)

        return dec_union
    if isinstance(t, dict):
        kind = t["type"]
        if kind == "array":
            item = _decoder(t["items"])

            def dec_array(buf, pos):
                out = []
                while True:
                    n, pos = _dec_long(buf, pos)
                    if n == 0:
                        return out, pos
                    if n < 0:  # block with byte-size prefix
                        n = -n
                        _, pos = _dec_long(buf, pos)
                    for _ in range(n):
                        v, pos = item(buf, pos)
                        out.append(v)

            return dec_array
        if kind == "map":
            val = _decoder(t["values"])

            def dec_map(buf, pos):
                out = {}
                while True:
                    n, pos = _dec_long(buf, pos)
                    if n == 0:
                        return out, pos
                    if n < 0:
                        n = -n
                        _, pos = _dec_long(buf, pos)
                    for _ in range(n):
                        ln, pos = _dec_long(buf, pos)
                        k = bytes(buf[pos : pos + ln]).decode("utf-8")
                        pos += ln
                        out[k], pos = val(buf, pos)

            return dec_map
        if kind == "record":
            decs = [(f["name"], _decoder(f["type"])) for f in t["fields"]]

            def dec_record(buf, pos):
                out = {}
                for name, d in decs:
                    out[name], pos = d(buf, pos)
                return out, pos

            return dec_record
        if kind == "enum":
            syms = t["symbols"]

            def dec_enum(buf, pos):
                ix, pos = _dec_long(buf, pos)
                return syms[ix], pos

            return dec_enum
        if kind == "fixed":
            size = t["size"]
            return lambda buf, pos: (bytes(buf[pos : pos + size]), pos + size)
        return _decoder(kind)
    if t in ("int", "long"):
        return _dec_long
    if t == "string":

        def dec_str(buf, pos):
            n, pos = _dec_long(buf, pos)
            return bytes(buf[pos : pos + n]).decode("utf-8"), pos + n

        return dec_str
    if t == "bytes":

        def dec_bytes(buf, pos):
            n, pos = _dec_long(buf, pos)
            return bytes(buf[pos : pos + n]), pos + n

        return dec_bytes
    if t == "boolean":
        return lambda buf, pos: (buf[pos] != 0, pos + 1)
    if t == "double":
        return lambda buf, pos: (struct.unpack_from("<d", buf, pos)[0], pos + 8)
    if t == "float":
        return lambda buf, pos: (struct.unpack_from("<f", buf, pos)[0], pos + 4)
    if t == "null":
        return lambda buf, pos: (None, pos)
    raise TypeError(f"no decoder for {t}")


# ---------------------------------------------------- block codecs


def _compress(data: bytes, codec: str) -> bytes:
    if codec == "null":
        return data
    if codec == "deflate":  # raw deflate, no zlib header (spec)
        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        return c.compress(data) + c.flush()
    if codec == "snappy":  # snappy body + 4-byte BE CRC32 of the plain data
        body = pa.Codec("snappy").compress(data, asbytes=True)
        return body + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    raise ValueError(f"unsupported codec {codec}")


def _decompress(data: bytes, codec: str) -> bytes:
    if codec == "null":
        return data
    if codec == "deflate":
        return zlib.decompress(data, -15)
    if codec == "snappy":
        body, crc = data[:-4], struct.unpack(">I", data[-4:])[0]
        # snappy streams lead with the uncompressed length as a plain varint
        n, shift, i = 0, 0, 0
        while True:
            b = body[i]
            n |= (b & 0x7F) << shift
            i += 1
            if not b & 0x80:
                break
            shift += 7
        out = pa.Codec("snappy").decompress(body, decompressed_size=n, asbytes=True)
        if zlib.crc32(out) & 0xFFFFFFFF != crc:
            raise ValueError("snappy block CRC mismatch")
        return out
    raise ValueError(f"unsupported codec {codec}")


# ---------------------------------------------------- container I/O


def _sync_marker(schema_json: str, codec: str) -> bytes:
    import hashlib

    return hashlib.md5((schema_json + "\x00" + codec).encode("utf-8")).digest()


def _prep_column(col: pa.ChunkedArray | pa.Array):
    """Arrow column → list of encodable Python values (temporal types
    lowered to their Avro base ints so the scalar encoder stays dumb)."""
    import pyarrow.compute as pc

    t = col.type
    if pa.types.is_timestamp(t) or pa.types.is_date32(t):
        base = pa.int64() if pa.types.is_timestamp(t) else pa.int32()
        return pc.cast(col, base).to_pylist()
    if pa.types.is_dictionary(t):
        return pc.cast(col, t.value_type).to_pylist()
    return col.to_pylist()


def table_to_avro(
    table: pa.Table,
    codec: str = "deflate",
    block_rows: int = 4096,
    schema: dict | None = None,
) -> bytes:
    """Arrow table → one Avro object container (bytes)."""
    avro_schema = schema or arrow_to_avro_schema(table.schema)
    schema_json = json.dumps(avro_schema, separators=(",", ":"))
    sync = _sync_marker(schema_json, codec)

    out = bytearray(MAGIC)
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    _enc_long(len(meta), out)
    for k, v in meta.items():
        kb = k.encode()
        _enc_long(len(kb), out)
        out += kb
        _enc_long(len(v), out)
        out += v
    _enc_long(0, out)
    out += sync

    encs = [_encoder(f["type"]) for f in avro_schema["fields"]]
    names = [f["name"] for f in avro_schema["fields"]]
    cols = [_prep_column(table[n]) for n in names]
    n = table.num_rows
    for lo in range(0, n, block_rows):
        hi = min(lo + block_rows, n)
        block = bytearray()
        for i in range(lo, hi):
            for enc, col in zip(encs, cols):
                enc(col[i], block)
        payload = _compress(bytes(block), codec)
        _enc_long(hi - lo, out)
        _enc_long(len(payload), out)
        out += payload
        out += sync
    return bytes(out)


def _read_header(data) -> tuple[dict, str, bytes, int]:
    """→ (avro schema dict, codec, sync marker, pos after header)."""
    if bytes(data[:4]) != MAGIC:
        raise ValueError("not an Avro object container (bad magic)")
    pos = 4
    meta = {}
    while True:
        n, pos = _dec_long(data, pos)
        if n == 0:
            break
        if n < 0:
            n = -n
            _, pos = _dec_long(data, pos)
        for _ in range(n):
            ln, pos = _dec_long(data, pos)
            k = bytes(data[pos : pos + ln]).decode()
            pos += ln
            ln, pos = _dec_long(data, pos)
            meta[k] = bytes(data[pos : pos + ln])
            pos += ln
    sync = bytes(data[pos : pos + 16])
    pos += 16
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    return schema, codec, sync, pos


def _iter_blocks(data, pos: int, sync: bytes):
    """yield (record_count, raw_block_bytes)."""
    total = len(data)
    while pos < total:
        cnt, pos = _dec_long(data, pos)
        size, pos = _dec_long(data, pos)
        yield cnt, data[pos : pos + size]
        pos += size
        if bytes(data[pos : pos + 16]) != sync:
            raise ValueError("sync marker mismatch (corrupt container)")
        pos += 16


def avro_to_table(data: bytes, columns: list[str] | None = None) -> pa.Table:
    """Avro object container → Arrow table. ``columns`` prunes AFTER
    decode (Avro is row-oriented; there is no column skip)."""
    schema, codec, sync, pos = _read_header(data)
    arrow_schema = avro_to_arrow_schema(schema)
    decs = [_decoder(f["type"]) for f in schema["fields"]]
    names = [f["name"] for f in schema["fields"]]
    rows: list[list] = [[] for _ in names]
    for cnt, raw in _iter_blocks(data, pos, sync):
        buf = _decompress(bytes(raw), codec)
        p = 0
        for _ in range(cnt):
            for j, d in enumerate(decs):
                v, p = d(buf, p)
                rows[j].append(v)
    arrays = []
    for name, vals in zip(names, rows):
        f = arrow_schema.field(name)
        t = f.type
        if pa.types.is_timestamp(t):
            arrays.append(pa.array(vals, pa.int64()).cast(t))
        elif pa.types.is_date32(t):
            arrays.append(pa.array(vals, pa.int32()).cast(t))
        else:
            arrays.append(pa.array(vals, t))
    table = pa.Table.from_arrays(arrays, schema=arrow_schema)
    return table.select(columns) if columns else table


# ------------------------------------------ canonical form + fingerprint

_PCF_PRIMS = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string",
}
_PCF_ORDER = ("name", "type", "fields", "symbols", "items", "values", "size")


def _pcf(node, namespace: str = ""):
    """Parsing Canonical Form (Avro spec): strip non-structural
    attributes, resolve fullnames, order keys canonically."""
    if isinstance(node, str):
        if node in _PCF_PRIMS:
            return node
        return node if "." in node or not namespace else f"{namespace}.{node}"
    if isinstance(node, list):
        return [_pcf(b, namespace) for b in node]
    kind = node["type"]
    if kind in _PCF_PRIMS and "logicalType" in node:
        return kind  # logical types are not part of PCF
    out = {}
    ns = node.get("namespace", namespace)
    for key in _PCF_ORDER:
        if key not in node:
            continue
        v = node[key]
        if key == "name":
            out["name"] = v if "." in v else (f"{ns}.{v}" if ns else v)
        elif key == "type":
            out["type"] = _pcf(v, ns) if kind not in ("record", "enum", "fixed", "array", "map") else v
        elif key == "fields":
            out["fields"] = [
                {"name": f["name"], "type": _pcf(f["type"], ns)} for f in v
            ]
        elif key in ("items", "values"):
            out[key] = _pcf(v, ns)
        else:
            out[key] = v
    return out


def canonical_form(schema: dict | str) -> str:
    node = json.loads(schema) if isinstance(schema, str) else schema
    return json.dumps(_pcf(node), separators=(",", ":"))


_CRC64_EMPTY = 0xC15D213AA4D7A795
_CRC64_TABLE: list[int] | None = None


def crc64_avro(data: bytes) -> int:
    """CRC-64-AVRO schema fingerprint (Avro spec 'Schema Fingerprints')."""
    global _CRC64_TABLE
    if _CRC64_TABLE is None:
        tbl = []
        for i in range(256):
            fp = i
            for _ in range(8):
                fp = (fp >> 1) ^ (_CRC64_EMPTY & -(fp & 1))
            tbl.append(fp)
        _CRC64_TABLE = tbl
    fp = _CRC64_EMPTY
    for b in data:
        fp = (fp >> 8) ^ _CRC64_TABLE[(fp ^ b) & 0xFF]
    return fp


# ------------------------------------------------- processor analogs


def extract_avro_metadata(data: bytes, count: bool = True) -> dict:
    """ExtractAvroMetadata (nifi-avro-bundle/.../ExtractAvroMetadata.java:
    53-104): schema fingerprint of the Parsing Canonical Form, type/name,
    codec, and (optionally, it costs a block scan) the item count."""
    schema, codec, sync, pos = _read_header(data)
    pcf = canonical_form(schema)
    out = {
        "schema.type": schema.get("type"),
        "schema.name": schema.get("name"),
        "schema.fingerprint": f"{crc64_avro(pcf.encode()):016x}",
        "schema.canonical": pcf,
        "avro.codec": codec,
    }
    if count:
        out["item.count"] = sum(c for c, _ in _iter_blocks(data, pos, sync))
    return out


def split_avro(data: bytes, output_size: int = 1, strategy: str = "datafile") -> list:
    """SplitAvro (nifi-avro-bundle/.../SplitAvro.java:60-132): split a
    container into chunks of ``output_size`` records. ``datafile`` wraps
    each chunk in a full container (schema + codec preserved);
    ``record`` returns bare record bytes (null codec, no wrapper)."""
    schema, codec, sync, pos = _read_header(data)
    decs = [_decoder(f["type"]) for f in schema["fields"]]
    schema_json = json.dumps(schema, separators=(",", ":"))

    # record boundaries inside each decompressed block
    chunks: list[bytes] = []
    pending = bytearray()
    pending_n = 0
    for cnt, raw in _iter_blocks(data, pos, sync):
        buf = _decompress(bytes(raw), codec)
        p = 0
        for _ in range(cnt):
            start = p
            for d in decs:
                _, p = d(buf, p)
            pending += buf[start:p]
            pending_n += 1
            if pending_n == output_size:
                chunks.append(bytes(pending))
                pending = bytearray()
                pending_n = 0
    if pending_n:
        chunks.append(bytes(pending))

    if strategy == "record":
        return chunks

    out = []
    for chunk in chunks:
        head = bytearray(MAGIC)
        meta = {"avro.schema": schema_json.encode(), "avro.codec": b"null"}
        _enc_long(len(meta), head)
        for k, v in meta.items():
            kb = k.encode()
            _enc_long(len(kb), head)
            head += kb
            _enc_long(len(v), head)
            head += v
        _enc_long(0, head)
        s = _sync_marker(schema_json, "null")
        head += s
        # count of records in this chunk: recompute (last chunk may be short)
        cnt = _count_records(chunk, decs)
        _enc_long(cnt, head)
        _enc_long(len(chunk), head)
        head += chunk
        head += s
        out.append(bytes(head))
    return out


def _count_records(buf: bytes, decs) -> int:
    p, n = 0, 0
    while p < len(buf):
        for d in decs:
            _, p = d(buf, p)
        n += 1
    return n


def avro_records_to_json(data: bytes) -> list[str]:
    """ConvertAvroToJSON (nifi-avro-bundle/.../ConvertAvroToJSON.java):
    one JSON object per record, field order preserved."""
    schema, codec, sync, pos = _read_header(data)
    decs = [(f["name"], _decoder(f["type"])) for f in schema["fields"]]
    out = []
    for cnt, raw in _iter_blocks(data, pos, sync):
        buf = _decompress(bytes(raw), codec)
        p = 0
        for _ in range(cnt):
            rec = {}
            for name, d in decs:
                rec[name], p = d(buf, p)
            out.append(json.dumps(rec, separators=(",", ":"), default=repr))
    return out


def infer_avro_schema(table_or_schema) -> str:
    """InferAvroSchema (kite bundle): JSON schema string from content —
    here from the Arrow schema Ray's readers already inferred."""
    schema = (
        table_or_schema.schema
        if isinstance(table_or_schema, pa.Table)
        else table_or_schema
    )
    return json.dumps(arrow_to_avro_schema(schema), separators=(",", ":"))


# ------------------------------------------------- Dataset-level I/O


def read_avro(paths, columns: list[str] | None = None):
    """Avro containers → Dataset. One decode task per file (the format's
    natural parallel unit); column prune applies post-decode."""
    import ray.data as rd

    def decode(batch: pa.Table) -> pa.Table:
        tables = [avro_to_table(b, columns=columns) for b in batch["bytes"].to_pylist()]
        return pa.concat_tables(tables) if tables else pa.table({})

    return rd.read_binary_files(paths).map_batches(
        decode, batch_format="pyarrow", batch_size=1
    )


def write_avro(ds, out_dir: str, codec: str = "deflate") -> int:
    """Dataset → one container per block under ``out_dir`` (tmp-write +
    atomic rename — PutFile's two-phase contract). Returns file count."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string())})
        data = table_to_avro(batch, codec=codec)
        import hashlib

        name = hashlib.md5(data[:4096] + str(batch.num_rows).encode()).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{name}.avro")
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path], pa.string())})

    written = ds.map_batches(write_block, batch_format="pyarrow").take_all()
    return len(written)
