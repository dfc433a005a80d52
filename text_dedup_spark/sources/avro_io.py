"""Pure-Python Apache Avro object-container codec (public Avro 1.12 spec).

Exists to make the Iceberg table format (sources/iceberg.py) executable in
environments without the Iceberg runtime jar: Iceberg manifests and
manifest lists are Avro object-container files, so a dependency-free
reader/writer for the generic datum encoding is the one missing piece
between "metadata JSON" and a working table.

Scope — the generic binary encoding, schema-driven:
- primitives: null, boolean, int, long (zigzag varints), float, double,
  bytes, string, fixed;
- complex: records (field order), enums (index), arrays and maps (block
  runs, including the negative-count + block-size form on read), unions
  (branch index prefix);
- named-type references (a previously defined record/enum/fixed name used
  as a type), namespaces ignored for resolution by full name;
- container framing: Obj\\x01 magic, file metadata map (avro.schema,
  avro.codec), 16-byte sync marker, per-block record count + byte size,
  null and deflate codecs (raw DEFLATE, RFC 1951, as the spec requires).

Logical types are annotations over the underlying primitive encodings and
need no special handling here.

Correctness evidence (tests/test_iceberg_native.py): bidirectional
conformance against the REAL Apache Avro Java library that ships inside
Spark's JVM (avro-1.12.1.jar) — files written here are read back by
org.apache.avro.file.DataFileReader, and files written by the Java
GenericDatumWriter are decoded here, so a matched encode/decode bug
cannot hide.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib


# ------------------------------------------------------------- primitives


def _write_long(out: io.BytesIO, v: int) -> None:
    """zigzag varint (Avro int and long share this encoding)."""
    u = (v << 1) ^ (v >> 63) if v < 0 else (v << 1)
    u &= (1 << 64) - 1
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _read_long(buf: memoryview, pos: int) -> tuple[int, int]:
    u = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("Avro varint truncated")
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("Avro varint too long")
    return (u >> 1) ^ -(u & 1), pos


def _write_bytes(out: io.BytesIO, v: bytes) -> None:
    _write_long(out, len(v))
    out.write(v)


def _read_bytes(buf: memoryview, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(buf, pos)
    if n < 0 or pos + n > len(buf):
        raise ValueError("Avro bytes length out of range")
    return bytes(buf[pos : pos + n]), pos + n


# ------------------------------------------------------- schema handling


def _normalize_schema(schema, names: dict) -> object:
    """Register named types and resolve string references to full names."""
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return [_normalize_schema(s, names) for s in schema]
    t = schema.get("type")
    if t in ("record", "error"):
        name = schema.get("name")
        full = name if "." in (name or "") else (
            f"{schema['namespace']}.{name}" if schema.get("namespace") else name)
        names[full] = schema
        if name and name != full:
            names[name] = schema
        for f in schema.get("fields", []):
            f["type"] = _normalize_schema(f["type"], names)
        return schema
    if t in ("enum", "fixed"):
        name = schema.get("name")
        if name:
            names[name] = schema
        return schema
    if t == "array":
        schema["items"] = _normalize_schema(schema["items"], names)
        return schema
    if t == "map":
        schema["values"] = _normalize_schema(schema["values"], names)
        return schema
    if isinstance(t, (dict, list)):
        schema["type"] = _normalize_schema(t, names)
        return schema["type"] if set(schema) == {"type"} else schema
    return schema


_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


def _resolve(schema, names: dict):
    if isinstance(schema, str) and schema not in _PRIMITIVES:
        if schema not in names:
            raise ValueError(f"unknown Avro named type {schema!r}")
        return names[schema]
    return schema


# --------------------------------------------------------------- encoding


def _write_datum(out: io.BytesIO, schema, datum, names: dict) -> None:
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union
        for idx, branch in enumerate(schema):
            if _union_match(branch, datum, names):
                _write_long(out, idx)
                _write_datum(out, branch, datum, names)
                return
        raise ValueError(f"datum {datum!r} matches no union branch {schema!r}")
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        if datum is not None:
            raise ValueError("non-null datum for null schema")
    elif t == "boolean":
        out.write(b"\x01" if datum else b"\x00")
    elif t in ("int", "long"):
        _write_long(out, int(datum))
    elif t == "float":
        out.write(struct.pack("<f", float(datum)))
    elif t == "double":
        out.write(struct.pack("<d", float(datum)))
    elif t == "bytes":
        _write_bytes(out, bytes(datum))
    elif t == "string":
        _write_bytes(out, datum.encode("utf-8"))
    elif t == "fixed":
        b = bytes(datum)
        if len(b) != schema["size"]:
            raise ValueError("fixed-size mismatch")
        out.write(b)
    elif t == "enum":
        _write_long(out, schema["symbols"].index(datum))
    elif t == "record":
        for f in schema["fields"]:
            if f["name"] not in datum and "default" in f:
                _write_datum(out, f["type"], f["default"], names)
            else:
                _write_datum(out, f["type"], datum[f["name"]], names)
    elif t == "array":
        items = list(datum)
        if items:
            _write_long(out, len(items))
            for it in items:
                _write_datum(out, schema["items"], it, names)
        _write_long(out, 0)
    elif t == "map":
        if datum:
            _write_long(out, len(datum))
            for k, v in datum.items():
                _write_bytes(out, k.encode("utf-8"))
                _write_datum(out, schema["values"], v, names)
        _write_long(out, 0)
    else:
        raise ValueError(f"unsupported Avro type {t!r}")


def _union_match(branch, datum, names: dict) -> bool:
    branch = _resolve(branch, names)
    t = branch if isinstance(branch, str) else branch["type"]
    if t == "null":
        return datum is None
    if datum is None:
        return False
    if t == "boolean":
        return isinstance(datum, bool)
    if t in ("int", "long"):
        return isinstance(datum, int) and not isinstance(datum, bool)
    if t in ("float", "double"):
        return isinstance(datum, float)
    if t == "string":
        return isinstance(datum, str)
    if t in ("bytes", "fixed"):
        return isinstance(datum, (bytes, bytearray))
    if t == "record":
        return isinstance(datum, dict)
    if t == "array":
        return isinstance(datum, (list, tuple))
    if t == "map":
        return isinstance(datum, dict)
    if t == "enum":
        return isinstance(datum, str)
    return False


def _read_datum(buf: memoryview, pos: int, schema, names: dict):
    schema = _resolve(schema, names)
    if isinstance(schema, list):
        idx, pos = _read_long(buf, pos)
        if not 0 <= idx < len(schema):
            raise ValueError("Avro union index out of range")
        return _read_datum(buf, pos, schema[idx], names)
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return None, pos
    if t == "boolean":
        if pos >= len(buf):
            raise ValueError("Avro stream truncated")
        return buf[pos] != 0, pos + 1
    if t in ("int", "long"):
        return _read_long(buf, pos)
    if t == "float":
        return struct.unpack("<f", buf[pos : pos + 4])[0], pos + 4
    if t == "double":
        return struct.unpack("<d", buf[pos : pos + 8])[0], pos + 8
    if t == "bytes":
        return _read_bytes(buf, pos)
    if t == "string":
        b, pos = _read_bytes(buf, pos)
        return b.decode("utf-8"), pos
    if t == "fixed":
        n = schema["size"]
        if pos + n > len(buf):
            raise ValueError("Avro fixed truncated")
        return bytes(buf[pos : pos + n]), pos + n
    if t == "enum":
        idx, pos = _read_long(buf, pos)
        return schema["symbols"][idx], pos
    if t == "record":
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = _read_datum(buf, pos, f["type"], names)
        return rec, pos
    if t == "array":
        out = []
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:
                n = -n
                _, pos = _read_long(buf, pos)  # block byte size, unused
            for _ in range(n):
                v, pos = _read_datum(buf, pos, schema["items"], names)
                out.append(v)
    if t == "map":
        out = {}
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:
                n = -n
                _, pos = _read_long(buf, pos)
            for _ in range(n):
                k, pos = _read_bytes(buf, pos)
                out[k.decode("utf-8")], pos = _read_datum(buf, pos, schema["values"], names)
    raise ValueError(f"unsupported Avro type {t!r}")


# -------------------------------------------------------------- container

_MAGIC = b"Obj\x01"


def write_avro_file(path: str, schema, records: list[dict],
                    codec: str = "deflate", metadata: dict | None = None) -> None:
    """Write an Avro object-container file (one block; manifests are small)."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    schema = json.loads(json.dumps(schema))  # private copy: _normalize mutates
    names: dict = {}
    norm = _normalize_schema(schema, names)

    body = io.BytesIO()
    for rec in records:
        _write_datum(body, norm, rec, names)
    payload = body.getvalue()
    if codec == "deflate":
        co = zlib.compressobj(6, zlib.DEFLATED, -15)  # raw DEFLATE per spec
        payload = co.compress(payload) + co.flush()
    elif codec != "null":
        raise ValueError(f"unsupported Avro codec {codec!r}")

    # deterministic sync marker from schema + content (no RNG needed)
    import hashlib

    sync = hashlib.md5(json.dumps(schema, sort_keys=True).encode()
                       + payload[:64] + len(records).to_bytes(8, "big")).digest()

    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    for k, v in (metadata or {}).items():
        meta[k] = v if isinstance(v, bytes) else str(v).encode()

    out = io.BytesIO()
    out.write(_MAGIC)
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)
    out.write(sync)
    if records:
        _write_long(out, len(records))
        _write_long(out, len(payload))
        out.write(payload)
        out.write(sync)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(out.getvalue())
    os.replace(tmp, path)


def read_avro_file(path: str) -> tuple[dict, list[dict], dict]:
    """Read an Avro object-container file -> (schema, records, metadata)."""
    with open(path, "rb") as f:
        data = f.read()
    buf = memoryview(data)
    if data[:4] != _MAGIC:
        raise ValueError("not an Avro object-container file")
    pos = 4
    meta: dict = {}
    while True:
        n, pos = _read_long(buf, pos)
        if n == 0:
            break
        if n < 0:
            n = -n
            _, pos = _read_long(buf, pos)
        for _ in range(n):
            k, pos = _read_bytes(buf, pos)
            v, pos = _read_bytes(buf, pos)
            meta[k.decode("utf-8")] = v
    sync = bytes(buf[pos : pos + 16])
    pos += 16
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    names: dict = {}
    norm = _normalize_schema(json.loads(json.dumps(schema)), names)
    records: list[dict] = []
    while pos < len(buf):
        count, pos = _read_long(buf, pos)
        size, pos = _read_long(buf, pos)
        block = bytes(buf[pos : pos + size])
        pos += size
        if bytes(buf[pos : pos + 16]) != sync:
            raise ValueError("Avro block sync marker mismatch")
        pos += 16
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported Avro codec {codec!r}")
        bbuf = memoryview(block)
        bpos = 0
        for _ in range(count):
            rec, bpos = _read_datum(bbuf, bpos, norm, names)
            records.append(rec)
        if bpos != len(block):
            raise ValueError("Avro block has trailing bytes")
    return schema, records, meta
