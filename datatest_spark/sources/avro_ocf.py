"""Minimal Apache Avro Object Container File reader/writer.

Written from the PUBLIC Avro 1.11 specification
(https://avro.apache.org/docs/1.11.1/specification/) because this
environment ships no avro library; needed by
:mod:`.iceberg_lite`, whose manifest-list and manifest files are Avro
OCF per the Apache Iceberg spec.  Generic over the embedded writer
schema — records, enums, arrays, maps, unions, fixed, and all
primitives decode/encode; logical types pass through as their base
type (Iceberg manifests only need timestamps-as-long).

Supported codecs: ``null`` and ``deflate`` (raw DEFLATE per the spec —
no zlib header).  Reading resolves against the writer schema only (no
reader-schema migration); that is exactly the contract a metadata
consumer needs, since the file tells you its own schema.

Not a general Avro implementation: no aliases, no default-based
schema evolution, no snappy/zstd codecs.  Each unsupported construct
raises with the construct's name rather than mis-decoding.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any, Dict, Iterable, List, Tuple

__all__ = ["read_ocf", "write_ocf", "SCHEMA_KEY"]

_MAGIC = b"Obj\x01"
SCHEMA_KEY = "avro.schema"
_CODEC_KEY = "avro.codec"
_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double",
               "bytes", "string"}


# ---------------------------------------------------------------------------
# zigzag varint (the Avro int/long wire form)
# ---------------------------------------------------------------------------

def _read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated Avro varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # zigzag decode


def _write_long(out: bytearray, value: int) -> None:
    n = (value << 1) ^ (value >> 63) if value < 0 else value << 1
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            break


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated Avro bytes")
    return data


def _write_bytes(out: bytearray, data: bytes) -> None:
    _write_long(out, len(data))
    out.extend(data)


# ---------------------------------------------------------------------------
# schema walk — named types are registered so references resolve
# ---------------------------------------------------------------------------

def _full_name(schema: dict, namespace: str) -> str:
    name = schema["name"]
    if "." in name:
        return name
    ns = schema.get("namespace", namespace)
    return f"{ns}.{name}" if ns else name


def _register_named(schema: Any, names: Dict[str, Any],
                    namespace: str = "") -> None:
    if isinstance(schema, list):
        for s in schema:
            _register_named(s, names, namespace)
    elif isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "enum", "fixed"):
            fn = _full_name(schema, namespace)
            names[fn] = schema
            names.setdefault(schema["name"], schema)
            ns = fn.rsplit(".", 1)[0] if "." in fn else namespace
            if t == "record":
                for f in schema["fields"]:
                    _register_named(f["type"], names, ns)
        elif t == "array":
            _register_named(schema["items"], names, namespace)
        elif t == "map":
            _register_named(schema["values"], names, namespace)


def _resolve(schema: Any, names: Dict[str, Any]) -> Any:
    if isinstance(schema, str) and schema not in _PRIMITIVES:
        try:
            return names[schema]
        except KeyError:
            raise ValueError(f"unresolved Avro named type {schema!r}")
    return schema


# ---------------------------------------------------------------------------
# datum decode / encode
# ---------------------------------------------------------------------------

def _decode(schema: Any, buf: io.BytesIO, names: Dict[str, Any]) -> Any:
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union
        idx = _read_long(buf)
        if not 0 <= idx < len(schema):
            raise ValueError(f"union index {idx} out of range")
        return _decode(schema[idx], buf, names)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {
                f["name"]: _decode(f["type"], buf, names)
                for f in schema["fields"]
            }
        if t == "array":
            out: List[Any] = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    break
                if n < 0:  # block with byte-size prefix
                    n = -n
                    _read_long(buf)
                for _ in range(n):
                    out.append(_decode(schema["items"], buf, names))
            return out
        if t == "map":
            m: Dict[str, Any] = {}
            while True:
                n = _read_long(buf)
                if n == 0:
                    break
                if n < 0:
                    n = -n
                    _read_long(buf)
                for _ in range(n):
                    k = _read_bytes(buf).decode("utf-8")
                    m[k] = _decode(schema["values"], buf, names)
            return m
        if t == "enum":
            return schema["symbols"][_read_long(buf)]
        if t == "fixed":
            data = buf.read(schema["size"])
            if len(data) != schema["size"]:
                raise EOFError("truncated Avro fixed")
            return data
        # {"type": "string", "logicalType": ...} style wrapper
        return _decode(t, buf, names)
    # primitive
    if schema == "null":
        return None
    if schema == "boolean":
        b = buf.read(1)
        if not b:
            raise EOFError("truncated Avro boolean")
        return b[0] != 0
    if schema in ("int", "long"):
        return _read_long(buf)
    if schema == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if schema == "bytes":
        return _read_bytes(buf)
    if schema == "string":
        return _read_bytes(buf).decode("utf-8")
    raise ValueError(f"unsupported Avro schema node {schema!r}")


def _union_branch(schema: list, value: Any) -> int:
    """Pick the union branch for a Python value — sufficient for the
    ["null", X] unions metadata files use, plus basic primitives."""
    def _matches(s: Any, v: Any) -> bool:
        if isinstance(s, dict):
            s = s["type"]
            if s in ("record", "map"):
                return isinstance(v, dict)
            if s == "array":
                return isinstance(v, list)
            if s == "enum":
                return isinstance(v, str)
            if s == "fixed":
                return isinstance(v, bytes)
        if s == "null":
            return v is None
        if s == "boolean":
            return isinstance(v, bool)
        if s in ("int", "long"):
            return isinstance(v, int) and not isinstance(v, bool)
        if s in ("float", "double"):
            return isinstance(v, float)
        if s == "bytes":
            return isinstance(v, bytes)
        if s == "string":
            return isinstance(v, str)
        return True  # named reference — trust the caller
    for i, s in enumerate(schema):
        if _matches(s, value):
            return i
    raise ValueError(f"no union branch in {schema!r} for {type(value)}")


def _encode(schema: Any, value: Any, out: bytearray,
            names: Dict[str, Any]) -> None:
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union
        idx = _union_branch(schema, value)
        _write_long(out, idx)
        _encode(schema[idx], value, out, names)
        return
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                if f["name"] not in value and "default" in f:
                    _encode(f["type"], f["default"], out, names)
                else:
                    _encode(f["type"], value[f["name"]], out, names)
            return
        if t == "array":
            if value:
                _write_long(out, len(value))
                for item in value:
                    _encode(schema["items"], item, out, names)
            _write_long(out, 0)
            return
        if t == "map":
            if value:
                _write_long(out, len(value))
                for k, v in value.items():
                    _write_bytes(out, k.encode("utf-8"))
                    _encode(schema["values"], v, out, names)
            _write_long(out, 0)
            return
        if t == "enum":
            _write_long(out, schema["symbols"].index(value))
            return
        if t == "fixed":
            if len(value) != schema["size"]:
                raise ValueError("fixed size mismatch")
            out.extend(value)
            return
        _encode(t, value, out, names)
        return
    if schema == "null":
        if value is not None:
            raise ValueError("non-null value for null schema")
        return
    if schema == "boolean":
        out.append(1 if value else 0)
        return
    if schema in ("int", "long"):
        _write_long(out, int(value))
        return
    if schema == "float":
        out.extend(struct.pack("<f", float(value)))
        return
    if schema == "double":
        out.extend(struct.pack("<d", float(value)))
        return
    if schema == "bytes":
        _write_bytes(out, bytes(value))
        return
    if schema == "string":
        _write_bytes(out, str(value).encode("utf-8"))
        return
    raise ValueError(f"unsupported Avro schema node {schema!r}")


# ---------------------------------------------------------------------------
# container file
# ---------------------------------------------------------------------------

def read_ocf(path: str) -> Tuple[dict, List[Any]]:
    """Read an Avro OCF → ``(metadata, records)``.  ``metadata`` maps
    the header keys (``avro.schema`` already JSON-parsed under
    :data:`SCHEMA_KEY`) plus every other key as a UTF-8 string."""
    with open(path, "rb") as f:
        raw = f.read()
    buf = io.BytesIO(raw)
    if buf.read(4) != _MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta: Dict[str, Any] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_long(buf)
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    sync = buf.read(16)
    schema = json.loads(meta[SCHEMA_KEY].decode("utf-8"))
    codec = meta.get(_CODEC_KEY, b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"{path}: unsupported Avro codec {codec!r}")
    meta = {k: (schema if k == SCHEMA_KEY else v.decode("utf-8", "replace"))
            for k, v in meta.items()}
    names: Dict[str, Any] = {}
    _register_named(schema, names)

    records: List[Any] = []
    while buf.tell() < len(raw):
        count = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if len(block) != size:
            raise EOFError(f"{path}: truncated Avro block")
        if codec == "deflate":
            block = zlib.decompress(block, -15)  # raw DEFLATE per spec
        bbuf = io.BytesIO(block)
        for _ in range(count):
            records.append(_decode(schema, bbuf, names))
        if buf.read(16) != sync:
            raise ValueError(f"{path}: Avro sync marker mismatch")
    return meta, records


def write_ocf(path: str, schema: dict, records: Iterable[Any],
              codec: str = "deflate",
              extra_meta: Dict[str, str] | None = None) -> None:
    """Write records as a single-block Avro OCF (metadata files are
    small; one block keeps the writer trivial and every reader happy)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec {codec!r}")
    names: Dict[str, Any] = {}
    _register_named(schema, names)
    body = bytearray()
    n = 0
    for rec in records:
        _encode(schema, rec, body, names)
        n += 1
    payload = bytes(body)
    if codec == "deflate":
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = co.compress(payload) + co.flush()

    meta = {SCHEMA_KEY: json.dumps(schema).encode("utf-8"),
            _CODEC_KEY: codec.encode("utf-8")}
    for k, v in (extra_meta or {}).items():
        meta[k] = v.encode("utf-8")
    out = bytearray(_MAGIC)
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode("utf-8"))
        _write_bytes(out, v)
    _write_long(out, 0)
    sync = bytes((i * 31 + 7) & 0xFF for i in range(16))  # deterministic
    out.extend(sync)
    _write_long(out, n)
    _write_long(out, len(payload))
    out.extend(payload)
    out.extend(sync)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(bytes(out))
