"""Avro Object Container File codec in pure Python (stdlib only).

Iceberg's manifest and manifest-list files are Avro OCF (Apache Avro spec
1.11, public); this sandbox has no avro/fastavro wheel and no
iceberg-spark-runtime jar, so gx_spark ships its own minimal, spec-faithful
codec: schema-driven generic encode/decode of the OCF framing plus the
binary encoding for every Avro type Iceberg metadata uses (null, boolean,
int, long, float, double, bytes, string, fixed, enum, record, array, map,
union).  `null` and `deflate` codecs (deflate via stdlib zlib, raw stream).

This is NOT a port of any Avro library — it is written from the published
spec (https://avro.apache.org/docs/1.11.1/specification/).  The upstream
great_expectations reference has no Avro layer at all (reference mount is
empty; SURVEY.md §0); this module exists to make the Iceberg-lite table
format (gx_spark/iceberg.py) real in-sandbox.

Records are plain dicts keyed by field name; unions pick the first branch
whose type matches the value (None -> "null" branch).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any, Iterable

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# zigzag varint (Avro long/int encoding)
# ---------------------------------------------------------------------------

def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift, u = 0, 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise ValueError("avro: truncated varint")
        b = raw[0]
        u |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
        if shift > 70:
            raise ValueError("avro: varint too long")
    return (u >> 1) ^ -(u & 1)


# ---------------------------------------------------------------------------
# schema-driven binary encode/decode
# ---------------------------------------------------------------------------

def _schema_type(schema: Any) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def _union_branch_for(value: Any, branches: list[Any]) -> int:
    """First branch whose type matches the python value."""
    for i, br in enumerate(branches):
        t = _schema_type(br)
        if value is None:
            if t == "null":
                return i
            continue
        if t == "null":
            continue
        if t == "boolean" and isinstance(value, bool):
            return i
        if t in ("int", "long") and isinstance(value, int) and not isinstance(value, bool):
            return i
        if t in ("float", "double") and isinstance(value, (int, float)) and not isinstance(value, bool):
            return i
        if t in ("bytes", "fixed") and isinstance(value, (bytes, bytearray)):
            return i
        if t in ("string", "enum") and isinstance(value, str):
            return i
        if t == "record" and isinstance(value, dict):
            return i
        if t == "map" and isinstance(value, dict):
            return i
        if t == "array" and isinstance(value, (list, tuple)):
            return i
    raise ValueError(f"avro: no union branch for {type(value).__name__} in {branches}")


def encode_value(value: Any, schema: Any, out: bytearray) -> None:
    t = _schema_type(schema)
    if t == "union":
        branches = schema if isinstance(schema, list) else schema["type"]
        i = _union_branch_for(value, branches)
        out += _zigzag_encode(i)
        encode_value(value, branches[i], out)
    elif t == "null":
        if value is not None:
            raise ValueError("avro: non-None for null schema")
    elif t == "boolean":
        out.append(1 if value else 0)
    elif t in ("int", "long"):
        out += _zigzag_encode(int(value))
    elif t == "float":
        out += struct.pack("<f", float(value))
    elif t == "double":
        out += struct.pack("<d", float(value))
    elif t == "bytes":
        b = bytes(value)
        out += _zigzag_encode(len(b))
        out += b
    elif t == "string":
        b = str(value).encode("utf-8")
        out += _zigzag_encode(len(b))
        out += b
    elif t == "fixed":
        b = bytes(value)
        if len(b) != schema["size"]:
            raise ValueError(f"avro: fixed size mismatch {len(b)} != {schema['size']}")
        out += b
    elif t == "enum":
        out += _zigzag_encode(schema["symbols"].index(value))
    elif t == "record":
        for f in schema["fields"]:
            if f["name"] in value:
                encode_value(value[f["name"]], f["type"], out)
            elif "default" in f:
                encode_value(f["default"], f["type"], out)
            else:
                raise ValueError(f"avro: missing field {f['name']!r}")
    elif t == "array":
        items = list(value)
        if items:
            out += _zigzag_encode(len(items))
            for it in items:
                encode_value(it, schema["items"], out)
        out += _zigzag_encode(0)
    elif t == "map":
        if value:
            out += _zigzag_encode(len(value))
            for k, v in value.items():
                encode_value(k, "string", out)
                encode_value(v, schema["values"], out)
        out += _zigzag_encode(0)
    else:
        raise ValueError(f"avro: unsupported type {t!r}")


def decode_value(buf: io.BytesIO, schema: Any) -> Any:
    t = _schema_type(schema)
    if t == "union":
        branches = schema if isinstance(schema, list) else schema["type"]
        i = _zigzag_decode(buf)
        if not 0 <= i < len(branches):
            raise ValueError(f"avro: union index {i} out of range")
        return decode_value(buf, branches[i])
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _zigzag_decode(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        n = _zigzag_decode(buf)
        return buf.read(n)
    if t == "string":
        n = _zigzag_decode(buf)
        return buf.read(n).decode("utf-8")
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "enum":
        return schema["symbols"][_zigzag_decode(buf)]
    if t == "record":
        return {f["name"]: decode_value(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _zigzag_decode(buf)
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix
                _zigzag_decode(buf)
                n = -n
            for _ in range(n):
                out.append(decode_value(buf, schema["items"]))
        return out
    if t == "map":
        out = {}
        while True:
            n = _zigzag_decode(buf)
            if n == 0:
                break
            if n < 0:
                _zigzag_decode(buf)
                n = -n
            for _ in range(n):
                k = decode_value(buf, "string")
                out[k] = decode_value(buf, schema["values"])
        return out
    raise ValueError(f"avro: unsupported type {t!r}")


# ---------------------------------------------------------------------------
# Object Container File framing
# ---------------------------------------------------------------------------

def write_ocf(
    path: str,
    schema: dict | list | str,
    records: Iterable[dict],
    codec: str = "null",
    sync: bytes | None = None,
    block_records: int = 1000,
    extra_meta: dict[str, bytes] | None = None,
) -> None:
    """Write records (dicts) as an Avro OCF at `path` (atomic via temp+rename)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec!r}")
    # deterministic sync marker from path (reproducible builds; spec only
    # requires the 16 bytes be consistent within the file)
    if sync is None:
        import hashlib

        sync = hashlib.md5(path.encode()).digest()
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    if extra_meta:
        meta.update(extra_meta)

    out = bytearray()
    out += MAGIC
    encode_value(meta, {"type": "map", "values": "bytes"}, out)
    out += sync

    recs = list(records)
    for i in range(0, max(len(recs), 1), block_records):
        block = recs[i : i + block_records]
        if not block and recs:
            break
        if not block:
            break
        body = bytearray()
        for r in block:
            encode_value(r, schema, body)
        payload = bytes(body)
        if codec == "deflate":
            payload = zlib.compress(payload)[2:-4]  # raw deflate per spec
        out += _zigzag_encode(len(block))
        out += _zigzag_encode(len(payload))
        out += payload
        out += sync

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(bytes(out))
    os.replace(tmp, path)


def read_ocf(path: str) -> tuple[Any, list[dict]]:
    """Read an Avro OCF -> (schema_json, records).  Generic: driven entirely
    by the embedded writer schema, so it reads any null/deflate OCF."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != MAGIC:
        raise ValueError(f"avro: bad magic in {path}")
    buf = io.BytesIO(data[4:])
    meta = decode_value(buf, {"type": "map", "values": "bytes"})
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec!r}")
    sync = buf.read(16)
    records: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        n = _zigzag_decode(buf)
        size = _zigzag_decode(buf)
        payload = buf.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        bbuf = io.BytesIO(payload)
        for _ in range(n):
            records.append(decode_value(bbuf, schema))
        marker = buf.read(16)
        if marker != sync:
            raise ValueError(f"avro: sync marker mismatch in {path}")
    return schema, records
