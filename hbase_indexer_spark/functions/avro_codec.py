"""Minimal Avro binary + Object Container File codec (pure python).

The reference's morphline configs ship a ``readAvroContainer`` /
``extractAvroPaths`` command pair for cells that carry Avro container
bytes (hbase-indexer-mr/src/test/resources/morphlines.conf:40-48).  This
environment has neither the spark-avro connector jar nor a python avro
package, so the container framing and binary encoding are implemented
here directly from the public Avro 1.x specification:

- binary primitives: zigzag-varint int/long, little-endian IEEE
  float/double, length-prefixed bytes/string, 1-byte boolean;
- unions: varint branch index + value; arrays: blocked count + items;
- container file: ``Obj\\x01`` magic, varint-map metadata
  (``avro.schema``, ``avro.codec``), 16-byte sync marker, then
  (count, size, payload, sync) blocks; ``null`` and ``deflate`` codecs.

Supported schema subset: records of primitives, nullable unions
(["null", T] in either order), arrays of primitives/records, and nested
records — the shapes the morphline pair is used for.  Decoding happens
in one Arrow-batched pandas UDF that emits each record as a canonical
JSON string; path extraction then stays JVM-side via get_json_object.

Convention for ``bytes``-typed fields: the ENCODER consumes raw
``bytes`` values, but the DECODER emits a lowercase hex string — the
decoded record must round-trip through JSON (the UDF's output format),
which has no binary type.  ``encode -> decode`` is therefore not an
identity for bytes fields by design; compare against ``value.hex()`` on
the consumer side (the extraction stages treat the hex form as the
field's canonical string representation, matching unique_key's hex
formatter elsewhere in the engine).
"""

from __future__ import annotations

import io
import json
import struct
import zlib

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

MAGIC = b"Obj\x01"
# deterministic sync marker: encoders here are fixture builders, and a
# fixed marker keeps container bytes bit-reproducible across runs
_SYNC = bytes(range(16))


# ---------------------------------------------------------------------------
# varint / zigzag primitives
# ---------------------------------------------------------------------------

def _write_long(out: io.BytesIO, v: int) -> None:
    v = (v << 1) ^ (v >> 63)  # zigzag
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            return


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


# ---------------------------------------------------------------------------
# schema-driven encode / decode
# ---------------------------------------------------------------------------

def _encode_value(out: io.BytesIO, schema, v) -> None:
    if isinstance(schema, list):  # union
        for i, branch in enumerate(schema):
            if (v is None) == (branch == "null"):
                _write_long(out, i)
                if branch != "null":
                    _encode_value(out, branch, v)
                return
        raise ValueError(f"no union branch for {v!r} in {schema}")
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                _encode_value(out, f["type"], v[f["name"]])
            return
        if t == "array":
            if v:
                _write_long(out, len(v))
                for item in v:
                    _encode_value(out, schema["items"], item)
            _write_long(out, 0)
            return
        schema = t  # {"type": "long", "logicalType": ...}
    if schema == "null":
        return
    if schema == "boolean":
        out.write(b"\x01" if v else b"\x00")
    elif schema in ("int", "long"):
        _write_long(out, int(v))
    elif schema == "float":
        out.write(struct.pack("<f", float(v)))
    elif schema == "double":
        out.write(struct.pack("<d", float(v)))
    elif schema in ("bytes", "string"):
        raw = v.encode("utf-8") if schema == "string" else bytes(v)
        _write_long(out, len(raw))
        out.write(raw)
    else:
        raise ValueError(f"unsupported avro type {schema!r}")


def _decode_value(schema, buf: bytes, pos: int):
    if isinstance(schema, list):  # union
        idx, pos = _read_long(buf, pos)
        return _decode_value(schema[idx], buf, pos)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            rec = {}
            for f in schema["fields"]:
                rec[f["name"]], pos = _decode_value(f["type"], buf, pos)
            return rec, pos
        if t == "array":
            items = []
            while True:
                n, pos = _read_long(buf, pos)
                if n == 0:
                    break
                if n < 0:  # block with byte-size prefix
                    _, pos = _read_long(buf, pos)
                    n = -n
                for _ in range(n):
                    v, pos = _decode_value(schema["items"], buf, pos)
                    items.append(v)
            return items, pos
        schema = t
    if schema == "null":
        return None, pos
    if schema == "boolean":
        return buf[pos] == 1, pos + 1
    if schema in ("int", "long"):
        return _read_long(buf, pos)
    if schema == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if schema == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if schema in ("bytes", "string"):
        n, pos = _read_long(buf, pos)
        raw = buf[pos:pos + n]
        return (raw.decode("utf-8") if schema == "string"
                else raw.hex()), pos + n
    raise ValueError(f"unsupported avro type {schema!r}")


# ---------------------------------------------------------------------------
# container file framing
# ---------------------------------------------------------------------------

def encode_container(schema: dict, records: list, codec: str = "null") -> bytes:
    """One Avro Object Container File holding ``records`` (single block)."""
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": json.dumps(schema, separators=(",", ":")),
            "avro.codec": codec}
    _write_long(out, len(meta))
    for k, v in meta.items():
        kb, vb = k.encode(), v.encode()
        _write_long(out, len(kb))
        out.write(kb)
        _write_long(out, len(vb))
        out.write(vb)
    _write_long(out, 0)  # end of metadata map
    out.write(_SYNC)
    payload = io.BytesIO()
    for rec in records:
        _encode_value(payload, schema, rec)
    raw = payload.getvalue()
    if codec == "deflate":
        raw = zlib.compress(raw)[2:-4]  # raw deflate, no zlib header/adler
    elif codec != "null":
        raise ValueError(f"unsupported codec {codec!r}")
    _write_long(out, len(records))
    _write_long(out, len(raw))
    out.write(raw)
    out.write(_SYNC)
    return out.getvalue()


def decode_container(blob: bytes) -> list:
    """All records from an Object Container File (schema is embedded)."""
    if blob[:4] != MAGIC:
        raise ValueError("not an avro container (bad magic)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _read_long(blob, pos)
        if n == 0:
            break
        if n < 0:
            _, pos = _read_long(blob, pos)
            n = -n
        for _ in range(n):
            kn, pos = _read_long(blob, pos)
            k = blob[pos:pos + kn].decode()
            pos += kn
            vn, pos = _read_long(blob, pos)
            meta[k] = blob[pos:pos + vn]
            pos += vn
    sync = blob[pos:pos + 16]
    pos += 16
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    records = []
    while pos < len(blob):
        cnt, pos = _read_long(blob, pos)
        size, pos = _read_long(blob, pos)
        block = blob[pos:pos + size]
        pos += size
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        bpos = 0
        for _ in range(cnt):
            rec, bpos = _decode_value(schema, block, bpos)
            records.append(rec)
        if blob[pos:pos + 16] != sync:
            raise ValueError("sync marker mismatch")
        pos += 16
    return records


# ---------------------------------------------------------------------------
# Spark boundary
# ---------------------------------------------------------------------------

@F.pandas_udf(ArrayType(StringType()))
def _container_to_json(s: pd.Series) -> pd.Series:
    def conv(b):
        if b is None:
            return None
        return [json.dumps(r, separators=(",", ":"), sort_keys=True)
                for r in decode_container(bytes(b))]

    return s.map(conv)


def container_to_json(col: Column) -> Column:
    """binary OCF column -> array<string> of canonical-JSON records.
    The one python-boundary hop; everything downstream (explode, path
    extraction, casts) stays JVM-side."""
    return _container_to_json(col)
