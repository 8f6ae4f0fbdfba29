"""Minimal pure-Python Avro Object Container File codec (no third-party
libs; the container has no fastavro).

Parity surface: ``AvroToPutGeoMesa`` ingests Avro files whose schema is
embedded in the file header (``AvroToPutGeoMesa.scala:84-173``), and
``GeoAvroRecordSetWriterFactory`` writes record sets as schema-embedding
Avro (``records/GeoAvroRecordSetWriterFactory.scala:34-86``). This module
implements exactly the needed subset of the Avro 1.11 spec:

- object container framing: ``Obj\\x01`` magic, metadata map with
  ``avro.schema`` JSON + ``avro.codec: null``, 16-byte sync marker, data
  blocks of (count, byte-size, payload, sync);
- binary encoding: zigzag varints, IEEE little-endian floats, length-
  prefixed bytes/strings, single-block arrays/maps, index-prefixed unions;
- types: null, boolean, int, long, float, double, bytes, string,
  record, array, map, nullable unions ``["null", T]``, and the
  ``timestamp-micros`` / ``timestamp-millis`` logical types.

Interchange path, not a hot path: rows encode/decode via Python values.
The lake's native schema-embedding format remains Parquet.
"""

from __future__ import annotations

import hashlib
import io
import json
import struct

import pyarrow as pa

MAGIC = b"Obj\x01"


# ------------------------------------------------------------ primitives --


def _zigzag_encode(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _zigzag_decode(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _write_long(buf: io.BytesIO, v: int) -> None:
    n = _zigzag_encode(int(v)) & ((1 << 64) - 1)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _read_long(buf) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        acc |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            return _zigzag_decode(acc)
        shift += 7


def _write_bytes(buf, data: bytes) -> None:
    _write_long(buf, len(data))
    buf.write(data)


def _read_bytes(buf) -> bytes:
    n = _read_long(buf)
    return buf.read(n)


# --------------------------------------------------------- schema mapping --


def arrow_to_avro_schema(schema: pa.Schema, name: str = "row") -> dict:
    def field_type(t: pa.DataType, fname: str):
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            base = "string"
        elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
            base = "bytes"
        elif pa.types.is_int32(t) or pa.types.is_int16(t) or pa.types.is_int8(t):
            base = "int"
        elif pa.types.is_int64(t):
            base = "long"
        elif pa.types.is_float32(t):
            base = "float"
        elif pa.types.is_float64(t):
            base = "double"
        elif pa.types.is_boolean(t):
            base = "boolean"
        elif pa.types.is_timestamp(t):
            if t.unit == "ns":
                raise ValueError(
                    f"field {fname!r}: ns-precision timestamps lose precision "
                    "in avro (timestamp-micros); cast to 'us' before writing "
                    "(same validate-before-persist discipline as schema.type_to_json)"
                )
            unit = "timestamp-micros" if t.unit == "us" else "timestamp-millis"
            base = {"type": "long", "logicalType": unit}
            if t.tz is not None:
                # avro timestamp-* is an absolute UTC instant, matching
                # tz-aware arrow storage; record the display zone as a
                # custom attribute so the round-trip restores the type.
                base["arrowTimezone"] = t.tz
        elif pa.types.is_list(t) or pa.types.is_large_list(t):
            base = {"type": "array", "items": field_type(t.value_type, fname + "_item")}
        elif pa.types.is_map(t):
            if not pa.types.is_string(t.key_type):
                raise ValueError("avro maps require string keys")
            base = {"type": "map", "values": field_type(t.item_type, fname + "_value")}
        elif pa.types.is_struct(t):
            base = {
                "type": "record",
                "name": f"{fname}_rec",
                "fields": [
                    {"name": f.name, "type": field_type(f.type, f"{fname}_{f.name}")}
                    for f in t
                ],
            }
        else:
            raise ValueError(f"unsupported arrow type for avro: {t}")
        return ["null", base]

    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": field_type(f.type, f.name)} for f in schema
        ],
    }


def avro_to_arrow_schema(avro: dict) -> pa.Schema:
    def to_arrow(t):
        if isinstance(t, list):  # union: take the non-null branch
            branches = [b for b in t if b != "null"]
            if len(branches) != 1:
                raise ValueError(f"only [null, T] unions supported, got {t}")
            return to_arrow(branches[0])
        if isinstance(t, dict):
            lt = t.get("logicalType")
            if lt == "timestamp-micros":
                return pa.timestamp("us", tz=t.get("arrowTimezone"))
            if lt == "timestamp-millis":
                return pa.timestamp("ms", tz=t.get("arrowTimezone"))
            kind = t["type"]
            if kind == "array":
                return pa.list_(to_arrow(t["items"]))
            if kind == "map":
                return pa.map_(pa.string(), to_arrow(t["values"]))
            if kind == "record":
                return pa.struct(
                    [pa.field(f["name"], to_arrow(f["type"]), nullable=True)
                     for f in t["fields"]]
                )
            return to_arrow(kind)
        prim = {
            "string": pa.string(), "bytes": pa.binary(), "int": pa.int32(),
            "long": pa.int64(), "float": pa.float32(), "double": pa.float64(),
            "boolean": pa.bool_(), "null": pa.null(),
        }
        if t not in prim:
            raise ValueError(f"unsupported avro type {t!r}")
        return prim[t]

    return pa.schema(
        [pa.field(f["name"], to_arrow(f["type"]), nullable=True)
         for f in avro["fields"]]
    )


# -------------------------------------------------------- value codec -----


def _encoder_for(t):
    """avro type -> fn(buf, python value); value is non-null."""
    if isinstance(t, list):
        branches = [b for b in t if b != "null"]
        inner = _encoder_for(branches[0])
        null_idx = t.index("null")
        val_idx = 1 - null_idx if len(t) == 2 else t.index(branches[0])

        def union(buf, v):
            if v is None:
                _write_long(buf, null_idx)
            else:
                _write_long(buf, val_idx)
                inner(buf, v)
        return union
    if isinstance(t, dict):
        if t.get("logicalType") in ("timestamp-micros", "timestamp-millis"):
            import pandas as pd

            unit = 1000 if t["logicalType"] == "timestamp-millis" else 1

            def ts(buf, v):
                if hasattr(v, "value"):       # pd.Timestamp (ns)
                    _write_long(buf, v.value // (1000 * unit))
                elif hasattr(v, "timestamp"):  # datetime
                    _write_long(buf, int(pd.Timestamp(v).value // (1000 * unit)))
                else:
                    _write_long(buf, int(v))
            return ts
        kind = t["type"]
        if kind == "array":
            inner = _encoder_for(t["items"])

            def arr(buf, v):
                if v:
                    _write_long(buf, len(v))
                    for x in v:
                        inner(buf, x)
                _write_long(buf, 0)
            return arr
        if kind == "map":
            inner = _encoder_for(t["values"])

            def mp(buf, v):
                items = list(v.items()) if isinstance(v, dict) else list(v)
                if items:
                    _write_long(buf, len(items))
                    for k, x in items:
                        _write_bytes(buf, k.encode("utf-8"))
                        inner(buf, x)
                _write_long(buf, 0)
            return mp
        if kind == "record":
            encs = [_encoder_for(f["type"]) for f in t["fields"]]
            names = [f["name"] for f in t["fields"]]

            def rec(buf, v):
                for n, e in zip(names, encs):
                    e(buf, v.get(n))
            return rec
        return _encoder_for(kind)
    prim = {
        "string": lambda buf, v: _write_bytes(buf, v.encode("utf-8")),
        "bytes": lambda buf, v: _write_bytes(buf, bytes(v)),
        "int": _write_long, "long": _write_long,
        "float": lambda buf, v: buf.write(struct.pack("<f", v)),
        "double": lambda buf, v: buf.write(struct.pack("<d", v)),
        "boolean": lambda buf, v: buf.write(b"\x01" if v else b"\x00"),
        "null": lambda buf, v: None,
    }
    if t not in prim:
        raise ValueError(f"unsupported avro type {t!r}")
    return prim[t]


def _decoder_for(t):
    if isinstance(t, list):
        decs = [None if b == "null" else _decoder_for(b) for b in t]

        def union(buf):
            idx = _read_long(buf)
            d = decs[idx]
            return None if d is None else d(buf)
        return union
    if isinstance(t, dict):
        lt = t.get("logicalType")
        if lt in ("timestamp-micros", "timestamp-millis"):
            return _read_long  # raw epoch int; arrow cast applies the unit
        kind = t["type"]
        if kind == "array":
            inner = _decoder_for(t["items"])

            def arr(buf):
                out = []
                while True:
                    n = _read_long(buf)
                    if n == 0:
                        return out
                    if n < 0:
                        n = -n
                        _read_long(buf)  # block byte size, unused
                    for _ in range(n):
                        out.append(inner(buf))
            return arr
        if kind == "map":
            inner = _decoder_for(t["values"])

            def mp(buf):
                out = []
                while True:
                    n = _read_long(buf)
                    if n == 0:
                        return out
                    if n < 0:
                        n = -n
                        _read_long(buf)
                    for _ in range(n):
                        k = _read_bytes(buf).decode("utf-8")
                        out.append((k, inner(buf)))
            return mp
        if kind == "record":
            decs = [(f["name"], _decoder_for(f["type"])) for f in t["fields"]]

            def rec(buf):
                return {n: d(buf) for n, d in decs}
            return rec
        return _decoder_for(kind)
    prim = {
        "string": lambda buf: _read_bytes(buf).decode("utf-8"),
        "bytes": _read_bytes,
        "int": _read_long, "long": _read_long,
        "float": lambda buf: struct.unpack("<f", buf.read(4))[0],
        "double": lambda buf: struct.unpack("<d", buf.read(8))[0],
        "boolean": lambda buf: buf.read(1) == b"\x01",
        "null": lambda buf: None,
    }
    if t not in prim:
        raise ValueError(f"unsupported avro type {t!r}")
    return prim[t]


# ------------------------------------------------------- container file ---


def write_avro(table: pa.Table, path: str, block_rows: int = 4096) -> str:
    """Write an Arrow table as a schema-embedding Avro container file.
    Deterministic: the sync marker derives from the path, so identical
    content at an identical path is byte-identical (idempotent replay)."""
    avro_schema = arrow_to_avro_schema(table.schema)
    field_encs = [
        (f["name"], _encoder_for(f["type"])) for f in avro_schema["fields"]
    ]
    sync = hashlib.md5(path.encode("utf-8")).digest()

    buf = io.BytesIO()
    buf.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(avro_schema).encode("utf-8"),
        "avro.codec": b"null",
    }
    _write_long(buf, len(meta))
    for k, v in meta.items():
        _write_bytes(buf, k.encode("utf-8"))
        _write_bytes(buf, v)
    _write_long(buf, 0)
    buf.write(sync)

    rows = table.to_pylist()
    for lo in range(0, len(rows), block_rows):
        chunk = rows[lo : lo + block_rows]
        body = io.BytesIO()
        for row in chunk:
            for name, enc in field_encs:
                enc(body, row.get(name))
        payload = body.getvalue()
        _write_long(buf, len(chunk))
        _write_long(buf, len(payload))
        buf.write(payload)
        buf.write(sync)

    import os

    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
        f.flush()
        os.fsync(f.fileno())  # a journaled rename of un-synced data can
        # survive a crash as a committed-but-torn container (same rule as
        # lake.LakeFS.publish_*)
    os.replace(tmp, path)
    return path


def read_avro_schema(path: str) -> tuple[dict, pa.Schema]:
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError(f"{path} is not an Avro container file")
        meta = {}
        n = _read_long(f)
        while n != 0:
            if n < 0:
                n = -n
                _read_long(f)
            for _ in range(n):
                k = _read_bytes(f).decode("utf-8")
                meta[k] = _read_bytes(f)
            n = _read_long(f)
        avro_schema = json.loads(meta["avro.schema"])
        return avro_schema, avro_to_arrow_schema(avro_schema)


def read_avro(path: str) -> pa.Table:
    """Read an Avro container file into an Arrow table (embedded schema —
    the ``AvroToPutGeoMesa`` ingest contract)."""
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError(f"{path} is not an Avro container file")
        meta = {}
        n = _read_long(f)
        while n != 0:
            if n < 0:
                n = -n
                _read_long(f)
            for _ in range(n):
                k = _read_bytes(f).decode("utf-8")
                meta[k] = _read_bytes(f)
            n = _read_long(f)
        if meta.get("avro.codec", b"null") not in (b"null", b""):
            raise ValueError(f"unsupported avro codec {meta['avro.codec']!r}")
        avro_schema = json.loads(meta["avro.schema"])
        arrow_schema = avro_to_arrow_schema(avro_schema)
        decs = [(f["name"], _decoder_for(f["type"])) for f in avro_schema["fields"]]
        sync = f.read(16)

        rows: list[dict] = []
        while True:
            head = f.read(1)
            if not head:
                break
            f.seek(-1, 1)
            count = _read_long(f)
            size = _read_long(f)
            block = io.BytesIO(f.read(size))
            for _ in range(count):
                rows.append({n: d(block) for n, d in decs})
            if f.read(16) != sync:
                raise ValueError("sync marker mismatch (corrupt avro file)")

    cols = {}
    for i, f_ in enumerate(arrow_schema):
        vals = [r[f_.name] for r in rows]
        if pa.types.is_timestamp(f_.type):
            # epoch ints are UTC instants; casting int64 -> timestamp(unit[,
            # tz]) restores both unit and (when recorded) the zone.
            arr = pa.array(vals, type=pa.int64()).cast(f_.type)
        else:
            arr = pa.array(vals, type=f_.type)
        cols[f_.name] = arr
    return pa.table(cols) if cols else arrow_schema.empty_table()
