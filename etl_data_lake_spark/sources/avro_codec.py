"""Pure-Python Avro Object Container File codec — the binary
encoding and container framing from the public Avro 1.x
specification (https://avro.apache.org/docs/current/specification/),
implemented from scratch because this environment ships neither the
``spark-avro`` connector jar nor a Python avro package. The Spark
surface lives in sources/avro_source.py (a Python DataSource) and
sources/readers.read_avro; this module is engine-free bytes-in /
dicts-out so it tests in microseconds and the interop check against
the JVM Avro jars (which ARE on Spark's classpath) stays honest.

Supported schema subset (explicit, fails loudly otherwise):

* primitives: null, boolean, int, long, float, double, bytes, string;
* logical types: timestamp-micros (long), date (int);
* records (nested), arrays, maps (string keys per the spec);
* the nullable idiom ``["null", T]`` / ``[T, "null"]`` — general
  unions beyond nullability are out of scope (they do not round-trip
  through a Spark schema anyway).

Container framing per the spec: ``Obj\\x01`` magic, a file-metadata
map carrying ``avro.schema`` + ``avro.codec``, a random 16-byte sync
marker, then data blocks of ``(count, byte-size, payload, sync)``.
Codecs: ``null`` and ``deflate`` (raw zlib, -15 window bits — the
spec's definition). Sync markers make blocks independently
decodable, which is exactly what the reader's bad-block policy
exploits: a corrupt block is skipped by seeking to the next marker,
the spec's own corruption-recovery story.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib


class AvroCodecError(ValueError):
    """Schema outside the supported subset, or malformed container."""


class AvroBlockError(AvroCodecError):
    """A single data block failed to decode (bad-record unit)."""


MAGIC = b"Obj\x01"
SYNC_SIZE = 16


# ------------------------------------------------------------------ encode --


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def write_bytes(buf: io.BytesIO, b: bytes) -> None:
    write_long(buf, len(b))
    buf.write(b)


def write_string(buf: io.BytesIO, s: str) -> None:
    write_bytes(buf, s.encode("utf-8"))


def _encode_value(buf: io.BytesIO, schema, v) -> None:
    kind = _kind(schema)
    if kind == "null":
        if v is not None:
            raise AvroCodecError(f"non-null {v!r} for null schema")
        return
    if kind == "union":
        branches = schema
        if v is None:
            idx = _null_index(branches)
            write_long(buf, idx)
            return
        idx = 1 - _null_index(branches)
        write_long(buf, idx)
        _encode_value(buf, branches[idx], v)
        return
    if v is None:
        raise AvroCodecError(f"null for non-nullable schema {schema!r}")
    if kind == "boolean":
        buf.write(b"\x01" if v else b"\x00")
    elif kind in ("int", "long"):
        write_long(buf, int(v))
    elif kind == "float":
        buf.write(struct.pack("<f", float(v)))
    elif kind == "double":
        buf.write(struct.pack("<d", float(v)))
    elif kind == "bytes":
        write_bytes(buf, bytes(v))
    elif kind == "string":
        write_string(buf, v)
    elif kind == "record":
        for f in schema["fields"]:
            _encode_value(buf, f["type"], v.get(f["name"]))
    elif kind == "array":
        items = list(v)
        if items:
            write_long(buf, len(items))
            for item in items:
                _encode_value(buf, schema["items"], item)
        write_long(buf, 0)
    elif kind == "map":
        entries = dict(v)
        if entries:
            write_long(buf, len(entries))
            for k, item in entries.items():
                write_string(buf, k)
                _encode_value(buf, schema["values"], item)
        write_long(buf, 0)
    else:
        raise AvroCodecError(f"unsupported schema {schema!r}")


# ------------------------------------------------------------------ decode --


class _Reader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise AvroBlockError("truncated data")
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def read_long(self) -> int:
        shift, acc = 0, 0
        while True:
            if self.pos >= len(self.data):
                raise AvroBlockError("truncated varint")
            b = self.data[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 63:
                raise AvroBlockError("varint too long")
        return (acc >> 1) ^ -(acc & 1)

    def read_bytes(self) -> bytes:
        n = self.read_long()
        if n < 0:
            raise AvroBlockError(f"negative byte length {n}")
        return self.read(n)

    def read_string(self) -> str:
        return self.read_bytes().decode("utf-8")


def _decode_value(r: _Reader, schema):
    kind = _kind(schema)
    if kind == "null":
        return None
    if kind == "union":
        idx = r.read_long()
        if not 0 <= idx < len(schema):
            raise AvroBlockError(f"union index {idx} out of range")
        return _decode_value(r, schema[idx])
    if kind == "boolean":
        return r.read(1) != b"\x00"
    if kind in ("int", "long"):
        return r.read_long()
    if kind == "float":
        return struct.unpack("<f", r.read(4))[0]
    if kind == "double":
        return struct.unpack("<d", r.read(8))[0]
    if kind == "bytes":
        return r.read_bytes()
    if kind == "string":
        return r.read_string()
    if kind == "record":
        return {
            f["name"]: _decode_value(r, f["type"])
            for f in schema["fields"]
        }
    if kind == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix (spec allows it)
                n = -n
                r.read_long()
            for _ in range(n):
                out.append(_decode_value(r, schema["items"]))
    if kind == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = r.read_string()
                out[k] = _decode_value(r, schema["values"])
    raise AvroCodecError(f"unsupported schema {schema!r}")


# ------------------------------------------------------------------ schema --


def _kind(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    if isinstance(schema, dict):
        return schema["type"]
    raise AvroCodecError(f"bad schema node {schema!r}")


def _null_index(branches) -> int:
    if (
        len(branches) == 2
        and sum(1 for b in branches if _kind(b) == "null") == 1
    ):
        return 0 if _kind(branches[0]) == "null" else 1
    raise AvroCodecError(
        f"only 2-branch nullable unions supported, got {branches!r}"
    )


def validate_schema(schema) -> None:
    """Walk the schema; raise AvroCodecError on anything outside the
    supported subset (better at write/plan time than mid-block)."""
    kind = _kind(schema)
    if kind in (
        "null", "boolean", "int", "long", "float", "double",
        "bytes", "string",
    ):
        return
    if kind == "union":
        _null_index(schema)
        for b in schema:
            validate_schema(b)
        return
    if kind == "record":
        names = [f["name"] for f in schema["fields"]]
        if len(names) != len(set(names)):
            raise AvroCodecError(f"duplicate field names in {names}")
        for f in schema["fields"]:
            validate_schema(f["type"])
        return
    if kind == "array":
        validate_schema(schema["items"])
        return
    if kind == "map":
        validate_schema(schema["values"])
        return
    raise AvroCodecError(f"unsupported schema {schema!r}")


# --------------------------------------------------------------- container --


def write_container(
    path: str,
    schema: dict,
    records,
    codec: str = "deflate",
    max_block_records: int = 4096,
    sync: bytes | None = None,
) -> int:
    """Write an Object Container File; returns the record count.
    ``sync`` is injectable for deterministic test fixtures; production
    callers keep the random default (the spec's collision guard)."""
    if codec not in ("null", "deflate"):
        raise AvroCodecError(f"unsupported codec {codec!r}")
    validate_schema(schema)
    sync = sync if sync is not None else os.urandom(SYNC_SIZE)
    if len(sync) != SYNC_SIZE:
        raise AvroCodecError("sync marker must be 16 bytes")
    header = io.BytesIO()
    header.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    write_long(header, len(meta))
    for k, v in meta.items():
        write_string(header, k)
        write_bytes(header, v)
    write_long(header, 0)
    header.write(sync)

    n_total = 0
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "wb") as out:
        out.write(header.getvalue())
        block = io.BytesIO()
        n_block = 0

        def flush():
            nonlocal n_block
            if n_block == 0:
                return
            payload = block.getvalue()
            if codec == "deflate":
                payload = zlib.compress(payload)[2:-4]  # raw, per spec
            head = io.BytesIO()
            write_long(head, n_block)
            write_long(head, len(payload))
            out.write(head.getvalue())
            out.write(payload)
            out.write(sync)
            block.seek(0)
            block.truncate()
            n_block = 0

        for rec in records:
            _encode_value(block, schema, rec)
            n_block += 1
            n_total += 1
            if n_block >= max_block_records:
                flush()
        flush()
    os.replace(tmp, path)
    return n_total


def read_header(data: bytes):
    """→ (schema, codec, sync, body_offset)."""
    if data[: len(MAGIC)] != MAGIC:
        raise AvroCodecError("not an Avro object container (bad magic)")
    r = _Reader(data, len(MAGIC))
    meta: dict[str, bytes] = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            k = r.read_string()
            meta[k] = r.read_bytes()
    sync = r.read(SYNC_SIZE)
    try:
        schema = json.loads(meta["avro.schema"])
    except (KeyError, ValueError) as exc:
        raise AvroCodecError(f"bad avro.schema metadata: {exc}") from exc
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise AvroCodecError(f"unsupported codec {codec!r}")
    return schema, codec, sync, r.pos


def iter_blocks(data: bytes, codec: str, sync: bytes, offset: int):
    """Yield ``(n_records, payload_bytes | AvroBlockError)`` per data
    block. A block whose framing or payload is corrupt yields the
    error and the iterator RESYNCS at the next sync marker — later
    blocks still decode (the container format's recovery guarantee)."""
    pos = offset
    total = len(data)
    while pos < total:
        r = _Reader(data, pos)
        try:
            n = r.read_long()
            size = r.read_long()
            if n <= 0 or size < 0 or r.pos + size + SYNC_SIZE > total:
                raise AvroBlockError(
                    f"bad block framing at offset {pos} (n={n})"
                )
            payload = r.read(size)
            marker = r.read(SYNC_SIZE)
            if marker != sync:
                raise AvroBlockError(f"sync mismatch at offset {pos}")
            if codec == "deflate":
                payload = zlib.decompress(payload, -15)
            yield n, payload
            pos = r.pos
        except (AvroBlockError, zlib.error) as exc:
            err = (
                exc
                if isinstance(exc, AvroBlockError)
                else AvroBlockError(f"deflate: {exc}")
            )
            yield 0, err
            nxt = data.find(sync, pos + 1)
            if nxt == -1:
                return
            pos = nxt + SYNC_SIZE


def read_container(path: str, on_error: str = "fail"):
    """→ ``(schema, records, bad_blocks)`` where ``records`` is the
    list of decoded dicts and ``bad_blocks`` a list of
    ``(byte_offset_hint, message)`` for blocks that failed.
    ``on_error``: 'fail' raises on the first bad block; 'capture'
    collects them; 'drop' skips them silently (mirrors
    sources/readers' policy surface)."""
    if on_error not in ("fail", "capture", "drop"):
        raise ValueError(f"on_error must be fail|capture|drop: {on_error}")
    with open(path, "rb") as fh:
        data = fh.read()
    schema, codec, sync, off = read_header(data)
    validate_schema(schema)
    records: list = []
    bad: list[tuple[int, str]] = []
    for n, payload in iter_blocks(data, codec, sync, off):
        if isinstance(payload, AvroBlockError):
            if on_error == "fail":
                raise payload
            if on_error == "capture":
                bad.append((len(records), str(payload)))
            continue
        r = _Reader(payload)
        base = len(records)
        try:
            for _ in range(n):
                records.append(_decode_value(r, schema))
            if r.pos != len(payload):
                raise AvroBlockError(
                    f"{len(payload) - r.pos} trailing bytes in block"
                )
        except AvroBlockError as exc:
            # a corrupt block's rows are ALL suspect (the encoding has
            # no per-row framing): roll back everything it appended
            del records[base:]
            if on_error == "fail":
                raise
            if on_error == "capture":
                bad.append((base, str(exc)))
    return schema, records, bad
