"""Zero-dependency Avro object-container-file codec (writer + reader).

Iceberg's manifest and manifest-list files are Avro OCF by spec, and
this environment ships no Python Avro library — so, in the same
discipline as the repo's BMP/WAV/PNG/JPEG codecs (multimodal.py), the
format is implemented from the public specification directly (Apache
Avro 1.11 spec, "Object Container Files" + "Binary encoding"). The
writer is what `operators/iceberg.py` exports metadata with; the
reader exists for round-trip tests and driver-side audits. The
INDEPENDENT verification path in tests/test_iceberg.py reads the
written files with the Avro JAVA library already on Spark's classpath
(avro-1.12 jar, via the JVM gateway) — a second implementation this
codec never touches.

Scope: codec "null" (uncompressed — metadata files are small and
readers must not need zlib), schema types null/boolean/int/long/
float/double/bytes/string/record/array/map/union/fixed, which covers
the Iceberg manifest schemas. Writing is driver-side only and bounded
by metadata size (one record per data file / manifest), never by row
count — the 100 TB posture is unchanged: data files are parquet;
Avro carries only the manifest tree.
"""

from __future__ import annotations

import io
import json
import struct


# ---------------------------------------------------------------------------
# binary encoding
# ---------------------------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_varint(out: io.BytesIO, n: int) -> None:
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _write_long(out: io.BytesIO, n: int) -> None:
    _write_varint(out, _zigzag(int(n)))


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


def _write_str(out: io.BytesIO, s: str) -> None:
    _write_bytes(out, s.encode("utf-8"))


def _branch_names(union: list) -> list[str]:
    return [
        b if isinstance(b, str) else b.get("name", b.get("type"))
        for b in union
    ]


def write_datum(out: io.BytesIO, schema, value, named=None) -> None:
    """Encode ``value`` per ``schema`` (parsed Avro JSON schema)."""
    named = named if named is not None else {}
    if isinstance(schema, str):
        if schema in named:  # named-type reference
            return write_datum(out, named[schema], value, named)
        t = schema
        if t == "null":
            if value is not None:
                raise ValueError("null schema, non-null value")
            return
        if t == "boolean":
            out.write(b"\x01" if value else b"\x00")
            return
        if t in ("int", "long"):
            _write_long(out, value)
            return
        if t == "float":
            out.write(struct.pack("<f", float(value)))
            return
        if t == "double":
            out.write(struct.pack("<d", float(value)))
            return
        if t == "bytes":
            _write_bytes(out, bytes(value))
            return
        if t == "string":
            _write_str(out, value)
            return
        raise ValueError(f"unsupported schema {schema!r}")
    if isinstance(schema, list):  # union: zigzag branch index, value
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch["type"]
            if value is None and bt == "null":
                _write_long(out, i)
                return
            if value is not None and bt != "null":
                _write_long(out, i)
                return write_datum(out, branch, value, named)
        raise ValueError(
            f"value {value!r} matches no union branch "
            f"{_branch_names(schema)}"
        )
    t = schema["type"]
    if t == "record":
        if schema.get("name"):
            named[schema["name"]] = schema
        for f in schema["fields"]:
            try:
                write_datum(out, f["type"], value.get(f["name"]), named)
            except ValueError as e:
                raise ValueError(f"field {f['name']!r}: {e}") from e
        return
    if t == "array":
        items = list(value or [])
        if items:
            _write_long(out, len(items))
            for it in items:
                write_datum(out, schema["items"], it, named)
        _write_long(out, 0)
        return
    if t == "map":
        entries = dict(value or {})
        if entries:
            _write_long(out, len(entries))
            for k, v in entries.items():
                _write_str(out, k)
                write_datum(out, schema["values"], v, named)
        _write_long(out, 0)
        return
    if t == "fixed":
        if schema.get("name"):
            named[schema["name"]] = schema
        b = bytes(value)
        if len(b) != schema["size"]:
            raise ValueError(
                f"fixed size {schema['size']} != {len(b)}"
            )
        out.write(b)
        return
    # {"type": "long", ...} wrapper form (logical types etc.)
    return write_datum(out, t, value, named)


class _Reader:
    def __init__(self, data: bytes):
        self.b = data
        self.i = 0

    def read(self, n: int) -> bytes:
        out = self.b[self.i : self.i + n]
        if len(out) != n:
            raise EOFError("truncated avro data")
        self.i += n
        return out

    def varint(self) -> int:
        shift, acc = 0, 0
        while True:
            byte = self.read(1)[0]
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                return acc
            shift += 7

    def long(self) -> int:
        return _unzigzag(self.varint())

    def bytes_(self) -> bytes:
        return self.read(self.long())

    def str_(self) -> str:
        return self.bytes_().decode("utf-8")


def read_datum(r: _Reader, schema, named=None):
    named = named if named is not None else {}
    if isinstance(schema, str):
        if schema in named:
            return read_datum(r, named[schema], named)
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return r.read(1) == b"\x01"
        if t in ("int", "long"):
            return r.long()
        if t == "float":
            return struct.unpack("<f", r.read(4))[0]
        if t == "double":
            return struct.unpack("<d", r.read(8))[0]
        if t == "bytes":
            return r.bytes_()
        if t == "string":
            return r.str_()
        raise ValueError(f"unsupported schema {schema!r}")
    if isinstance(schema, list):
        return read_datum(r, schema[r.long()], named)
    t = schema["type"]
    if t == "record":
        if schema.get("name"):
            named[schema["name"]] = schema
        return {
            f["name"]: read_datum(r, f["type"], named)
            for f in schema["fields"]
        }
    if t == "array":
        out = []
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:  # block with byte size prefix
                n = -n
                r.long()
            for _ in range(n):
                out.append(read_datum(r, schema["items"], named))
    if t == "map":
        out = {}
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.long()
            for _ in range(n):
                k = r.str_()
                out[k] = read_datum(r, schema["values"], named)
    if t == "fixed":
        if schema.get("name"):
            named[schema["name"]] = schema
        return r.read(schema["size"])
    return read_datum(r, t, named)


# ---------------------------------------------------------------------------
# object container files
# ---------------------------------------------------------------------------

_MAGIC = b"Obj\x01"
# deterministic sync marker: exports are reproducible byte-for-byte
# (the marker only needs to be consistent within one file)
_SYNC = bytes(range(16))


def write_ocf(path: str, schema: dict, records: list[dict],
              metadata: dict[str, str] | None = None) -> int:
    """Write an Avro object container file (codec null); returns the
    byte length (Iceberg manifest lists carry manifest_length)."""
    out = io.BytesIO()
    out.write(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")),
        "avro.codec": "null",
        **(metadata or {}),
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_str(out, k)
        _write_bytes(out, v.encode("utf-8"))
    _write_long(out, 0)
    out.write(_SYNC)
    if records:
        body = io.BytesIO()
        for rec in records:
            write_datum(body, schema, rec)
        payload = body.getvalue()
        _write_long(out, len(records))
        _write_long(out, len(payload))
        out.write(payload)
        out.write(_SYNC)
    data = out.getvalue()
    with open(path, "wb") as fh:
        fh.write(data)
    return len(data)


def read_ocf(path: str) -> tuple[dict, list]:
    """Read an OCF written by any Avro implementation (codec null);
    returns (schema, records)."""
    _, schema, records = read_ocf_meta(path)
    return schema, records


def read_ocf_meta(path: str) -> tuple[dict, dict, list]:
    """`read_ocf` + the file-level metadata map decoded to str —
    Iceberg manifests carry their partition spec and content kind
    there, which multi-spec readers and conformance checks need.
    Returns (metadata, schema, records)."""
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:4] != _MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    r = _Reader(data)
    r.i = 4
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.long()
        for _ in range(n):
            k = r.str_()
            meta[k] = r.bytes_()
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"{path}: unsupported avro codec {codec!r}")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    sync = r.read(16)
    records: list = []
    while r.i < len(data):
        count = r.long()
        size = r.long()
        block = r.read(size)
        if codec == "deflate":
            import zlib

            block = zlib.decompress(block, -15)
        br = _Reader(block)
        for _ in range(count):
            records.append(read_datum(br, schema))
        if r.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    meta_str = {
        k: v.decode("utf-8", errors="replace") for k, v in meta.items()
    }
    return meta_str, schema, records
