"""Minimal Apache Thrift binary-protocol codec (client + server side).

The Hive Metastore speaks Thrift's TBinaryProtocol over a plain socket
(optionally framed). The ``thrift`` runtime and generated
``hive_metastore`` stubs aren't installable here, so this module
implements the small, stable subset of the wire format the catalog
needs, from the public protocol spec
(https://github.com/apache/thrift/blob/master/doc/specs/thrift-binary-protocol.md):

- strict message header: ``i32 (0x80010000 | message_type)``, name,
  seqid — then the args/result struct;
- struct encoding: per-field ``(byte type, i16 id)`` headers, ``STOP``
  terminator;
- scalars big-endian, strings/binary length-prefixed, list/set/map with
  element-type headers.

Structs are described declaratively (field-id -> (name, type, spec))
and read/written generically, so the Hive IDL surface in
``catalog_hive`` is data, not code. This mirrors the role of the
reference's generated ``hive_metastore.ttypes`` (pyiceberg vendors the
generated client; reference catalog/hive.py:294 imports it) without a
code generator.
"""

from __future__ import annotations

import socket
import struct
from typing import Any, Dict, Optional, Tuple

# TType ids (thrift public constants)
STOP = 0
VOID = 1
BOOL = 2
BYTE = 3
DOUBLE = 4
I16 = 6
I32 = 8
I64 = 10
STRING = 11
STRUCT = 12
MAP = 13
SET = 14
LIST = 15

# message types
CALL = 1
REPLY = 2
EXCEPTION = 3
ONEWAY = 4

_STRICT_VERSION = 0x80010000

# A struct schema: {field_id: (field_name, ttype, spec)} where spec is
#   None            for scalars/strings
#   a struct schema for STRUCT
#   (etype, espec)  for LIST / SET
#   (ktype, kspec, vtype, vspec) for MAP
StructSchema = Dict[int, Tuple[str, int, Any]]


class TApplicationException(Exception):
    """Thrift-level failure (unknown method, server error)."""


class ThriftStructException(Exception):
    """A declared IDL exception returned by the server; carries the
    decoded struct (message text under ``message``)."""

    def __init__(self, name: str, fields: Dict[str, Any]):
        self.name = name
        self.fields = fields
        super().__init__(f"{name}: {fields.get('message')}")


# ---------------------------------------------------------------------------
# encoding
# ---------------------------------------------------------------------------


def _w_i16(out: bytearray, v: int) -> None:
    out += struct.pack(">h", v)


def _w_i32(out: bytearray, v: int) -> None:
    out += struct.pack(">i", v)


def _w_i64(out: bytearray, v: int) -> None:
    out += struct.pack(">q", v)


def _w_string(out: bytearray, v: Any) -> None:
    b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
    _w_i32(out, len(b))
    out += b


def write_value(out: bytearray, ttype: int, spec: Any, value: Any) -> None:
    if ttype == BOOL:
        out.append(1 if value else 0)
    elif ttype == BYTE:
        out += struct.pack(">b", value)
    elif ttype == DOUBLE:
        out += struct.pack(">d", value)
    elif ttype == I16:
        _w_i16(out, value)
    elif ttype == I32:
        _w_i32(out, value)
    elif ttype == I64:
        _w_i64(out, value)
    elif ttype == STRING:
        _w_string(out, value)
    elif ttype == STRUCT:
        write_struct(out, spec, value)
    elif ttype in (LIST, SET):
        etype, espec = spec
        out.append(etype)
        _w_i32(out, len(value))
        for item in value:
            write_value(out, etype, espec, item)
    elif ttype == MAP:
        ktype, kspec, vtype, vspec = spec
        out.append(ktype)
        out.append(vtype)
        _w_i32(out, len(value))
        for k, v in value.items():
            write_value(out, ktype, kspec, k)
            write_value(out, vtype, vspec, v)
    else:
        raise TApplicationException(f"cannot encode thrift type {ttype}")


def write_struct(out: bytearray, schema: StructSchema, value: Dict[str, Any]) -> None:
    for fid, (name, ttype, spec) in schema.items():
        v = value.get(name)
        if v is None:
            continue  # optional / unset
        out.append(ttype)
        _w_i16(out, fid)
        write_value(out, ttype, spec, v)
    out.append(STOP)


def encode_message(name: str, mtype: int, seqid: int, schema: StructSchema, args: Dict[str, Any]) -> bytes:
    out = bytearray()
    out += struct.pack(">I", (_STRICT_VERSION | mtype) & 0xFFFFFFFF)
    _w_string(out, name)
    _w_i32(out, seqid)
    write_struct(out, schema, args)
    return bytes(out)


# ---------------------------------------------------------------------------
# decoding
# ---------------------------------------------------------------------------


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise TApplicationException("truncated thrift payload")
        b = self.buf[self.pos : self.pos + n]
        self.pos += n
        return b

    def i8(self) -> int:
        return struct.unpack(">b", self.take(1))[0]

    def i16(self) -> int:
        return struct.unpack(">h", self.take(2))[0]

    def i32(self) -> int:
        return struct.unpack(">i", self.take(4))[0]

    def i64(self) -> int:
        return struct.unpack(">q", self.take(8))[0]

    def string(self) -> str:
        n = self.i32()
        return self.take(n).decode("utf-8", errors="replace")


def read_value(r: _Reader, ttype: int, spec: Any) -> Any:
    if ttype == BOOL:
        return r.take(1)[0] != 0
    if ttype == BYTE:
        return r.i8()
    if ttype == DOUBLE:
        return struct.unpack(">d", r.take(8))[0]
    if ttype == I16:
        return r.i16()
    if ttype == I32:
        return r.i32()
    if ttype == I64:
        return r.i64()
    if ttype == STRING:
        return r.string()
    if ttype == STRUCT:
        return read_struct(r, spec)
    if ttype in (LIST, SET):
        etype = r.take(1)[0]
        n = r.i32()
        espec = spec[1] if spec else None
        return [read_value(r, etype, espec) for _ in range(n)]
    if ttype == MAP:
        ktype = r.take(1)[0]
        vtype = r.take(1)[0]
        n = r.i32()
        kspec, vspec = (spec[1], spec[3]) if spec else (None, None)
        return {read_value(r, ktype, kspec): read_value(r, vtype, vspec) for _ in range(n)}
    raise TApplicationException(f"cannot decode thrift type {ttype}")


def _skip(r: _Reader, ttype: int) -> None:
    read_value(r, ttype, None)


def read_struct(r: _Reader, schema: Optional[StructSchema]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    while True:
        ftype = r.take(1)[0]
        if ftype == STOP:
            return out
        fid = r.i16()
        entry = schema.get(fid) if schema else None
        if entry is None:
            _skip(r, ftype)  # unknown field: forward-compatible skip
            continue
        name, want, spec = entry
        if ftype != want:
            _skip(r, ftype)
            continue
        out[name] = read_value(r, ftype, spec)


def decode_message_header(r: _Reader) -> Tuple[str, int, int]:
    first = r.i32() & 0xFFFFFFFF
    if first & 0xFFFF0000 == _STRICT_VERSION & 0xFFFF0000:  # strict
        mtype = first & 0xFF
        name = r.string()
        seqid = r.i32()
    else:  # old-style: name-length first
        name = r.take(first).decode("utf-8")
        mtype = r.take(1)[0]
        seqid = r.i32()
    return name, mtype, seqid


# TApplicationException wire struct
_TAPP_SCHEMA: StructSchema = {1: ("message", STRING, None), 2: ("type", I32, None)}


# ---------------------------------------------------------------------------
# socket transport (unframed + framed)
# ---------------------------------------------------------------------------


class ThriftConnection:
    """Blocking client connection; one outstanding call at a time (the
    metastore protocol is request/response)."""

    def __init__(self, host: str, port: int, framed: bool = False, timeout: float = 30.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.framed = framed
        self._seq = 0
        self._rbuf = b""

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass

    def _recv_exact(self, n: int) -> bytes:
        while len(self._rbuf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise TApplicationException("connection closed by metastore")
            self._rbuf += chunk
        b, self._rbuf = self._rbuf[:n], self._rbuf[n:]
        return b

    def call(
        self,
        method: str,
        args_schema: StructSchema,
        args: Dict[str, Any],
        result_schema: StructSchema,
        exception_names: Optional[Dict[int, str]] = None,
    ) -> Any:
        """Issue a CALL; return the ``success`` field of the result
        struct (None for void). Declared IDL exceptions surface as
        ThriftStructException keyed by their result-struct field id."""
        self._seq += 1
        payload = encode_message(method, CALL, self._seq, args_schema, args)
        if self.framed:
            payload = struct.pack(">i", len(payload)) + payload
        self.sock.sendall(payload)

        if self.framed:
            (n,) = struct.unpack(">i", self._recv_exact(4))
            r = _Reader(self._recv_exact(n))
        else:
            # unframed: read incrementally — buffer until a full message parses
            r = self._read_unframed()
        name, mtype, _seqid = decode_message_header(r)
        if mtype == EXCEPTION:
            exc = read_struct(r, _TAPP_SCHEMA)
            raise TApplicationException(exc.get("message", "server error"))
        result = read_struct(r, result_schema)
        for fid, ename in (exception_names or {}).items():
            fname = result_schema[fid][0]
            if fname in result:
                raise ThriftStructException(ename, result[fname] or {})
        return result.get("success")

    def _read_unframed(self) -> "_Reader":
        # Accumulate until the reply struct decodes cleanly. Metastore
        # replies arrive in few segments; retry-parse is simpler than a
        # streaming decoder and bounded by message size.
        data = self._rbuf
        self._rbuf = b""
        while True:
            if data:
                try:
                    probe = _Reader(data)
                    decode_message_header(probe)
                    _consume_struct(probe)
                    self._rbuf = data[probe.pos :]
                    return _Reader(data[: probe.pos])
                except TApplicationException:
                    pass
            chunk = self.sock.recv(65536)
            if not chunk:
                raise TApplicationException("connection closed by metastore")
            data += chunk


def _consume_struct(r: _Reader) -> None:
    """Advance past one struct without a schema (validity probe)."""
    while True:
        ftype = r.take(1)[0]
        if ftype == STOP:
            return
        r.i16()
        _skip(r, ftype)
